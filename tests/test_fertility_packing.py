"""tokenizer_fertility (functions/bpe.py) and packing_efficiency
(functions/corpus.py)."""

from __future__ import annotations

import pytest

from polars_trading_spark.functions.bpe import bpe_train, tokenizer_fertility
from polars_trading_spark.functions.corpus import (
    pack_sequences,
    packing_efficiency,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_tokenizer_fertility_golden(spark):
    # train on an English-only corpus, audit a bilingual one: the
    # out-of-vocabulary language pays the character-count fallback
    train = _docs(
        spark,
        [(1, "en", "low low low lower lowest"), (2, "en", "low lower newest")],
    )
    _, words = bpe_train(train, n_merges=6, min_pair_count=2)
    audit = _docs(
        spark,
        [
            (10, "en", "low lower"),
            (11, "en", "lowest low"),
            (12, "xx", "zq zq"),  # fully OOV: 2 words, 2+2 chars
        ],
    )
    out = {r["lang"]: r for r in tokenizer_fertility(audit, words).collect()}
    en, xx = out["en"], out["xx"]
    assert en["n_docs"] == 2 and en["whitespace_tokens"] == 4
    assert en["n_oov_words"] == 0 and en["oov_rate"] == 0.0
    assert en["chars"] == len("low lower") + len("lowest low")
    # xx: every word OOV -> bpe tokens = char counts (2 + 2)
    assert xx["n_docs"] == 1 and xx["whitespace_tokens"] == 2
    assert xx["n_oov_words"] == 2 and xx["oov_rate"] == 1.0
    assert xx["bpe_tokens"] == 4
    assert xx["bpe_per_word"] == pytest.approx(2.0)
    assert xx["chars_per_bpe_token"] == pytest.approx(len("zq zq") / 4)
    # fertility is bounded by 1 from below (a word is >= 1 token)
    assert en["bpe_per_word"] >= 1.0


def test_tokenizer_fertility_totals_match_budget(spark):
    from polars_trading_spark.functions.bpe import bpe_token_budget

    docs = spark.createDataFrame(
        [
            (1, "en", "s1", "the quick brown fox jumps over the lazy dog"),
            (2, "de", "s1", "der schnelle braune fuchs springt"),
            (3, "en", "s2", "the quick dog sleeps"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    _, words = bpe_train(docs, n_merges=8, min_pair_count=2)
    fert = tokenizer_fertility(docs, words).collect()
    budg = bpe_token_budget(docs, words).collect()
    for col in ("n_docs", "whitespace_tokens", "bpe_tokens", "chars", "n_oov_words"):
        assert sum(r[col] for r in fert) == sum(r[col] for r in budg), col


def test_packing_efficiency_golden(spark):
    # hand-built assignment: budget 10; fills 10 (full), 7 (3 padding),
    # 12 (single oversized doc)
    packed = spark.createDataFrame(
        [
            (1, 0, 0, 0, 6),
            (2, 0, 0, 6, 4),
            (3, 0, 1, 0, 7),
            (4, 1, 0, 0, 12),
        ],
        "doc_id long, shard int, seq_id int, seq_offset long, n_tokens int",
    )
    r = packing_efficiency(packed, budget_tokens=10).collect()[0]
    assert r["budget_tokens"] == 10
    assert r["n_sequences"] == 3 and r["n_docs"] == 4
    assert r["total_tokens"] == 29
    assert r["padding_tokens"] == 3
    assert r["n_oversized"] == 1
    assert (r["min_fill"], r["max_fill"]) == (7, 12)
    assert r["fill_rate"] == pytest.approx(1 - 3 / 30, abs=1e-9)
    assert r["avg_docs_per_seq"] == pytest.approx(4 / 3, abs=1e-6)


def test_packing_efficiency_over_real_packing(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (5 + (i * 13) % 40)) for i in range(60)],
        "doc_id long, text string",
    )
    packed = pack_sequences(docs, budget_tokens=64, n_shards=4)
    r = packing_efficiency(packed, budget_tokens=64).collect()[0]
    # consistency with the assignment frame
    rows = packed.collect()
    assert r["n_docs"] == len(rows)
    assert r["total_tokens"] == sum(x["n_tokens"] for x in rows)
    # no doc exceeds 64 tokens here -> nothing oversized, fills bounded
    assert r["n_oversized"] == 0
    assert r["max_fill"] <= 64
    assert 0.0 < r["fill_rate"] <= 1.0
    # greedy packing of shard-thousands corpora stays well filled; even
    # this tiny corpus should beat one-doc-per-sequence waste
    assert r["avg_docs_per_seq"] > 1.0


def test_packing_efficiency_validation(spark):
    packed = spark.createDataFrame(
        [(1, 0, 0, 0, 5)],
        "doc_id long, shard int, seq_id int, seq_offset long, n_tokens int",
    )
    with pytest.raises(ValueError):
        packing_efficiency(packed, budget_tokens=0)
