"""Round-7 text-quality profiles: lexical diversity, encoding quality,
Heaps'-law vocabulary growth, term burstiness."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from polars_trading_spark.functions.text import encoding_quality, lexical_diversity
from polars_trading_spark.functions.tfidf import heaps_law, term_burstiness


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9 ]", " ", text.lower())
    return [x for x in re.sub(r" +", " ", t).strip().split(" ") if x]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------- lexical


def test_lexical_diversity_hand_computed(spark):
    # doc 0: tokens a a b c -> N=4 V=3 V1=2 S2=4+1+1=6
    #   ttr=0.75 hapax=2/3 yule_k=1e4*(6-4)/16=1250
    # doc 1: all distinct -> yule_k = 0
    # doc 2: one repeated token -> V=1, V1=0, S2=N^2
    rows = (
        lexical_diversity(_docs(spark, ["a a b c", "x y z", "w w w w w"]))
        .orderBy("doc_id")
        .collect()
    )
    r0, r1, r2 = rows
    assert (r0.n_tokens, r0.n_types, r0.n_hapax) == (4, 3, 2)
    assert r0.ttr == pytest.approx(0.75)
    assert r0.hapax_ratio == pytest.approx(2 / 3)
    assert r0.yule_k == pytest.approx(1e4 * 2 / 16)
    assert r1.yule_k == pytest.approx(0.0)
    assert (r2.n_types, r2.n_hapax) == (1, 0)
    assert r2.yule_k == pytest.approx(1e4 * (25 - 5) / 25)


def test_lexical_diversity_empty_doc_keeps_row_with_nulls(spark):
    rows = lexical_diversity(_docs(spark, ["", "a b"])).orderBy("doc_id").collect()
    assert rows[0].n_tokens == 0 and rows[0].n_types == 0
    assert rows[0].ttr is None and rows[0].hapax_ratio is None and rows[0].yule_k is None
    assert rows[1].ttr == pytest.approx(1.0)


# ---------------------------------------------------------------- encoding


def test_encoding_quality_counts(spark):
    texts = [
        "clean ascii text.",
        "café Ã© broken â€™ quote",  # 4 mojibake leads (Ã, â) + é
        "bad \x00\x01 bytes",
        "lossy �� decode",
        "",
    ]
    rows = encoding_quality(_docs(spark, texts)).orderBy("doc_id").collect()
    r = {x.doc_id: x for x in rows}
    assert r[0].n_replacement == 0 and r[0].n_control == 0
    assert r[0].ascii_ratio == pytest.approx(1.0)
    assert not r[0].flagged
    # doc 1: 'Ã' appears twice (standalone + inside 'Ã©'? no — text has Ã then â)
    assert r[1].mojibake_leads == 2
    assert r[1].flagged  # 2/24 chars > 0.5%
    assert r[2].n_control == 2 and r[2].flagged
    assert r[3].n_replacement == 2 and r[3].flagged
    assert r[4].n_chars == 0 and r[4].ascii_ratio is None and not r[4].flagged


def test_encoding_quality_ascii_ratio(spark):
    rows = encoding_quality(_docs(spark, ["abéé"])).collect()
    assert rows[0].ascii_ratio == pytest.approx(0.5)


# ---------------------------------------------------------------- heaps


def test_heaps_law_recovers_beta_on_synthetic_power_corpus(spark):
    # vocabulary grows ~ sqrt(N): doc i introduces tokens so that after
    # i docs of 20 tokens each, V ~ k * N^0.5
    texts = []
    vocab_used = 0
    total = 0
    for i in range(120):
        total += 20
        target_v = int(4 * math.sqrt(total))
        new = max(0, target_v - vocab_used)
        toks = [f"w{vocab_used + j}" for j in range(new)]
        vocab_used += new
        while len(toks) < 20:
            toks.append(f"w{(i * 7 + len(toks)) % max(1, vocab_used)}")
        texts.append(" ".join(toks))
    row = heaps_law(_docs(spark, texts), n_checkpoints=40).collect()[0]
    assert row.n_points > 10
    assert 0.35 < row.beta < 0.65
    assert row.r2 > 0.95
    assert row.total_tokens == 120 * 20
    assert row.n_vocab == vocab_used


def test_heaps_law_closed_vocabulary_beta_near_zero(spark):
    texts = ["the cat sat on the mat"] * 50
    row = heaps_law(_docs(spark, texts), n_checkpoints=10).collect()[0]
    assert row.n_vocab == 5  # the, cat, sat, on, mat
    assert row.beta < 0.2


def test_heaps_law_rejects_too_few_checkpoints(spark):
    with pytest.raises(ValueError):
        heaps_law(_docs(spark, ["a"]), n_checkpoints=2)


# ---------------------------------------------------------------- burstiness


def test_term_burstiness_hand_computed(spark):
    # 4 docs; 'the' once per doc (Poisson-ish, fano small);
    # 'spam' 8 times in one doc (bursty).
    texts = [
        "the spam spam spam spam spam spam spam spam",
        "the quick fox",
        "the lazy dog",
        "the end here",
    ]
    out = term_burstiness(_docs(spark, texts), min_df=1, top_k=10)
    rows = {r.token: r for r in out.collect()}
    # the: c=[1,1,1,1] S1=4 S2=4 D=4 -> fano = 1 - 1 = 0
    assert rows["the"].fano == pytest.approx(0.0)
    assert rows["the"].df == 4 and rows["the"].total_count == 4
    # spam: c=[8] S1=8 S2=64 -> fano = 8 - 2 = 6
    assert rows["spam"].fano == pytest.approx(6.0)
    # ranked first
    first = out.collect()[0]
    assert first.token == "spam"


def test_term_burstiness_min_df_filters(spark):
    texts = ["aa bb", "aa cc", "aa dd"]
    out = term_burstiness(_docs(spark, texts), min_df=2, top_k=10).collect()
    assert {r.token for r in out} == {"aa"}


def test_term_burstiness_rejects_bad_min_df(spark):
    with pytest.raises(ValueError):
        term_burstiness(_docs(spark, ["a"]), min_df=0)


def _ref_burstiness(texts, min_df):
    per_doc = [Counter(_norm_tokens(t)) for t in texts]
    toks = set().union(*[set(c) for c in per_doc])
    d = len(texts)
    out = {}
    for t in toks:
        cs = [c[t] for c in per_doc if t in c]
        if len(cs) < min_df:
            continue
        s1, s2 = sum(cs), sum(c * c for c in cs)
        out[t] = s2 / s1 - s1 / d
    return out


def test_term_burstiness_matches_python_reference(spark):
    texts = [
        "alpha beta beta gamma " * (i % 3 + 1) + "delta " * (i % 5) for i in range(20)
    ]
    ref = _ref_burstiness(texts, 3)
    rows = term_burstiness(_docs(spark, texts), min_df=3, top_k=50).collect()
    for r in rows:
        assert r.fano == pytest.approx(ref[r.token]), r.token
