"""Distributed BPE trainer golden tests (functions/bpe.py).

No SQL oracle exists (greedy iterative training), so the gate is an
EXACT match against an independent pure-Python BPE reference — the
classic word-frequency-dict implementation, written from the Sennrich
et al. (2016) algorithm description, sharing no code with the engine.
"""

from __future__ import annotations

from collections import Counter

import pytest

from polars_trading_spark.functions.bpe import bpe_token_budget, bpe_train


def _ref_tokens(text: str) -> list[str]:
    """Mirror functions/text.py::tokens — lowercase, strip to [a-z0-9 ],
    collapse whitespace."""
    import re

    norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip()
    return [t for t in norm.split(" ") if t]


def _ref_bpe_train(texts, n_merges, min_pair_count=2):
    """Independent reference: greedy BPE on the word-frequency dict."""
    words = Counter()
    for t in texts:
        words.update(_ref_tokens(t))
    segs = {w: list(w) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, c in words.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # (count desc, left, right) tiebreak
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, left + right, cnt))
        for w, s in segs.items():
            out = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            segs[w] = out
    return merges, {w: len(s) for w, s in segs.items()}, dict(words)


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "low lower lowest newer newest widest wide",
    "hugging faces hug hugs hugged hugging",
    "aaa aaaa aa aaa banana bandana",
    "the the the and and of of of of",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(CORPUS)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_bpe_train_matches_reference_exactly(docs, spark):
    merges_df, words_df = bpe_train(docs, n_merges=12, min_pair_count=2)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    ref_merges, ref_seg_counts, ref_counts = _ref_bpe_train(CORPUS, 12, 2)
    assert got == ref_merges
    got_words = {
        r["word"]: (r["word_count"], r["n_bpe_tokens"])
        for r in words_df.collect()
    }
    assert set(got_words) == set(ref_counts)
    for w in ref_counts:
        assert got_words[w] == (ref_counts[w], ref_seg_counts[w]), w


def test_bpe_train_early_stop_and_overlap_semantics(spark):
    # 'aaaa' x3: pair (a,a) counts 3 occurrences x 3 docs... reference
    # decides; key check = greedy leftmost non-overlap ('aaaa' -> aa,aa)
    texts = ["aaaa aaaa", "aaaa"]
    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    merges_df, words_df = bpe_train(df, n_merges=50, min_pair_count=2)
    ref_merges, ref_seg_counts, _ = _ref_bpe_train(texts, 50, 2)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    assert got == ref_merges
    got_seg = {r["word"]: r["n_bpe_tokens"] for r in words_df.collect()}
    assert got_seg == ref_seg_counts
    # early stop: merge count << 50
    assert len(got) < 50


def test_bpe_token_budget_matches_reference(docs, spark):
    n_merges = 8
    merges_df, words_df = bpe_train(docs, n_merges=n_merges)
    out = {r["source"]: r for r in bpe_token_budget(docs, words_df).collect()}
    _, ref_seg_counts, _ = _ref_bpe_train(CORPUS, n_merges, 2)
    for src in ("s0", "s1"):
        texts = [t for i, t in enumerate(CORPUS) if f"s{i % 2}" == src]
        ws = sum(len(_ref_tokens(t)) for t in texts)
        bpe = sum(
            ref_seg_counts[w] for t in texts for w in _ref_tokens(t)
        )
        r = out[src]
        assert r["whitespace_tokens"] == ws
        assert r["bpe_tokens"] == bpe
        assert r["bpe_per_word"] == pytest.approx(round(bpe / ws, 6))
        assert r["n_docs"] == len(texts)


def test_bpe_train_validation(docs):
    with pytest.raises(ValueError):
        bpe_train(docs, n_merges=0)
    with pytest.raises(ValueError):
        bpe_train(docs, min_pair_count=0)
