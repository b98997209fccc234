"""Cross-doc duplicated-span stats (functions/dedup.py::duplicated_span_stats)."""

from __future__ import annotations

import pytest

from polars_trading_spark.functions.dedup import duplicated_span_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


def test_shared_span_exact_coverage(spark):
    # Docs 1 and 2 share a 12-token span; doc 3 is disjoint.
    shared = " ".join(WORDS)  # 12 tokens
    rows = [
        (1, "one two three " + shared),
        (2, shared + " nine ten eleven"),
        (3, "completely different words with no overlap at all whatsoever here"),
    ]
    out = {
        r["doc_id"]: r
        for r in duplicated_span_stats(_docs(spark, rows), ngram=4, min_docs=2).collect()
    }
    # Shared span of L=12 tokens with n=4: L-n+1 = 9 duplicated shingles,
    # union coverage = 12 tokens.
    for d in (1, 2):
        assert out[d]["dup_shingles"] == 9
        assert out[d]["dup_token_cov"] == 12
        assert out[d]["n_tokens"] == 15
        assert out[d]["dup_frac"] == pytest.approx(12 / 15)
    assert out[3]["dup_shingles"] == 0
    assert out[3]["dup_token_cov"] == 0
    assert out[3]["keep"] is True
    # 80% duplicated > 50% default threshold
    assert out[1]["keep"] is False


def test_disjoint_spans_union(spark):
    # Two separate shared 4-token spans inside doc 1 -> coverage 8, not
    # merged and not double-counted.
    s1, s2 = " ".join(WORDS[:4]), " ".join(WORDS[8:12])
    rows = [
        (1, s1 + " filler1 filler2 filler3 " + s2),
        (2, s1),
        (3, s2),
    ]
    out = {
        r["doc_id"]: r
        for r in duplicated_span_stats(_docs(spark, rows), ngram=4, min_docs=2).collect()
    }
    assert out[1]["dup_shingles"] == 2
    assert out[1]["dup_token_cov"] == 8
    assert out[2]["dup_shingles"] == 1
    assert out[2]["dup_token_cov"] == 4


def test_min_docs_three_excludes_pairs(spark):
    shared = " ".join(WORDS[:6])
    rows = [(1, shared), (2, shared), (3, "unrelated text entirely")]
    out = {
        r["doc_id"]: r
        for r in duplicated_span_stats(_docs(spark, rows), ngram=4, min_docs=3).collect()
    }
    assert out[1]["dup_shingles"] == 0 and out[2]["dup_shingles"] == 0


def test_within_doc_repetition_not_cross_doc(spark):
    phrase = " ".join(WORDS[:5])
    rows = [
        (1, phrase + " sep " + phrase),  # repeats internally only
        (2, "other material here unrelated to anything"),
    ]
    out = {
        r["doc_id"]: r
        for r in duplicated_span_stats(_docs(spark, rows), ngram=5, min_docs=2).collect()
    }
    assert out[1]["dup_shingles"] == 0


def test_short_and_empty_docs(spark):
    rows = [(1, "one two"), (2, ""), (3, "one two")]
    out = {
        r["doc_id"]: r
        for r in duplicated_span_stats(_docs(spark, rows), ngram=4, min_docs=2).collect()
    }
    # No doc reaches 4 tokens: no shingles anywhere; empty doc keeps.
    for d in (1, 2, 3):
        assert out[d]["n_shingles"] == 0
        assert out[d]["dup_frac"] == 0.0
        assert out[d]["keep"] is True


def test_param_validation(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="ngram"):
        duplicated_span_stats(df, ngram=0)
    with pytest.raises(ValueError, match="min_docs"):
        duplicated_span_stats(df, min_docs=1)


def test_containment_catches_quote_inclusion(spark):
    """A short doc quoted inside a long one: Jaccard is tiny but
    containment of the short side is ~1."""
    from polars_trading_spark.functions.dedup import ngram_containment_pairs

    short = " ".join(WORDS)  # 12 tokens
    filler = " ".join(f"filler{i}" for i in range(100))
    rows = [
        (1, short),
        (2, filler + " " + short + " " + filler.replace("filler", "pad")),
        (3, "totally different content with nothing shared at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_containment_pairs(docs, ngram=3, threshold=0.9, max_df_frac=1.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment_a"] == pytest.approx(1.0)  # all of 1's shingles in 2
    assert r["containment_b"] < 0.1


def test_containment_maxdf_prune_drops_stop_shingles(spark):
    from polars_trading_spark.functions.dedup import ngram_containment_pairs

    common = "the common boiler plate line"
    rows = [(i, common + f" unique{i} tail{i} end{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # every pair shares ONLY the ubiquitous shingles; with max_df 0.2
    # they never become candidates
    out = ngram_containment_pairs(docs, ngram=3, threshold=0.3, max_df_frac=0.2).collect()
    assert out == []


def test_containment_validation(spark):
    from polars_trading_spark.functions.dedup import ngram_containment_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        ngram_containment_pairs(docs, threshold=0.0)
    with pytest.raises(ValueError, match="max_df_frac"):
        ngram_containment_pairs(docs, max_df_frac=0.0)
