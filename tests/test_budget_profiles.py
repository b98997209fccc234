"""perplexity_budget_curves (functions/corpus.py) and
dedup_cluster_profile (functions/dedup.py)."""

from __future__ import annotations

import pytest

from polars_trading_spark.functions.corpus import perplexity_budget_curves
from polars_trading_spark.functions.dedup import dedup_cluster_profile


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_perplexity_curves_golden(spark):
    # one source, 4 ranked docs: common words score high logprob,
    # hapax gibberish scores low; token counts 4 / 4 / 2 / 2
    docs = _docs(
        spark,
        [
            (1, "s", "the cat the cat"),
            (2, "s", "the cat sat here"),
            (3, "s", "zq wv"),
            (4, "s", "the cat"),
            (5, "s", ""),  # empty: excluded from the curve
        ],
    )
    out = perplexity_budget_curves(docs, n_cutoffs=4).collect()
    rows = {r["cutoff_idx"]: r for r in out}
    assert len(rows) == 4
    total = rows[4]["total_tokens"]
    assert total == 4 + 4 + 2 + 2
    # last cutoff covers every token-bearing doc
    assert rows[4]["n_docs_kept"] == 4
    assert rows[4]["token_share"] == pytest.approx(1.0)
    assert rows[4]["cum_tokens"] == total
    # cum_tokens monotone in cutoff, ppl_cutoff monotone non-decreasing
    for d in (2, 3, 4):
        assert rows[d]["cum_tokens"] >= rows[d - 1]["cum_tokens"]
        assert rows[d]["ppl_cutoff"] >= rows[d - 1]["ppl_cutoff"] - 1e-9
    # the gibberish doc (hapax-only) ranks LAST: it enters only at the
    # final cutoff, so the cutoff-3 keep-set excludes exactly its 2
    # tokens
    assert rows[3]["cum_tokens"] == total - 2
    # ppl consistency at each boundary
    import math

    for r in out:
        assert r["ppl_cutoff"] == pytest.approx(
            math.exp(-r["logprob_cutoff"]), rel=1e-6
        )
    with pytest.raises(ValueError):
        perplexity_budget_curves(docs, n_cutoffs=0)


def test_dedup_cluster_profile_golden(spark):
    body = (
        "the quick brown fox jumps over the lazy dog near the quiet "
        "river bank while birds sing in the morning light"
    )
    other = (
        "completely different content about distributed query engines "
        "and shuffle partitioning strategies for large scale analytics"
    )
    docs = _docs(
        spark,
        [
            (1, "s", body),
            (2, "s", body),            # pair with 1
            (3, "s", other),
            (4, "s", other),
            (5, "s", other),           # triple with 3, 4
            (6, "s", "unique text one about gardening tools"),
            (7, "s", "unique text two about ocean navigation"),
        ],
    )
    out = {r["cluster_size"]: r for r in dedup_cluster_profile(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[1]["n_clusters"] == 2 and out[1]["dup_docs"] == 0
    assert out[2]["dup_docs"] == 1 and out[3]["dup_docs"] == 2
    assert sum(r["n_docs"] for r in out.values()) == 7
    assert sum(r["doc_share"] for r in out.values()) == pytest.approx(
        1.0, abs=1e-5
    )
