"""Plan + equivalence contracts for the round-11 additions: the
BUCKETED banded MinHash index (the 100-TB posture claim at
functions/dedup.py::minhash_index made concrete) and the banded
incremental-dedup join that must read the index side shuffle-free."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from polars_trading_spark.functions.dedup import (
    incremental_dedup,
    incremental_dedup_banded,
    minhash_index,
    write_banded_minhash_index,
)
from polars_trading_spark.plans import count_exchanges, plan_string

_BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture
def corpus(spark):
    base = _docs(
        spark,
        [(i, f"base document number {i} with shared filler words") for i in range(12)]
        + [(50, _BASE_TEXT)],
    )
    new = _docs(
        spark,
        [
            (100, _BASE_TEXT),
            (101, "novel content about spark engines and shuffle plans"),
            (102, "novel content about spark engines and shuffle plans"),
            (103, ""),
        ],
    )
    return base, new


def test_banded_index_join_has_no_exchange_on_index_side(spark, corpus):
    """The bucketed band table must join WITHOUT an exchange on the
    index branch: the same plan against a non-bucketed copy of the
    identical band rows needs exactly one more shuffle (the index
    side's), and the bucketed scan advertises its bucketing."""
    base, new = corpus
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS pts_r11_banded_idx")
    spark.sql("DROP TABLE IF EXISTS pts_r11_flat_idx")
    try:
        # broadcast would hide the exchange question entirely
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_banded_minhash_index(
            minhash_index(base), "pts_r11_banded_idx", buckets=8
        )
        # control: identical rows, no bucketing metadata
        spark.table("pts_r11_banded_idx").write.mode("overwrite").saveAsTable(
            "pts_r11_flat_idx"
        )
        bucketed = incremental_dedup_banded(new, spark.table("pts_r11_banded_idx"))
        flat = incremental_dedup_banded(new, spark.table("pts_r11_flat_idx"))
        n_bucketed, n_flat = count_exchanges(bucketed), count_exchanges(flat)
        assert n_bucketed == n_flat - 1, (n_bucketed, n_flat)
        plan = plan_string(bucketed, "executed")
        assert re.search(r"Bucketed: true", plan), "index scan not bucketed"
        assert "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS pts_r11_banded_idx")
        spark.sql("DROP TABLE IF EXISTS pts_r11_flat_idx")


def test_banded_matches_unbanded_incremental_dedup(spark, corpus):
    """Output contract equality: the banded path must reproduce
    incremental_dedup row-for-row (same keep/dup_of/dup_is_base, same
    exact k-rational est_jaccard)."""
    base, new = corpus
    spark.sql("DROP TABLE IF EXISTS pts_r11_eq_idx")
    try:
        idx = minhash_index(base)
        write_banded_minhash_index(idx, "pts_r11_eq_idx", buckets=4)
        expect = {
            r["doc_id"]: r for r in incremental_dedup(new, idx).collect()
        }
        got = {
            r["doc_id"]: r
            for r in incremental_dedup_banded(
                new, spark.table("pts_r11_eq_idx")
            ).collect()
        }
        assert set(got) == set(expect)
        for did, r in got.items():
            e = expect[did]
            for c in ("keep", "dup_of", "dup_is_base", "est_jaccard"):
                assert r[c] == e[c], (did, c, r[c], e[c])
    finally:
        spark.sql("DROP TABLE IF EXISTS pts_r11_eq_idx")


def test_banded_respects_base_flag_zero_rows(spark):
    """Flag-0 rows in the banded index (appended earlier snapshots)
    only match HIGHER-id new docs — the micro-batch replay rule."""
    spark.sql("DROP TABLE IF EXISTS pts_r11_flag_idx")
    try:
        prior = _docs(spark, [(300, _BASE_TEXT)])  # higher id than new doc
        idx = minhash_index(prior).withColumn("is_base", F.lit(0))
        write_banded_minhash_index(
            idx, "pts_r11_flag_idx", buckets=4, base_flag_col="is_base"
        )
        new = _docs(spark, [(100, _BASE_TEXT), (400, _BASE_TEXT)])
        got = {
            r["doc_id"]: r
            for r in incremental_dedup_banded(
                new, spark.table("pts_r11_flag_idx")
            ).collect()
        }
        # 100 < 300: the flag-0 index doc must NOT claim it.  400 ties
        # at est 1.0 / base 0 against both 300 and in-batch 100; the
        # smallest id wins the tie.
        assert got[100]["keep"] == 1 and got[100]["dup_of"] is None
        assert got[400]["keep"] == 0 and got[400]["dup_of"] == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS pts_r11_flag_idx")


def test_banded_index_validation(spark, corpus):
    base, new = corpus
    with pytest.raises(ValueError, match="divide"):
        write_banded_minhash_index(minhash_index(base), "pts_r11_bad", bands=5)
    with pytest.raises(ValueError, match="missing signature column"):
        write_banded_minhash_index(minhash_index(base).drop("m3"), "pts_r11_bad")
    with pytest.raises(ValueError, match="missing columns"):
        incremental_dedup_banded(new, minhash_index(base))
    with pytest.raises(ValueError, match="sig_threshold"):
        incremental_dedup_banded(
            new,
            minhash_index(base).withColumn("__bkey", F.lit("x"))
            .withColumn("__id", F.col("doc_id"))
            .withColumn("__base", F.lit(1)),
            sig_threshold=0.0,
        )


def test_shared_signature_cache_reuses_across_calls(spark, sf_dir):
    """The bench/pipeline amortization contract: inside the context,
    two SEPARATELY-BUILT reads of the same corpus hit one persisted
    shingle+signature stage (canonicalized-plan keying — object
    identity would never match across queries); results identical to
    the uncached path; cache gone and unpersisted after the block."""
    import polars_trading_spark.functions.dedup as dd
    from polars_trading_spark.sources.tables import read_table

    def pairs():
        docs = read_table(spark, sf_dir, "documents")
        return dd.minhash_lsh_pairs(docs, jaccard_threshold=0.1)

    off = sorted(map(tuple, pairs().collect()))
    with dd.shared_signature_cache():
        r1 = sorted(map(tuple, pairs().collect()))
        n_entries = len(dd._SHARED_SIG_CACHE)
        assert n_entries == 2, "expected shingle + signature entries"
        cached = list(dd._SHARED_SIG_CACHE.values())
        assert all(v.storageLevel.useMemory for v in cached)
        r2 = sorted(map(tuple, pairs().collect()))
        assert len(dd._SHARED_SIG_CACHE) == n_entries, (
            "second identical corpus read must HIT the cache, not add entries"
        )
    assert dd._SHARED_SIG_CACHE is None
    assert all(not v.storageLevel.useMemory for v in cached)
    assert r1 == r2 == off


def test_shared_signature_cache_distinguishes_params(spark, sf_dir):
    """Different shingle/hash parameters must NOT collide in the cache."""
    import polars_trading_spark.functions.dedup as dd
    from polars_trading_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    with dd.shared_signature_cache():
        dd.minhash_lsh_pairs(docs, ngram=3).collect()
        n3 = len(dd._SHARED_SIG_CACHE)
        dd.minhash_lsh_pairs(docs, ngram=2).collect()
        assert len(dd._SHARED_SIG_CACHE) == 2 * n3
