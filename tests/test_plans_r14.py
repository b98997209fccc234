"""Round-14 optimization contracts.

Pins the plan/caching shapes introduced by the round-14 optimization
pass:

* the exact-verify shingle base of ``ngram_jaccard_pairs`` is served
  from the active ``shared_signature_cache()`` (one staged table feeds
  every recall/param harness) with results identical to the uncached
  path;
* the ``"auto"`` recall-sample corpus count is computed once per corpus
  plan inside a cache block (it is one scalar job per harness call
  otherwise);
* the base-scan / trades-mapping / shared-bars plan memos return the
  SAME lazy plan object per (session, path) — plans only, never
  persisted data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_ngram_base_served_from_shared_cache(spark, sf_dir):
    """Two separately-built exact-verify calls over the same corpus hit
    ONE persisted shingle-base stage; results identical to uncached."""
    import polars_trading_spark.functions.dedup as dd
    from polars_trading_spark.sources.tables import read_table

    def pairs():
        docs = read_table(spark, sf_dir, "documents")
        return dd.ngram_jaccard_pairs(docs, threshold=0.1, block_cols=())

    off = sorted(map(tuple, pairs().collect()))
    with dd.shared_signature_cache():
        r1 = sorted(map(tuple, pairs().collect()))
        n_entries = len(dd._SHARED_SIG_CACHE)
        assert n_entries == 1, "expected exactly the ngbase entry"
        r2 = sorted(map(tuple, pairs().collect()))
        assert len(dd._SHARED_SIG_CACHE) == n_entries, (
            "second identical corpus read must HIT the cache"
        )
        # a different ngram must NOT collide
        docs = read_table(spark, sf_dir, "documents")
        dd.ngram_jaccard_pairs(docs, ngram=2, threshold=0.1, block_cols=()).collect()
        assert len(dd._SHARED_SIG_CACHE) == n_entries + 1
    assert dd._SHARED_SIG_CACHE is None
    assert r1 == r2 == off


def test_recall_sample_auto_count_cached(spark, sf_dir):
    """Inside a cache block the auto-fraction corpus count is computed
    once per corpus plan and reused; the sample itself is unchanged."""
    import polars_trading_spark.functions.dedup as dd
    from polars_trading_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    off = sorted(
        r[0]
        for r in dd._recall_sample(docs, "auto", 5, "pts-recall", "doc_id")
        .select("doc_id")
        .collect()
    )
    with dd.shared_signature_cache():
        s1 = dd._recall_sample(docs, "auto", 5, "pts-recall", "doc_id")
        scalar_keys = [
            k for k in dd._SHARED_SIG_CACHE if isinstance(k, tuple) and "ndocs" in k
        ]
        assert len(scalar_keys) == 1
        n_cached = dd._SHARED_SIG_CACHE[scalar_keys[0]]
        assert n_cached == docs.count()
        s2 = dd._recall_sample(docs, "auto", 5, "pts-recall", "doc_id")
        assert len(dd._SHARED_SIG_CACHE) >= 1  # scalar entry survives
        got1 = sorted(r[0] for r in s1.select("doc_id").collect())
        got2 = sorted(r[0] for r in s2.select("doc_id").collect())
    assert got1 == got2 == off


def test_plan_memos_return_same_plan_and_hold_no_data(spark, sf_dir):
    """The round-14 plan memos are PLAN-only: repeated reads return one
    lazy DataFrame per (session, path) and nothing is persisted."""
    from polars_trading_spark.oracles._shared import feature_bars
    from polars_trading_spark.sources.tables import read_table, trades_from_events

    t1 = read_table(spark, sf_dir, "events")
    t2 = read_table(spark, sf_dir, "events")
    assert t1 is t2
    tr1 = trades_from_events(spark, sf_dir)
    tr2 = trades_from_events(spark, sf_dir)
    assert tr1 is tr2
    b1 = feature_bars(spark, sf_dir)
    b2 = feature_bars(spark, sf_dir)
    assert b1 is b2
    # plans, not data: none of the memoized frames is persisted
    for df in (t1, tr1, b1):
        assert not df.storageLevel.useMemory and not df.storageLevel.useDisk
    # and the plans still compute from the input on every action
    assert tr1.count() == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert b1.groupBy().count().collect()[0][0] > 0
