"""Plan contracts for the round-4 additions (roll, O-U, seasonality,
dup spans, semdedup, BPE pairs) — the shapes that decide 100× scale
survival."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from polars_trading_spark.config import Config
from polars_trading_spark.plans import (
    count_exchanges,
    count_python_stages,
    plan_string,
)
from polars_trading_spark.sources.tables import trades_from_events


@pytest.fixture
def trades(spark, sf_dir):
    return trades_from_events(spark, sf_dir)


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_roll_adjust_single_symbol_shuffle_no_python(spark, trades):
    from polars_trading_spark.operators.roll import roll_adjust

    with Config(timestamp_column="ts_event"):
        pts = trades.groupBy(
            "symbol", F.date_trunc("week", "ts_event").alias("__wk")
        ).agg(F.min("ts_event").alias("roll_ts")).drop("__wk")
        out = roll_adjust(trades, pts, method="backward")
    assert count_python_stages(out) == 0
    # boundary group-by + ONE symbol-hash exchange reused by all windows
    assert count_exchanges(out) <= 2
    # the only whole-frame window is the O(n) full-partition total; the
    # quadratic [current, unbounded following] running shape must not
    # appear: every unboundedfollowing frame must also start unbounded.
    plan = _executed(out).lower()
    for m in re.finditer(r"specifiedwindowframe\(rowframe, ([^,]*), unboundedfollowing", plan):
        assert "unboundedpreceding" in m.group(1)


def test_ou_fit_one_window_one_agg_no_join(spark, trades):
    from polars_trading_spark.operators.mean_reversion import ou_fit

    out = ou_fit(trades, ts_col="ts_event", close_col="price")
    assert count_python_stages(out) == 0
    plan = _executed(out)
    assert "Join" not in plan
    # lag window + hash aggregate: at most 2 exchanges
    assert count_exchanges(out) <= 2


def test_intraday_profile_no_join_no_python(spark, trades):
    from polars_trading_spark.operators.seasonality import intraday_profile

    with Config(timestamp_column="ts_event"):
        out = intraday_profile(trades, bucket_minutes=60)
    assert count_python_stages(out) == 0
    assert "Join" not in _executed(out)


def test_bpe_pairs_distributed_topk_no_global_sort(spark, sf_dir):
    from polars_trading_spark.functions.text import bpe_pair_counts
    from polars_trading_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = bpe_pair_counts(docs, top_k=20)
    assert count_python_stages(out) == 0
    plan = _executed(out)
    assert "TakeOrderedAndProject" in plan


def test_dup_spans_no_cartesian(spark, sf_dir):
    from polars_trading_spark.functions.dedup import duplicated_span_stats
    from polars_trading_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = duplicated_span_stats(docs, ngram=8)
    assert count_python_stages(out) == 0
    plan = _executed(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_only_broadcast_pack_is_nested_loop(spark, sf_dir):
    from polars_trading_spark.functions.similarity import semdedup
    from polars_trading_spark.sources.tables import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = semdedup(emb, n_cells=8, threshold=0.95, centroid_method="lowest_id")
    assert count_python_stages(out) == 0
    plan = _executed(out)
    # The centroid pack rides a ONE-ROW broadcast (one BNLJ per
    # reference to the assigned frame — bounded by plan shape, not data);
    # the pair join itself must be a hash equi-join on the cell id.
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 3
    assert re.search(r"BroadcastHashJoin \[cell#\d+\], \[cell#\d+\]", plan) or re.search(
        r"SortMergeJoin \[cell#\d+\], \[cell#\d+\]", plan
    )


def test_jump_test_single_window_partitioning(spark, trades):
    from polars_trading_spark import time_bars
    from polars_trading_spark.operators.volatility import jump_test

    with Config(timestamp_column="ts_event"):
        bars = time_bars(trades, bar_size="15m")
    out = jump_test(bars, window=10, ts_col="ts_event")
    assert count_python_stages(out) == 0
    assert "Join" not in _executed(out)


def test_sign_autocorr_native_no_python(spark, trades):
    from polars_trading_spark.operators.microstructure import sign_autocorr

    with Config(timestamp_column="ts_event"):
        out = sign_autocorr(trades, window=20)
    assert count_python_stages(out) == 0
    plan = _executed(out)
    assert "Join" not in plan
    # the carry-forward sign must ride a RUNNING frame, not the
    # quadratic unbounded-following shape
    for m in re.finditer(r"specifiedwindowframe\(rowframe, ([^,]*), unboundedfollowing", plan.lower()):
        assert "unboundedpreceding" in m.group(1)


def test_ledoit_wolf_no_cartesian_beyond_scalar_broadcast(spark, trades):
    from polars_trading_spark import time_bars
    from polars_trading_spark.operators.covariance import ledoit_wolf_cov

    with Config(timestamp_column="ts_event"):
        bars = time_bars(trades, bar_size="15m")
    out = ledoit_wolf_cov(bars, ts_col="ts_event")
    assert count_python_stages(out) == 0
    plan = _executed(out)
    assert "CartesianProduct" not in plan


def test_sessionize_single_user_shuffle(spark, sf_dir):
    from polars_trading_spark.functions.events import sessionize
    from polars_trading_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    out = sessionize(ev, gap="30m")
    assert count_python_stages(out) == 0
    assert "Join" not in _executed(out)
    assert count_exchanges(out) <= 1


class TestGlobalWindowsBounded:
    """Every global (empty-partition-spec) window must read from an
    aggregate- or limit-bounded subtree — a global window funnels all
    rows through ONE task, so it is only scale-safe over collapsed
    cardinality (one row per bucket / top-k).  These pin the three
    global windows in the codebase to bounded inputs, and sanity-check
    the detector on a deliberately unbounded plan."""

    def test_detector_flags_raw_global_window(self, spark, sf_dir):
        from pyspark.sql import Window
        from polars_trading_spark.plans import unbounded_global_windows
        from polars_trading_spark.sources.tables import trades_from_events

        t = trades_from_events(spark, sf_dir)
        bad = t.withColumn(
            "rn", F.row_number().over(Window.orderBy("ts_event"))
        )
        assert unbounded_global_windows(bad), "detector missed a raw global window"

    def test_rank_portfolio_global_lag_is_bucket_bounded(self, spark, sf_dir):
        from polars_trading_spark.operators.cross_section import rank_portfolio_backtest
        from polars_trading_spark.plans import unbounded_global_windows
        from polars_trading_spark.sources.tables import trades_from_events
        from polars_trading_spark.operators.bars import time_bars
        from polars_trading_spark.config import Config

        with Config(timestamp_column="ts_event"):
            bars = time_bars(trades_from_events(spark, sf_dir), bar_size="15m")
        out = rank_portfolio_backtest(
            bars, lookback=4, top_n=2, ts_col="ts_event", close_col="close"
        )
        assert unbounded_global_windows(out) == []

    def test_bpe_and_vocabulary_global_rank_is_topk_bounded(self, spark, sf_dir):
        from polars_trading_spark.functions.text import bpe_pair_counts
        from polars_trading_spark.functions.tfidf import vocabulary
        from polars_trading_spark.plans import unbounded_global_windows
        from polars_trading_spark.sources.tables import read_table

        docs = read_table(spark, sf_dir, "documents")
        assert unbounded_global_windows(bpe_pair_counts(docs, top_k=20)) == []
        assert unbounded_global_windows(vocabulary(docs, top_k=20)) == []
