"""Plan contracts for the round-9 additions (walk-forward splits,
cost-aware band backtest, contamination report, color JPEG decode,
batched BPE trainer, auto-sampled recall harnesses) — pinning the
shapes that decide 100x scale survival: broadcast hulls/probes stay
broadcast, lookup joins never sort the corpus side, Python stages only
where the work IS Python (codecs), no quadratic frames."""

from __future__ import annotations

import pytest

from polars_trading_spark.plans import (
    count_exchanges,
    count_python_stages,
    has_unbounded_following_frame,
    plan_string,
)
from polars_trading_spark.sources.tables import read_table, trades_from_events


@pytest.fixture
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


@pytest.fixture
def bars(spark, sf_dir):
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.bars import time_bars

    with Config(timestamp_column="ts_event"):
        return time_bars(trades_from_events(spark, sf_dir), bar_size="15m")


@pytest.fixture
def events(spark, sf_dir):
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.dynamic_labels import (
        get_vertical_barrier_by_timedelta,
    )

    with Config(timestamp_column="ts_event"):
        return get_vertical_barrier_by_timedelta(
            trades_from_events(spark, sf_dir), "4h"
        )


def test_walk_forward_broadcast_hulls_one_corpus_shuffle(spark, events):
    from polars_trading_spark.operators.cv import walk_forward

    out = walk_forward(events, n_splits=4, embargo="30m")
    assert count_python_stages(out) == 0
    assert not has_unbounded_following_frame(out)
    plan = plan_string(out)
    # the (symbols x splits)-sized block-start table joins back broadcast
    assert "BroadcastHashJoin" in plan
    # same posture as purged_kfold: the ntile window's hash partition is
    # the only corpus-sized exchange family (block starts add tiny ones)
    assert count_exchanges(out) <= 4


def test_spread_band_net_no_corpus_sort_joins(spark, bars):
    from polars_trading_spark.operators.mean_reversion import (
        spread_band_backtest_net,
    )

    out = spread_band_backtest_net(bars, ts_col="ts_event")
    assert count_python_stages(out) == 0
    assert not has_unbounded_following_frame(out)
    plan = plan_string(out)
    # the CS cost lookups must hash-join onto the pair frame — a
    # SortMergeJoin would sort the (pairs x bars)-sized probe twice
    assert "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_contamination_report_broadcast_probe_single_pass(spark, docs):
    from polars_trading_spark.functions.corpus import contamination_report
    from pyspark.sql import functions as F

    bench = docs.where(F.col("doc_id") % 20 == 0).withColumn(
        "benchmark", F.lit("b")
    )
    out = contamination_report(docs, bench)
    assert count_python_stages(out) == 0
    plan = plan_string(out)
    # benchmark gram set and the leak rollup join back broadcast; the
    # corpus side never sort-merge-joins
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # ONE corpus tokenizer pass: the doc-level aggregate + source rollup
    # are the only corpus-sized exchanges
    assert plan.count("Generate explode") <= 3


def test_jpeg_color_decode_is_python_islands_no_shuffle(spark, docs):
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_color,
    )

    out = png_pixel_stats(synthesize_jpeg_color(docs))
    # synthesis + decode are the two Arrow islands; per-file pixel work
    # is embarrassingly parallel — the ONE exchange is _media_base's
    # slim id repartition (round 12), payloads never shuffle
    assert count_python_stages(out) == 2
    assert count_exchanges(out) == 1


def test_recall_auto_sample_filter_reaches_both_arms(spark, docs):
    from polars_trading_spark.functions.dedup import dedup_recall_stats
    from polars_trading_spark._utils import release_persisted

    try:
        out = dedup_recall_stats(
            docs, num_hashes=8, bands=4, sample_fraction="auto", target_docs=100
        )
        plan = plan_string(out)
        # the salted-hash sample predicate must sit in the scan filters
        # (both pair-generation arms read the SAMPLED corpus, not a
        # post-hoc filter over full-corpus pairs)
        assert plan.count("pts-recall") >= 2
    finally:
        release_persisted()
