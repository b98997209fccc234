"""Plan contracts for the round-5 additions (winnowing pairs,
upsample+ffill, DSIR weights, funnel latency) — pinning the shapes
that decide 100x scale survival: df-pruned posting joins, staged
fingerprint frames, bounded exchange counts, zero Python stages."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL
from polars_trading_spark.plans import (
    count_exchanges,
    count_keyed_exchanges,
    count_python_stages,
    has_unbounded_following_frame,
    plan_string,
)
from polars_trading_spark.sources.tables import read_table, trades_from_events


@pytest.fixture
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_winnow_dup_pairs_df_pruned_and_staged(spark, docs):
    from polars_trading_spark.functions.winnow import winnow_duplicate_pairs

    out = winnow_duplicate_pairs(docs, max_df=50)
    assert count_python_stages(out) == 0
    plan = plan_string(out, "executed")
    # the fp self-join must probe the DF-PRUNED posting list: the
    # doc-frequency cap appears as a real filter in the executed plan
    # (an unpruned posting join lets one boilerplate fingerprint drive
    # a quadratic bucket)
    assert re.search(r"__df#\d+L? <= 50", plan)
    # the winnowing window pipeline runs once: its three consumers read
    # the persisted fingerprint frame, not three re-executions
    assert "InMemoryTableScan" in plan


def test_upsample_ffill_bounded_exchanges_no_quadratic_frame(spark, sf_dir):
    from polars_trading_spark.operators.resample import upsample_ffill

    t = trades_from_events(spark, sf_dir)
    u = t.groupBy("symbol", "ts_event").agg(
        F.max_by("price", F.col(SEQ_COL)).alias("price")
    )
    out = upsample_ffill(u, every="2h", by="symbol", ts_col="ts_event")
    assert count_python_stages(out) == 0
    # bounds aggregate + dedup aggregate + the as-of join's group
    # exchange; the grid explode and the fill window ride those
    assert count_exchanges(out) <= 3
    # forward fill must use the running-frame rewrite, never the
    # O(n^2)-evaluated [current row, unbounded following] frame
    assert not has_unbounded_following_frame(out)


def test_dsir_weights_zero_python_broadcast_ratio(spark, docs):
    from polars_trading_spark.functions.corpus import dsir_log_weights

    d = docs.withColumn("__t", F.col("doc_id") % 5 == 0)
    out = dsir_log_weights(d, is_target_col="__t")
    assert count_python_stages(out) == 0
    # the bucket log-ratio table joins the feature frame via broadcast
    # (n_buckets rows), not a shuffled join of the corpus-sized side
    plan = plan_string(out, "executed")
    assert "BroadcastHashJoin" in plan
    # the (doc, bucket) aggregate is STAGED: its two consumers read the
    # cache, not two re-executions of the bigram explode (SCALING §35)
    assert "InMemoryTableScan" in plan
    # the round-5 bound, on data-placement shuffles only: the payload-
    # scan parallelism guard adds one RoundRobin per scan branch in the
    # STATIC plan (deduplicated by exchange reuse at runtime)
    assert count_keyed_exchanges(out) <= 8


def test_funnel_latency_zero_python_bounded_exchanges(spark, sf_dir):
    from polars_trading_spark.functions.events import funnel_latency

    ev = read_table(spark, sf_dir, "events")
    out = funnel_latency(ev, ["click", "view", "purchase"], ts_col="ts")
    assert count_python_stages(out) == 0
    # per-user funnel aggregate, pair union, one rank window per pair,
    # conditional aggregate + tiny join — never a k-way self-join
    assert count_exchanges(out) <= 6
