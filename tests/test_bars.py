"""Bar operators: golden fixtures + differential tests vs DuckDB oracles."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from polars_trading_spark import Config, dollar_bars, time_bars, volume_bars
from polars_trading_spark.registry import QUERIES
from tests._compare import assert_query_matches_oracle


@pytest.fixture
def single_trade(spark):
    return spark.createDataFrame(
        [("A", 3.0, 8, dt.datetime(2021, 1, 1))],
        "symbol string, price double, size long, ts_event timestamp",
    )


def test_volume_bars_overflow_trade_golden(spark, single_trade):
    # Reference golden: tests/test_bars.py:78-113 — one size-8 trade at
    # bar_size 5 splits into two bars with volumes {5, 3}.
    with Config(timestamp_column="ts_event"):
        out = volume_bars(single_trade, bar_size=5)
    rows = sorted(out.collect(), key=lambda r: r["volume"])
    assert len(rows) == 2
    assert [r["volume"] for r in rows] == [3, 5]
    for r in rows:
        assert r["open"] == r["high"] == r["low"] == r["close"] == r["vwap"] == 3.0
        assert r["n_trades"] == 1
        assert r["ts_event_start"] == r["ts_event_end"] == dt.datetime(2021, 1, 1)


def test_dollar_bars_overflow_trade_golden(spark, single_trade):
    # Reference golden: tests/test_bars.py:115-154 — one 8-share trade at
    # price 3 with bar_size 13 → bars of 5 and 3 shares (share-level
    # overflow closes the first bar at cum 15 >= 13).
    with Config(timestamp_column="ts_event"):
        out = dollar_bars(single_trade, bar_size=13.0)
    rows = sorted(out.collect(), key=lambda r: r["volume"])
    assert [r["volume"] for r in rows] == [3, 5]
    for r in rows:
        assert r["open"] == r["close"] == r["vwap"] == 3.0
        assert r["n_trades"] == 1


def test_time_bars_buckets_and_schema(spark):
    df = spark.createDataFrame(
        [
            ("A", 1.0, 10, dt.datetime(2021, 1, 1, 9, 30, 15)),
            ("A", 2.0, 20, dt.datetime(2021, 1, 1, 9, 30, 45)),
            ("A", 3.0, 30, dt.datetime(2021, 1, 1, 9, 31, 5)),
            ("B", 9.0, 5, dt.datetime(2021, 1, 1, 9, 30, 59)),
        ],
        "symbol string, price double, size long, ts_event timestamp",
    )
    with Config(timestamp_column="ts_event"):
        out = time_bars(df, bar_size="1m").collect()
    by_key = {(r["symbol"], r["ts_event"]): r for r in out}
    a1 = by_key[("A", dt.datetime(2021, 1, 1, 9, 30))]
    assert (a1["open"], a1["close"], a1["high"], a1["low"]) == (1.0, 2.0, 2.0, 1.0)
    assert a1["volume"] == 30
    assert a1["n_trades"] == 2
    assert a1["vwap"] == pytest.approx((10 * 1.0 + 20 * 2.0) / 30)
    a2 = by_key[("A", dt.datetime(2021, 1, 1, 9, 31))]
    assert a2["n_trades"] == 1
    assert ("B", dt.datetime(2021, 1, 1, 9, 30)) in by_key


@pytest.mark.parametrize("name", ["time_bars", "tick_bars", "volume_bars"])
def test_bars_match_duckdb_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, QUERIES[name], sf_dir)


def test_dollar_bars_runs_and_conserves_volume(spark, sf_dir):
    # No SQL oracle (sequential overflow state) — invariants instead:
    # total shares conserved, every bar >= bar_size dollars except the
    # last open bar per (symbol, date).
    q = QUERIES["dollar_bars"]
    out = q.spark(spark, sf_dir).collect()
    assert len(out) > 0
    from polars_trading_spark.sources.tables import trades_from_events

    total_shares = trades_from_events(spark, sf_dir).agg(F.sum("size")).collect()[0][0]
    assert sum(r["volume"] for r in out) == total_shares
