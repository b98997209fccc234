"""Intraday profile (operators/seasonality.py)."""

from __future__ import annotations

from datetime import datetime

import math

import pytest

from polars_trading_spark.config import Config
from polars_trading_spark.operators.seasonality import intraday_profile


def _trades(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, size long"
    )


def test_profile_golden(spark):
    rows = [
        # day 1: two trades at 9:xx, one at 15:xx
        ("A", datetime(2024, 1, 1, 9, 0), 100.0, 10),
        ("A", datetime(2024, 1, 1, 9, 30), 110.0, 20),
        ("A", datetime(2024, 1, 1, 15, 0), 121.0, 30),
        # day 2: one trade at 9:xx — first of day, contributes no return
        ("A", datetime(2024, 1, 2, 9, 15), 200.0, 40),
    ]
    with Config(timestamp_column="ts"):
        out = {r["bucket"]: r for r in intraday_profile(_trades(spark, rows)).collect()}
    assert set(out) == {9, 15}
    b9, b15 = out[9], out[15]
    assert b9["n_trades"] == 3 and b15["n_trades"] == 1
    assert b9["volume"] == 70.0 and b15["volume"] == 30.0
    assert b9["volume_share"] == pytest.approx(0.7)
    assert b15["trade_share"] == pytest.approx(0.25)
    assert b9["dollar_volume"] == pytest.approx(100 * 10 + 110 * 20 + 200 * 40)
    # bucket 9 returns: log(110/100) on day 1 only (day-2 trade is first of day)
    assert b9["mean_abs_ret"] == pytest.approx(abs(math.log(1.1)))
    assert b15["mean_abs_ret"] == pytest.approx(abs(math.log(121 / 110)))


def test_overnight_gap_excluded(spark):
    rows = [
        ("A", datetime(2024, 1, 1, 23, 59), 100.0, 1),
        ("A", datetime(2024, 1, 2, 0, 1), 500.0, 1),  # huge overnight jump
    ]
    with Config(timestamp_column="ts"):
        out = {r["bucket"]: r for r in intraday_profile(_trades(spark, rows)).collect()}
    # both trades are each the first of their day: no returns anywhere
    assert out[0]["mean_abs_ret"] is None
    assert out[23]["mean_abs_ret"] is None


def test_bucket_minutes_validation(spark):
    df = _trades(spark, [("A", datetime(2024, 1, 1, 9, 0), 1.0, 1)])
    with pytest.raises(ValueError, match="bucket_minutes"):
        intraday_profile(df, bucket_minutes=7)


def test_fine_buckets(spark):
    rows = [
        ("A", datetime(2024, 1, 1, 9, 10), 100.0, 1),
        ("A", datetime(2024, 1, 1, 9, 20), 101.0, 1),
    ]
    with Config(timestamp_column="ts"):
        out = intraday_profile(_trades(spark, rows), bucket_minutes=15).collect()
    got = {r["bucket"] for r in out}
    # 9:10 -> bucket 36, 9:20 -> bucket 37 at 15-minute granularity
    assert got == {36, 37}
