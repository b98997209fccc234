"""Tape validation (operators/data_quality.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from polars_trading_spark.config import Config
from polars_trading_spark.operators.data_quality import tick_quality, universe_summary

SCHEMA = "symbol string, ts timestamp, price double, size long"


def test_tick_quality_flags_defects(spark):
    rows = [
        # clean day
        ("A", datetime(2024, 1, 1, 9, 0), 100.0, 10),
        ("A", datetime(2024, 1, 1, 9, 30), 101.0, 20),
        # dirty day: dup ts, bad price, bad size, jump, 2h gap
        ("A", datetime(2024, 1, 2, 9, 0), 100.0, 10),
        ("A", datetime(2024, 1, 2, 9, 0), 100.5, 10),   # dup ts
        ("A", datetime(2024, 1, 2, 9, 1), -5.0, 10),    # bad price
        ("A", datetime(2024, 1, 2, 9, 2), 100.0, 0),    # bad size
        ("A", datetime(2024, 1, 2, 11, 2), 150.0, 10),  # 2h gap + 50% jump
    ]
    with Config(timestamp_column="ts"):
        out = {str(r["day"]): r for r in tick_quality(spark.createDataFrame(rows, SCHEMA)).collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert d1["clean"] is True and d1["n_dup_ts"] == 0 and d1["n_jumps"] == 0
    assert d2["clean"] is False
    assert d2["n_dup_ts"] == 1
    assert d2["n_bad_price"] == 1
    assert d2["n_bad_size"] == 1
    assert d2["n_jumps"] >= 1
    assert d2["max_gap_s"] == pytest.approx(7200.0)


def test_tick_quality_gap_threshold(spark):
    rows = [
        ("A", datetime(2024, 1, 1, 9, 0), 100.0, 1),
        ("A", datetime(2024, 1, 1, 9, 40), 100.1, 1),  # 40m gap
    ]
    with Config(timestamp_column="ts"):
        strict = tick_quality(
            spark.createDataFrame(rows, SCHEMA), max_gap="30m"
        ).collect()[0]
        loose = tick_quality(
            spark.createDataFrame(rows, SCHEMA), max_gap="1h"
        ).collect()[0]
    assert strict["clean"] is False and loose["clean"] is True


def test_universe_summary_golden(spark):
    rows = [
        ("A", datetime(2024, 1, 1, 9), 100.0, 10),
        ("A", datetime(2024, 1, 1, 10), 102.0, 20),
        ("A", datetime(2024, 1, 3, 9), 104.0, 30),
        ("B", datetime(2024, 1, 2, 9), 50.0, 5),
    ]
    with Config(timestamp_column="ts"):
        out = {r["symbol"]: r for r in universe_summary(spark.createDataFrame(rows, SCHEMA)).collect()}
    a = out["A"]
    assert a["active_days"] == 2 and a["n_trades"] == 3
    assert a["first_ts"] == datetime(2024, 1, 1, 9)
    assert a["last_ts"] == datetime(2024, 1, 3, 9)
    assert a["avg_daily_volume"] == pytest.approx(60 / 2)
    assert a["avg_daily_dollar_volume"] == pytest.approx((1000 + 2040 + 3120) / 2)
    assert a["mean_price"] == pytest.approx((100 + 102 + 104) / 3)
    assert out["B"]["active_days"] == 1


def test_tick_quality_validation(spark):
    df = spark.createDataFrame([("A", datetime(2024, 1, 1), 1.0, 1)], SCHEMA)
    with Config(timestamp_column="ts"):
        with pytest.raises(ValueError, match="max_abs_ret"):
            tick_quality(df, max_abs_ret=0.0)
