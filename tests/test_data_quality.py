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


def test_hampel_filter_catches_planted_spike(spark):
    import datetime as dt

    from polars_trading_spark.operators.data_quality import hampel_filter

    base = dt.datetime(2024, 1, 2, 9, 30)
    # smooth tape with one fat-finger print at seq 10
    prices = [100.0 + 0.01 * i for i in range(21)]
    prices[10] = 150.0
    rows = [
        ("A", base + dt.timedelta(seconds=i), i, p) for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, __pts_seq long, price double"
    )
    from polars_trading_spark.config import Config

    with Config(timestamp_column="ts_event"):
        out = {
            r["__pts_seq"]: r
            for r in hampel_filter(df, window=21, k=3.0).collect()
        }
    # only the center row has a full +/-10 window on this 21-row tape
    assert out[10]["is_outlier"] is True
    assert out[10]["price_clean"] == pytest.approx(out[10]["rolling_median"])
    # the spike replaced 100.10, so the window median is the 11th of the
    # remaining sorted values: 100.11
    assert out[10]["rolling_median"] == pytest.approx(100.11)
    for i in (0, 5, 15, 20):
        assert out[i]["is_outlier"] is False
        assert out[i]["rolling_median"] is None  # partial window gated
        assert out[i]["price_clean"] == pytest.approx(prices[i])


def test_hampel_filter_matches_pandas_reference(spark):
    import datetime as dt

    import numpy as np
    import pandas as pd

    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.data_quality import hampel_filter

    rng = np.random.RandomState(17)
    base = dt.datetime(2024, 1, 2, 9, 30)
    rows = []
    for sym in ("A", "B"):
        p = 100.0 + np.cumsum(rng.normal(0, 0.5, size=120))
        spikes = rng.choice(120, size=5, replace=False)
        p[spikes] += rng.choice([-1, 1], size=5) * 25.0
        for i, x in enumerate(p):
            rows.append((sym, base + dt.timedelta(seconds=i), i, float(x)))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "__pts_seq", "price"])
    df = spark.createDataFrame(pdf)
    w, k = 11, 3.0
    with Config(timestamp_column="ts_event"):
        out = hampel_filter(df, window=w, k=k).toPandas()
    for sym, g in pdf.groupby("symbol"):
        cnt = g["price"].rolling(w, center=True, min_periods=1).count()
        med = g["price"].rolling(w, center=True, min_periods=1).median()
        dev = (g["price"] - med).abs()
        # canonical Hampel MAD: median of each window member's deviation
        # from the CENTER window's median
        mad = (
            g["price"]
            .rolling(w, center=True, min_periods=1)
            .apply(lambda s: np.median(np.abs(s - np.median(s))), raw=True)
        )
        full = (cnt == w).to_numpy()
        flag = ((dev.round(9) > (1.4826 * k * mad).round(9)).to_numpy()) & full
        got = (
            out[out["symbol"] == sym]
            .sort_values("__pts_seq")
            .reset_index(drop=True)
        )
        np.testing.assert_allclose(
            got["rolling_median"][full], med[full], rtol=1e-12
        )
        np.testing.assert_allclose(got["rolling_mad"][full], mad[full], rtol=1e-12)
        assert got["is_outlier"].tolist() == flag.tolist()
        assert (got["is_outlier"].sum()) >= 4  # the planted spikes fire


def test_hampel_filter_validation_and_plan(spark):
    import datetime as dt

    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.data_quality import hampel_filter
    from polars_trading_spark.plans import (
        count_exchanges,
        count_python_stages,
        has_unbounded_following_frame,
        unbounded_global_windows,
    )

    df = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 2), 0, 1.0)],
        "symbol string, ts_event timestamp, __pts_seq long, price double",
    )
    with Config(timestamp_column="ts_event"):
        with pytest.raises(ValueError):
            hampel_filter(df, window=4)  # even
        with pytest.raises(ValueError):
            hampel_filter(df, window=1)
        with pytest.raises(ValueError):
            hampel_filter(df, k=0)
        out = hampel_filter(df)
    assert count_python_stages(out) == 0
    assert unbounded_global_windows(out) == []
    # bounded centered frames are sliding buffers, not the quadratic
    # unbounded-following shape
    assert not has_unbounded_following_frame(out)
    assert count_exchanges(out) <= 1
