"""BNS jump test (operators/volatility.py) and sign autocorrelation
(operators/microstructure.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import math

import numpy as np
import pytest

from polars_trading_spark.config import Config
from polars_trading_spark.operators.microstructure import sign_autocorr
from polars_trading_spark.operators.volatility import jump_test


def _bars(spark, closes):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("A", t0 + timedelta(minutes=15 * i), float(c)) for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(rows, "symbol string, ts timestamp, close double")


def test_jump_test_matches_numpy(spark):
    rng = np.random.default_rng(8)
    closes = 100 * np.exp(np.cumsum(0.002 * rng.standard_normal(200)))
    W = 50
    out = (
        jump_test(_bars(spark, closes), window=W, ts_col="ts")
        .orderBy("ts")
        .collect()
    )
    r = np.diff(np.log(closes))
    a = np.abs(r)
    mu43 = 2 ** (2 / 3) * math.gamma(7 / 6) / math.gamma(0.5)
    i = 150  # bar index (row i uses returns up to i)
    # row i's window covers rows i-W+1..i -> returns r[i-W..i-1]
    r2 = r[i - W : i] ** 2
    rv = r2.sum()
    bp = a[i - W : i] * np.concatenate([[np.nan], a[:-1]])[i - W : i]
    bv = np.nansum(bp) * math.pi / 2
    row = out[i]
    assert row["rv"] == pytest.approx(rv, rel=1e-9)
    assert row["bv"] == pytest.approx(bv, rel=1e-9)
    assert row["rj"] == pytest.approx((rv - bv) / rv, rel=1e-9)


def test_jump_detected(spark):
    rng = np.random.default_rng(12)
    r = 0.001 * rng.standard_normal(300)
    r[200] = 0.08  # an 8% jump in a 10bp-vol series
    closes = 100 * np.exp(np.cumsum(r))
    out = (
        jump_test(_bars(spark, closes), window=50, ts_col="ts")
        .orderBy("ts")
        .collect()
    )
    z_at_jump = out[205]["z"]
    z_before = out[195]["z"]
    assert z_at_jump is not None and z_at_jump > 3.0
    assert abs(z_before) < z_at_jump


def test_jump_validation(spark):
    with pytest.raises(ValueError, match="window"):
        jump_test(_bars(spark, [1.0, 2.0]), window=2, ts_col="ts")


def test_native_tick_signs_match_numpy_kernel(spark):
    """The native carry-forward sign must equal the numpy _tick_signs
    kernel the bar islands use."""
    from polars_trading_spark.operators.imbalance import _tick_signs

    rng = np.random.default_rng(5)
    prices = 100 + np.cumsum(rng.choice([-0.5, 0.0, 0.0, 0.5], size=500))
    t0 = datetime(2024, 1, 1)
    rows = [
        ("A", t0 + timedelta(seconds=i), float(p), 1) for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, price double, size long")
    with Config(timestamp_column="ts"):
        out = sign_autocorr(df, window=50).orderBy("ts").collect()
    got = np.array([r["sign"] for r in out])
    np.testing.assert_array_equal(got, _tick_signs(prices.astype(np.float64)))


def test_sign_autocorr_persistent_flow(spark):
    # long runs of same-direction trades -> strongly positive autocorr
    prices = [100.0]
    for block in range(20):
        step = 0.5 if block % 2 == 0 else -0.5
        for _ in range(25):
            prices.append(prices[-1] + step)
    t0 = datetime(2024, 1, 1)
    rows = [("A", t0 + timedelta(seconds=i), float(p), 1) for i, p in enumerate(prices)]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, price double, size long")
    with Config(timestamp_column="ts"):
        out = sign_autocorr(df, window=100).orderBy("ts").collect()
    tail = [r["autocorr"] for r in out[-50:] if r["autocorr"] is not None]
    assert tail and min(tail) > 0.7


def test_sign_autocorr_validation(spark):
    df = spark.createDataFrame(
        [("A", datetime(2024, 1, 1), 1.0, 1)],
        "symbol string, ts timestamp, price double, size long",
    )
    with Config(timestamp_column="ts"):
        with pytest.raises(ValueError, match="window"):
            sign_autocorr(df, window=2)
        with pytest.raises(ValueError, match="lag"):
            sign_autocorr(df, lag=0)
