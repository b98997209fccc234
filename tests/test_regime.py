"""Regime diagnostics (operators/regime.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest

from polars_trading_spark.operators.regime import hurst_exponent, variance_ratio


def _frame(spark, series):
    t0 = datetime(2024, 1, 1)
    rows = []
    for sym, arr in series.items():
        for i, p in enumerate(arr):
            rows.append((sym, t0 + timedelta(minutes=15 * i), float(p)))
    return spark.createDataFrame(rows, "symbol string, ts timestamp, close double")


def _paths(n=2000, seed=9):
    rng = np.random.default_rng(seed)
    rw = np.exp(np.cumsum(0.01 * rng.standard_normal(n)))
    # strongly mean-reverting OU log price
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = 0.2 * x[i - 1] + 0.01 * rng.standard_normal()
    mr = np.exp(x)
    # persistent: AR(1) returns with phi = 0.8
    r = np.zeros(n)
    for i in range(1, n):
        r[i] = 0.8 * r[i - 1] + 0.002 * rng.standard_normal()
    tr = np.exp(np.cumsum(r))
    return {"RW": rw, "MR": mr, "TR": tr}


def test_variance_ratio_classifies_regimes(spark):
    df = _frame(spark, _paths())
    out = {r["symbol"]: r for r in variance_ratio(df, q=4, ts_col="ts").collect()}
    assert 0.7 < out["RW"]["vr"] < 1.3
    assert out["MR"]["vr"] < 0.6
    assert out["TR"]["vr"] > 1.5
    assert out["MR"]["z"] < -2
    assert out["TR"]["z"] > 2


def test_variance_ratio_matches_numpy(spark):
    paths = _paths(n=500, seed=21)
    df = _frame(spark, {"RW": paths["RW"]})
    r = variance_ratio(df, q=4, ts_col="ts").collect()[0]
    x = np.log(paths["RW"])
    r1 = x[1:] - x[:-1]
    rq = x[4:] - x[:-4]
    v1 = r1.var()  # population variance, mean-corrected
    vq = rq.var()
    vr = vq / (4 * v1)
    z = (vr - 1) / np.sqrt(2 * (2 * 4 - 1) * (4 - 1) / (3 * 4) / len(r1))
    assert r["n_obs"] == len(r1)
    assert r["vr"] == pytest.approx(vr, rel=1e-9)
    assert r["z"] == pytest.approx(z, rel=1e-9)


def test_hurst_classifies_regimes(spark):
    df = _frame(spark, _paths())
    out = {r["symbol"]: r for r in hurst_exponent(df, ts_col="ts").collect()}
    assert 0.4 < out["RW"]["hurst"] < 0.6
    assert out["MR"]["hurst"] < 0.35
    assert out["TR"]["hurst"] > 0.65
    assert out["RW"]["r2"] > 0.95


def test_hurst_matches_numpy(spark):
    paths = _paths(n=800, seed=33)
    df = _frame(spark, {"RW": paths["RW"]})
    r = hurst_exponent(df, ts_col="ts").collect()[0]
    x = np.log(paths["RW"])
    scales = (1, 2, 4, 8, 16)
    lv, lq = [], []
    for q in scales:
        rq = x[q:] - x[:-q]
        lv.append(np.log(rq.var()))
        lq.append(np.log(q))
    slope, _ = np.polyfit(lq, lv, 1)
    assert r["hurst"] == pytest.approx(slope / 2, rel=1e-6)


def test_regime_validation_and_short_series(spark):
    df = _frame(spark, {"S": np.array([100.0, 101.0, 102.0])})
    with pytest.raises(ValueError, match="q must"):
        variance_ratio(df, q=1)
    with pytest.raises(ValueError, match="scales"):
        hurst_exponent(df, scales=(4,))
    out = hurst_exponent(df, ts_col="ts").collect()[0]
    assert out["hurst"] is None  # scale 16 unpopulated
    vr = variance_ratio(df, q=4, ts_col="ts").collect()[0]
    assert vr["vr"] is None


def test_return_acf_matches_numpy(spark):
    from polars_trading_spark.operators.regime import return_acf

    paths = _paths(n=600, seed=44)
    df = _frame(spark, {"TR": paths["TR"], "RW": paths["RW"]})
    out = {r["symbol"]: r for r in return_acf(df, lags=(1, 2, 5), ts_col="ts").collect()}

    for sym in ("TR", "RW"):
        x = np.log(paths[sym])
        r = x[1:] - x[:-1]
        n = len(r)
        mean = r.mean()
        den = ((r - mean) ** 2).sum()
        got = out[sym]
        q = 0.0
        for k in (1, 2, 5):
            num = ((r[k:] - mean) * (r[:-k] - mean)).sum()
            rho = num / den
            assert got[f"acf_{k}"] == pytest.approx(rho, rel=1e-9), (sym, k)
            q += rho * rho / (n - k)
        assert got["ljung_box_q"] == pytest.approx(n * (n + 2) * q, rel=1e-9)
    # persistent returns: strongly positive acf_1 and huge Q
    assert out["TR"]["acf_1"] > 0.5
    assert out["TR"]["ljung_box_q"] > out["RW"]["ljung_box_q"] * 10


def test_return_acf_validation_and_short(spark):
    from polars_trading_spark.operators.regime import return_acf

    df = _frame(spark, {"S": np.array([100.0, 101.0, 102.0])})
    with pytest.raises(ValueError, match="lags"):
        return_acf(df, lags=())
    out = return_acf(df, lags=(1, 10), ts_col="ts").collect()[0]
    assert out["acf_1"] is None and out["ljung_box_q"] is None
