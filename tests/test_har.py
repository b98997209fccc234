"""HAR-RV regression (operators/har.py) vs a numpy lstsq reference."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from polars_trading_spark.operators.har import har_rv

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _trades(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, seq long, price double"
    )


def _make_tape(seed, n=3000, symbol="A"):
    rng = np.random.RandomState(seed)
    # stochastic-vol walk so RV actually varies across buckets
    vol = 0.02 * np.exp(np.cumsum(rng.normal(0, 0.05, size=n)) * 0.1)
    prices = 100 * np.exp(np.cumsum(rng.normal(0, 1, size=n) * vol))
    ts = np.cumsum(rng.exponential(900, size=n))  # ~4 trades/hour
    return [
        (symbol, BASE + dt.timedelta(seconds=float(s)), i, float(p))
        for i, (s, p) in enumerate(zip(ts, prices))
    ]


def _ref_har(rows, bucket_s=6 * 3600, p_mid=4, p_long=28):
    rows = sorted(rows, key=lambda r: (r[1], r[2]))
    prices = [r[3] for r in rows]
    secs = [(r[1] - dt.datetime(1970, 1, 1)).total_seconds() for r in rows]
    rv: dict[int, float] = {}
    for i in range(1, len(prices)):
        b = math.floor(secs[i] / bucket_s)
        rv[b] = rv.get(b, 0.0) + math.log(prices[i] / prices[i - 1]) ** 2
    vals = [rv[b] for b in sorted(rv)]
    ys, xs = [], []
    for t in range(p_long, len(vals)):
        ys.append(vals[t])
        xs.append(
            [
                1.0,
                vals[t - 1],
                sum(vals[t - p_mid : t]) / p_mid,
                sum(vals[t - p_long : t]) / p_long,
            ]
        )
    X, Y = np.array(xs), np.array(ys)
    beta, *_ = np.linalg.lstsq(X, Y, rcond=None)
    resid = Y - X @ beta
    cyy = ((Y - Y.mean()) ** 2).sum()
    return {
        "n_buckets": len(vals),
        "n_obs": len(ys),
        "c": beta[0],
        "b_s": beta[1],
        "b_m": beta[2],
        "b_l": beta[3],
        "r2": 1 - (resid ** 2).sum() / cyy,
    }


def test_matches_numpy_lstsq(spark):
    rows = _make_tape(11)
    out = har_rv(_trades(spark, rows), seq_col="seq").collect()
    assert len(out) == 1
    got, ref = out[0], _ref_har(rows)
    assert got["n_buckets"] == ref["n_buckets"]
    assert got["n_obs"] == ref["n_obs"]
    for k in ("c", "b_s", "b_m", "b_l"):
        assert got[k] == pytest.approx(ref[k], rel=1e-6, abs=1e-10), k
    assert got["r2"] == pytest.approx(ref["r2"], rel=1e-6)


def test_symbols_fit_independently(spark):
    rows = _make_tape(1, symbol="A") + _make_tape(2, symbol="B")
    out = {r["symbol"]: r for r in har_rv(_trades(spark, rows), seq_col="seq").collect()}
    ref_a = _ref_har([r for r in rows if r[0] == "A"])
    ref_b = _ref_har([r for r in rows if r[0] == "B"])
    assert out["A"]["b_s"] == pytest.approx(ref_a["b_s"], rel=1e-6, abs=1e-10)
    assert out["B"]["b_s"] == pytest.approx(ref_b["b_s"], rel=1e-6, abs=1e-10)
    assert out["A"]["b_s"] != out["B"]["b_s"]


def test_short_history_emits_nulls_with_counts(spark):
    rows = _make_tape(3)[:200]  # few buckets, below min_obs
    out = har_rv(_trades(spark, rows), seq_col="seq", min_obs=12).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_buckets"] > 0
    assert r["c"] is None and r["b_s"] is None and r["r2"] is None


def test_validation_and_plan(spark):
    from polars_trading_spark.plans import (
        count_python_stages,
        has_unbounded_following_frame,
        unbounded_global_windows,
    )

    rows = _make_tape(4)[:50]
    with pytest.raises(ValueError):
        har_rv(_trades(spark, rows), p_mid=5, p_long=5)
    with pytest.raises(ValueError):
        har_rv(_trades(spark, rows), min_obs=3)
    out = har_rv(_trades(spark, rows), seq_col="seq")
    assert count_python_stages(out) == 0
    assert unbounded_global_windows(out) == []
    assert not has_unbounded_following_frame(out)
