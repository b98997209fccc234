"""Wilder RSI (operators/rsi.py) vs a naive quadratic reference."""

from __future__ import annotations

import datetime as dt

import pytest

from polars_trading_spark.operators.rsi import rsi

BASE = dt.datetime(2024, 1, 2, 9, 30, 0)


def _trades(spark, prices, symbol="A"):
    rows = [
        (symbol, BASE + dt.timedelta(seconds=i), i, float(p))
        for i, p in enumerate(prices)
    ]
    return spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, seq long, price double"
    )


def _ref_rsi(prices, period):
    d = 1.0 - 1.0 / period
    out = [None]
    for i in range(1, len(prices)):
        s_up = s_dn = 0.0
        for j in range(1, i + 1):
            diff = prices[j] - prices[j - 1]
            w = d ** (i - j)
            if diff > 0:
                s_up += w * diff
            elif diff < 0:
                s_dn += w * -diff
        out.append(
            100.0 * s_up / (s_up + s_dn) if (s_up + s_dn) > 0 else None
        )
    return out


@pytest.mark.parametrize("period", [2, 14])
def test_matches_naive_reference(spark, period):
    import numpy as np

    rng = np.random.RandomState(7)
    # long walk crossing chunk boundaries at period=2 (L=64)
    prices = list(100 + np.cumsum(rng.normal(0, 1, size=300)))
    out = sorted(
        rsi(_trades(spark, prices), period=period, seq_col="seq").collect(),
        key=lambda r: r["seq"],
    )
    ref = _ref_rsi(prices, period)
    for r, e in zip(out, ref):
        if e is None:
            assert r["rsi"] is None, r["seq"]
        else:
            assert r["rsi"] == pytest.approx(e, rel=1e-9, abs=1e-9), r["seq"]


def test_monotone_extremes_and_flat(spark):
    up = rsi(_trades(spark, [1, 2, 3, 4, 5]), period=3, seq_col="seq").collect()
    assert all(r["rsi"] == 100.0 for r in up if r["rsi"] is not None)
    dn = rsi(_trades(spark, [5, 4, 3, 2, 1]), period=3, seq_col="seq").collect()
    assert all(r["rsi"] == 0.0 for r in dn if r["rsi"] is not None)
    flat = rsi(_trades(spark, [3, 3, 3, 3]), period=3, seq_col="seq").collect()
    assert all(r["rsi"] is None for r in flat)


def test_symbols_independent(spark):
    a = _trades(spark, [1, 2, 3], "A")
    b = _trades(spark, [9, 8, 7], "B")
    out = {
        (r["symbol"], r["seq"]): r["rsi"]
        for r in rsi(a.union(b), period=2, seq_col="seq").collect()
    }
    assert out[("A", 2)] == 100.0 and out[("B", 2)] == 0.0
    assert out[("A", 0)] is None and out[("B", 0)] is None


def test_validation_and_plan(spark):
    from polars_trading_spark.plans import (
        count_python_stages,
        has_unbounded_following_frame,
        unbounded_global_windows,
    )

    with pytest.raises(ValueError):
        rsi(_trades(spark, [1, 2]), period=1)
    out = rsi(_trades(spark, [1, 2, 3]), period=14, seq_col="seq")
    assert count_python_stages(out) == 0
    assert unbounded_global_windows(out) == []
    assert not has_unbounded_following_frame(out)
