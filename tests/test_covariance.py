"""Ledoit-Wolf shrunk covariance (operators/covariance.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest

from polars_trading_spark.operators.covariance import ledoit_wolf_cov


def _frame(spark, prices):
    """prices: dict symbol -> np.array over a shared timestamp grid."""
    t0 = datetime(2024, 1, 1)
    rows = []
    for sym, arr in prices.items():
        for i, p in enumerate(arr):
            rows.append((sym, t0 + timedelta(minutes=15 * i), float(p)))
    return spark.createDataFrame(rows, "symbol string, ts timestamp, close double")


def _lw_numpy(X):
    """sklearn LedoitWolf formulas on an (n, p) demeaned matrix."""
    n, p = X.shape
    S = X.T @ X / n
    m = np.trace(S) / p
    d2 = ((S - m * np.eye(p)) ** 2).sum() / p
    b2raw = sum(((np.outer(x, x) - S) ** 2).sum() for x in X) / (n * n) / p
    b2 = min(max(b2raw, 0.0), d2)
    shrink = b2 / d2 if d2 > 0 else None
    Sh = shrink * m * np.eye(p) + (1 - shrink) * S if shrink is not None else S
    return S, Sh, shrink, m


def test_lw_matches_numpy(spark):
    rng = np.random.default_rng(5)
    n, p = 120, 4
    rets = 0.01 * rng.standard_normal((n, p)) @ np.array(
        [[1, 0.5, 0, 0], [0, 1, 0.3, 0], [0, 0, 1, 0.2], [0, 0, 0, 1.0]]
    )
    syms = ["AA", "BB", "CC", "DD"]
    prices = {s: np.exp(np.concatenate([[0.0], np.cumsum(rets[:, j])])) for j, s in enumerate(syms)}
    df = _frame(spark, prices)
    out = {
        (r["sym_a"], r["sym_b"]): r
        for r in ledoit_wolf_cov(df, ts_col="ts", close_col="close").collect()
    }
    assert len(out) == p * (p + 1) // 2

    X = rets - rets.mean(axis=0)
    S, Sh, shrink, m = _lw_numpy(X)
    any_row = next(iter(out.values()))
    assert any_row["shrinkage"] == pytest.approx(shrink, rel=1e-9)
    assert any_row["mu"] == pytest.approx(m, rel=1e-9)
    for i, si in enumerate(syms):
        for j in range(i, p):
            r = out[(si, syms[j])]
            assert r["n_obs"] == n
            assert r["cov_sample"] == pytest.approx(S[i, j], rel=1e-9, abs=1e-15)
            assert r["cov_shrunk"] == pytest.approx(Sh[i, j], rel=1e-9, abs=1e-15)


def test_lw_misaligned_rows_dropped(spark):
    # Symbol B misses one timestamp: that bucket must drop for everyone.
    t0 = datetime(2024, 1, 1)
    rows = []
    pa = [100.0, 101.0, 103.0, 102.0, 104.0]
    pb = [50.0, 50.5, 51.0, None, 51.5]
    for i in range(5):
        rows.append(("A", t0 + timedelta(minutes=15 * i), pa[i]))
        if pb[i] is not None:
            rows.append(("B", t0 + timedelta(minutes=15 * i), pb[i]))
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    out = {
        (r["sym_a"], r["sym_b"]): r
        for r in ledoit_wolf_cov(df, ts_col="ts", close_col="close").collect()
    }
    # B's return exists at bars 1,2 and 4->null path: aligned return
    # timestamps are those where BOTH have returns = bars 1,2 (bar 3 has
    # no B return because B missed ts3; bar 4's B return spans the gap).
    assert out[("A", "A")]["n_obs"] == out[("A", "B")]["n_obs"] == out[("B", "B")]["n_obs"]
    assert out[("A", "A")]["n_obs"] == 3  # ts1, ts2, ts4 (B return spans ts2->ts4)


def test_lw_single_symbol_degenerate(spark):
    prices = {"A": np.array([100.0, 101.0, 100.5, 102.0, 103.0])}
    df = _frame(spark, prices)
    rows = ledoit_wolf_cov(df, ts_col="ts", close_col="close").collect()
    assert len(rows) == 1
    r = rows[0]
    # p = 1: S == m, d2 == 0 -> shrinkage undefined, shrunk == sample
    assert r["shrinkage"] is None
    assert r["cov_shrunk"] == pytest.approx(r["cov_sample"])
