"""Execution layer (operators/execution.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest

from polars_trading_spark.config import Config
from polars_trading_spark.operators.execution import (
    almgren_chriss_schedule,
    vwap_slippage,
)


def _vols(spark, rows):
    return spark.createDataFrame(rows, "symbol string, sigma double")


def test_ac_matches_numpy_formula(spark):
    lam, eta, X, N = 2e-6, 1e-6, 5000.0, 8
    out = almgren_chriss_schedule(
        _vols(spark, [("A", 0.8)]),
        n_buckets=N,
        total_shares=X,
        risk_aversion=lam,
        eta=eta,
    ).collect()
    assert len(out) == N
    kt2 = lam * 0.8 * 0.8 / eta
    kappa = np.arccosh(kt2 / 2 + 1)
    for r in out:
        j = r["bucket"]
        assert r["kappa"] == pytest.approx(kappa, rel=1e-12)
        assert r["x_remaining"] == pytest.approx(
            X * np.sinh(kappa * (N - j)) / np.sinh(kappa * N), rel=1e-9
        )
    assert sum(r["shares"] for r in out) == pytest.approx(X, rel=1e-9)


def test_ac_risk_neutral_is_twap(spark):
    out = almgren_chriss_schedule(
        _vols(spark, [("A", 0.5)]), n_buckets=5, total_shares=100.0, risk_aversion=0.0
    ).collect()
    for r in out:
        assert r["kappa"] == 0.0
        assert r["shares"] == pytest.approx(20.0, rel=1e-12)


def test_ac_higher_vol_front_loads(spark):
    out = almgren_chriss_schedule(
        _vols(spark, [("LO", 0.1), ("HI", 2.0)]),
        n_buckets=10,
        total_shares=1.0,
        risk_aversion=1e-4,
        eta=1e-6,
    ).collect()
    first = {(r["symbol"], r["bucket"]): r["shares"] for r in out}
    assert first[("HI", 0)] > first[("LO", 0)]


def test_ac_validation(spark):
    v = _vols(spark, [("A", 1.0)])
    with pytest.raises(ValueError, match="n_buckets"):
        almgren_chriss_schedule(v, n_buckets=0)
    with pytest.raises(ValueError, match="eta"):
        almgren_chriss_schedule(v, n_buckets=2, eta=0.0)


def test_vwap_slippage_golden(spark):
    rows = [
        ("A", datetime(2024, 1, 1, 9, 1), 100.0, 10),
        ("A", datetime(2024, 1, 1, 9, 5), 102.0, 30),
        ("A", datetime(2024, 1, 1, 9, 40), 50.0, 10),  # different bucket
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, price double, size long")
    with Config(timestamp_column="ts"):
        out = vwap_slippage(df, bucket="15 minutes").collect()
    assert len(out) == 1
    r = out[0]
    vwap1 = (100 * 10 + 102 * 30) / 40  # 101.5
    s1 = (100 - vwap1) / vwap1 * 1e4
    s2 = (102 - vwap1) / vwap1 * 1e4
    # single-trade bucket: zero slippage by construction
    expected_vw = (s1 * 10 + s2 * 30 + 0.0 * 10) / 50
    assert r["n_trades"] == 3
    assert r["volume"] == 50
    assert r["vw_slippage_bps"] == pytest.approx(expected_vw, rel=1e-9)
    assert r["worst_bps"] == pytest.approx(s2, rel=1e-9)
    assert r["best_bps"] == pytest.approx(s1, rel=1e-9)


def test_session_vwap_hand_computed_and_day_reset(spark):
    from polars_trading_spark.operators.execution import session_vwap

    rows = [
        # day 1: two trades
        ("A", datetime(2024, 1, 2, 10, 0), 0, 10.0, 100),
        ("A", datetime(2024, 1, 2, 11, 0), 1, 20.0, 300),
        # day 2: sums must reset
        ("A", datetime(2024, 1, 3, 9, 0), 2, 50.0, 10),
        # other symbol independent
        ("B", datetime(2024, 1, 2, 10, 30), 3, 7.0, 7),
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, seq long, price double, size long"
    )
    out = {
        (r["symbol"], r["seq"]): r
        for r in session_vwap(
            df, symbol_col="symbol", ts_col="ts_event",
            price_col="price", size_col="size", seq_col="seq",
        ).collect()
    }
    assert out[("A", 0)]["session_vwap"] == pytest.approx(10.0)
    assert out[("A", 0)]["cum_volume"] == 100
    assert out[("A", 1)]["session_vwap"] == pytest.approx(
        (10.0 * 100 + 20.0 * 300) / 400
    )
    assert out[("A", 1)]["cum_volume"] == 400
    assert out[("A", 2)]["session_vwap"] == pytest.approx(50.0)  # reset
    assert out[("A", 2)]["cum_volume"] == 10
    assert out[("B", 3)]["session_vwap"] == pytest.approx(7.0)


def test_session_vwap_plan(spark):
    from polars_trading_spark.operators.execution import session_vwap
    from polars_trading_spark.plans import (
        count_python_stages,
        has_unbounded_following_frame,
        unbounded_global_windows,
    )

    df = spark.createDataFrame(
        [("A", datetime(2024, 1, 2, 10, 0), 0, 10.0, 100)],
        "symbol string, ts_event timestamp, seq long, price double, size long",
    )
    out = session_vwap(
        df, symbol_col="symbol", ts_col="ts_event",
        price_col="price", size_col="size", seq_col="seq",
    )
    assert count_python_stages(out) == 0
    assert unbounded_global_windows(out) == []
    assert not has_unbounded_following_frame(out)


def test_implementation_shortfall_golden(spark):
    from polars_trading_spark.operators.execution import (
        execution_tearsheet,
        implementation_shortfall,
    )

    # 5 trades, trades_per_parent=3 -> parent 0 (buy, 3 fills),
    # parent 1 (sell, 2 fills)
    rows = [
        ("A", datetime(2024, 1, 1, 9, 0), 100.0, 10),
        ("A", datetime(2024, 1, 1, 9, 1), 101.0, 20),
        ("A", datetime(2024, 1, 1, 9, 2), 102.0, 10),
        ("A", datetime(2024, 1, 1, 9, 3), 103.0, 5),
        ("A", datetime(2024, 1, 1, 9, 4), 101.0, 15),
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, size long"
    )
    with Config(timestamp_column="ts"):
        par = {
            r["parent_id"]: r
            for r in implementation_shortfall(df, trades_per_parent=3).collect()
        }
        ts = execution_tearsheet(df, trades_per_parent=3).collect()
    p0, p1 = par[0], par[1]
    vw0 = (100 * 10 + 101 * 20 + 102 * 10) / 40
    vw1 = (103 * 5 + 101 * 15) / 20
    assert (p0["side"], p0["n_fills"], p0["qty"]) == (1, 3, 40)
    assert p0["arrival_price"] == 100.0
    assert p0["fill_vwap"] == pytest.approx(vw0, rel=1e-12)
    assert p0["shortfall_bps"] == pytest.approx(
        1e4 * (vw0 - 100) / 100, rel=1e-9
    )
    assert p0["market_move_bps"] == pytest.approx(
        1e4 * (102 - 100) / 100, rel=1e-9
    )
    # sell parent: positive shortfall means selling BELOW arrival
    assert (p1["side"], p1["n_fills"], p1["qty"]) == (-1, 2, 20)
    assert p1["arrival_price"] == 103.0
    assert p1["shortfall_bps"] == pytest.approx(
        -1e4 * (vw1 - 103) / 103, rel=1e-9
    )
    # tearsheet aggregates the two parents
    assert len(ts) == 1
    r = ts[0]
    sb0 = 1e4 * (vw0 - 100) / 100
    sb1 = -1e4 * (vw1 - 103) / 103
    assert r["n_orders"] == 2 and r["total_qty"] == 60
    assert r["vw_shortfall_bps"] == pytest.approx(
        (sb0 * 40 + sb1 * 20) / 60, rel=1e-9
    )
    assert r["avg_shortfall_bps"] == pytest.approx((sb0 + sb1) / 2, rel=1e-9)
    assert r["worst_bps"] == pytest.approx(max(sb0, sb1), rel=1e-9)
    assert r["best_bps"] == pytest.approx(min(sb0, sb1), rel=1e-9)
    assert r["hit_rate"] == pytest.approx(
        sum(1 for s in (sb0, sb1) if s <= 0) / 2
    )


def test_implementation_shortfall_validation(spark):
    from polars_trading_spark.operators.execution import implementation_shortfall

    df = spark.createDataFrame(
        [("A", datetime(2024, 1, 1), 1.0, 1)],
        "symbol string, ts timestamp, price double, size long",
    )
    with pytest.raises(ValueError):
        implementation_shortfall(df, trades_per_parent=0)


def test_market_impact_fit_numpy_reference(spark):
    from polars_trading_spark.operators.execution import (
        implementation_shortfall,
        market_impact_fit,
    )

    # two symbols x 120 trades (12 parents of 10); deterministic
    # pseudo-random walk so several parents land on each side of zero
    rows = []
    for si, sym in enumerate(("A", "B")):
        px = 100.0 + 7 * si
        for i in range(120):
            px += (((i * 1103515245 + 12345 + si * 997) % 19) - 9) * 0.03
            rows.append(
                (
                    sym,
                    datetime(2024, 1, 1, 9, 0) + timedelta(seconds=i),
                    round(px, 2),
                    1 + (i * 7 + si) % 13,
                )
            )
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, size long"
    )
    with Config(timestamp_column="ts"):
        parents = implementation_shortfall(df, trades_per_parent=10).collect()
        out = {
            r["symbol"]: r
            for r in market_impact_fit(df, trades_per_parent=10).collect()
        }
    for sym in ("A", "B"):
        par = sorted(
            (r for r in parents if r["symbol"] == sym),
            key=lambda r: r["parent_id"],
        )
        tq = sum(r["qty"] for r in par)
        pts = [
            (np.log(r["qty"] / tq), np.log(r["shortfall_bps"]))
            for r in par
            if r["shortfall_bps"] > 0 and r["qty"] > 0
        ]
        r = out[sym]
        assert r["n_orders"] == len(par)
        assert r["n_used"] == len(pts)
        if len(pts) < 3:
            assert r["impact_exponent"] is None
            continue
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        beta, alpha = np.polyfit(x, y, 1)
        assert r["impact_exponent"] == pytest.approx(beta, rel=1e-9)
        assert r["ln_impact_coef"] == pytest.approx(alpha, rel=1e-9)
        assert r["impact_at_1pct_bps"] == pytest.approx(
            np.exp(alpha + beta * np.log(0.01)), rel=1e-9
        )
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        assert r["impact_r2"] == pytest.approx(r2, rel=1e-9)


def test_market_impact_fit_degenerate_guard(spark):
    from polars_trading_spark.operators.execution import market_impact_fit

    # monotone-down buys: every even parent beats arrival (sb <= 0),
    # every odd sell parent also profits -> zero usable points
    rows = [
        ("A", datetime(2024, 1, 1, 9, 0) + timedelta(seconds=i), 100.0 - i, 10)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, size long"
    )
    with Config(timestamp_column="ts"):
        out = market_impact_fit(df, trades_per_parent=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_orders"] == 2
    # buy parent falls, sell parent rises in profit terms -> n_used <= 1
    assert r["n_used"] < 3
    for c in (
        "impact_exponent",
        "ln_impact_coef",
        "impact_at_1pct_bps",
        "impact_r2",
    ):
        assert r[c] is None
