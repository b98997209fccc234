"""Roll-gap adjustment (operators/roll.py) and O-U/AR(1) fit
(operators/mean_reversion.py)."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_trading_spark.config import Config
from polars_trading_spark.operators.mean_reversion import ou_fit
from polars_trading_spark.operators.roll import roll_adjust


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


@pytest.fixture()
def spliced(spark):
    # Two segments with a +10 roll gap at 12:00: 100, 101 | 111, 112.
    rows = [
        ("A", _ts(9), 100.0, 0),
        ("A", _ts(10), 101.0, 1),
        ("A", _ts(13), 111.0, 2),
        ("A", _ts(14), 112.0, 3),
    ]
    return spark.createDataFrame(rows, "symbol string, ts timestamp, price double, __pts_seq long")


def _pts(spark, ts):
    return spark.createDataFrame([("A", ts)], "symbol string, roll_ts timestamp")


def test_roll_backward_latest_segment_true(spark, spliced):
    with Config(timestamp_column="ts"):
        out = roll_adjust(spliced, _pts(spark, _ts(12)), method="backward")
    got = {r["ts"]: r["adj_price"] for r in out.collect()}
    # gap = 111 - 101 = 10; earlier segment shifted up by 10, later true.
    assert got[_ts(9)] == pytest.approx(110.0)
    assert got[_ts(10)] == pytest.approx(111.0)
    assert got[_ts(13)] == pytest.approx(111.0)
    assert got[_ts(14)] == pytest.approx(112.0)


def test_roll_forward_first_segment_true(spark, spliced):
    with Config(timestamp_column="ts"):
        out = roll_adjust(spliced, _pts(spark, _ts(12)), method="forward")
    got = {r["ts"]: r["adj_price"] for r in out.collect()}
    assert got[_ts(9)] == pytest.approx(100.0)
    assert got[_ts(13)] == pytest.approx(101.0)


def test_roll_ratio_preserves_returns(spark, spliced):
    with Config(timestamp_column="ts"):
        out = roll_adjust(spliced, _pts(spark, _ts(12)), method="ratio")
    got = {r["ts"]: r["adj_price"] for r in out.collect()}
    # ratio = 111/101; earlier segment multiplied by it, later unchanged.
    assert got[_ts(9)] == pytest.approx(100.0 * 111.0 / 101.0)
    assert got[_ts(13)] == pytest.approx(111.0)
    # cross-boundary return becomes the within-series return 111->111.
    assert got[_ts(10)] == pytest.approx(111.0)


def test_roll_boundary_at_trade_ts_starts_new_segment(spark, spliced):
    # Boundary exactly at 13:00: the 13:00 trade is in the NEW segment,
    # so gap = 111 - 101 still.
    with Config(timestamp_column="ts"):
        out = roll_adjust(spliced, _pts(spark, _ts(13)), method="backward")
    got = {r["ts"]: r["adj_price"] for r in out.collect()}
    assert got[_ts(10)] == pytest.approx(111.0)
    assert got[_ts(13)] == pytest.approx(111.0)


def test_roll_edge_boundaries_zero_gap(spark, spliced):
    # Boundaries before all trades and after all trades adjust nothing.
    pts = spark.createDataFrame(
        [("A", _ts(8)), ("A", _ts(20))], "symbol string, roll_ts timestamp"
    )
    with Config(timestamp_column="ts"):
        out = roll_adjust(spliced, pts, method="backward")
    got = {r["ts"]: r["adj_price"] for r in out.collect()}
    assert got[_ts(9)] == pytest.approx(100.0)
    assert got[_ts(14)] == pytest.approx(112.0)


def test_roll_bad_method(spark, spliced):
    with pytest.raises(ValueError, match="method"):
        roll_adjust(spliced, _pts(spark, _ts(12)), method="nope")


def test_ou_fit_matches_numpy_ols(spark):
    rng = np.random.default_rng(7)
    x = [0.0]
    for _ in range(399):
        x.append(0.05 + 0.9 * x[-1] + 0.1 * rng.standard_normal())
    prices = np.exp(np.array(x))
    rows = [
        ("A", datetime(2024, 1, 1, 0, 0, 0).replace(minute=i % 60, hour=i // 60), float(p))
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    out = ou_fit(df, ts_col="ts", close_col="close").collect()[0]

    lx, ly = np.array(x[:-1]), np.array(x[1:])
    A = np.vstack([lx, np.ones_like(lx)]).T
    (phi, a), res, *_ = np.linalg.lstsq(A, ly, rcond=None)
    sigma = float(np.sqrt(res[0] / (len(ly) - 2)))
    assert out["n_obs"] == 399
    assert out["phi"] == pytest.approx(phi, rel=1e-9)
    assert out["mu"] == pytest.approx(a / (1 - phi), rel=1e-9)
    assert out["half_life"] == pytest.approx(-np.log(2) / np.log(phi), rel=1e-9)
    assert out["sigma"] == pytest.approx(sigma, rel=1e-9)
    assert out["sigma_eq"] == pytest.approx(sigma / np.sqrt(1 - phi**2), rel=1e-9)


def test_ou_fit_too_short_and_degenerate(spark):
    rows = [
        ("S", _ts(9), 100.0),
        ("S", _ts(10), 101.0),
        # constant series: degenerate regressor
        ("C", _ts(9), 50.0),
        ("C", _ts(10), 50.0),
        ("C", _ts(11), 50.0),
        ("C", _ts(12), 50.0),
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    got = {r["symbol"]: r for r in ou_fit(df, ts_col="ts", close_col="close").collect()}
    assert got["S"]["phi"] is None  # only 1 pair
    assert got["C"]["phi"] is None  # zero variance regressor


def test_ou_fit_non_reverting_null_half_life(spark):
    # Explosive AR(1): phi > 1 -> half_life and sigma_eq null, phi real.
    x = [1.0]
    for _ in range(49):
        x.append(x[-1] * 1.1)
    rows = [("A", _ts(i // 60, i % 60), float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    out = ou_fit(df, ts_col="ts", close_col="close", use_log=True).collect()[0]
    assert out["phi"] is not None and out["phi"] > 1.0 or out["phi"] == pytest.approx(1.0, abs=1e-6)
    assert out["half_life"] is None
    assert out["sigma_eq"] is None


def test_cointegration_matches_numpy(spark):
    from polars_trading_spark.operators.mean_reversion import cointegration_fit

    rng = np.random.default_rng(11)
    n = 300
    xb = np.cumsum(0.01 * rng.standard_normal(n)) + 5.0
    e = np.zeros(n)
    for i in range(1, n):
        e[i] = 0.7 * e[i - 1] + 0.02 * rng.standard_normal()
    xa = 1.5 + 0.8 * xb + e
    rows = []
    for i in range(n):
        ts = datetime(2024, 1, 1 + i // 288, (i % 288) // 12, (i % 12) * 5)
        rows.append(("AAA", ts, float(np.exp(xa[i]))))
        rows.append(("BBB", ts, float(np.exp(xb[i]))))
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    out = cointegration_fit(df, ts_col="ts", close_col="close").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["sym_a"], r["sym_b"]) == ("AAA", "BBB")
    assert r["n_obs"] == n

    # replicate with numpy OLS
    A = np.vstack([xb, np.ones(n)]).T
    (beta, alpha), *_ = np.linalg.lstsq(A, xa, rcond=None)
    assert r["beta"] == pytest.approx(beta, rel=1e-7)
    assert r["alpha"] == pytest.approx(alpha, rel=1e-7)
    resid = xa - alpha - beta * xb
    assert r["resid_std"] == pytest.approx(resid.std(ddof=1), rel=1e-7)
    lx, ly = resid[:-1], resid[1:]
    A2 = np.vstack([lx, np.ones(n - 1)]).T
    (phi, _), *_ = np.linalg.lstsq(A2, ly, rcond=None)
    assert r["phi"] == pytest.approx(phi, rel=1e-6)
    assert r["half_life"] == pytest.approx(-np.log(2) / np.log(phi), rel=1e-6)


def test_cointegration_degenerate_perfect_fit(spark):
    from polars_trading_spark.operators.mean_reversion import cointegration_fit

    rows = []
    for i, p in enumerate([100.0, 105.0, 98.0, 111.0, 103.0]):
        ts = _ts(9, i)
        rows.append(("A", ts, p * p))  # log(a) = 2 log(b): exact relation
        rows.append(("B", ts, p))
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    r = cointegration_fit(df, ts_col="ts", close_col="close").collect()[0]
    assert r["beta"] == pytest.approx(2.0, abs=1e-9)
    assert r["resid_std"] == pytest.approx(0.0, abs=1e-9)
    # zero-variance residual: AR(1) denominator degenerate -> nulls
    assert r["phi"] is None and r["half_life"] is None


def test_cointegration_too_few_obs(spark):
    from polars_trading_spark.operators.mean_reversion import cointegration_fit

    rows = [
        ("A", _ts(9), 100.0), ("B", _ts(9), 50.0),
        ("A", _ts(10), 101.0), ("B", _ts(10), 51.0),
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    r = cointegration_fit(df, ts_col="ts", close_col="close").collect()[0]
    assert r["beta"] is None and r["phi"] is None


def test_spread_signal_matches_pandas(spark):
    import pandas as pd
    from polars_trading_spark.operators.mean_reversion import spread_zscore_signal

    rng = np.random.default_rng(3)
    n = 120
    xb = np.cumsum(0.01 * rng.standard_normal(n)) + 4.0
    e = 0.05 * rng.standard_normal(n)
    xa = 0.5 + 1.2 * xb + e
    rows = []
    for i in range(n):
        ts = datetime(2024, 1, 1, i // 60, i % 60)
        rows.append(("A", ts, float(np.exp(xa[i]))))
        rows.append(("B", ts, float(np.exp(xb[i]))))
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    W, EZ = 20, 1.5
    out = (
        spread_zscore_signal(df, entry_z=EZ, window=W, ts_col="ts", close_col="close")
        .orderBy("ts")
        .collect()
    )
    assert len(out) == n

    # pandas replication with the same quantized coefficients
    A = np.vstack([xb, np.ones(n)]).T
    (beta, alpha), *_ = np.linalg.lstsq(A, xa, rcond=None)
    alpha, beta = round(alpha, 6), round(beta, 6)
    spread = pd.Series(xa - alpha - beta * xb)
    m = spread.rolling(W).mean()
    sd = spread.rolling(W).std(ddof=1)
    z = (spread - m) / sd
    pos = pd.Series(np.where(z >= EZ, -1.0, np.where(z <= -EZ, 1.0, 0.0)))
    pos[z.isna()] = np.nan
    pnl = pos.shift(1) * spread.diff()
    for i, r in enumerate(out):
        assert r["spread"] == pytest.approx(spread[i], abs=1e-9)
        if np.isnan(z[i]):
            assert r["z"] is None
        else:
            assert r["z"] == pytest.approx(z[i], abs=1e-9)
        if np.isnan(pnl[i]):
            assert r["pnl"] is None
        else:
            assert r["pnl"] == pytest.approx(pnl[i], abs=1e-12)


def test_spread_signal_validation(spark):
    from polars_trading_spark.operators.mean_reversion import spread_zscore_signal

    df = spark.createDataFrame(
        [("A", _ts(9), 1.0)], "symbol string, ts timestamp, close double"
    )
    with pytest.raises(ValueError, match="entry_z"):
        spread_zscore_signal(df, entry_z=0.0)
    with pytest.raises(ValueError, match="window"):
        spread_zscore_signal(df, window=1)


def test_spread_band_backtest_hysteresis_properties(spark):
    """Band-rule invariants, checked row-by-row on a tape engineered to
    cross both bands repeatedly: beyond entry -> position = -sign(z);
    inside exit -> flat; in the HOLD band -> position unchanged from
    the previous bar (the hysteresis memoryless pos cannot express);
    pnl = prev position x spread change; traded marks every flip."""
    import datetime as dt

    import numpy as np

    from polars_trading_spark.operators.mean_reversion import (
        spread_band_backtest,
    )

    base = dt.datetime(2024, 1, 2)
    rows = []
    rng = np.random.RandomState(7)
    # symbol B is a flat anchor; A oscillates slowly so the spread
    # z-score sweeps across +-entry and back through the exit band
    n = 400
    for i in range(n):
        ts = base + dt.timedelta(minutes=15 * i)
        osc = 0.06 * np.sin(i / 17.0) + 0.002 * rng.normal()
        rows.append(("A", ts, float(100.0 * np.exp(osc))))
        rows.append(("B", ts, float(50.0 * np.exp(0.0005 * i))))
    bars = spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, close double"
    )
    out = (
        spread_band_backtest(
            bars, entry_z=2.0, exit_z=0.5, window=50, ts_col="ts_event"
        )
        .orderBy("ts_event")
        .collect()
    )
    assert len(out) == n
    entered = exited = held = 0
    prev = None
    for r in out:
        z = r["z"]
        pos = r["position"]
        ppos = prev["position"] if prev is not None else 0.0
        if z is not None:
            zr = round(z, 6)
            if zr >= 2.0:
                assert pos == -1.0, r
                entered += 1
            elif zr <= -2.0:
                assert pos == 1.0, r
                entered += 1
            elif abs(zr) <= 0.5:
                assert pos == 0.0, r
                exited += 1
            else:
                assert pos == ppos, r  # hold band: hysteresis
                held += 1
        else:
            assert pos == ppos, r  # no signal -> hold
        assert r["traded"] == (pos != ppos), r
        if prev is not None and prev["spread"] is not None:
            want = ppos * (r["spread"] - prev["spread"])
            if r["pnl"] is not None:
                assert r["pnl"] == pytest.approx(want, abs=1e-12), r
        prev = r
    # the tape must actually exercise all three regimes, with real
    # held-through-band rows where position is nonzero
    assert entered > 5 and exited > 5 and held > 5
    assert any(
        r["position"] != 0.0 and r["z"] is not None and 0.5 < abs(round(r["z"], 6)) < 2.0
        for r in out
    )


def test_spread_band_backtest_net_cost_invariants(spark):
    """Round-9 cost-aware variant: gross columns equal the plain band
    backtest; cost = |position change| x (cs_a + |beta| * cs_b)/2 with
    Corwin-Schultz half-spreads (0 where nothing traded, 0 in the CS
    warmup); net_pnl = coalesce(pnl, 0) - cost."""
    import datetime as dt

    import numpy as np

    from polars_trading_spark.operators.mean_reversion import (
        spread_band_backtest,
        spread_band_backtest_net,
    )
    from polars_trading_spark.operators.microstructure import corwin_schultz

    base = dt.datetime(2024, 1, 2)
    rows = []
    rng = np.random.RandomState(7)
    n = 400
    for i in range(n):
        ts = base + dt.timedelta(minutes=15 * i)
        osc = 0.06 * np.sin(i / 17.0) + 0.002 * rng.normal()
        ca = float(100.0 * np.exp(osc))
        cb = float(50.0 * np.exp(0.0005 * i))
        # highs/lows around the close so Corwin-Schultz has real ranges
        rows.append(("A", ts, ca, ca * 1.004, ca * 0.996))
        rows.append(("B", ts, cb, cb * 1.002, cb * 0.998))
    bars = spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, close double, "
        "high double, low double"
    )
    kw = dict(entry_z=2.0, exit_z=0.5, window=50, ts_col="ts_event")
    gross = {
        (r["sym_a"], r["sym_b"], r["ts_event"]): r
        for r in spread_band_backtest(bars, **kw).collect()
    }
    cs = {
        (r["symbol"], r["ts_event"]): (
            round(r["cs_spread"], 6) if r["cs_spread"] is not None else None
        )
        for r in corwin_schultz(bars, window=20, ts_col="ts_event").collect()
    }
    out = sorted(
        spread_band_backtest_net(bars, cs_window=20, **kw).collect(),
        key=lambda r: (r["sym_a"], r["sym_b"], r["ts_event"]),
    )
    assert len(out) == len(gross)
    n_costly = 0
    prev_pos = 0.0
    for r in out:
        g = gross[(r["sym_a"], r["sym_b"], r["ts_event"])]
        for col in ("spread", "z", "position", "traded", "pnl"):
            assert r[col] == g[col], (col, r, g)
        turn = abs(r["position"] - prev_pos)
        csa = cs.get(("A", r["ts_event"])) or 0.0
        csb = cs.get(("B", r["ts_event"])) or 0.0
        want = turn * (csa + abs(r["beta"]) * csb) / 2.0
        assert r["cost"] == pytest.approx(want, abs=1e-12), r
        assert r["cost"] >= 0.0
        if not r["traded"]:
            assert r["cost"] == 0.0
        elif want > 0:
            n_costly += 1
        want_net = (r["pnl"] if r["pnl"] is not None else 0.0) - r["cost"]
        assert r["net_pnl"] == pytest.approx(want_net, abs=1e-12)
        prev_pos = r["position"]
    assert n_costly > 5  # the tape actually charges real costs


def test_rank_portfolio_net_cost_invariants(spark):
    """Cost-aware momentum book: gross columns equal the plain
    backtest; per-bucket cost equals the hand-recomputed integer
    micro-spread fold over that bucket's entry/exit trades (first
    bucket = full entry cost, last bucket's exit never charged);
    zero-turnover buckets cost zero; net = pnl - cost."""
    import datetime as dt

    import numpy as np

    from polars_trading_spark.operators.cross_section import (
        _rank_members,
        rank_portfolio_backtest,
        rank_portfolio_backtest_net,
    )
    from polars_trading_spark.operators.microstructure import corwin_schultz

    base = dt.datetime(2024, 1, 2)
    rows = []
    rng = np.random.RandomState(3)
    n, syms = 240, ("A", "B", "C", "D")
    px = {s: 100.0 * (1 + i) for i, s in enumerate(syms)}
    for i in range(n):
        ts = base + dt.timedelta(minutes=15 * i)
        for s in syms:
            px[s] *= float(np.exp(rng.normal(0.0, 0.01)))
            c = px[s]
            rows.append((s, ts, c, c * 1.004, c * 0.996))
    bars = spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, close double, "
        "high double, low double"
    )
    kw = dict(lookback=5, top_n=1, ts_col="ts_event")
    gross = {
        r["ts_event"]: r for r in rank_portfolio_backtest(bars, **kw).collect()
    }
    out = sorted(
        rank_portfolio_backtest_net(bars, cs_window=20, **kw).collect(),
        key=lambda r: r["ts_event"],
    )
    assert len(out) == len(gross)

    # hand-recompute trades from the membership + CS micro-spreads
    members = sorted(
        _rank_members(bars, close_col="close", symbol_col="symbol", **kw)
        .select("ts_event", "symbol", "__side")
        .collect(),
        key=lambda r: r["ts_event"],
    )
    micro = {
        (r["symbol"], r["ts_event"]): int(round(r["cs_spread"] * 1e6))
        for r in corwin_schultz(bars, window=20, ts_col="ts_event").collect()
        if r["cs_spread"] is not None
    }
    buckets = sorted({r["ts_event"] for r in members})
    book = {
        t: {(r["symbol"], r["__side"]) for r in members if r["ts_event"] == t}
        for t in buckets
    }
    want_cost = {}
    for i, t in enumerate(buckets):
        prev = book[buckets[i - 1]] if i > 0 else set()
        entries = book[t] - prev
        exits = prev - book[t]
        k = sum(micro.get((s, t), 0) for s, _ in entries) + sum(
            micro.get((s, t), 0) for s, _ in exits
        )
        want_cost[t] = k / 1e6 / 2.0  # top_n = 1 -> / (2 * 1)

    n_nonzero = 0
    for r in out:
        g = gross[r["ts_event"]]
        for col in ("n_long", "n_short", "pnl", "turnover"):
            assert r[col] == g[col], (col, r, g)
        assert r["cost"] == pytest.approx(want_cost[r["ts_event"]], abs=1e-12)
        assert r["cost"] >= 0.0
        if r["turnover"] == 0.0:
            assert r["cost"] == 0.0
        if r["cost"] > 0:
            n_nonzero += 1
        want_net = (r["pnl"] if r["pnl"] is not None else 0.0) - r["cost"]
        assert r["net_pnl"] == pytest.approx(want_net, abs=1e-12)
    assert n_nonzero > 10  # the tape actually rebalances


def test_spread_band_tearsheet_matches_per_bar_recomputation(spark):
    """The one-row summary equals a pandas recomputation over the
    per-bar net backtest output: ordered sums, all-bar Sharpes (the
    rank_portfolio_tearsheet convention — the warmup bar's undefined
    gross P&L contributes 0), running-peak drawdown of the net equity
    curve."""
    import datetime as dt

    import numpy as np

    from polars_trading_spark.operators.mean_reversion import (
        spread_band_backtest_net,
        spread_band_tearsheet,
    )

    base = dt.datetime(2024, 1, 2)
    rows = []
    rng = np.random.RandomState(7)
    for i in range(400):
        ts = base + dt.timedelta(minutes=15 * i)
        osc = 0.06 * np.sin(i / 17.0) + 0.002 * rng.normal()
        ca = float(100.0 * np.exp(osc))
        cb = float(50.0 * np.exp(0.0005 * i))
        rows.append(("A", ts, ca, ca * 1.004, ca * 0.996))
        rows.append(("B", ts, cb, cb * 1.002, cb * 0.998))
    bars = spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, close double, "
        "high double, low double"
    )
    kw = dict(entry_z=2.0, exit_z=0.5, window=50, cs_window=20,
              ts_col="ts_event")
    per_bar = (
        spread_band_backtest_net(bars, **kw)
        .toPandas()
        .sort_values("ts_event")
        .reset_index(drop=True)
    )
    out = spread_band_tearsheet(bars, **kw).collect()
    assert len(out) == 1
    r = out[0]
    g = per_bar.pnl.fillna(0.0)
    nv = per_bar.net_pnl
    assert r["n_bars"] == len(per_bar)
    assert r["n_trades"] == int(per_bar.traded.sum())
    assert r["gross_pnl"] == pytest.approx(g.sum(), abs=1e-9)
    assert r["total_cost"] == pytest.approx(per_bar.cost.sum(), abs=1e-9)
    assert r["net_pnl"] == pytest.approx(nv.sum(), abs=1e-9)
    # Sharpes over ALL bars, matching rank_portfolio_tearsheet: the
    # warmup bar's null gross pnl counts as 0 and its (zero) cost bar
    # stays in the net series
    assert r["gross_sharpe"] == pytest.approx(
        g.mean() / g.std(ddof=1), rel=1e-9
    )
    assert r["net_sharpe"] == pytest.approx(
        nv.mean() / nv.std(ddof=1), rel=1e-9
    )
    cum = nv.cumsum()
    assert r["max_drawdown"] == pytest.approx(
        (cum - cum.cummax()).min(), abs=1e-9
    )
    assert r["max_drawdown"] <= 0
    assert r["net_pnl"] < r["gross_pnl"]  # costs really charged


def test_rank_portfolio_tearsheet_matches_per_bucket_recomputation(spark):
    """The one-row book summary equals a pandas recomputation over the
    per-bucket net output."""
    import datetime as dt

    import numpy as np

    from polars_trading_spark.operators.cross_section import (
        rank_portfolio_backtest_net,
        rank_portfolio_tearsheet,
    )

    base = dt.datetime(2024, 1, 2)
    rows = []
    rng = np.random.RandomState(3)
    n, syms = 240, ("A", "B", "C", "D")
    px = {s: 100.0 * (1 + i) for i, s in enumerate(syms)}
    for i in range(n):
        ts = base + dt.timedelta(minutes=15 * i)
        for s in syms:
            px[s] *= float(np.exp(rng.normal(0.0, 0.01)))
            c = px[s]
            rows.append((s, ts, c, c * 1.004, c * 0.996))
    bars = spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, close double, "
        "high double, low double"
    )
    kw = dict(lookback=5, top_n=1, cs_window=20, ts_col="ts_event")
    per = (
        rank_portfolio_backtest_net(bars, **kw)
        .toPandas()
        .sort_values("ts_event")
        .reset_index(drop=True)
    )
    out = rank_portfolio_tearsheet(bars, **kw).collect()
    assert len(out) == 1
    r = out[0]
    g = per.pnl.fillna(0.0)
    assert r["n_buckets"] == len(per)
    assert r["gross_pnl"] == pytest.approx(g.sum(), abs=1e-9)
    assert r["total_cost"] == pytest.approx(per.cost.sum(), abs=1e-9)
    assert r["net_pnl"] == pytest.approx(per.net_pnl.sum(), abs=1e-9)
    # Sharpes over ALL buckets: the first bucket has null gross P&L but
    # a real entry cost, so it belongs in the net series
    assert r["gross_sharpe"] == pytest.approx(
        g.mean() / g.std(ddof=1), rel=1e-9
    )
    assert r["net_sharpe"] == pytest.approx(
        per.net_pnl.mean() / per.net_pnl.std(ddof=1), rel=1e-9
    )
    assert r["avg_turnover"] == pytest.approx(
        per.turnover.dropna().mean(), rel=1e-9
    )
    cum = per.net_pnl.cumsum()
    assert r["max_drawdown"] == pytest.approx(
        (cum - cum.cummax()).min(), abs=1e-9
    )
    assert r["net_pnl"] < r["gross_pnl"]
