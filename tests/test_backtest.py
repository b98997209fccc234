"""Golden tests for the backtest statistics operator
(operators/backtest.py), validated against independent pandas/numpy
computations and a hand-crafted drawdown path."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

from polars_trading_spark.operators.backtest import backtest_stats

PPY = 252.0


@pytest.fixture(scope="module")
def bar_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    rows = []
    for sym in ("AAPL", "MSFT"):
        price = 100.0
        for i in range(120):
            price *= math.exp(rng.normal(0.0005, 0.02))
            rows.append(
                {
                    "symbol": sym,
                    "ts_event_start": pd.Timestamp("2024-01-01") + pd.Timedelta(days=i),
                    "close": price,
                }
            )
    return pd.DataFrame(rows)


def _expected(close: np.ndarray) -> dict:
    r = np.diff(np.log(close))
    n = len(r)
    mu = r.mean()
    sd = r.std(ddof=1)
    m2 = ((r - mu) ** 2).mean()
    g3 = ((r - mu) ** 3).mean() / m2**1.5
    g4 = ((r - mu) ** 4).mean() / m2**2
    sr = mu / sd
    psr_var = 1 - g3 * sr + (g4 - 1) / 4 * sr * sr
    cum = np.cumsum(r)
    peak = np.maximum.accumulate(np.maximum(cum, 0.0))
    dd = cum - peak
    # Longest run of strictly-underwater periods between high-water marks.
    hwm = np.cumsum(dd >= 0)
    tuw = 0
    for k in np.unique(hwm):
        length = int((hwm == k).sum())
        tuw = max(tuw, length if k == 0 else length - 1)
    return {
        "n_periods": n,
        "ann_return": mu * PPY,
        "ann_vol": sd * math.sqrt(PPY),
        "sharpe": sr * math.sqrt(PPY),
        "psr_z": sr * math.sqrt(n - 1) / math.sqrt(psr_var),
        "skew": g3,
        "kurtosis": g4,
        "hit_ratio": (r > 0).sum() / (r != 0).sum(),
        "max_drawdown": 1 - math.exp(dd.min()),
        "max_tuw": tuw,
    }


def test_matches_numpy_reference(spark, bar_pdf):
    out = (
        backtest_stats(spark.createDataFrame(bar_pdf), periods_per_year=PPY)
        .toPandas()
        .set_index("symbol")
    )
    for sym, sub in bar_pdf.groupby("symbol"):
        exp = _expected(sub.sort_values("ts_event_start")["close"].to_numpy())
        got = out.loc[sym]
        for k, v in exp.items():
            assert got[k] == pytest.approx(v, rel=1e-9, abs=1e-12), (sym, k)


def test_handcrafted_drawdown_and_tuw(spark):
    # Path: up, down, down, recover to new high, down, flat end.
    # closes (log scale deltas): +.10, -.05, -.03, +.12, -.02, +.01
    logs = np.cumsum([0.0, 0.10, -0.05, -0.03, 0.12, -0.02, 0.01])
    pdf = pd.DataFrame(
        {
            "symbol": "X",
            "ts_event_start": pd.date_range("2024-01-01", periods=len(logs), freq="D"),
            "close": np.exp(logs) * 50,
        }
    )
    out = backtest_stats(spark.createDataFrame(pdf), periods_per_year=PPY).toPandas().iloc[0]
    # Max drawdown: peak after +.10 is .10; trough at .10-.05-.03 = .02 → dd = -.08.
    assert out["max_drawdown"] == pytest.approx(1 - math.exp(-0.08), rel=1e-12)
    # Underwater spells: after bar1 high, two down periods then recovery
    # (new high at bar4) → TuW 2; then one down period never recovered → 1.
    assert out["max_tuw"] == 2
    assert out["n_periods"] == 6
    assert out["hit_ratio"] == pytest.approx(3 / 6)


def test_underwater_from_inception(spark):
    # Monotone decline: never makes a high → hwm=0 spell counts all rows.
    pdf = pd.DataFrame(
        {
            "symbol": "X",
            "ts_event_start": pd.date_range("2024-01-01", periods=5, freq="D"),
            "close": [100.0, 90.0, 80.0, 70.0, 60.0],
        }
    )
    out = backtest_stats(spark.createDataFrame(pdf), periods_per_year=PPY).toPandas().iloc[0]
    assert out["max_tuw"] == 4
    assert out["max_drawdown"] == pytest.approx(1 - 60.0 / 100.0, rel=1e-12)
    assert out["hit_ratio"] == 0.0


def test_constant_price_degenerate(spark):
    # Zero returns: sd undefined-guarded → sharpe/psr null, no drawdown.
    pdf = pd.DataFrame(
        {
            "symbol": "X",
            "ts_event_start": pd.date_range("2024-01-01", periods=4, freq="D"),
            "close": [100.0] * 4,
        }
    )
    out = backtest_stats(spark.createDataFrame(pdf), periods_per_year=PPY).toPandas().iloc[0]
    assert out["n_periods"] == 3
    assert pd.isna(out["sharpe"]) and pd.isna(out["psr_z"])
    assert out["max_drawdown"] == 0.0
    assert pd.isna(out["hit_ratio"])  # no non-zero periods


def test_rejects_bad_ppy(spark):
    with pytest.raises(ValueError, match="periods_per_year"):
        backtest_stats(spark.range(1), periods_per_year=0)


def test_drawdown_path_handcrafted(spark):
    from polars_trading_spark.operators.backtest import drawdown_path

    logs = np.cumsum([0.0, 0.10, -0.05, -0.03, 0.12, -0.02, 0.01])
    pdf = pd.DataFrame(
        {
            "symbol": "X",
            "ts_event_start": pd.date_range("2024-01-01", periods=len(logs), freq="D"),
            "close": np.exp(logs) * 50,
        }
    )
    out = (
        drawdown_path(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("ts_event_start")
        .reset_index(drop=True)
    )
    # returns: +.10 (high), -.05, -.03, +.12 (new high), -.02, +.01 (still under)
    assert out["underwater"].tolist() == [0, 1, 2, 0, 1, 2]
    assert out["drawdown"].iloc[0] == pytest.approx(0.0)
    assert out["drawdown"].iloc[2] == pytest.approx(1 - math.exp(-0.08), rel=1e-12)
    assert out["cum_return"].iloc[-1] == pytest.approx(0.13, rel=1e-9)


def test_drawdown_path_consistent_with_stats(spark, bar_pdf):
    """max over the path equals the summary operator's numbers."""
    from polars_trading_spark.operators.backtest import backtest_stats, drawdown_path

    sdf = spark.createDataFrame(bar_pdf)
    path = drawdown_path(sdf).toPandas()
    stats = backtest_stats(sdf, periods_per_year=PPY).toPandas().set_index("symbol")
    agg = path.groupby("symbol").agg(dd=("drawdown", "max"), tuw=("underwater", "max"))
    for sym in agg.index:
        assert agg.loc[sym, "dd"] == pytest.approx(stats.loc[sym, "max_drawdown"], rel=1e-12)
        assert agg.loc[sym, "tuw"] == stats.loc[sym, "max_tuw"]


def test_ma_crossover_golden(spark):
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.backtest import ma_crossover_signal

    rng = np.random.default_rng(4)
    n = 200
    close = 100 * np.exp(np.cumsum(0.01 * rng.standard_normal(n)))
    t0 = dt.datetime(2024, 1, 1)
    rows = [("A", t0 + dt.timedelta(minutes=15 * i), float(c)) for i, c in enumerate(close)]
    df = spark.createDataFrame(rows, "symbol string, ts_event_start timestamp, close double")
    out = (
        ma_crossover_signal(df, fast=5, slow=20)
        .orderBy("ts_event_start")
        .toPandas()
    )
    s = pd.Series(close)
    sf = s.rolling(5, min_periods=1).mean()
    ss = s.rolling(20, min_periods=1).mean()
    pos = pd.Series(np.where(np.arange(n) >= 19, np.sign(sf - ss), 0.0))
    ret = pd.Series(np.log(close)).diff()
    pnl = pos.shift(1) * ret
    assert np.allclose(out["sma_fast"], sf, rtol=1e-12)
    assert np.allclose(out["pos"], pos, rtol=0)
    assert np.allclose(out["pnl"].iloc[1:], pnl.iloc[1:], rtol=1e-12)
    assert out["pnl"].iloc[0] is None or np.isnan(out["pnl"].iloc[0])


def test_ma_crossover_validation(spark):
    import pytest as _pytest

    from polars_trading_spark.operators.backtest import ma_crossover_signal

    df = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1), 1.0)],
        "symbol string, ts_event_start timestamp, close double",
    )
    with _pytest.raises(ValueError, match="fast"):
        ma_crossover_signal(df, fast=20, slow=10)


def test_cross_sectional_zscore_golden(spark):
    import numpy as np

    from polars_trading_spark.operators.cross_section import cross_sectional_zscore

    t = dt.datetime(2024, 1, 1)
    rows = [
        ("A", t, 1.0), ("B", t, 2.0), ("C", t, 3.0), ("D", t, 100.0),
        ("E", t, None),
    ]
    df = spark.createDataFrame(rows, "symbol string, ts_event_start timestamp, x double")
    out = {r["symbol"]: r for r in cross_sectional_zscore(df, "x", clip_sigmas=1.4).collect()}
    vals = np.array([1.0, 2.0, 3.0, 100.0])
    mean, sd = vals.mean(), vals.std(ddof=1)
    assert out["A"]["z"] == pytest.approx((1 - mean) / sd, rel=1e-12)
    assert out["D"]["z"] == pytest.approx((100 - mean) / sd, rel=1e-12)
    assert out["D"]["z_clipped"] == 1.4  # winsorized
    assert out["E"]["z"] is None and out["E"]["z_clipped"] is None


def test_var_cvar_golden(spark):
    import numpy as np

    from polars_trading_spark.operators.backtest import var_cvar

    rng = np.random.default_rng(6)
    n = 200
    closes = 100 * np.exp(np.cumsum(0.01 * rng.standard_normal(n)))
    t0 = dt.datetime(2024, 1, 1)
    rows = [("A", t0 + dt.timedelta(minutes=15 * i), float(c)) for i, c in enumerate(closes)]
    df = spark.createDataFrame(rows, "symbol string, ts_event_start timestamp, close double")
    out = var_cvar(df, alpha=0.05).collect()[0]
    r = np.diff(np.log(closes))
    k = max(1, int(np.floor(0.05 * len(r))))
    worst = np.sort(r)[:k]
    assert out["n_obs"] == len(r) and out["k"] == k
    assert out["var_5"] == pytest.approx(worst.max(), rel=1e-12)
    assert out["cvar_5"] == pytest.approx(worst.mean(), rel=1e-12)
    assert out["cvar_5"] <= out["var_5"] <= 0 or out["var_5"] > 0  # ordering


def test_var_cvar_tiny_series_k_floor(spark):
    from polars_trading_spark.operators.backtest import var_cvar

    rows = [
        ("A", dt.datetime(2024, 1, 1, 9, m), 100.0 + m, ) for m in range(5)
    ]
    df = spark.createDataFrame(rows, "symbol string, ts_event_start timestamp, close double")
    out = var_cvar(df, alpha=0.05).collect()[0]
    assert out["k"] == 1  # floor(0.05*4) = 0 -> clamped to 1
    with pytest.raises(ValueError, match="alpha"):
        var_cvar(df, alpha=0.6)


def test_rank_portfolio_golden(spark):
    """3 symbols, deterministic trajectories: the top/bottom picks and
    the long-short pnl are hand-checkable."""
    from polars_trading_spark.operators.cross_section import rank_portfolio_backtest

    t0 = dt.datetime(2024, 1, 1)
    # A trends up, B trends down, C flat
    rows = []
    for i in range(10):
        rows.append(("A", t0 + dt.timedelta(minutes=15 * i), 100.0 * (1.01 ** i)))
        rows.append(("B", t0 + dt.timedelta(minutes=15 * i), 100.0 * (0.99 ** i)))
        rows.append(("C", t0 + dt.timedelta(minutes=15 * i), 100.0))
    df = spark.createDataFrame(rows, "symbol string, ts_event_start timestamp, close double")
    out = sorted(
        rank_portfolio_backtest(df, lookback=2, top_n=1).collect(),
        key=lambda r: r["ts_event_start"],
    )
    # buckets with momentum start at bar index 2
    assert len(out) == 8
    first = out[0]
    assert first["n_long"] == 1 and first["n_short"] == 1
    # long A (uptrend), short B (downtrend): pnl = ln(1.01) - ln(0.99)
    import math
    for r in out[:-1]:  # last bucket has no forward return -> null pnl
        assert r["pnl"] == pytest.approx(math.log(1.01) - math.log(0.99), rel=1e-9)
    assert out[0]["turnover"] is None        # first formed bucket
    for r in out[1:]:
        assert r["turnover"] == 0.0          # membership never changes


def test_rank_portfolio_turnover_moves(spark):
    from polars_trading_spark.operators.cross_section import rank_portfolio_backtest

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # alternate which symbol leads so membership flips each bar
    import numpy as np
    rng = np.random.default_rng(14)
    prices = {s: [100.0] for s in ("A", "B", "C", "D")}
    for i in range(30):
        for s in prices:
            prices[s].append(prices[s][-1] * float(np.exp(0.05 * rng.standard_normal())))
    for s, ps in prices.items():
        for i, p in enumerate(ps):
            rows.append((s, t0 + dt.timedelta(minutes=15 * i), p))
    df = spark.createDataFrame(rows, "symbol string, ts_event_start timestamp, close double")
    out = rank_portfolio_backtest(df, lookback=1, top_n=1).collect()
    turns = [r["turnover"] for r in out if r["turnover"] is not None]
    assert turns and max(turns) > 0.0  # membership changes somewhere


def test_rank_portfolio_validation(spark):
    from polars_trading_spark.operators.cross_section import rank_portfolio_backtest

    df = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1), 1.0)],
        "symbol string, ts_event_start timestamp, close double",
    )
    with pytest.raises(ValueError, match="lookback"):
        rank_portfolio_backtest(df, lookback=0)
    with pytest.raises(ValueError, match="top_n"):
        rank_portfolio_backtest(df, top_n=0)


class TestDeflatedSharpe:
    def _bars(self, spark, seed=7, n=400, drift=(0.004, 0.0, -0.002, 0.001, 0.002)):
        import datetime as dt

        import numpy as np

        rng = np.random.RandomState(seed)
        base = dt.datetime(2024, 1, 1)
        rows = []
        for s_i, mu in enumerate(drift):
            p = 100 * np.exp(np.cumsum(rng.normal(mu, 0.01, n)))
            for i in range(n):
                rows.append((f"S{s_i}", base + dt.timedelta(hours=i), float(p[i])))
        return spark.createDataFrame(
            rows, "symbol string, ts_event_start timestamp, close double"
        )

    def test_probabilities_match_normal_cdf_and_ordering(self, spark):
        import math
        from statistics import NormalDist

        import pytest as pt

        from polars_trading_spark.operators.backtest import (
            backtest_stats,
            deflated_sharpe,
        )

        bars = self._bars(spark)
        ppy = 24 * 365
        out = {
            r["symbol"]: r
            for r in deflated_sharpe(bars, periods_per_year=ppy, n_trials=10).collect()
        }
        stats = {
            r["symbol"]: r
            for r in backtest_stats(bars, periods_per_year=ppy).collect()
        }
        nd = NormalDist()
        srs = [stats[s]["sharpe"] / math.sqrt(ppy) for s in sorted(stats)]
        mean_sr = sum(srs) / len(srs)
        v = sum((x - mean_sr) ** 2 for x in srs) / (len(srs) - 1)
        gamma = 0.5772156649015329
        sr0 = math.sqrt(v) * (
            (1 - gamma) * nd.inv_cdf(1 - 1 / 10)
            + gamma * nd.inv_cdf(1 - 1 / (10 * math.e))
        )
        for s, r in out.items():
            st = stats[s]
            # A&S polynomial is within 1.5e-7 of the true normal CDF
            assert r["psr_prob"] == pt.approx(nd.cdf(st["psr_z"]), abs=2e-7)
            assert r["sr0"] == pt.approx(sr0, rel=1e-9)
            sr = st["sharpe"] / math.sqrt(ppy)
            var = 1 - st["skew"] * sr + (st["kurtosis"] - 1) / 4 * sr * sr
            dsr_z = (sr - sr0) * math.sqrt(st["n_periods"] - 1) / math.sqrt(var)
            assert r["dsr_z"] == pt.approx(dsr_z, rel=1e-9)
            assert r["dsr_prob"] == pt.approx(nd.cdf(dsr_z), abs=2e-7)
        # deflation must strictly lower every z-score (sr0 > 0 here)
        for s, r in out.items():
            assert r["dsr_z"] < stats[s]["psr_z"]
        # the strongly-drifting symbol still survives deflation best
        assert max(out, key=lambda s: out[s]["dsr_prob"]) == "S0"

    def test_validation_and_plan(self, spark):
        import pytest as pt

        from polars_trading_spark.operators.backtest import deflated_sharpe
        from polars_trading_spark.plans import (
            count_python_stages,
            unbounded_global_windows,
        )

        bars = self._bars(spark, n=50)
        with pt.raises(ValueError):
            deflated_sharpe(bars, periods_per_year=252, n_trials=1)
        out = deflated_sharpe(bars, periods_per_year=252, n_trials=5)
        assert count_python_stages(out) == 0
        assert unbounded_global_windows(out) == []


class TestRiskRatios:
    def _bars(self, spark, prices):
        import datetime as dt

        rows = [
            ("A", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), p)
            for i, p in enumerate(prices)
        ]
        return spark.createDataFrame(rows, "symbol string, ts timestamp, close double")

    def test_matches_python_golden(self, spark):
        import math
        import random

        import pytest as pt

        from polars_trading_spark.operators.backtest import risk_ratios

        rng = random.Random(5)
        prices = [100.0]
        for _ in range(99):
            prices.append(max(1.0, prices[-1] * math.exp(rng.gauss(0.001, 0.02))))
        out = risk_ratios(
            self._bars(spark, prices), periods_per_year=252, ts_col="ts"
        ).collect()
        assert len(out) == 1
        r = out[0]
        rets = [math.log(prices[i] / prices[i - 1]) for i in range(1, len(prices))]
        n = len(rets)
        mu_ann = sum(rets) / n * 252
        down = math.sqrt(sum(min(x, 0.0) ** 2 for x in rets) / n) * math.sqrt(252)
        cum = peak = 0.0
        mindd = 0.0
        for x in rets:
            cum += x
            peak = max(peak, cum, 0.0)
            mindd = min(mindd, cum - peak)
        maxdd = 1 - math.exp(mindd)
        assert r["n_periods"] == n
        assert r["ann_return"] == pt.approx(mu_ann, rel=1e-9)
        assert r["downside_dev_ann"] == pt.approx(down, rel=1e-9)
        assert r["sortino"] == pt.approx(mu_ann / down, rel=1e-9)
        assert r["max_drawdown"] == pt.approx(maxdd, rel=1e-9)
        assert r["calmar"] == pt.approx(mu_ann / maxdd, rel=1e-9)
        omega = sum(max(x, 0.0) for x in rets) / sum(max(-x, 0.0) for x in rets)
        assert r["omega"] == pt.approx(omega, rel=1e-9)

    def test_degenerate_guards(self, spark):
        import pytest as pt

        from polars_trading_spark.operators.backtest import risk_ratios

        # monotone-up path: no downside, no drawdown, no losses
        out = risk_ratios(
            self._bars(spark, [100.0, 101.0, 102.0, 103.0]),
            periods_per_year=252,
            ts_col="ts",
        ).collect()[0]
        assert out["sortino"] is None      # downside dev == 0
        assert out["calmar"] is None       # max drawdown == 0
        assert out["omega"] is None        # loss mass == 0
        assert out["ann_return"] is not None
        with pt.raises(ValueError, match="periods_per_year"):
            risk_ratios(self._bars(spark, [1.0]), periods_per_year=0, ts_col="ts")

    def test_plan_zero_python_no_global_window(self, spark):
        from polars_trading_spark.operators.backtest import risk_ratios
        from polars_trading_spark.plans import count_python_stages, unbounded_global_windows

        out = risk_ratios(
            self._bars(spark, [100.0, 101.0]), periods_per_year=252, ts_col="ts"
        )
        assert count_python_stages(out) == 0
        assert unbounded_global_windows(out) == []


class TestUlcerIndex:
    def test_matches_python_golden(self, spark):
        import datetime as dt
        import math
        import random

        import pytest as pt

        from polars_trading_spark.operators.backtest import ulcer_index

        rng = random.Random(17)
        prices = [100.0]
        for _ in range(149):
            prices.append(max(1.0, prices[-1] * math.exp(rng.gauss(0.0005, 0.02))))
        rows = [
            ("A", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), p)
            for i, p in enumerate(prices)
        ]
        df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
        out = ulcer_index(df, periods_per_year=252, ts_col="ts").collect()
        assert len(out) == 1
        r = out[0]
        rets = [math.log(prices[i] / prices[i - 1]) for i in range(1, len(prices))]
        cum = peak = 0.0
        sdd2 = 0.0
        for x in rets:
            cum += x
            peak = max(peak, cum, 0.0)
            ddf = 1 - math.exp(cum - peak)
            sdd2 += ddf * ddf
        n = len(rets)
        ulcer = math.sqrt(sdd2 / n)
        mu_ann = sum(rets) / n * 252
        assert r["n_periods"] == n
        assert r["ulcer"] == pt.approx(ulcer, rel=1e-9)
        assert r["martin"] == pt.approx(mu_ann / ulcer, rel=1e-9)

    def test_monotone_up_has_zero_ulcer_null_martin(self, spark):
        import datetime as dt

        import pytest as pt

        from polars_trading_spark.operators.backtest import ulcer_index

        rows = [
            ("A", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 100.0 + i)
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
        r = ulcer_index(df, periods_per_year=252, ts_col="ts").collect()[0]
        assert r["ulcer"] == pt.approx(0.0, abs=1e-15)
        assert r["martin"] is None
        with pt.raises(ValueError, match="periods_per_year"):
            ulcer_index(df, periods_per_year=0, ts_col="ts")


class TestRunsTest:
    def test_matches_closed_form(self, spark):
        import datetime as dt
        import math

        import pytest as pt

        from polars_trading_spark.operators.regime import runs_test

        # signs: + + - + - - + +  (prices engineered to alternate as below)
        moves = [1, 1, -1, 1, -1, -1, 1, 1]
        prices = [100.0]
        for m in moves:
            prices.append(prices[-1] * (1.02 if m > 0 else 0.98))
        rows = [
            ("A", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), p)
            for i, p in enumerate(prices)
        ]
        df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
        r = runs_test(df, ts_col="ts").collect()[0]
        n1 = sum(1 for m in moves if m > 0)
        n2 = sum(1 for m in moves if m < 0)
        runs = 1 + sum(1 for a, b in zip(moves, moves[1:]) if a != b)
        n = n1 + n2
        e = 1 + 2 * n1 * n2 / n
        var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
        assert (r["n_up"], r["n_down"], r["n_runs"]) == (n1, n2, runs)
        assert r["expected_runs"] == pt.approx(e, rel=1e-12)
        assert r["z"] == pt.approx((runs - e) / math.sqrt(var), rel=1e-12)

    def test_one_sided_and_zero_returns_guarded(self, spark):
        import datetime as dt

        from polars_trading_spark.operators.regime import runs_test

        rows = [
            # B: all up moves, plus one flat (excluded)
            ("B", dt.datetime(2024, 1, 1), 100.0),
            ("B", dt.datetime(2024, 1, 2), 101.0),
            ("B", dt.datetime(2024, 1, 3), 101.0),
            ("B", dt.datetime(2024, 1, 4), 102.0),
        ]
        df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
        r = runs_test(df, ts_col="ts").collect()[0]
        assert r["n_up"] == 2 and r["n_down"] == 0 and r["n_runs"] == 1
        assert r["z"] is None  # one-sided: variance degenerates

    def test_plan_zero_python(self, spark):
        import datetime as dt

        from polars_trading_spark.operators.regime import runs_test
        from polars_trading_spark.plans import count_python_stages

        df = spark.createDataFrame(
            [("A", dt.datetime(2024, 1, 1), 1.0)],
            "symbol string, ts timestamp, close double",
        )
        assert count_python_stages(runs_test(df, ts_col="ts")) == 0
