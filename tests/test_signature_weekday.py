"""rv_signature (operators/volatility.py) and weekday_effect
(operators/seasonality.py)."""

from __future__ import annotations

from datetime import date, datetime, timedelta

import numpy as np
import pytest

from polars_trading_spark.config import Config
from polars_trading_spark.operators.seasonality import weekday_effect
from polars_trading_spark.operators.volatility import rv_signature


def test_rv_signature_numpy_reference(spark):
    rng = np.random.RandomState(9)
    rows = []
    prices = {}
    for sym in ("A", "B"):
        lp = np.cumsum(rng.normal(0, 0.002, 300)) + np.log(50.0)
        px = np.exp(lp)
        prices[sym] = px
        for i, p in enumerate(px):
            rows.append(
                (sym, datetime(2024, 1, 2) + timedelta(seconds=i), float(p))
            )
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double"
    )
    lags = (1, 2, 4, 8, 16, 32)
    with Config(timestamp_column="ts"):
        out = {
            (r["symbol"], r["k"]): r
            for r in rv_signature(df, lags=lags).collect()
        }
    for sym in ("A", "B"):
        lp = np.log(prices[sym])
        base = None
        for k in lags:
            d = lp[k:] - lp[:-k]
            rv = float((d * d).sum() / k)
            r = out[(sym, k)]
            assert r["n_diffs"] == len(d)
            assert r["rv"] == pytest.approx(rv, rel=1e-9)
            if k == 32:
                base = rv
        assert out[(sym, 1)]["noise_ratio"] == pytest.approx(
            out[(sym, 1)]["rv"] / base, rel=1e-9
        )
        assert out[(sym, 32)]["noise_ratio"] == pytest.approx(1.0)


def test_rv_signature_detects_bidask_noise(spark):
    rng = np.random.RandomState(11)
    lp = np.cumsum(rng.normal(0, 0.0005, 600)) + np.log(50.0)
    bounce = np.where(np.arange(600) % 2 == 0, 0.002, -0.002)
    rows_noisy, rows_clean = [], []
    for i in range(600):
        t = datetime(2024, 1, 2) + timedelta(seconds=i)
        rows_noisy.append(("N", t, float(np.exp(lp[i] + bounce[i]))))
        rows_clean.append(("C", t, float(np.exp(lp[i]))))
    df = spark.createDataFrame(
        rows_noisy + rows_clean, "symbol string, ts timestamp, price double"
    )
    with Config(timestamp_column="ts"):
        out = {
            (r["symbol"], r["k"]): r["noise_ratio"]
            for r in rv_signature(df).collect()
        }
    # the bounce inflates tick-scale RV; the clean walk stays flat
    assert out[("N", 1)] > 3.0
    assert out[("C", 1)] < 1.8
    with pytest.raises(ValueError):
        rv_signature(df, lags=(1, 1))
    with pytest.raises(ValueError):
        rv_signature(df, lags=())


def test_weekday_effect_golden(spark):
    # daily one-tick closes over 4 weeks: Mondays jump ~+1%, other days
    # wiggle ~0; 2024-01-01 is a Monday
    rows = []
    px = 100.0
    d0 = date(2024, 1, 1)
    mon_rets = [0.010, 0.012, 0.008]  # applied on Mondays 2..4
    k_mon = 0
    closes = {}
    for i in range(28):
        day = d0 + timedelta(days=i)
        if i > 0:
            if day.weekday() == 0:
                px *= 1 + mon_rets[k_mon]
                k_mon += 1
            else:
                px *= 1 + (0.0002 if i % 2 else -0.0002)
        closes[day] = round(px, 6)  # what actually lands in the frame
        rows.append(
            ("A", datetime(day.year, day.month, day.day, 12, 0), round(px, 6))
        )
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double"
    )
    with Config(timestamp_column="ts"):
        out = {r["weekday"]: r for r in weekday_effect(df).collect()}
    assert set(out) == set(range(7))
    mon = out[0]
    assert mon["n_days"] == 3
    rets = []
    days = sorted(closes)
    for a, b in zip(days, days[1:]):
        if b.weekday() == 0:
            rets.append(closes[b] / closes[a] - 1)
    mean = float(np.mean(rets))
    t = mean / (np.std(rets, ddof=1) / np.sqrt(len(rets)))
    assert mon["mean_ret"] == pytest.approx(mean, rel=1e-6)
    assert mon["t_stat"] == pytest.approx(t, rel=1e-6)
    assert mon["t_stat"] > 3  # the planted Monday effect is detected
    for wd in range(1, 7):
        assert abs(out[wd]["mean_ret"]) < 0.001


def test_weekday_effect_degenerate_guard(spark):
    # a weekday with a single observation gets a null t-stat
    rows = [
        ("A", datetime(2024, 1, 1, 12), 100.0),  # Monday
        ("A", datetime(2024, 1, 2, 12), 101.0),  # Tuesday (1 ret)
        ("A", datetime(2024, 1, 3, 12), 102.0),  # Wednesday (1 ret)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double"
    )
    with Config(timestamp_column="ts"):
        out = {r["weekday"]: r for r in weekday_effect(df).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["n_days"] == 1 and r["t_stat"] is None


def test_ic_decay_reference_and_decay_property(spark):


    from polars_trading_spark.operators.cross_section import ic_decay

    # persistent-momentum universe: trend continues ~2 bars then fades,
    # so mean IC should decay with horizon
    rng = np.random.RandomState(17)
    n_bars, syms = 120, [f"S{i}" for i in range(6)]
    drift = {s: rng.normal(0, 0.004) for s in syms}
    rows = []
    for s in syms:
        px = 100.0
        for i in range(n_bars):
            if i % 30 == 0:
                drift[s] = rng.normal(0, 0.004)
            px *= float(np.exp(drift[s] + rng.normal(0, 0.001)))
            rows.append(
                (s, datetime(2024, 1, 2) + timedelta(minutes=15 * i), px)
            )
    bars = spark.createDataFrame(
        rows, "symbol string, ts_event_start timestamp, close double"
    )
    lags, hs = 5, (1, 2, 4)
    out = {
        r["horizon"]: r
        for r in ic_decay(bars, momentum_lag=lags, horizons=hs).collect()
    }
    # python reference
    import math

    closes = {}
    for s, t, c in rows:
        closes.setdefault(s, []).append(c)
    per_h = {h: [] for h in hs}
    for h in hs:
        for i in range(n_bars):
            pts = []
            for s in syms:
                cs = closes[s]
                if i - lags < 0 or i + h >= n_bars:
                    continue
                sig = math.log(cs[i] / cs[i - lags])
                fwd = math.log(cs[i + h] / cs[i])
                pts.append((s, sig, fwd))
            if len(pts) < 3:
                continue
            rs = {
                s: k + 1
                for k, (s, _, _) in enumerate(
                    sorted(pts, key=lambda p: (p[1], p[0]))
                )
            }
            rf = {
                s: k + 1
                for k, (s, _, _) in enumerate(
                    sorted(pts, key=lambda p: (p[2], p[0]))
                )
            }
            n = len(pts)
            ssd = sum((rs[s] - rf[s]) ** 2 for s, _, _ in pts)
            per_h[h].append(1 - 6 * ssd / (n * (n * n - 1)))
    for h in hs:
        ics = per_h[h]
        r = out[h]
        assert r["n_periods"] == len(ics)
        assert r["mean_ic"] == pytest.approx(np.mean(ics), rel=1e-9)
        sd = np.std(ics, ddof=1)
        assert r["ic_t"] == pytest.approx(
            np.mean(ics) / (sd / np.sqrt(len(ics))), rel=1e-9
        )
        assert r["hit_rate"] == pytest.approx(
            np.mean([1 if x > 0 else 0 for x in ics]), rel=1e-9
        )
    # momentum IC is positive at short horizons and decays
    assert out[1]["mean_ic"] > 0.1
    assert out[1]["mean_ic"] >= out[4]["mean_ic"] - 0.05
    with pytest.raises(ValueError):
        ic_decay(bars, horizons=())
    with pytest.raises(ValueError):
        ic_decay(bars, momentum_lag=0)
