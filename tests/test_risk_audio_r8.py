"""Round-8 second-wave goldens: risk_contributions (vs an independent
numpy matrix reference) and pcm_band_power (pure-tone detection — the
closed-form DFT anchor)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

BASE = dt.datetime(2024, 1, 2, 9, 30)


def _bars_from_returns(spark, returns):
    rows = []
    for sym, rs in returns.items():
        p = 100.0
        rows.append((sym, BASE, p))
        for i, r in enumerate(rs):
            p *= float(np.exp(r))
            rows.append((sym, BASE + dt.timedelta(minutes=15 * (i + 1)), p))
    return spark.createDataFrame(
        rows, "symbol string, ts_event_start timestamp, close double"
    )


def test_risk_contributions_matches_numpy_reference(spark):
    from polars_trading_spark.operators.covariance import risk_contributions

    rng = np.random.RandomState(19)
    rets = {f"S{i}": rng.normal(0, 0.01 * (i + 1), 40).tolist() for i in range(4)}
    bars = _bars_from_returns(spark, rets)
    out = {r["symbol"]: r for r in
           risk_contributions(bars, use_shrunk=False).collect()}

    # independent reference: full matrix algebra in numpy over the SAME
    # population covariance of per-symbol demeaned log returns
    syms = sorted(rets)
    X = np.array([np.asarray(rets[s]) - np.mean(rets[s]) for s in syms])
    cov = X @ X.T / X.shape[1]
    inv = 1.0 / np.diag(cov)
    w = inv / inv.sum()
    mrc = cov @ w
    pv = float(w @ mrc)
    for i, s in enumerate(syms):
        r = out[s]
        assert r["weight"] == pytest.approx(w[i], rel=1e-9)
        assert r["mrc"] == pytest.approx(mrc[i], rel=1e-9)
        assert r["rc"] == pytest.approx(w[i] * mrc[i], rel=1e-9)
        assert r["rc_share"] == pytest.approx(w[i] * mrc[i] / pv, rel=1e-9)
        assert r["portfolio_variance"] == pytest.approx(pv, rel=1e-9)
    assert sum(r["rc_share"] for r in out.values()) == pytest.approx(1.0, rel=1e-12)


def test_risk_contributions_equal_on_diagonal_cov(spark):
    from polars_trading_spark.operators.covariance import risk_contributions

    # orthogonal equal-norm returns -> cov = c*I -> everything equal
    h2 = np.array([[1, 1], [1, -1]])
    h8 = np.kron(np.kron(h2, h2), h2).astype(float)
    rows = h8[[1, 2, 4, 7]] * 0.01
    bars = _bars_from_returns(
        spark, {f"S{i}": rows[i].tolist() for i in range(4)}
    )
    out = risk_contributions(bars, use_shrunk=False).collect()
    for r in out:
        assert r["weight"] == pytest.approx(0.25, rel=1e-9)
        assert r["rc_share"] == pytest.approx(0.25, rel=1e-9)


def test_pcm_band_power_detects_pure_tones(spark):
    from polars_trading_spark.functions.multimodal import pcm_band_power

    n = 160  # multiple of 8: integer cycles of every dyadic bin
    t = np.arange(n)
    tones = {
        # media_id -> (samples, expected dominant bin, amplitude)
        1: (1000 * np.cos(2 * np.pi * t / 8), "amp_sr8", 1000.0),
        2: (2000 * np.cos(2 * np.pi * t / 4), "amp_sr4", 2000.0),
        3: (3000.0 * np.where(t % 2 == 0, 1, -1), "amp_sr2", 3000.0),
    }
    rows = [
        (mid, 16_000, np.round(x).astype("<i2").tobytes())
        for mid, (x, _, _) in tones.items()
    ]
    media = spark.createDataFrame(
        rows, "media_id long, sample_rate int, payload binary"
    )
    out = {r["media_id"]: r for r in pcm_band_power(media).collect()}
    for mid, (_, bin_col, amp) in tones.items():
        r = out[mid]
        assert r["n_samples"] == n
        # cos tones round exactly at the 8 phase points, so the bin
        # amplitude is EXACT (sqrt(1/2) phases hit +-707.106781...,
        # rounded — allow 0.1% there, exact elsewhere)
        assert r[bin_col] == pytest.approx(amp, rel=2e-3), (mid, bin_col)
        for other in ("amp_sr8", "amp_sr4", "amp_sr2"):
            if other != bin_col:
                assert abs(r[other]) < amp * 2e-3, (mid, other)
        assert abs(r["dc_mean"]) < 1.0


def test_pcm_band_power_matches_full_dft(spark):
    from polars_trading_spark.functions.multimodal import pcm_band_power

    rng = np.random.RandomState(23)
    n = 96
    x = rng.randint(-20000, 20000, size=n)
    media = spark.createDataFrame(
        [(7, 16_000, x.astype("<i2").tobytes())],
        "media_id long, sample_rate int, payload binary",
    )
    r = pcm_band_power(media).collect()[0]
    t = np.arange(n)
    for col, period in (("amp_sr8", 8), ("amp_sr4", 4), ("amp_sr2", 2)):
        c = float(np.sum(x * np.cos(2 * np.pi * t / period)))
        s = float(np.sum(x * np.sin(2 * np.pi * t / period)))
        scale = 1.0 if period == 2 else 2.0  # Nyquist: no conjugate pair
        want = scale * np.hypot(c, s) / n
        assert r[col] == pytest.approx(want, rel=1e-9), col
    assert r["dc_mean"] == pytest.approx(float(x.mean()), rel=1e-12)
