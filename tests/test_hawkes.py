"""Hawkes self-exciting intensity (operators/hawkes.py)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from polars_trading_spark.operators.hawkes import hawkes_intensity


def _trades(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, seq long"
    )


def _naive(times, beta):
    out = []
    for i, t in enumerate(times):
        out.append(sum(math.exp(-beta * (t - s)) for s in times[:i]))
    return out


BASE = dt.datetime(2024, 1, 2, 9, 30, 0)


def test_matches_naive_quadratic_sum(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    # bursty tape: clustered arrivals over ~6 hours, crossing many
    # segment boundaries at beta=0.01 (W=3200s)
    gaps = rng.exponential(60, size=200)
    gaps[50:60] = rng.exponential(2, size=10)  # a burst
    times = list(np.cumsum(gaps))
    rows = [("A", BASE + dt.timedelta(seconds=s), i) for i, s in enumerate(times)]
    beta = 0.01
    out = sorted(
        hawkes_intensity(_trades(spark, rows), beta=beta).collect(),
        key=lambda r: r["seq"],
    )
    # reconstruct the exact event seconds the operator saw (micros/1e6)
    secs = [
        r["ts_event"].timestamp() - rows[0][1].timestamp() + times[0]
        for r in out
    ]
    expect = _naive([s - times[0] for s in secs], beta)
    for r, e in zip(out, expect):
        assert r["intensity"] == pytest.approx(e, rel=1e-9, abs=1e-9), r["seq"]
        assert r["excitation"] == pytest.approx(e / (e + 1), rel=1e-9)


def test_first_event_zero_and_burst_detection(spark):
    rows = [("A", BASE + dt.timedelta(seconds=s), i) for i, s in enumerate(
        [0, 1, 2, 3, 4, 3600, 3601]
    )]
    out = {r["seq"]: r for r in hawkes_intensity(_trades(spark, rows), beta=0.5).collect()}
    assert out[0]["intensity"] == 0.0
    # inside the burst, intensity builds
    assert out[4]["intensity"] > out[1]["intensity"] > 0
    # an hour later the burst has fully decayed
    assert out[5]["intensity"] == pytest.approx(0.0, abs=1e-12)
    assert out[6]["intensity"] == pytest.approx(math.exp(-0.5), rel=1e-9)


def test_symbols_independent(spark):
    rows = [("A", BASE, 0), ("B", BASE + dt.timedelta(seconds=1), 1)]
    out = {r["symbol"]: r for r in hawkes_intensity(_trades(spark, rows), beta=0.1).collect()}
    assert out["A"]["intensity"] == 0.0 and out["B"]["intensity"] == 0.0


def test_validation_and_plan(spark):
    from polars_trading_spark.plans import count_python_stages, unbounded_global_windows

    rows = [("A", BASE, 0)]
    with pytest.raises(ValueError):
        hawkes_intensity(_trades(spark, rows), beta=0.0)
    out = hawkes_intensity(_trades(spark, rows), beta=0.1)
    assert count_python_stages(out) == 0
    assert unbounded_global_windows(out) == []
