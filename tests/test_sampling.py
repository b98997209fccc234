"""CUSUM filter: vectorized scan vs naive AFML loop, operator goldens."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from polars_trading_spark.operators.sampling import _cusum_scan, cusum_filter


def _naive(diffs, h):
    """The AFML snippet, verbatim branch order."""
    spos = sneg = 0.0
    idx, side = [], []
    for i, d in enumerate(diffs):
        spos, sneg = max(0.0, spos + d), min(0.0, sneg + d)
        if sneg < -h:
            sneg = 0.0
            idx.append(i)
            side.append(-1)
        elif spos > h:
            spos = 0.0
            idx.append(i)
            side.append(1)
    return idx, side


@pytest.mark.parametrize("seed", range(8))
def test_vectorized_scan_matches_naive_loop(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 6000))
    diffs = rng.normal(0, 1.0, n)
    h = float(rng.uniform(0.5, 5.0))
    idx, side, _, _ = _cusum_scan(diffs, h)
    nidx, nside = _naive(diffs, h)
    assert idx.tolist() == nidx
    assert side.tolist() == nside


def test_scan_crosses_chunk_boundaries():
    # A drift that fires long after the 2048-row chunk edge, with state
    # carried across chunks.
    diffs = np.full(5000, 0.001)
    idx, side, _, _ = _cusum_scan(diffs, 3.0)
    nidx, nside = _naive(diffs, 3.0)
    assert idx.tolist() == nidx and side.tolist() == nside
    assert len(idx) == 1 and side[0] == 1


def test_cusum_filter_golden(spark):
    t0 = dt.datetime(2024, 1, 1)
    prices = [100.0, 103.0, 107.0, 104.0, 99.0, 101.0]
    rows = [("A", t0 + dt.timedelta(minutes=i), p, 1) for i, p in enumerate(prices)]
    df = spark.createDataFrame(
        rows, "symbol string, timestamp timestamp, price double, size long"
    )
    # h=5: +3 +4 -> +7 > 5 fires at idx 2; reset; -3 -5 -> -8 < -5 fires
    # at idx 4; +2 no event.
    out = sorted(cusum_filter(df, 5.0).collect(), key=lambda r: r.timestamp)
    assert [(r.timestamp.minute, r.side) for r in out] == [(2, 1), (4, -1)]


def test_cusum_filter_requires_positive_threshold(spark):
    df = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1), 1.0)],
        "symbol string, timestamp timestamp, price double",
    )
    with pytest.raises(ValueError):
        cusum_filter(df, 0.0)


def test_cusum_filter_no_symbol_column(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0 + dt.timedelta(minutes=i), 100.0 + 10.0 * i) for i in range(4)],
        "timestamp timestamp, price double",
    )
    out = cusum_filter(df, 5.0).collect()
    assert len(out) == 3 and all(r.side == 1 for r in out)
    assert set(out[0].asDict()) == {"timestamp", "side"}
