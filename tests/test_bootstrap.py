"""Golden + property tests for the sequential bootstrap
(operators/bootstrap.py), validated against a direct per-draw loop."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from polars_trading_spark.operators.bootstrap import sequential_bootstrap


def _naive(symbol, t0s, t1s, n_draws):
    """Textbook AFML 4.5.3 loop with A-Res keys, no vectorization."""
    n = len(t0s)
    ends = [max(j for j in range(n) if t0s[j] <= t1s[i]) for i in range(n)]
    c = [0] * n
    picks = []
    for d in range(1, n_draws + 1):
        keys = []
        for i in range(n):
            span = range(i, ends[i] + 1)
            avg_u = sum(1.0 / (1 + c[j]) for j in span) / len(span)
            h = int(hashlib.md5(f"{symbol}|{d}|{i}".encode()).hexdigest()[:15], 16)
            u = (h + 0.5) / float(1 << 60)
            keys.append(math.log(u) / avg_u)
        pick = max(range(n), key=lambda i: (keys[i], -i))
        picks.append(pick)
        for j in range(pick, ends[pick] + 1):
            c[j] += 1
    return picks


@pytest.fixture(scope="module")
def event_pdf():
    rng = np.random.default_rng(17)
    rows = []
    for sym in ("AAA", "BBB"):
        t = pd.Timestamp("2024-03-01")
        for i in range(60):
            t = t + pd.Timedelta(minutes=int(rng.integers(5, 120)))
            rows.append(
                {
                    "symbol": sym,
                    "t0": t,
                    "t1": t + pd.Timedelta(hours=3),
                }
            )
    return pd.DataFrame(rows)


def test_matches_naive_loop(spark, event_pdf):
    out = (
        sequential_bootstrap(spark.createDataFrame(event_pdf), n_draws=25)
        .toPandas()
        .sort_values(["symbol", "draw"])
        .reset_index(drop=True)
    )
    for sym, grp in event_pdf.groupby("symbol"):
        grp = grp.sort_values("t0").reset_index(drop=True)
        picks = _naive(sym, list(grp["t0"]), list(grp["t1"]), 25)
        sub = out[out.symbol == sym]
        assert sub["event_idx"].tolist() == picks
        assert list(sub["t0"]) == [grp["t0"][p] for p in picks]


def test_overlap_downweighted(spark):
    """Ten events stacked on one span vs ten disjoint events: the
    disjoint ones keep full uniqueness and must be drawn more often."""
    base = pd.Timestamp("2024-01-01")
    rows = []
    # Overlapping cluster: all cover each other (1-minute apart, 1-day barrier).
    for i in range(10):
        t = base + pd.Timedelta(minutes=i)
        rows.append({"symbol": "X", "t0": t, "t1": t + pd.Timedelta(days=1)})
    # Disjoint tail: a week apart, barrier shorter than the gap.
    for i in range(10):
        t = base + pd.Timedelta(days=7 * (i + 1))
        rows.append({"symbol": "X", "t0": t, "t1": t + pd.Timedelta(hours=1)})
    out = sequential_bootstrap(spark.createDataFrame(pd.DataFrame(rows)), n_draws=200).toPandas()
    n_overlap = (out["event_idx"] < 10).sum()
    n_disjoint = (out["event_idx"] >= 10).sum()
    assert n_disjoint > n_overlap * 1.5


def test_draw_count_and_validation(spark, event_pdf):
    out = sequential_bootstrap(spark.createDataFrame(event_pdf), n_draws=5).toPandas()
    assert len(out) == 10  # 5 draws x 2 symbols
    assert set(out["draw"]) == {1, 2, 3, 4, 5}
    with pytest.raises(ValueError, match="n_draws"):
        sequential_bootstrap(spark.createDataFrame(event_pdf), n_draws=0)
