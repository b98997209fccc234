"""Hierarchical Risk Parity golden tests (operators/hrp.py).

No SQL oracle exists for HRP (iterative linkage/bisection), so these
closed-form anchors ARE the correctness gate:

* 2 assets        -> HRP == the inverse-variance split, exactly
* orthogonal equal-norm returns -> equal weights (cov is c*I exactly)
* two tight clusters -> seriation puts them adjacent, the top split is
  the analytic inverse-cluster-variance allocation, and the within-
  cluster split is inverse-variance
* invariants: weights > 0, sum to 1, deterministic across calls and
  input row order
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from polars_trading_spark.config import Config
from polars_trading_spark.operators.hrp import (
    _bisect_allocate,
    _single_linkage_order,
    hrp_weights,
)

BASE = dt.datetime(2024, 1, 2, 9, 30)


def _bars_from_returns(spark, returns: dict[str, list[float]]):
    """Build a bar frame whose per-symbol log returns equal `returns`
    (prices = 100 * exp(cumsum(r)), plus the seed bar)."""
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


def _pop_var(xs) -> float:
    x = np.asarray(xs, dtype=float)
    x = x - x.mean()
    return float((x * x).mean())


def test_hrp_two_assets_is_inverse_variance(spark):
    rng = np.random.RandomState(3)
    ra = (rng.normal(0, 0.01, 24)).tolist()
    rb = (rng.normal(0, 0.03, 24)).tolist()
    bars = _bars_from_returns(spark, {"A": ra, "B": rb})
    w = {r["symbol"]: r["weight"] for r in
         hrp_weights(bars, use_shrunk=False).collect()}
    va, vb = _pop_var(ra), _pop_var(rb)
    assert w["A"] == pytest.approx(vb / (va + vb), rel=1e-9)
    assert w["B"] == pytest.approx(va / (va + vb), rel=1e-9)


def test_hrp_orthogonal_equal_norm_is_equal_weight(spark):
    # 4 non-constant rows of an 8x8 Sylvester-Hadamard matrix: zero
    # mean, mutually orthogonal, equal norm -> sample cov = c*I exactly
    h2 = np.array([[1, 1], [1, -1]])
    h8 = np.kron(np.kron(h2, h2), h2).astype(float)
    rows = h8[[1, 2, 4, 7]] * 0.01
    bars = _bars_from_returns(
        spark, {f"S{i}": rows[i].tolist() for i in range(4)}
    )
    out = hrp_weights(bars, use_shrunk=False).collect()
    for r in out:
        assert r["weight"] == pytest.approx(0.25, rel=1e-9)


def test_hrp_clusters_seriate_and_allocate_analytically(spark):
    # A~B tight cluster, C~D tight cluster, clusters orthogonal
    h2 = np.array([[1, 1], [1, -1]])
    h8 = np.kron(np.kron(h2, h2), h2).astype(float)
    u, v, e1, e2 = h8[1], h8[2], h8[4], h8[7]  # orthogonal, norm^2 = 8
    ra = 0.010 * u
    rb = 0.010 * u + 0.002 * e1      # corr(A,B) ~ 0.98
    rc = 0.020 * v
    rd = 0.020 * v + 0.004 * e2
    bars = _bars_from_returns(
        spark,
        {"A": ra.tolist(), "B": rb.tolist(), "C": rc.tolist(), "D": rd.tolist()},
    )
    out = {r["symbol"]: r for r in hrp_weights(bars, use_shrunk=False).collect()}
    ranks = {s: out[s]["seriation_rank"] for s in "ABCD"}
    # cluster members adjacent after seriation
    assert abs(ranks["A"] - ranks["B"]) == 1
    assert abs(ranks["C"] - ranks["D"]) == 1
    # within-cluster split is exactly inverse-variance
    va, vb = _pop_var(ra), _pop_var(rb)
    vc, vd = _pop_var(rc), _pop_var(rd)
    wa, wb = out["A"]["weight"], out["B"]["weight"]
    wc, wd = out["C"]["weight"], out["D"]["weight"]
    assert wa / wb == pytest.approx(vb / va, rel=1e-9)
    assert wc / wd == pytest.approx(vd / vc, rel=1e-9)
    # the low-variance cluster gets the larger share
    assert wa + wb > wc + wd
    assert wa + wb + wc + wd == pytest.approx(1.0, rel=1e-12)


def test_hrp_invariants_and_determinism(spark):
    rng = np.random.RandomState(11)
    rets = {f"S{i}": rng.normal(0, 0.01 * (i + 1), 30).tolist() for i in range(5)}
    bars = _bars_from_returns(spark, rets)
    out1 = sorted(hrp_weights(bars).collect())
    out2 = sorted(hrp_weights(bars.orderBy(F_rand()).cache()).collect())
    ws = [r["weight"] for r in out1]
    assert all(w > 0 for w in ws)
    assert sum(ws) == pytest.approx(1.0, rel=1e-12)
    assert sorted(r["seriation_rank"] for r in out1) == [0, 1, 2, 3, 4]
    for a, b in zip(out1, out2):
        assert a["symbol"] == b["symbol"]
        assert a["weight"] == pytest.approx(b["weight"], rel=1e-9)


def F_rand():
    from pyspark.sql import functions as F

    return F.rand(42)


def test_hrp_validation(spark):
    with Config(timestamp_column="ts_event_start"):
        one = _bars_from_returns(spark, {"A": [0.01, -0.01, 0.02]})
        with pytest.raises(ValueError, match=">= 2"):
            hrp_weights(one)


def test_single_linkage_and_bisect_kernels():
    # chain distances: 0-1 closest, then {0,1}-2, then 3 farthest
    d = np.array(
        [
            [0.0, 0.1, 0.3, 0.9],
            [0.1, 0.0, 0.35, 0.85],
            [0.3, 0.35, 0.0, 0.8],
            [0.9, 0.85, 0.8, 0.0],
        ]
    )
    order = _single_linkage_order(d)
    assert sorted(order) == [0, 1, 2, 3]
    pos = {x: i for i, x in enumerate(order)}
    assert abs(pos[0] - pos[1]) == 1  # closest pair adjacent
    # identity covariance -> equal weights whatever the order
    w = _bisect_allocate(np.eye(4), [2, 0, 3, 1])
    assert np.allclose(w / w.sum(), 0.25)
