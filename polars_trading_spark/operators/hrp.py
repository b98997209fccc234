"""Hierarchical Risk Parity allocation (AFML ch.16, López de Prado).

HRP sidesteps the instability of mean-variance inversion: cluster the
assets by return correlation (single linkage over the AFML distance
``d = sqrt((1 - rho)/2)``), seriate the covariance into quasi-diagonal
form, then allocate top-down by recursive bisection — each split gets
capital inversely proportional to its cluster variance (computed with
inverse-variance weights within the cluster).  No matrix inversion, no
eigendecomposition, weights strictly positive by construction.

Distributed shape (the part that touches data is fully distributed):
the covariance is the existing pairwise Ledoit-Wolf aggregate
(operators/covariance.py — one pair join + one hash agg over the bar
tape, no driver matrix).  Only the POST-AGGREGATE pair table — N(N+1)/2
rows for an N-symbol universe, data-INDEPENDENT — is collected for the
clustering/bisection, the same bounded-collect pattern as IVF centroid
training (functions/similarity.py): HRP's dendrogram is inherently
O(N^2) state, so the collect is the algorithm's own footprint, not a
shortcut.  A 10k-symbol universe collects ~50M float rows; beyond that
the clustering itself, not Spark, is the binding constraint.

Correctness is pinned two ways: golden tests against closed-form cases
(2-asset HRP == inverse-variance split, uncorrelated-equal-variance ==
equal weights, block-diagonal clusters allocate by analytic bisection,
input-order invariance), and (round 10) a recursive-CTE DuckDB oracle
that replays the linkage/bisection loop over list state
(oracles/portfolio.py::hrp_weights — the sequential_bootstrap replay
pattern), so the driver hash-gates the query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from polars_trading_spark.operators.covariance import ledoit_wolf_cov

__all__ = ["hrp_weights"]


def _single_linkage_order(dist: np.ndarray) -> list[int]:
    """Seriation: single-linkage agglomeration over the distance matrix,
    then left-to-right leaf order of the dendrogram (quasi-diagonalizes
    the covariance).  Deterministic: merge ties break on the smaller
    (i, j) index pair; cluster leaf lists concatenate smaller-index
    cluster first (matching scipy's observation-order convention for
    distinct distances)."""
    n = dist.shape[0]
    if n == 1:
        return [0]
    # active clusters: id -> leaf list; inter-cluster distance = min
    # pairwise leaf distance (single linkage), maintained incrementally
    leaves = {i: [i] for i in range(n)}
    d = dist.astype(float).copy()
    np.fill_diagonal(d, np.inf)
    cd = {}  # (a, b) a < b -> distance between active clusters
    for i in range(n):
        for j in range(i + 1, n):
            cd[(i, j)] = d[i, j]
    next_id = n
    while len(leaves) > 1:
        (a, b), _ = min(cd.items(), key=lambda kv: (kv[1], kv[0]))
        merged = leaves[a] + leaves[b]
        del leaves[a], leaves[b]
        # distances from the new cluster to every survivor
        new = {}
        for c in leaves:
            da = cd[(min(a, c), max(a, c))]
            db = cd[(min(b, c), max(b, c))]
            new[c] = min(da, db)
        cd = {
            (i, j): v
            for (i, j), v in cd.items()
            if i not in (a, b) and j not in (a, b)
        }
        for c, v in new.items():
            cd[(min(c, next_id), max(c, next_id))] = v
        leaves[next_id] = merged
        next_id += 1
    return leaves[next_id - 1]


def _bisect_allocate(cov: np.ndarray, order: list[int]) -> np.ndarray:
    """AFML snippet 16.4: recursive bisection over the seriated order.
    Cluster variance uses inverse-variance weights within the cluster;
    the split factor is ``alpha = 1 - V_left / (V_left + V_right)``."""

    def cluster_var(items: list[int]) -> float:
        sub = cov[np.ix_(items, items)]
        ivp = 1.0 / np.diag(sub)
        ivp /= ivp.sum()
        return float(ivp @ sub @ ivp)

    w = np.ones(cov.shape[0])
    stack = [order]
    while stack:
        items = stack.pop()
        if len(items) < 2:
            continue
        half = len(items) // 2
        left, right = items[:half], items[half:]
        vl, vr = cluster_var(left), cluster_var(right)
        alpha = 1.0 - vl / (vl + vr)
        w[left] *= alpha
        w[right] *= 1.0 - alpha
        stack.extend((left, right))
    return w


def hrp_weights(
    bars: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    use_shrunk: bool = True,
) -> DataFrame:
    """Hierarchical Risk Parity weights from per-bar log returns.

    Returns one row per symbol: ``symbol, weight, seriation_rank,
    variance`` — weights sum to 1 and are strictly positive;
    ``seriation_rank`` is the quasi-diagonal position (adjacent ranks =
    correlated cluster neighbours).  ``use_shrunk`` selects the
    Ledoit-Wolf shrunk covariance (default; the well-conditioned choice
    AFML pairs HRP with) or the raw sample covariance.

    Raises ``ValueError`` when fewer than 2 symbols survive the
    complete-case alignment of the covariance step.
    """
    cov_col = "cov_shrunk" if use_shrunk else "cov_sample"
    pairs = (
        ledoit_wolf_cov(
            bars, symbol_col=symbol_col, ts_col=ts_col, close_col=close_col
        )
        .select("sym_a", "sym_b", cov_col)
        .collect()
    )
    syms = sorted({r["sym_a"] for r in pairs} | {r["sym_b"] for r in pairs})
    n = len(syms)
    if n < 2:
        raise ValueError(f"HRP needs >= 2 aligned symbols, got {n}")
    idx = {s: i for i, s in enumerate(syms)}
    cov = np.zeros((n, n))
    for r in pairs:
        i, j = idx[r["sym_a"]], idx[r["sym_b"]]
        cov[i, j] = cov[j, i] = float(r[cov_col])
    sd = np.sqrt(np.diag(cov))
    if np.any(sd <= 0):
        raise ValueError("HRP needs strictly positive per-symbol variance")
    corr = cov / np.outer(sd, sd)
    corr = np.clip(corr, -1.0, 1.0)
    dist = np.sqrt(np.maximum(0.0, (1.0 - corr) / 2.0))

    order = _single_linkage_order(dist)
    w = _bisect_allocate(cov, order)
    w = w / w.sum()

    rank = {item: k for k, item in enumerate(order)}
    rows = [
        (syms[i], float(w[i]), int(rank[i]), float(cov[i, i])) for i in range(n)
    ]
    spark = bars.sparkSession
    return spark.createDataFrame(
        rows, "symbol string, weight double, seriation_rank int, variance double"
    )
