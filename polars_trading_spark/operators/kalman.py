"""Kalman-filter hedge ratio for pairs trading.

The classic state-space upgrade of the rolling-OLS hedge (Montana,
Triantafyllopoulos & Tsagaris 2009; Chan, "Algorithmic Trading" ch.3):
model the hedge ratio between two price series as a random walk

    beta_t = beta_{t-1} + w_t,        w_t ~ N(0, Q)
    y_t    = beta_t * x_t + v_t,      v_t ~ N(0, R)

and track it with the scalar Kalman recursion

    P_pred = P + Q
    K      = P_pred * x_t / (x_t^2 * P_pred + R)
    beta   = beta + K * (y_t - beta * x_t)
    P      = (1 - K * x_t) * P_pred

emitting the filtered ``beta_t`` and the innovation ``spread_t = y_t -
beta_pred * x_t`` (the mean-reverting residual the strategy trades).

Distributed shape: the recursion is genuinely sequential **per pair**
— the textbook case for a slim Arrow island.  Pairs are the unit of
parallelism: one ``applyInPandas`` over the (sym_a, sym_b) partition,
a numpy scalar loop inside (O(bars) per pair, no quadratic anything),
and every input column the kernel needs is staged by a
ts-co-partitioned equi-join exactly like ``rolling_pair_correlation``.
At 100 TB the pair count (universe width²) drives parallelism, not
history length.

Determinism: the recursion is a pure function of the ordered (x, y)
sequence and the (Q, R, beta_0, P_0) constants; rows are sorted by
(ts) inside the kernel with a stable sort, so replay is bit-exact on
any partitioning — and the DuckDB oracle replays the identical scalar
recursion with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kalman_hedge"]


def kalman_hedge(
    bars: DataFrame,
    *,
    q: float = 1e-5,
    r: float = 1e-3,
    beta0: float = 0.0,
    p0: float = 1.0,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Filtered hedge ratio and innovation spread for every unordered
    symbol pair (``sym_a < sym_b``; ``sym_a`` is y, ``sym_b`` is x).

    Output: one row per (pair, shared bar) — ``sym_a, sym_b, ts,
    beta, spread`` where ``beta`` is the post-update filtered ratio at
    that bar and ``spread`` the pre-update innovation.
    """
    import numpy as np
    import pandas as pd

    if q <= 0 or r <= 0:
        raise ValueError(f"q and r must be positive, got q={q}, r={r}")
    if p0 <= 0:
        raise ValueError(f"p0 must be positive, got {p0}")

    a = bars.select(
        F.col(symbol_col).alias("sym_a"),
        F.col(ts_col).alias("__ts"),
        F.col(close_col).cast("double").alias("__y"),
    )
    b = bars.select(
        F.col(symbol_col).alias("sym_b"),
        F.col(ts_col).alias("__ts"),
        F.col(close_col).cast("double").alias("__x"),
    )
    joined = (
        a.join(b, on="__ts")
        .where(F.col("sym_a") < F.col("sym_b"))
        # a null on either leg would poison the sequential state (NaN
        # propagates through every later beta) — drop the bar instead
        .where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    )

    qq, rr, b0, pp0 = float(q), float(r), float(beta0), float(p0)
    ts_name = ts_col
    schema = (
        f"sym_a string, sym_b string, {ts_name} timestamp, "
        "beta double, spread double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ts", kind="mergesort").reset_index(drop=True)
        x = pdf["__x"].to_numpy(dtype=np.float64)
        y = pdf["__y"].to_numpy(dtype=np.float64)
        n = len(x)
        beta, p = b0, pp0
        betas = np.empty(n, dtype=np.float64)
        spreads = np.empty(n, dtype=np.float64)
        for i in range(n):
            p_pred = p + qq
            innov = y[i] - beta * x[i]
            gain = p_pred * x[i] / (x[i] * x[i] * p_pred + rr)
            beta = beta + gain * innov
            p = (1.0 - gain * x[i]) * p_pred
            betas[i] = beta
            spreads[i] = innov
        return pd.DataFrame(
            {
                "sym_a": pdf["sym_a"],
                "sym_b": pdf["sym_b"],
                ts_name: pdf["__ts"],
                "beta": betas,
                "spread": spreads,
            }
        )

    return joined.groupBy("sym_a", "sym_b").applyInPandas(kernel, schema=schema)
