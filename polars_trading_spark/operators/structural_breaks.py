"""Structural breaks: rolling supremum Dickey-Fuller statistic (SADF,
AFML ch.17; Phillips/Wu/Yu 2011 explosive-bubble test).

At each observation, regress ``dy_k = alpha + beta * y_{k-1}`` over the
trailing window of length ``l`` for every ``l`` in ``[min_span,
max_span]`` and take the supremum of beta's t-statistic — values above
the PWY critical surface flag explosive (bubble) regimes.  This is the
lag-0 (plain Dickey-Fuller) member of the ADF family: the augmentation
lags add regressors, not new dataflow shape, and are deliberately out of
scope for the differential gate.

Dataflow twin of ``trend_scan`` mirrored backward: ONE
(symbol)-partitioned window pass materializes the trailing price vector
``y_t, y_{t-1}, ..., y_{t-max_span}`` via ``lag``; an Arrow-batched
numpy kernel computes all window-length t-stats from five row-wise
``np.cumsum`` prefix sums over the **newest-first** matrix (so every
trailing window is a prefix — no suffix/total subtraction whose float
association would diverge from the oracle's chains); the sup selection
is a native rounded ``array_max``.  numpy's sequential row-wise
accumulation reproduces the SQL oracle's left-associated newest-first
chains bit-for-bit, so the rounded argmax key cannot flip between
engines.  No joins, no shuffle beyond the window sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["sadf"]


def _adf_kernel(min_span: int, max_span: int):
    """Trailing-price matrix (newest first, width max_span+1) ->
    per-window-length DF t-stats; NaN where the window is incomplete or
    degenerate."""
    spans = list(range(min_span, max_span + 1))

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def tstats(hist: pd.Series) -> pd.Series:
        m = np.array(hist.tolist(), dtype=np.float64)  # rows x (max_span+1)
        if m.ndim != 2:
            return pd.Series([[] for _ in range(len(hist))])
        y = m[:, :-1]       # y_k   (newest first: y_t ... y_{t-max+1})
        x = m[:, 1:]        # y_{k-1}
        d = y - x           # dy_k
        sx = np.cumsum(x, axis=1)
        sxx = np.cumsum(x * x, axis=1)
        sd = np.cumsum(d, axis=1)
        sxd = np.cumsum(x * d, axis=1)
        sdd = np.cumsum(d * d, axis=1)
        out = np.empty((m.shape[0], len(spans)), dtype=np.float64)
        for i, l in enumerate(spans):
            n = float(l)
            a, b, c, e, g = sx[:, l - 1], sxx[:, l - 1], sd[:, l - 1], sxd[:, l - 1], sdd[:, l - 1]
            denom = n * b - a * a
            with np.errstate(invalid="ignore", divide="ignore"):
                beta = (n * e - a * c) / denom
                alpha = (c - beta * a) / n
                sse = np.maximum(g - alpha * c - beta * e, 0.0)
                se2 = (sse / (n - 2.0)) / (b - a * a / n)
                t = beta / np.sqrt(se2)
            t[~(se2 > 0) | ~(np.abs(denom) > 0)] = np.nan
            out[:, i] = t
        return pd.Series(list(out))

    return tstats


def sadf(
    df: DataFrame,
    *,
    min_span: int = 10,
    max_span: int = 40,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
) -> DataFrame:
    """Rolling sup-DF statistic per observation.

    Returns ``symbol, ts_event, sadf_stat, sadf_span`` where
    ``sadf_stat`` is the supremum trailing DF t-statistic (rounded 6dp —
    the argmax key) and ``sadf_span`` the window length attaining it.
    Rows with fewer than ``min_span + 1`` preceding observations get
    nulls.
    """
    if min_span < 3:
        raise ValueError(f"min_span must be >= 3, got {min_span}")
    if max_span < min_span:
        raise ValueError(f"max_span ({max_span}) < min_span ({min_span})")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    p0 = F.col(price_col).cast("double")
    hist = [p0] + [F.lag(p0, k).over(order) for k in range(1, max_span + 1)]

    base = df.select(symbol_col, ts_col, F.array(*hist).alias("__hist"))
    kernel = _adf_kernel(min_span, max_span)
    base = base.withColumn("__ts", kernel("__hist"))

    spans = list(range(min_span, max_span + 1))
    candidates: list[Column] = []
    for i, l in enumerate(spans):
        raw = F.element_at("__ts", i + 1)
        stat = F.round(raw, 6) + F.lit(0.0)
        candidates.append(
            F.when(
                raw.isNotNull() & ~F.isnan(raw),
                F.struct(
                    stat.alias("stat"),
                    F.lit(-l).alias("neg_span"),
                ),
            )
        )
    best = F.array_max(F.array(*candidates))
    return base.withColumn("__best", best).select(
        symbol_col,
        ts_col,
        F.col("__best.stat").alias("sadf_stat"),
        (-F.col("__best.neg_span")).cast("int").alias("sadf_span"),
    )
