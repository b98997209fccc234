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
numpy kernel computes every window-length t-stat from five row-wise
``np.cumsum`` prefix sums over the **newest-first** matrix (so every
trailing window is a prefix — no suffix/total subtraction whose float
association would diverge from the oracle's chains) and takes the sup
in the same pass.  numpy's sequential row-wise accumulation reproduces
the SQL oracle's left-associated newest-first chains bit-for-bit, so
the sup over raw doubles — ties to the shortest window — selects the
identical (stat, span) on both engines with no rounding needed.  No
joins, no shuffle beyond the window sort, and the selection costs one
``argmax`` per row instead of a 31-candidate expression forest
(measured 13s -> ~6s at sf0.1 vs the Column-algebra selection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sadf"]


def _sadf_kernel(min_span: int, max_span: int):
    """Trailing-price matrix (newest first, width max_span+1) ->
    (sup t-stat, winning span); nulls where no window is valid."""
    spans = np.arange(min_span, max_span + 1)

    @F.pandas_udf("stat double, span int")
    def kernel(hist: pd.Series) -> pd.DataFrame:
        m = np.array(hist.tolist(), dtype=np.float64)  # rows x (max_span+1)
        if m.ndim != 2 or m.shape[0] == 0:
            return pd.DataFrame({"stat": [], "span": []})
        y = m[:, :-1]       # y_k   (newest first: y_t ... y_{t-max+1})
        x = m[:, 1:]        # y_{k-1}
        d = y - x           # dy_k
        sx = np.cumsum(x, axis=1)
        sxx = np.cumsum(x * x, axis=1)
        sd = np.cumsum(d, axis=1)
        sxd = np.cumsum(x * d, axis=1)
        sdd = np.cumsum(d * d, axis=1)
        stats = np.empty((m.shape[0], len(spans)), dtype=np.float64)
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
            stats[:, i] = t
        # validity must mirror the oracle's WHERE exactly (NaN = invalid);
        # +/-inf stats, if they ever occur, stay comparable on both sides
        valid = ~np.isnan(stats)
        any_valid = valid.any(axis=1)
        masked = np.where(valid, stats, -np.inf)
        idx = np.argmax(masked, axis=1)  # first max -> smallest span on ties
        rows = np.arange(m.shape[0])
        stat = pd.Series(stats[rows, idx], dtype="Float64")
        span = pd.Series(spans[idx], dtype="Int32")
        stat[~any_valid] = pd.NA
        span[~any_valid] = pd.NA
        return pd.DataFrame({"stat": stat, "span": span})

    return kernel


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
    ``sadf_stat`` is the supremum trailing DF t-statistic and
    ``sadf_span`` the window length attaining it (smallest on ties).
    Rows with fewer than ``min_span`` preceding observations get nulls.
    """
    if min_span < 3:
        raise ValueError(f"min_span must be >= 3, got {min_span}")
    if max_span < min_span:
        raise ValueError(f"max_span ({max_span}) < min_span ({min_span})")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    p0 = F.col(price_col).cast("double")
    hist = [p0] + [F.lag(p0, k).over(order) for k in range(1, max_span + 1)]

    base = df.select(symbol_col, ts_col, F.array(*hist).alias("__hist"))
    kernel = _sadf_kernel(min_span, max_span)
    return base.withColumn("__r", kernel("__hist")).select(
        symbol_col,
        ts_col,
        F.col("__r.stat").alias("sadf_stat"),
        F.col("__r.span").cast("int").alias("sadf_span"),
    )
