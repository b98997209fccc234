"""Trend-scanning labels (AFML ch.5, López de Prado 2018).

For every observation, fit an OLS trend ``price ~ a + b*x`` over each
forward span ``l`` in ``[min_span, max_span]``, take the span whose
slope t-statistic has the largest magnitude, and label with its sign.
This is the reference's labeling family taken one step further — the
reference ships fixed-horizon and triple-barrier labels
(polars_trading/labels/labels.py:31-110, dynamic_labels.py:173-246);
trend-scanning removes the horizon hyperparameter by scanning it.

Shape: each row reads its forward prices once via ``lead(price, k)``
(k < max_span) inside ONE (symbol)-partitioned window pass.  The
regression statistics per span are prefix sums of that forward vector:

    Sy(l)  = Sy(l-1)  + p[l-1]
    Syy(l) = Syy(l-1) + p[l-1]^2
    Sxy(l) = Sxy(l-1) + (l-1)*p[l-1]

with ``Sx = l(l-1)/2`` / ``Sxx = (l-1)l(2l-1)/6`` as literals, and
slope, variance and t-value in closed form.

Why an Arrow numpy kernel and not Column algebra: as expressions, the
Sy/Syy/Sxy chains re-embed into every candidate's slope/SSE/t (no
cross-Project CSE) — an O(spans^2 * span) interpreted tree per row,
measured 136s at 100k rows vs ~1s for sibling operators.  The same
math is three row-wise ``np.cumsum`` prefixes plus flat elementwise
algebra, and numpy's sequential accumulation has EXACTLY the
left-associated float semantics of the SQL oracle's generated chains —
every t-value is bitwise equal on both engines, so the kernel also
performs the argmax-|t| span selection (ties to the shortest span) with
no rounding defence needed; the winning end-timestamp is picked
natively from the ``lead(ts)`` columns by the chosen span.  One window
pass, one Arrow round trip, no joins, no extra shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["trend_scanning_labels"]


def _trend_kernel(min_span: int, max_span: int):
    """Forward-price matrix -> (t-value, span) of the strongest trend;
    nulls where no span has a complete window and positive residual
    variance."""
    spans = np.arange(min_span, max_span + 1)

    @F.pandas_udf("tval double, span int")
    def kernel(prices: pd.Series) -> pd.DataFrame:
        m = np.array(prices.tolist(), dtype=np.float64)  # rows x max_span
        if m.ndim != 2 or m.shape[0] == 0:
            return pd.DataFrame({"tval": [], "span": []})
        k = np.arange(m.shape[1], dtype=np.float64)
        c1 = np.cumsum(m, axis=1)
        c2 = np.cumsum(m * m, axis=1)
        c3 = np.cumsum(m * k, axis=1)
        tvals = np.empty((m.shape[0], len(spans)), dtype=np.float64)
        for i, l in enumerate(spans):
            n = float(l)
            sx = l * (l - 1) / 2.0
            sxx = (l - 1) * l * (2 * l - 1) / 6.0
            sy, syy, sxy = c1[:, l - 1], c2[:, l - 1], c3[:, l - 1]
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            intercept = (sy - slope * sx) / n
            with np.errstate(invalid="ignore", divide="ignore"):
                sse = np.maximum(syy - intercept * sy - slope * sxy, 0.0)
                se2 = (sse / (n - 2.0)) / (sxx - sx * sx / n)
                t = slope / np.sqrt(se2)
            t[~(se2 > 0)] = np.nan
            tvals[:, i] = t
        valid = ~np.isnan(tvals)
        any_valid = valid.any(axis=1)
        masked = np.where(valid, np.abs(tvals), -np.inf)
        idx = np.argmax(masked, axis=1)  # first max -> smallest span on ties
        rows = np.arange(m.shape[0])
        tval = pd.Series(tvals[rows, idx], dtype="Float64")
        span = pd.Series(spans[idx], dtype="Int32")
        tval[~any_valid] = pd.NA
        span[~any_valid] = pd.NA
        return pd.DataFrame({"tval": tval, "span": span})

    return kernel


def trend_scanning_labels(
    df: DataFrame,
    *,
    min_span: int = 5,
    max_span: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
) -> DataFrame:
    """Label each row with the sign of the strongest forward OLS trend.

    Returns ``symbol, ts_event, t1, span, tval, label`` where ``t1`` is
    the end timestamp of the winning span, ``tval`` its slope
    t-statistic, and ``label`` its sign.  Rows too close to the end of a
    series for even ``min_span`` get nulls.
    """
    if min_span < 3:
        raise ValueError(f"min_span must be >= 3 (t-stat needs l-2 dof), got {min_span}")
    if max_span < min_span:
        raise ValueError(f"max_span ({max_span}) < min_span ({min_span})")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    p0 = F.col(price_col).cast("double")
    spans = list(range(min_span, max_span + 1))

    leads = [p0] + [F.lead(p0, k).over(order) for k in range(1, max_span)]
    ts_leads = [F.lead(ts_col, l - 1).over(order) for l in spans]

    base = df.select(
        symbol_col,
        ts_col,
        F.array(*leads).alias("__fwd"),
        F.array(*ts_leads).alias("__ends"),
    )
    # Round 14 (guide §2.5/§2.6): same rebalance as sadf — the lead
    # window leaves at most n_symbols-way parallelism for the kernel;
    # kernel rows are independent, so spread them when the source is a
    # small single-split scan (no-op shape at real scale).
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < min(sc.defaultParallelism, 8):
        base = base.repartition(sc.defaultParallelism)
    kernel = _trend_kernel(min_span, max_span)
    out = base.withColumn("__r", kernel("__fwd"))
    span = F.col("__r.span")
    tval = F.col("__r.tval")
    return out.select(
        symbol_col,
        ts_col,
        F.element_at("__ends", span - min_span + 1).alias("t1"),
        span.cast("int").alias("span"),
        tval.alias("tval"),
        # ``+ 0.0`` maps IEEE signum(-0.0) = -0.0 onto the oracle's 0.0
        (F.signum(tval) + F.lit(0.0)).alias("label"),
    )
