"""Trend-scanning labels (AFML ch.5, López de Prado 2018).

For every observation, fit an OLS trend ``price ~ a + b*x`` over each
forward span ``l`` in ``[min_span, max_span]``, take the span whose
slope t-statistic has the largest magnitude, and label with its sign.
This is the reference's labeling family taken one step further — the
reference ships fixed-horizon and triple-barrier labels
(polars_trading/labels/labels.py:31-110, dynamic_labels.py:173-246);
trend-scanning removes the horizon hyperparameter by scanning it.

Spark-first design: the naive formulation is a per-row forward
regression (a Python loop over O(n * spans * span_len) points).  Here
each row instead reads its forward prices once via ``lead(price, k)``
(k < max_span) inside ONE window pass, and every regression statistic is
an explicit left-associated incremental sum over those leads:

    Sy(l)  = Sy(l-1)  + p[l-1]
    Syy(l) = Syy(l-1) + p[l-1]^2
    Sxy(l) = Sxy(l-1) + (l-1)*p[l-1]

with ``Sx = l(l-1)/2`` and ``Sxx = (l-1)l(2l-1)/6`` as literals; slope,
variance and t-value follow in closed form.  Deliberately NOT prefix-sum
differences over cumulative columns: those are numerically fine but the
engine's windowed-sum association order is implementation-defined
(segment trees vs running sums), which makes the low bits — and
therefore a rounded argmax key — engine-dependent.  Fixed-shape
expression trees over the raw leads are bitwise reproducible on any
engine, so span selection is exactly portable.

Scale: one hash exchange on ``symbol`` for the window sort; spans add
expressions to the same whole-stage-codegen pass, not stages or joins.
Memory per row is O(max_span) doubles.  Span selection is
``array_max`` over ``struct(|t| rounded, -l, ...)`` — largest |t|,
ties to the shortest span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["trend_scanning_labels"]


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
    t-statistic (rounded to 6dp — the argmax key), and ``label`` its
    sign.  Rows too close to the end of a series for even ``min_span``
    get nulls.
    """
    if min_span < 3:
        raise ValueError(f"min_span must be >= 3 (t-stat needs l-2 dof), got {min_span}")
    if max_span < min_span:
        raise ValueError(f"max_span ({max_span}) < min_span ({min_span})")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    p0 = F.col(price_col).cast("double")

    leads: list[Column] = [p0]
    for k in range(1, max_span):
        leads.append(F.lead(p0, k).over(order))

    candidates: list[Column] = []
    sy: Column = leads[0]
    syy: Column = leads[0] * leads[0]
    sxy: Column = F.lit(0.0)
    for l in range(2, max_span + 1):
        pk = leads[l - 1]
        sy = sy + pk
        syy = syy + pk * pk
        sxy = sxy + F.lit(float(l - 1)) * pk
        if l < min_span:
            continue
        n = float(l)
        sx = l * (l - 1) / 2.0
        sxx = (l - 1) * l * (2 * l - 1) / 6.0
        denom = n * sxx - sx * sx
        slope = (F.lit(n) * sxy - F.lit(sx) * sy) / F.lit(denom)
        intercept = (sy - slope * F.lit(sx)) / F.lit(n)
        sse = F.greatest(syy - intercept * sy - slope * sxy, F.lit(0.0))
        se2 = (sse / F.lit(n - 2.0)) / F.lit(sxx - sx * sx / n)
        # ``+ 0.0`` normalizes IEEE -0.0 (round of a tiny negative) to
        # 0.0 so downstream string-keyed sorts agree across engines.
        tval = F.round(slope / F.sqrt(se2), 6) + F.lit(0.0)
        end_ts = F.lead(ts_col, l - 1).over(order)
        candidates.append(
            F.when(
                pk.isNotNull() & (se2 > 0),
                F.struct(
                    F.abs(tval).alias("abs_t"),
                    F.lit(-l).alias("neg_span"),
                    tval.alias("tval"),
                    end_ts.alias("t1"),
                ),
            )
        )

    best = F.array_max(F.array(*candidates))
    return df.withColumn("__best", best).select(
        symbol_col,
        ts_col,
        F.col("__best.t1").alias("t1"),
        (-F.col("__best.neg_span")).cast("int").alias("span"),
        F.col("__best.tval").alias("tval"),
        F.signum("__best.tval").alias("label"),
    )
