"""Fractional differentiation (FFD) feature.

Reference: polars_trading/features/frac_diff.py + the Rust kernel
src/frac_diff.rs:7-59.  The kernel computes fixed-width-window
fractional differencing: weights ``w_k = -w_{k-1}/k · (d - k + 1)``
accumulated until ``|w| < threshold`` (driver-side, pure Python), then
each output value is the dot product of the weights against the
trailing K prices; the first K-1 rows are null.

Spark-first: the dot product is a linear combination of ``lag`` columns
over the per-symbol time window — fully native, whole-stage codegen, no
Python at execution time.  ``lag(price, k)`` is null before the series
start, which nulls the whole sum — exactly the kernel's first-K-1-rows
contract.  The kernel hard-errors on null prices (src/frac_diff.rs:36-39);
we enforce the same contract with a ``raise_error`` guard on the input
column, so a caller who forgets ``na.drop`` gets the kernel's error, not
silent nulls.

The terms are summed in ascending-k order with left-associated adds so
results are bit-identical to any oracle that evaluates the same
left-to-right sum (DuckDB SQL ``+`` is left-associative).
"""

from __future__ import annotations

import operator
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import col_or_lit

__all__ = ["get_weights_ffd", "frac_diff", "frac_diff_sql_expr"]


def get_weights_ffd(d: float, threshold: float) -> list[float]:
    """FFD weights, ``w[0] = 1`` applying to the current row and ``w[k]``
    to lag k (reference src/frac_diff.rs:7-20 builds the reversed list)."""
    w = [1.0]
    k = 1.0
    while True:
        w_next = -w[-1] / k * (d - k + 1.0)
        if abs(w_next) < threshold:
            break
        w.append(w_next)
        k += 1.0
    return w


def frac_diff(
    prices,
    d: float,
    threshold: float,
    symbol=None,
    *,
    order_by: Sequence,
) -> Column:
    """Fractionally differentiated series as a Column expression.

    Raises at execution time on any null input price, matching the
    reference kernel's ComputeError (src/frac_diff.rs:36-39) — lag nulls
    before the series start are legitimate and stay null.
    """
    weights = get_weights_ffd(d, threshold)
    part = [col_or_lit(symbol)] if symbol is not None else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(*[col_or_lit(c) for c in order_by])
    p = col_or_lit(prices)
    checked = F.when(
        p.isNull(),
        F.raise_error(F.lit("frac_diff: input prices contain nulls; drop or fill them first")),
    ).otherwise(p)
    terms = [F.lit(wk) * F.lag(checked, k).over(w) for k, wk in enumerate(weights)]
    return reduce(operator.add, terms)


def frac_diff_sql_expr(
    price_col: str, d: float, threshold: float, window_name: str = "w"
) -> str:
    """The same left-folded linear combination as ANSI SQL (oracle side)."""
    weights = get_weights_ffd(d, threshold)
    terms = [
        f"({wk!r}) * lag({price_col}, {k}) OVER {window_name}"
        for k, wk in enumerate(weights)
    ]
    return " + ".join(terms)
