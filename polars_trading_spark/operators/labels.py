"""Fixed-time return labels (reference: polars_trading/labels/labels.py).

Expression-level API like the reference: these return a ``Column`` to be
attached with ``withColumn``.  Spark windows need an explicit ordering,
so ``order_by`` replaces Polars' implicit frame order — pass the
timestamp (plus a sequence tiebreaker for duplicate timestamps).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import col_or_lit

__all__ = ["fixed_time_return", "fixed_time_return_classification"]


def _forward_window(symbol, order_by: Sequence) -> Window:
    part = [col_or_lit(symbol)] if symbol is not None else [F.lit(1)]
    return Window.partitionBy(*part).orderBy(*[col_or_lit(c) for c in order_by])


def fixed_time_return(
    prices,
    window: int,
    offset: int = 1,
    symbol=None,
    *,
    order_by: Sequence,
) -> Column:
    """Return from t+offset to t+offset+window (reference labels.py:70-104).

    ``lead(price, offset+window) / lead(price, offset) - 1`` over the
    per-symbol time ordering.  Null when either lead runs off the series.
    """
    p = col_or_lit(prices)
    w = _forward_window(symbol, order_by)
    return F.lead(p, offset + window).over(w) / F.lead(p, offset).over(w) - 1


def _classify_by_threshold(values: Column, threshold) -> Column:
    """Threshold classifier (reference labels.py:15-27): 1 above +thr,
    -1 below -thr, 0 inside [-thr, +thr], NULL otherwise (null input)."""
    if threshold is None:
        return F.signum(values).cast("int")
    thr = F.abs(col_or_lit(threshold))
    return (
        F.when(values > thr, 1)
        .when(values < -thr, -1)
        .when(values.between(-thr, thr), 0)
        .otherwise(F.lit(None))
        .cast("int")
    )


def fixed_time_return_classification(
    prices,
    window: int,
    threshold=None,
    offset: int = 1,
    symbol=None,
    *,
    order_by: Sequence,
) -> Column:
    """Classified fixed-time return (reference labels.py:30-67).

    ``threshold=None`` → sign of the return; otherwise {1, -1, 0, NULL}
    per the threshold classifier.  ``threshold`` may be a per-row column.
    """
    ret = fixed_time_return(prices, window, offset=offset, symbol=symbol, order_by=order_by)
    return _classify_by_threshold(ret, threshold)
