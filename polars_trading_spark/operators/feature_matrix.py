"""ML feature-matrix assembly: the end-to-end "dataset builder" a user
of the reference library would run before training.

Composes the round-3 feature operators over one bar frame into a single
wide table per (symbol, bar): range-volatility estimators
(operators/volatility.py), microstructure liquidity features
(operators/microstructure.py), and a supervised target — the forward
next-bar log return and its sign.

Shape: the feature operators are window pipelines over the SAME
(symbol, ts) ordering, so the assembly joins co-partitioned frames on
their grain keys — with bucketed bar storage (sinks.write_bucketed)
those joins are Exchange-free; on a cold frame they share one hash
partitioning.  The label is one more lead() on the shared ordering.
No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark.operators.microstructure import microstructure_features
from polars_trading_spark.operators.volatility import bar_volatility

__all__ = ["bar_feature_matrix"]


def bar_feature_matrix(
    bars: DataFrame,
    *,
    window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Wide per-bar feature matrix + forward-return target.

    Returns ``symbol, ts, vol_* (5), roll_measure, kyle_lambda, amihud,
    fwd_return, label``; feature columns are null until their rolling
    windows fill, ``fwd_return``/``label`` are null on each symbol's
    last bar.
    """
    vol = bar_volatility(bars, window=window, symbol_col=symbol_col, ts_col=ts_col,
                         close_col=close_col)
    micro = microstructure_features(bars, window=window, symbol_col=symbol_col,
                                    ts_col=ts_col, close_col=close_col)
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    c = F.col(close_col)
    target = bars.select(
        symbol_col,
        ts_col,
        F.log(F.lead(c).over(order) / c).alias("fwd_return"),
    ).withColumn("label", F.signum("fwd_return") + F.lit(0.0))

    keys = [symbol_col, ts_col]
    return vol.join(micro, on=keys).join(target, on=keys)
