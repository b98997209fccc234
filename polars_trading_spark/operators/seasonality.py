"""Intraday seasonality profile: time-of-day activity and volatility.

Volume and volatility follow a pronounced time-of-day shape (the U
curve); execution schedulers (VWAP/POV), bar-threshold calibration
(volume/dollar bar sizes per session phase) and anomaly detection all
consume this profile.  The reference's bar operators sample *through*
the clock; this operator summarizes the clock itself.

Distributed shape: one per-(symbol, date) lag window for tick returns,
then ONE hash aggregate to (symbol, bucket) and a tiny per-symbol
window for shares — aggregation state is |symbols| × |buckets| rows, so
a 100 TB tape reduces map-side to a few thousand rows regardless of
history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL, with_seq
from polars_trading_spark.config import column_names

__all__ = ["intraday_profile"]


def intraday_profile(df: DataFrame, *, bucket_minutes: int = 60) -> DataFrame:
    """Per-symbol time-of-day profile over ``bucket_minutes`` buckets.

    Output per (symbol, bucket): ``n_trades``, ``volume``,
    ``dollar_volume``, ``volume_share`` (of the symbol's total),
    ``trade_share``, and ``mean_abs_ret`` — the mean absolute tick log
    return of trades in the bucket (returns computed within each
    (symbol, date) island so overnight gaps never contaminate the first
    bucket; the first trade of a day contributes no return).

    Column names follow the ``Config`` convention.  ``bucket`` is the
    0-based index of the trade's minute-of-day divided by
    ``bucket_minutes``.
    """
    if bucket_minutes < 1 or 1440 % bucket_minutes != 0:
        raise ValueError(
            f"bucket_minutes must divide 1440, got {bucket_minutes}"
        )

    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    t = with_seq(df.na.drop(subset=[price]))
    day = F.to_date(ts)
    order = Window.partitionBy(symbol, day).orderBy(ts, SEQ_COL)
    minute_of_day = F.hour(ts) * 60 + F.minute(ts)
    t = t.select(
        F.col(symbol),
        (minute_of_day / bucket_minutes).cast("int").alias("bucket"),
        F.col(size).cast("double").alias("__sz"),
        F.col(price).cast("double").alias("__p"),
        F.abs(F.log(F.col(price) / F.lag(price).over(order))).alias("__ar"),
    )
    g = t.groupBy(symbol, "bucket").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("__sz").alias("volume"),
        F.sum(F.col("__sz") * F.col("__p")).alias("dollar_volume"),
        F.avg("__ar").alias("mean_abs_ret"),
    )
    tot = Window.partitionBy(symbol)
    return g.select(
        F.col(symbol),
        "bucket",
        "n_trades",
        "volume",
        "dollar_volume",
        (F.col("volume") / F.sum("volume").over(tot)).alias("volume_share"),
        (F.col("n_trades") / F.sum("n_trades").over(tot)).alias("trade_share"),
        "mean_abs_ret",
    )
