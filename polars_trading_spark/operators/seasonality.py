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


def weekday_effect(
    df: DataFrame,
    *,
    symbol_col: str | None = None,
    ts_col: str | None = None,
    price_col: str | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Day-of-week return seasonality test per symbol — the classic
    calendar-anomaly screen (French 1980, "Stock returns and the
    weekend effect"): daily close-to-close returns bucketed by weekday
    with a one-sample t-statistic per bucket, so a "Monday effect"
    shows up as a |t| worth acting on rather than a bar chart.

    One row per (symbol, weekday): ``weekday`` (0 = Monday .. 6 =
    Sunday, computed as INTEGER epoch-day arithmetic ``(days_since_
    epoch + 3) % 7`` — engine- and locale-independent, never a library
    dayofweek whose origin differs), ``n_days, mean_ret, t_stat``
    (null when fewer than 2 observations or zero variance).

    Scale shape: daily closes via one (symbol, day) hash aggregate
    (``max(struct(ts, seq, price))`` — the ordered-last pick), the
    daily return via one lag over the per-symbol DAY frame (bounded by
    calendar days, not ticks), then per-(symbol, weekday) day-ordered
    moment folds read at the last row.  Zero joins, zero Python.
    """
    from polars_trading_spark._utils import SEQ_COL
    from polars_trading_spark.config import column_names

    sym = symbol_col or column_names.symbol
    ts = ts_col or column_names.timestamp
    price = price_col or column_names.price
    seq = seq_col or (SEQ_COL if SEQ_COL in df.columns else None)

    pick = F.struct(
        F.col(ts),
        *([F.col(seq)] if seq else []),
        F.col(price).cast("double").alias("__px"),
    )
    daily = (
        df.na.drop(subset=[price])
        .groupBy(F.col(sym).alias("symbol"), F.to_date(ts).alias("day"))
        .agg(F.max(pick)["__px"].alias("close"))
    )
    w_day = Window.partitionBy("symbol").orderBy("day")
    daily = daily.select(
        "symbol",
        "day",
        (F.col("close") / F.lag("close").over(w_day) - 1).alias("ret"),
        (
            (F.datediff(F.col("day"), F.lit("1970-01-01")) + 3) % 7
        ).cast("int").alias("weekday"),
    ).where(F.col("ret").isNotNull())
    w = Window.partitionBy("symbol", "weekday").orderBy("day")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("symbol", "weekday")
    g = daily.select(
        "symbol",
        "weekday",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.sum("ret").over(w_run).alias("__s1"),
        F.sum(F.col("ret") * F.col("ret")).over(w_run).alias("__s2"),
    ).where(F.col("__rn") == F.col("__n"))
    n = F.col("__n").cast("double")
    mean = F.col("__s1") / n
    var = (F.col("__s2") - F.col("__s1") * F.col("__s1") / n) / (n - 1)
    ok = (F.col("__n") >= 2) & (var > 0)
    return g.select(
        "symbol",
        "weekday",
        F.col("__n").cast("long").alias("n_days"),
        mean.alias("mean_ret"),
        F.when(ok, mean / F.sqrt(var / n)).alias("t_stat"),
    )
