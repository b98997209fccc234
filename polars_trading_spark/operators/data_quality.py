"""Tick-tape data quality and universe summaries.

Before any operator in this package touches a tape, a production
pipeline validates it; these two run that validation *inside* the
engine, as ordinary aggregates:

* ``tick_quality`` — per (symbol, day): duplicate-timestamp count,
  non-positive prices/sizes, extreme one-tick jumps (|log return| above
  a threshold), the largest intra-day quiet gap, and an overall
  ``clean`` verdict.  The per-day grain is deliberate: it is the
  partition grain the bar operators consume, so a dirty day can be
  quarantined without rescanning history.
* ``universe_summary`` — per symbol: listing span, active days, trade
  counts, average daily volume/dollar volume, mean price.  The screen
  behind "which symbols are liquid enough to model".

Both are single hash aggregates over one window pass — no joins, no
Python, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL, with_seq
from polars_trading_spark.config import column_names

__all__ = ["tick_quality", "universe_summary", "hampel_filter"]


def tick_quality(
    df: DataFrame,
    *,
    max_abs_ret: float = 0.2,
    max_gap: str = "1h",
) -> DataFrame:
    """Per-(symbol, day) tape validation report.

    Output: ``symbol, day, n_trades, n_dup_ts, n_bad_price,
    n_bad_size, n_jumps, max_gap_s, clean`` — ``clean`` is true when
    every defect count is zero and no quiet gap exceeds ``max_gap`` (Polars-style duration, e.g. "1h").
    Column names follow the ``Config`` convention.
    """
    if max_abs_ret <= 0:
        raise ValueError(f"max_abs_ret must be positive, got {max_abs_ret}")

    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    from polars_trading_spark._utils import parse_duration

    limit_s = parse_duration(max_gap)[0] / 1e6

    t = with_seq(df)
    day = F.to_date(ts)
    order = Window.partitionBy(symbol, day).orderBy(ts, SEQ_COL)
    prev_ts = F.lag(F.col(ts)).over(order)
    prev_p = F.lag(F.col(price)).over(order)
    ret = F.when(
        (F.col(price) > 0) & (prev_p > 0), F.abs(F.log(F.col(price) / prev_p))
    )
    gap = F.col(ts).cast("double") - prev_ts.cast("double")
    dup = F.when(F.col(ts) == prev_ts, 1)
    staged = t.select(
        F.col(symbol),
        day.alias("day"),
        F.col(price).alias("__p"),
        F.col(size).alias("__s"),
        dup.alias("__dup"),
        ret.alias("__ret"),
        gap.alias("__gap"),
    )
    g = staged.groupBy(symbol, "day").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.count("__dup").cast("long").alias("n_dup_ts"),
        F.count(F.when(F.col("__p").isNull() | (F.col("__p") <= 0), 1))
        .cast("long")
        .alias("n_bad_price"),
        F.count(F.when(F.col("__s").isNull() | (F.col("__s") <= 0), 1))
        .cast("long")
        .alias("n_bad_size"),
        F.count(F.when(F.col("__ret") > float(max_abs_ret), 1))
        .cast("long")
        .alias("n_jumps"),
        F.max("__gap").alias("max_gap_s"),
    )
    clean = (
        (F.col("n_dup_ts") == 0)
        & (F.col("n_bad_price") == 0)
        & (F.col("n_bad_size") == 0)
        & (F.col("n_jumps") == 0)
        & (F.coalesce(F.col("max_gap_s"), F.lit(0.0)) <= F.lit(float(limit_s)))
    )
    return g.select(
        F.col(symbol),
        "day",
        F.col("n_trades").cast("long").alias("n_trades"),
        "n_dup_ts",
        "n_bad_price",
        "n_bad_size",
        "n_jumps",
        "max_gap_s",
        clean.alias("clean"),
    )


def universe_summary(df: DataFrame) -> DataFrame:
    """Per-symbol listing/liquidity screen.

    Output: ``symbol, first_ts, last_ts, active_days, n_trades,
    avg_daily_volume, avg_daily_dollar_volume, mean_price`` (simple
    mean; the dollar-volume figures are the liquidity screen inputs).

    The dollar-volume and mean-price sums add O(1e9)-magnitude float
    terms over unbounded per-symbol histories, so they are folded as
    ORDER-DETERMINISTIC running sums over (ts, seq) read at the
    partition's last row — an unordered hash-agg sum's fold order
    varies with partition layout and flips round-to-6 knife edges
    between engines/runs (the round-5 ``vwap_slippage`` failure mode).
    Counts, min/max and the exact integer-valued volume sum are
    order-insensitive and ride the same single window pass.
    """
    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    order_cols = [ts] + ([SEQ_COL] if SEQ_COL in df.columns else [])
    day = F.to_date(ts)
    sz = F.col(size).cast("double")
    w_ord = Window.partitionBy(symbol).orderBy(*order_cols)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(symbol)
    t = df.select(
        F.col(symbol),
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.min(ts).over(w_all).alias("first_ts"),
        F.max(ts).over(w_all).alias("last_ts"),
        F.size(F.collect_set(day).over(w_all)).cast("long").alias("active_days"),
        F.sum(sz).over(w_run).alias("__rvol"),
        F.sum(sz * F.col(price)).over(w_run).alias("__rdvol"),
        F.sum(F.col(price)).over(w_run).alias("__rp"),
    )
    return t.where(F.col("__rn") == F.col("__n")).select(
        F.col(symbol),
        "first_ts",
        "last_ts",
        "active_days",
        F.col("__n").cast("long").alias("n_trades"),
        (F.col("__rvol") / F.col("active_days")).alias("avg_daily_volume"),
        (F.col("__rdvol") / F.col("active_days")).alias("avg_daily_dollar_volume"),
        (F.col("__rp") / F.col("__n")).alias("mean_price"),
    )


def hampel_filter(
    df: DataFrame,
    *,
    window: int = 21,
    k: float = 3.0,
    symbol_col: str | None = None,
    ts_col: str | None = None,
    price_col: str | None = None,
    seq_col: str | None = SEQ_COL,
) -> DataFrame:
    """Hampel outlier filter — the standard robust tick scrubber: flag a
    price whose deviation from the centered ``window``-tick rolling
    median exceeds ``k`` scaled rolling MADs (median absolute
    deviation, Gaussian-consistent scale 1.4826), and offer the median
    as the cleaned value.  Mean/std filters chase the very outliers
    they should remove; the median/MAD pair has a 50% breakdown point.

    Appends ``rolling_median``, ``rolling_mad`` (null until the
    centered window is full — shrunken edge windows give noisy
    medians), ``is_outlier`` (false on partial windows) and
    ``price_clean`` (median where flagged, else the price).

    The MAD is the CANONICAL Hampel estimator — the median of each
    window member's deviation from the CENTER window's median,
    ``median_j(|x_j - med_t|)`` — not the staged approximation
    ``median_j(|x_j - med_j|)`` that naive window composition gives.
    A window aggregate cannot nest inside another window, so the
    center's median is staged as a real column and the exact MAD is
    read as the middle element of the sorted per-window deviation
    array (odd ``window`` makes the median interpolation-free).

    Scale/determinism shape: two bounded centered frames (NOT the
    quadratic unbounded-following shape — a ±h row frame is a sliding
    buffer) over ONE symbol exchange; the deviation array is
    ``window``-sized per row (21 doubles by default — a bounded
    constant, not data-sized).  ``percentile`` / ``quantile_cont`` are
    the same exact quantile on both engines, and the outlier comparison
    rounds both sides to 9 so a 1-ulp MAD difference cannot flip the
    flag.  Zero joins, zero Python.
    """
    if window < 3 or window % 2 == 0:
        raise ValueError(f"window must be an odd int >= 3, got {window}")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    symbol = symbol_col or column_names.symbol
    ts = ts_col or column_names.timestamp
    price = price_col or column_names.price
    h = window // 2
    order = [F.col(ts)] + ([F.col(seq_col)] if seq_col else [])
    w = (
        Window.partitionBy(symbol)
        .orderBy(*order)
        .rowsBetween(-h, h)
    )
    staged = (
        df.withColumn("__hn", F.count(F.lit(1)).over(w))
        .withColumn("__med", F.expr(f"percentile({price}, 0.5)").over(w))
        .withColumn("__vals", F.collect_list(F.col(price)).over(w))
    )
    staged = staged.withColumn("__dev", F.abs(F.col(price) - F.col("__med")))
    # canonical MAD: middle element of the sorted |x_j - med_t| array
    # (F.get is 0-based and null — not an ANSI error — on short edge
    # windows, which the full-window gate masks anyway)
    staged = staged.withColumn(
        "__mad",
        F.get(
            F.array_sort(
                F.transform("__vals", lambda v: F.abs(v - F.col("__med")))
            ),
            F.lit(h),
        ),
    ).drop("__vals")
    full = F.col("__hn") == window
    scale = 1.4826 * float(k)
    flag = full & (
        F.round(F.col("__dev"), 9) > F.round(F.lit(scale) * F.col("__mad"), 9)
    )
    return (
        staged.withColumn("rolling_median", F.when(full, F.col("__med")))
        .withColumn("rolling_mad", F.when(full, F.col("__mad")))
        .withColumn("is_outlier", flag)
        .withColumn(
            "price_clean", F.when(flag, F.col("__med")).otherwise(F.col(price))
        )
        .drop("__hn", "__med", "__dev", "__mad")
    )
