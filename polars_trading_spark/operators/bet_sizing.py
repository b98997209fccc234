"""Bet sizing from signal strength (AFML ch.10).

Converts label-stage outputs into position sizes:

* ``bet_size_from_tstat`` — the sigmoid sizing of AFML 10.3/SNIPPET
  10.4: ``m = t / sqrt(1 + t^2)``, mapping a trend/signal t-statistic
  into (-1, 1) without needing a normal CDF.
* ``average_active_bets`` — AFML 10.2: at each event time, average the
  sizes of ALL bets whose holding interval ``[t0, t1]`` is still open,
  so positions step smoothly instead of whipsawing on every new signal.

Scale shape: averaging active bets is the same horizon-bucketed span
join as ``sample_weights``/``label_concurrency`` — each event explodes
to the horizon-sized time buckets its interval covers, so the join
fan-out is bounded by the holding horizon, never a per-symbol cross
product — followed by one hash aggregate.  No Python anywhere.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_trading_spark._utils import col_or_lit
from polars_trading_spark.operators.sample_weights import _span_join

__all__ = ["bet_size_from_tstat", "average_active_bets"]


def bet_size_from_tstat(tval) -> Column:
    """Sigmoid bet size ``t / sqrt(1 + t^2)`` in (-1, 1) (AFML 10.3)."""
    t = col_or_lit(tval)
    return t / F.sqrt(F.lit(1.0) + t * t)


def average_active_bets(
    events: DataFrame,
    *,
    size_col: str = "bet_size",
    t1_col: str = "t1",
    symbol_col: str = "symbol",
    t0_col: str = "ts_event",
    bucket: str | timedelta | None = "4h",
) -> DataFrame:
    """Average bet size over all concurrently-active events (AFML 10.2).

    ``events`` needs one row per signal with ``[t0_col, t1_col]`` and a
    ``size_col`` in [-1, 1].  Returns ``symbol, ts_event,
    avg_active_bet, n_active`` — one row per event time, averaging every
    event whose interval covers it (inclusive on both ends).  ``bucket``
    bounds the span-join fan-out; pick it at or above the typical
    holding horizon.
    """
    ev = events.select(
        F.col(symbol_col).alias(symbol_col),
        F.col(t0_col).alias("__t0"),
        F.col(t1_col).cast("timestamp").alias("__t1"),
        F.col(size_col).alias("__m"),
    ).where(F.col("__t1").isNotNull() & F.col("__m").isNotNull())

    path = ev.select(symbol_col, F.col("__t0").alias("__pt"))
    spans = ev.select(symbol_col, "__t0", "__t1", "__m")
    joined = _span_join(spans, path, [symbol_col], bucket)
    return joined.groupBy(symbol_col, F.col("__pt").alias(t0_col)).agg(
        F.avg("__m").alias("avg_active_bet"),
        F.count(F.lit(1)).cast("int").alias("n_active"),
    )
