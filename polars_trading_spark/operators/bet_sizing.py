"""Bet sizing from signal strength (AFML ch.10).

Converts label-stage outputs into position sizes:

* ``bet_size_from_tstat`` — the sigmoid sizing of AFML 10.3/SNIPPET
  10.4: ``m = t / sqrt(1 + t^2)``, mapping a trend/signal t-statistic
  into (-1, 1) without needing a normal CDF.
* ``average_active_bets`` — AFML 10.2: at each event time, average the
  sizes of ALL bets whose holding interval ``[t0, t1]`` is still open,
  so positions step smoothly instead of whipsawing on every new signal.

Scale shape (round 14): averaging active bets is a SWEEP-LINE — the
same +1/-1 boundary trick ``sample_weights`` uses for concurrency,
generalized to a second ±bet-size accumulator, so the covering-set sum
and count at every event time cost O(3·events) rows and ONE per-symbol
ordered window instead of the horizon-bucketed span join they replaced
(the fan-out was events × local overlap — 21 MB shuffled and ~30 s CPU
at sf0.1 for a 3-column output).  No Python anywhere.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import col_or_lit

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
    is retained for API compatibility; the sweep-line form needs no
    fan-out bound (it never materializes the covering pairs).

    Sweep detail: boundary rows +m at ``t0`` (kind 0) and -m just after
    ``t1`` (kind 2) bracket each event-time probe row (kind 1), so both
    interval ends stay inclusive under the (t, kind) sort.  A probe row
    therefore reads the exact covering-set Σm and count off the running
    sums.  Duplicate event times keep the span-join's multiplicity
    semantics: ``n_active`` sums the per-row counts (multiplicity ×
    covering), while the average is multiplicity-invariant.
    """
    ev = events.select(
        F.col(symbol_col).alias(symbol_col),
        F.col(t0_col).alias("__t0"),
        F.col(t1_col).cast("timestamp").alias("__t1"),
        F.col(size_col).alias("__m"),
    ).where(F.col("__t1").isNotNull() & F.col("__m").isNotNull())

    # ONE pass over ``ev`` (a 3-way union would re-execute the upstream
    # signal pipeline once per branch — measured 3x the trend-scan
    # kernel cost at sf0.1): each event explodes to its three sweep
    # rows in the same task.
    def _b(pt, k, d, dm):
        return F.struct(
            pt.alias("__pt"),
            F.lit(k).alias("__k"),
            F.lit(d).alias("__d"),
            dm.alias("__dm"),
        )

    boundaries = ev.select(
        symbol_col,
        F.explode(
            F.array(
                _b(F.col("__t0"), 0, 1, F.col("__m")),
                _b(F.col("__t1"), 2, -1, -F.col("__m")),
                _b(F.col("__t0"), 1, 0, F.lit(0.0)),
            )
        ).alias("__b"),
    ).select(symbol_col, "__b.*")
    w = (
        Window.partitionBy(symbol_col)
        .orderBy("__pt", "__k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = (
        boundaries
        .select(
            symbol_col,
            "__pt",
            "__k",
            F.sum("__dm").over(w).alias("__sum"),
            F.sum("__d").over(w).alias("__cnt"),
        )
        .where(F.col("__k") == 1)
    )
    return swept.groupBy(symbol_col, F.col("__pt").alias(t0_col)).agg(
        F.avg(F.col("__sum") / F.col("__cnt")).alias("avg_active_bet"),
        F.sum("__cnt").cast("int").alias("n_active"),
    )
