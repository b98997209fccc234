"""Time-grid upsampling with forward fill (Polars ``upsample`` +
``fill_forward``).

Irregular event series → a regular clock: generate each group's
epoch-aligned grid of ``every``-spaced instants between its first and
last observation, then carry the latest at-or-before row onto every
grid point.  The standard pre-step for joining irregular tapes against
fixed-frequency models, portfolio marks, or feature matrices.

Distributed shape: per-group bounds are one hash aggregate; the grid
is ``explode(sequence(...))`` over integer bucket indices (pure
codegen, fan-out = span/every per group); the fill is the union-marker
as-of join (operators/asof.py) — one shuffle on the group key, running
frames only, zero Python.  Polars runs ``upsample`` single-threaded on
a sorted frame; this shape shards by group and scales with executors.

Input rows must be unique per (group, ``ts_col``) — pre-aggregate
duplicates (e.g. ``max_by(value, seq)``) or the fill value at a tied
instant is engine-dependent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_trading_spark._utils import parse_duration

__all__ = ["upsample_ffill"]


def upsample_ffill(
    df: DataFrame,
    *,
    every: str,
    by: str | Sequence[str] = "symbol",
    ts_col: str = "ts_event",
) -> DataFrame:
    """Regular ``every``-spaced grid per group, epoch-aligned, spanning
    [ceil(first obs), floor(last obs)], with every non-key column
    forward-filled from the latest at-or-before observation.

    Output: ``by`` columns, ``ts_col`` (the grid instant), the filled
    value columns, and ``ts_src`` (the observation timestamp the row
    was filled from — its age is the staleness measure).  Groups whose
    span contains no aligned instant emit no rows.
    """
    from polars_trading_spark.operators.asof import asof_join

    by_cols = [by] if isinstance(by, str) else list(by)
    width_us, weekly = parse_duration(every)
    if weekly:
        raise ValueError("weekly grids are not supported for upsample_ffill")

    us = F.unix_micros(F.col(ts_col))
    bounds = df.groupBy(*by_cols).agg(
        F.min(us).alias("__lo"), F.max(us).alias("__hi")
    )
    # integer ceil/floor of the bucket index; doubles are exact here
    # (epoch micros < 2^53)
    g0 = F.floor((F.col("__lo") + width_us - 1) / width_us).cast("long")
    g1 = F.floor(F.col("__hi") / width_us).cast("long")
    grid = (
        bounds.where(g1 >= g0)
        .select(
            *by_cols,
            F.explode(F.sequence(g0, g1)).alias("__g"),
        )
        .select(
            *by_cols,
            F.timestamp_micros(F.col("__g") * width_us).alias(ts_col),
        )
    )

    right = df.withColumnRenamed(ts_col, "ts_src")
    return asof_join(
        grid,
        right,
        left_on=ts_col,
        right_on="ts_src",
        by=by_cols,
        strategy="backward",
    )
