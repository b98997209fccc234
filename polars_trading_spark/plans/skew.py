"""Skew-handling utilities.

AQE's skew-join splitting (enabled in ``session.py``) covers joins;
aggregations over a hot key (one symbol carrying half the tape is
normal in market data) need **salted two-phase aggregation**: group by
(key, salt) first — spreading the hot key over N reducers — then
re-aggregate the partials by key.  This works for any algebraic
aggregate; the OHLCV bundle is algebraic end-to-end (min/max/min_by/
max_by/sum/count all merge associatively), so bar pipelines can opt in
when a symbol histogram says so.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_two_phase_agg"]


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "__pts_salt") -> DataFrame:
    """Attach a deterministic salt in [0, buckets) derived from a stable
    row attribute when available, else a random one (aggregation-safe
    either way — the salt only spreads rows, it never joins)."""
    return df.withColumn(col_name, (F.spark_partition_id() + F.monotonically_increasing_id()) % buckets)


def salted_two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    *,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) with ``partial_aggs``,
    then groupBy(keys) with ``final_aggs`` over the partials.

    ``partial_aggs`` must emit the columns ``final_aggs`` consume (the
    usual algebraic split: sum→sum, count→sum, min→min, min_by carries
    its (value, key) pair through).
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__pts_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
