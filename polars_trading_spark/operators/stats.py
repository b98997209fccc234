"""Distribution diagnostics: exact group quantiles and key-skew
profiling.

Two engine-room operators every 100 TB pipeline leans on:

* ``quantile_profile`` — EXACT count-based quantiles per group (the
  ``var_cvar``/``funnel_latency`` convention: the k-th smallest value
  with k computed in integer arithmetic, ties broken deterministically)
  — sizing shuffle partitions, clipping outliers, building sampling
  strata.  Spark's ``approx_percentile`` is the approximate cousin;
  this is the reproducible one the differential oracle can replay.
* ``key_skew_profile`` — the heavy-hitter report behind every "why is
  this join slow" investigation: top-k keys by row count, each key's
  share, and the max/mean skew ratio that decides whether a join needs
  salting or AQE skew handling (SCALING.md's own tuning rules).

Both are one hash aggregate + one bounded selection — no Python, no
global sort over raw rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quantile_profile", "key_skew_profile"]


def quantile_profile(
    df: DataFrame,
    value_col: str,
    *,
    by: str | Sequence[str],
    percents: Sequence[int] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """Exact percentiles of ``value_col`` per ``by`` group.

    Percentile p selects the ``ceil(p/100 * n)``-th smallest value —
    computed as ``(p*n + 99) // 100`` in INTEGER arithmetic (float
    ``ceil(0.9*n)`` rounds 27.000000000000004 up; the integer form
    cannot).  Ties order by the value itself, so the selected rows are
    engine-deterministic.  Null values are excluded; groups with no
    non-null rows emit no row.

    Output: ``by`` columns, ``n``, then one ``p<percent>`` column per
    requested percent.

    Shape: one group exchange, a rank window and ONE conditional
    aggregate — the selection never sorts more than the group needs,
    and adding a percentile adds a column, not a pass.
    """
    ps = sorted(set(int(p) for p in percents))
    if not ps or ps[0] < 1 or ps[-1] > 100:
        raise ValueError(f"percents must be in [1, 100], got {percents}")
    by_cols = [by] if isinstance(by, str) else list(by)

    v = F.col(value_col)
    t = df.where(v.isNotNull())
    w_ord = Window.partitionBy(*by_cols).orderBy(v.asc())
    w_all = Window.partitionBy(*by_cols)
    ranked = t.select(
        *by_cols,
        v.alias("__v"),
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    aggs = [F.max("__n").cast("long").alias("n")]
    for p in ps:
        # integer ceil(p/100 * n): exact for any n a long can hold
        k = F.floor((F.lit(p) * F.col("__n") + 99) / 100).cast("long")
        aggs.append(
            F.max(F.when(F.col("__rn") == k, F.col("__v"))).alias(f"p{p}")
        )
    return ranked.groupBy(*by_cols).agg(*aggs)


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    *,
    top_k: int = 10,
) -> DataFrame:
    """Heavy-hitter / skew report for a prospective join or group key.

    Output: the ``top_k`` keys by row count — ``rank, key (as string),
    n_rows, share`` (fraction of all rows), plus the global context on
    every row: ``n_keys`` (distinct), ``total_rows``, and
    ``skew_ratio`` = max key count / mean key count (1.0 = perfectly
    uniform; SCALING.md's salting guidance kicks in around ~8-10 on a
    32-way shuffle).  Null keys count as a key (they hash to one
    partition too — often the worst hitter).

    Shape: one (key) hash aggregate, a distributed
    ``TakeOrderedAndProject`` for the top-k (never a global sort), and
    a broadcast one-row totals frame; the rank window runs on the
    collapsed k rows.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.count(F.lit(1)).alias("__nk"),
        F.sum("n_rows").alias("__tot"),
        F.max("n_rows").alias("__mx"),
    )
    top = (
        counts.orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
        .limit(top_k)
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.row_number().over(w).cast("int").alias("rank"),
            "key",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_rows") / F.col("__tot")).alias("share"),
            F.col("__nk").cast("long").alias("n_keys"),
            F.col("__tot").cast("long").alias("total_rows"),
            (
                F.col("__mx") / (F.col("__tot") / F.col("__nk").cast("double"))
            ).alias("skew_ratio"),
        )
    )
