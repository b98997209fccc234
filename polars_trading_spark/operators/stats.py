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

__all__ = ["quantile_profile", "key_skew_profile", "robust_moments"]


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


def robust_moments(
    df: DataFrame,
    *,
    alpha: float = 0.1,
    group_col: str = "symbol",
    value_col: str = "value",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact trimmed and winsorized moments per group — the robust
    alternative to raw mean/std for outlier-heavy inputs (fat-finger
    ticks, heavy-tailed returns): drop (trim) or clamp (winsorize) the
    lowest and highest ``floor(alpha * n)`` values before the moments.

    Output per group: ``n``, ``n_cut`` (per side), ``trimmed_mean``,
    ``winsor_mean``, ``winsor_std`` (sample); null moments when fewer
    than one value survives the trim.

    Scale/determinism shape: rank values with a total order (value,
    then ``order_cols`` tiebreak), take ONE rank-ordered prefix sum per
    power — the trimmed sum is then the DIFFERENCE of two prefix-sum
    readings (ranks n-k and k) and the winsorized moments add the
    clamp values times k, so every float is a prefix fold in a single
    deterministic order: layout- and engine-independent by
    construction, no unordered reduces at all.  One group exchange,
    windows reuse it, one final aggregate, zero Python.
    """
    if not (0.0 < alpha < 0.5):
        raise ValueError(f"alpha must be in (0, 0.5), got {alpha}")
    v = F.col(value_col)
    order = [v] + [F.col(c) for c in order_cols]
    w_ord = Window.partitionBy(group_col).orderBy(*order)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_full = Window.partitionBy(group_col)
    staged = (
        df.where(v.isNotNull())
        .withColumn("__rn", F.row_number().over(w_ord))
        .withColumn("__s1", F.sum(v).over(w_run))
        .withColumn("__s2", F.sum(v * v).over(w_run))
        # n and k staged as real columns: an aggregate cannot nest inside
        # the conditional aggregates below
        .withColumn("__n", F.count(F.lit(1)).over(w_full))
        .withColumn("__kc", F.floor(F.lit(float(alpha)) * F.col("__n")).cast("long"))
    )
    rn = F.col("__rn")
    kc = F.col("__kc")
    top = F.col("__n") - kc
    agg = staged.groupBy(group_col).agg(
        F.first("__n").cast("long").alias("n"),
        F.first("__kc").alias("__k"),
        # prefix sums at the two cut ranks and the top of the kept range,
        # plus the clamp values at ranks k+1 and n-k
        F.max(F.when(rn == kc, F.col("__s1"))).alias("__s1_k"),
        F.max(F.when(rn == top, F.col("__s1"))).alias("__s1_top"),
        F.max(F.when(rn == kc, F.col("__s2"))).alias("__s2_k"),
        F.max(F.when(rn == top, F.col("__s2"))).alias("__s2_top"),
        F.max(F.when(rn == kc + 1, v)).alias("__lo"),
        F.max(F.when(rn == top, v)).alias("__hi"),
    )
    k = F.col("__k").cast("double")
    nn = F.col("n").cast("double")
    kept = nn - 2.0 * k
    s1_k = F.coalesce("__s1_k", F.lit(0.0))
    s2_k = F.coalesce("__s2_k", F.lit(0.0))
    t1 = F.col("__s1_top") - s1_k
    t2 = F.col("__s2_top") - s2_k
    w1 = t1 + k * F.col("__lo") + k * F.col("__hi")
    w2 = t2 + k * (F.col("__lo") * F.col("__lo")) + k * (F.col("__hi") * F.col("__hi"))
    wvar = (w2 - (w1 * w1) / nn) / (nn - 1.0)
    return agg.select(
        group_col,
        "n",
        F.col("__k").alias("n_cut"),
        F.when(kept >= 1.0, t1 / kept).alias("trimmed_mean"),
        F.when(kept >= 1.0, w1 / nn).alias("winsor_mean"),
        F.when(
            (kept >= 1.0) & (nn >= 2.0), F.sqrt(F.greatest(wvar, F.lit(0.0)))
        ).alias("winsor_std"),
    )
