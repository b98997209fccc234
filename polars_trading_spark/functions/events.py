"""Event-stream analytics: sessionization, funnels, retention cohorts.

The ``events`` table is a user-action stream (user_id, ts, event_type);
these are the three queries every product-analytics warehouse runs on
such a stream, expressed as window/aggregate algebra:

* ``sessionize``       — gap-based sessions: a new session starts after
  ``gap`` of inactivity.  The classic "flag + running sum over one
  ordered window" formulation — one shuffle on user_id, O(1) state.
* ``event_funnel``     — ordered-step conversion: for each user, the
  earliest timestamp of step k that occurs AFTER the user's step k−1
  time.  k self-joins are avoided: each step is a conditional ``min``
  over the same user partition, computed iteratively on the aggregated
  (tiny) per-user frame.
* ``retention_cohorts``— cohort = first-seen period; the retention
  triangle counts users active n periods after their cohort period.
  Two hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import parse_duration

__all__ = ["event_funnel", "event_transitions", "funnel_latency", "retention_cohorts", "sessionize"]


def sessionize(
    events: DataFrame,
    *,
    gap: str = "30m",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: per user, a session breaks after
    ``gap`` (Polars-style duration) of inactivity.

    Returns one row per session: ``user, session_id (1-based per
    user), session_start, session_end, n_events, duration_s``.
    """
    gap_s = parse_duration(gap)[0] / 1e6
    order = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(order)
    new_sess = F.when(
        prev.isNull()
        | ((F.col(ts_col).cast("double") - prev.cast("double")) > gap_s),
        1,
    ).otherwise(0)
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    tagged = events.withColumn("__sid", F.sum(new_sess).over(run))
    g = tagged.groupBy(user_col, "__sid").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return g.select(
        F.col(user_col),
        F.col("__sid").cast("int").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
        (
            F.col("session_end").cast("double") - F.col("session_start").cast("double")
        ).alias("duration_s"),
    )


def event_funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: per user, the earliest time of each
    step that strictly FOLLOWS (>) the user's previous-step time.

    Returns one row per user: ``user, ts_step_1..ts_step_k, depth``
    (number of consecutive steps reached).  A user missing step j has
    null for steps ≥ j regardless of later raw events — order matters.

    Shape: one conditional-aggregate pass collects every (user, step)
    first/candidate timestamp is NOT enough for ordered semantics, so
    steps resolve iteratively — but on the per-user aggregated frame
    (k × users rows), never the raw stream: the heavy reduction happens
    once, the k-step recursion costs k tiny column expressions.
    """
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {steps}")

    ev = events.where(F.col(type_col).isin(steps)).select(
        F.col(user_col), F.col(ts_col), F.col(type_col)
    )
    # per (user, step): the sorted list of that step's timestamps
    per = ev.groupBy(user_col).pivot(type_col, steps).agg(
        F.array_sort(F.collect_list(ts_col))
    )

    out = per
    prev_ts = None
    for i, s in enumerate(steps):
        arr = F.coalesce(F.col(s), F.array().cast("array<timestamp>"))
        if prev_ts is None:
            step_ts = F.try_element_at(arr, F.lit(1))
        else:
            # earliest element strictly after prev step's ts
            after = F.filter(arr, lambda x: x > prev_ts)
            step_ts = F.when(prev_ts.isNotNull(), F.try_element_at(after, F.lit(1)))
        out = out.withColumn(f"ts_{s}", step_ts)
        prev_ts = F.col(f"ts_{s}")

    depth = sum(
        (F.when(F.col(f"ts_{s}").isNotNull(), 1).otherwise(0) for s in steps),
        F.lit(0),
    )
    return out.select(
        F.col(user_col),
        *[F.col(f"ts_{s}") for s in steps],
        depth.cast("int").alias("depth"),
    )


def retention_cohorts(
    events: DataFrame,
    *,
    period: str = "1w",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen period,
    counted in each later period they were active.

    Returns ``cohort (period start), period_n (0-based offset),
    n_active, cohort_size, retention`` — the standard triangle, one row
    per (cohort, offset) with activity.
    """
    from polars_trading_spark._utils import truncate

    p = truncate(F.col(ts_col), period)
    per_user = events.select(F.col(user_col), p.alias("__p")).distinct()
    first = per_user.groupBy(user_col).agg(F.min("__p").alias("__cohort"))
    j = per_user.join(first, user_col)
    offset = (
        (F.col("__p").cast("double") - F.col("__cohort").cast("double"))
        / (parse_duration(period)[0] / 1e6)
    ).cast("int")
    g = j.withColumn("__n", offset).groupBy("__cohort", "__n").agg(
        F.count_distinct(user_col).cast("long").alias("n_active")
    )
    size = g.where(F.col("__n") == 0).select(
        F.col("__cohort"), F.col("n_active").alias("cohort_size")
    )
    return (
        g.join(size, "__cohort")
        .select(
            F.col("__cohort").alias("cohort"),
            F.col("__n").alias("period_n"),
            "n_active",
            "cohort_size",
            (F.col("n_active") / F.col("cohort_size")).alias("retention"),
        )
    )


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple = ("event_id",),
) -> DataFrame:
    """First-order Markov transition matrix of the event stream.

    Per user, consecutive events (ordered by ``ts_col`` then
    ``order_cols`` for deterministic simultaneous-event order) form
    (from_type, to_type) transitions; output is one row per observed
    pair with ``n`` (count), ``p`` (row-normalized transition
    probability, n / outgoing total of from_type) and ``n_from`` (the
    denominator).  The standard user-journey / clickstream analytics
    primitive (and the drift monitor for event pipelines: compare
    matrices across releases with psi/ks on p).

    Distributed shape: one lead window per user (user-keyed exchange),
    one (from, to) hash aggregate — vocabulary-sized output — and the
    denominator as a window sum over the aggregated matrix itself
    (never a second scan of the events).  Probabilities are exact
    integer ratios, so they are engine-independent.  Zero Python.
    """
    w = Window.partitionBy(user_col).orderBy(
        ts_col, *[F.col(c) for c in order_cols]
    )
    pairs = (
        events.withColumn("__to", F.lead(type_col).over(w))
        .where(F.col("__to").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"), F.col("__to").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(w_from).alias("n_from"),
        (F.col("n").cast("double") / F.sum("n").over(w_from).cast("double")).alias("p"),
    )


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Step-to-step conversion and latency profile of an ordered
    funnel: for each consecutive pair (step i -> step i+1), how many
    users arrive, how many convert, and the EXACT median / p90 of the
    conversion latency.

    Count-based order statistics (the var_cvar convention): with n
    converters, median = the ``(n+1) // 2``-th smallest latency and
    p90 = the ``(9n + 9) // 10``-th (integer ceil of 0.9n — computed
    in integer arithmetic because ``ceil(0.9 * n)`` in floats can
    round 27.000000000000004 up).  Ties break by user id, so the
    selected rows are deterministic on every engine.

    Output: one row per step pair — ``step_idx, step_from, step_to,
    n_from, n_to, conv_rate, med_latency_s, p90_latency_s``.

    Shape: one funnel pass (k tiny column expressions over the per-user
    aggregate), a (k-1)-way union of pair projections, one rank window
    per pair and one conditional aggregate.  The rank window partitions
    by step pair — k-1 partitions of converter-count rows; for
    billion-user funnels swap the exact selection for approx_percentile
    (documented dial, same output schema).
    """
    from functools import reduce as _reduce

    fun = event_funnel(
        events, steps, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    parts = []
    for i in range(len(steps) - 1):
        a, b = steps[i], steps[i + 1]
        parts.append(
            fun.select(
                F.lit(i + 1).cast("int").alias("step_idx"),
                F.lit(a).alias("step_from"),
                F.lit(b).alias("step_to"),
                F.col(user_col).alias("__u"),
                F.col(f"ts_{a}").alias("__ta"),
                F.col(f"ts_{b}").alias("__tb"),
            )
        )
    allp = _reduce(lambda x, y: x.unionByName(y), parts)
    base = allp.withColumn(
        "__lat", F.unix_micros("__tb") - F.unix_micros("__ta")
    )

    conv = base.groupBy("step_idx", "step_from", "step_to").agg(
        F.sum(F.when(F.col("__ta").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_from"),
        F.sum(F.when(F.col("__tb").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_to"),
    )

    lat = base.where(F.col("__lat").isNotNull())
    w_rank = Window.partitionBy("step_idx").orderBy(F.asc("__lat"), F.asc("__u"))
    w_n = Window.partitionBy("step_idx")
    ranked = lat.withColumn("__rk", F.row_number().over(w_rank)).withColumn(
        "__n", F.count(F.lit(1)).over(w_n)
    )
    k_med = F.floor((F.col("__n") + 1) / 2)
    k_p90 = F.floor((9 * F.col("__n") + 9) / 10)
    sel = ranked.groupBy("step_idx").agg(
        F.max(F.when(F.col("__rk") == k_med, F.col("__lat"))).alias("__med_us"),
        F.max(F.when(F.col("__rk") == k_p90, F.col("__lat"))).alias("__p90_us"),
    )

    return (
        conv.join(sel, "step_idx", "left")
        .select(
            "step_idx",
            "step_from",
            "step_to",
            "n_from",
            "n_to",
            F.when(
                F.col("n_from") > 0,
                F.col("n_to").cast("double") / F.col("n_from").cast("double"),
            ).alias("conv_rate"),
            (F.col("__med_us") / 1_000_000.0).alias("med_latency_s"),
            (F.col("__p90_us") / 1_000_000.0).alias("p90_latency_s"),
        )
    )
