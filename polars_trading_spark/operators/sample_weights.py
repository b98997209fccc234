"""AFML ch. 4 sample weights: label concurrency, average uniqueness,
return attribution, and time-decay scaling.

The reference library labels events with path-dependent barriers
(reference polars_trading/labels/dynamic_labels.py) but stops before
AFML's next step: weighting the resulting samples so that overlapping
labels — which share path information — don't dominate training.  These
operators complete that pipeline stage:

* ``label_concurrency`` — c_t: how many event intervals [t0, t1] cover
  each observed timestamp (AFML 4.3.1).
* ``average_uniqueness`` — per event, mean of 1/c_t over its own span
  (AFML 4.4.2): the sample weight that discounts overlap.
* ``return_attribution`` — per event, |Σ_{t ∈ (t0, t1]} r_t / c_t|
  (AFML 4.5.3): weight by the log return the label can uniquely claim.
* ``time_decay`` — rescale weights linearly on cumulative uniqueness so
  the oldest sample gets ``last_weight`` and the newest 1.0 (AFML 4.5.4).

Scale design (round 14): concurrency is a SWEEP-LINE — +1/-1 interval
boundaries unioned with the path timestamps and running-summed per
symbol — so c_t costs O(2·events + path) rows instead of a window over
the events×horizon fan-out (the old shape; 8.8s -> 3.6s isolated at
sf0.1).  The per-event averages still ride ONE bucketed span join (the
same horizon-bounded equi-join shape as the pt/sl first-touch scan —
each event explodes to the horizon-sized buckets its interval covers,
so the join never degenerates to a per-symbol cross product), but the
fan-out now feeds straight into a map-side-combined hash aggregate:
nothing shuffles at fan-out grain.  No Python stages anywhere.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import (
    SEQ_COL,
    ensure_parallelism,
    has_unique_timestamps,
    parse_duration,
)
from polars_trading_spark.config import column_names

__all__ = [
    "label_concurrency",
    "average_uniqueness",
    "return_attribution",
    "sample_weights",
    "time_decay",
]


def _bucket_micros(bucket: str | timedelta) -> int:
    if isinstance(bucket, timedelta):
        return int(bucket.total_seconds() * 1_000_000)
    micros, _ = parse_duration(bucket)
    return micros


def _span_join(
    events: DataFrame,
    path: DataFrame,
    by: list[str],
    bucket: str | timedelta | None,
) -> DataFrame:
    """events × path rows with path.__pt in [t0, t1], horizon-bucketed.

    ``events`` carries (by…, __t0, __t1); ``path`` carries (by…, __pt,
    extra value columns).  The bucket explode bounds each event's join
    fan-out to its own horizon — the same scale contract as
    ``apply_profit_taking_stop_loss`` (operators/dynamic_labels.py).
    """
    join_keys: list[str] = []
    if bucket is not None:
        bucket_us = _bucket_micros(bucket)
        events = events.withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros("__t0") / bucket_us),
                    F.floor(F.unix_micros("__t1") / bucket_us),
                )
            ),
        )
        path = path.withColumn("__bkt", F.floor(F.unix_micros("__pt") / bucket_us))
        join_keys.append("__bkt")
    join_keys.extend(by)
    path = ensure_parallelism(path, *join_keys)
    return events.join(path, on=join_keys, how="inner").where(
        (F.col("__pt") >= F.col("__t0")) & (F.col("__pt") <= F.col("__t1"))
    )


def _concurrency_sweep(
    ev: DataFrame, path: DataFrame, by: list[str]
) -> DataFrame:
    """c_t per path row WITHOUT windowing the span-join fan-out.

    Round 14 (r13 verdict: ``sample_weights`` was the suite's slowest
    query two rounds running — the old plan shuffled the entire
    events×span fan-out on (symbol, t) just to count coverage).  The
    sweep-line form counts it on O(2·events + path) rows instead: +1 at
    ``__t0``, -1 just after ``__t1``, running-sum ordered by
    (t, kind) where start boundaries sort BEFORE the path row at the
    same timestamp and end boundaries AFTER it — so both interval ends
    stay inclusive.  The count is an exact integer, so downstream
    aggregates are bit-identical to the fan-out window they replace;
    the span join now only feeds a map-side-combined hash aggregate.
    At 100 TB the ordered window shuffles the (small) boundary+path
    union on the same per-symbol key the return-lag window already
    uses, instead of the horizon-multiplied fan-out.

    ``ev`` carries (by…, __t0, __t1); ``path`` (by…, __pt, extras).
    Returns ``path`` columns plus integer ``__c`` (0 when uncovered).
    """
    extras = [c for c in path.columns if c not in (*by, "__pt")]
    starts = ev.select(
        *by,
        F.col("__t0").alias("__pt"),
        F.lit(0).alias("__k"),
        F.lit(1).alias("__d"),
        *[F.lit(None).cast(path.schema[c].dataType).alias(c) for c in extras],
    )
    ends = ev.select(
        *by,
        F.col("__t1").alias("__pt"),
        F.lit(2).alias("__k"),
        F.lit(-1).alias("__d"),
        *[F.lit(None).cast(path.schema[c].dataType).alias(c) for c in extras],
    )
    pts = path.select(
        *by,
        "__pt",
        F.lit(1).alias("__k"),
        F.lit(0).alias("__d"),
        *extras,
    )
    w = (
        Window.partitionBy(*(by or [F.lit(1)]))
        .orderBy("__pt", "__k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        starts.unionByName(ends)
        .unionByName(pts)
        .withColumn("__c", F.sum("__d").over(w))
        .where(F.col("__k") == 1)
        .drop("__k", "__d")
    )


def _distinct_path(prices: DataFrame, by: list[str], ts: str) -> DataFrame:
    """Distinct observed timestamps (concurrency is defined per unique
    timestamp, not per trade).  Sources that declare per-group-unique
    timestamps (``declare_unique_timestamps``) skip the dedup shuffle."""
    path = prices.select(*by, F.col(ts).alias("__pt"))
    if not has_unique_timestamps(prices, ts):
        path = path.distinct()
    return path


def label_concurrency(
    events: DataFrame,
    prices: DataFrame,
    *,
    t1_col: str = "t1",
    bucket: str | timedelta | None = "1d",
) -> DataFrame:
    """c_t per observed (symbol?, timestamp): the number of event
    intervals [ts, t1] containing it (AFML 4.3.1).

    ``events`` needs (symbol?, ts, t1); ``prices`` is the trades table.
    Returns (symbol?, timestamp, concurrency) for every observed
    timestamp covered by at least one event.
    """
    ts, symbol = column_names.timestamp, column_names.symbol
    by = [symbol] if symbol in events.columns else []

    last_ts = F.max(F.col(ts)).over(Window.partitionBy(*(by or [F.lit(1)])))
    ev = events.select(
        *by,
        F.col(ts).alias("__t0"),
        F.coalesce(F.col(t1_col).cast("timestamp"), last_ts).alias("__t1"),
    )
    path = _distinct_path(prices, by, ts)
    return (
        _concurrency_sweep(ev, path, by)
        .where(F.col("__c") > 0)
        .select(*by, F.col("__pt").alias(ts), F.col("__c").alias("concurrency"))
    )


def sample_weights(
    events: DataFrame,
    prices: DataFrame,
    *,
    t1_col: str = "t1",
    bucket: str | timedelta | None = "1d",
) -> DataFrame:
    """Average uniqueness AND return attribution per event in one pass
    (AFML 4.4.2 + 4.5.3).

    ``events`` needs (symbol?, ts, t1); rows with a null ``t1`` are
    clamped to the last event timestamp per symbol (the same fill the
    pt/sl scan applies).  Output per event:

    * ``avg_uniqueness`` — mean over t ∈ [t0, t1] of 1/c_t, in (0, 1];
      1.0 exactly when the event overlaps nothing.
    * ``n_path`` — number of observed timestamps in the span.
    * ``ret_attr`` — |Σ_{t ∈ (t0, t1]} log(p_t/p_{t-1}) / c_t|, the
      overlap-discounted absolute log return; NULL when the span holds
      no return observation (single-tick span).

    One span join serves both: the t0 row participates in uniqueness
    (intervals are inclusive) while attribution sums strictly-after-t0
    returns (the return at t0 belongs to the previous holding period).

    The concurrency window shuffles the fan-out once on (symbol, t); the
    final aggregate returns to (event) grain.  Both keys are bounded by
    data density × horizon, never by total corpus size.
    """
    ts, price, symbol = column_names.timestamp, column_names.price, column_names.symbol
    by = [symbol] if symbol in events.columns else []

    last_ts = F.max(F.col(ts)).over(
        Window.partitionBy(*(by or [F.lit(1)]))
    )
    ev = events.select(
        *by,
        F.col(ts).alias("__t0"),
        F.coalesce(F.col(t1_col).cast("timestamp"), last_ts).alias("__t1"),
    )

    # Per-timestamp price series → one log return per observed timestamp.
    # Multiple trades on one timestamp resolve to the last by seq (the
    # deterministic close-side pick used across the bar operators).
    if has_unique_timestamps(prices, ts):
        per_ts = prices.select(*by, F.col(ts).alias("__pt"), F.col(price).alias("__p"))
    else:
        order = F.struct(F.col(SEQ_COL)) if SEQ_COL in prices.columns else F.col(ts)
        per_ts = prices.groupBy(*by, F.col(ts).alias("__pt")).agg(
            F.max_by(F.col(price), order).alias("__p")
        )
    w_sym = Window.partitionBy(*(by or [F.lit(1)])).orderBy("__pt")
    path = per_ts.withColumn(
        "__r", F.log(F.col("__p") / F.lag("__p").over(w_sym))
    ).drop("__p")

    # Two-phase c_t (round 14): attach the exact integer concurrency to
    # each path row via the sweep BEFORE the span join, so the fan-out
    # feeds straight into a map-side-combined hash aggregate instead of
    # being shuffled whole on (symbol, t) for a window count.
    path_c = _concurrency_sweep(ev, path, by)
    with_c = _span_join(ev, path_c, by, bucket)
    return (
        with_c.groupBy(*by, F.col("__t0").alias(ts))
        .agg(
            F.avg(F.lit(1.0) / F.col("__c")).alias("avg_uniqueness"),
            F.count(F.lit(1)).alias("n_path"),
            F.abs(
                F.sum(
                    F.when(F.col("__pt") > F.col("__t0"), F.col("__r") / F.col("__c"))
                )
            ).alias("ret_attr"),
        )
    )


def average_uniqueness(
    events: DataFrame,
    prices: DataFrame,
    *,
    t1_col: str = "t1",
    bucket: str | timedelta | None = "1d",
) -> DataFrame:
    """Per-event average uniqueness only (AFML 4.4.2); see
    ``sample_weights`` for semantics and the combined fast path."""
    ts = column_names.timestamp
    symbol = column_names.symbol
    by = [symbol] if symbol in events.columns else []
    return sample_weights(events, prices, t1_col=t1_col, bucket=bucket).select(
        *by, ts, "avg_uniqueness", "n_path"
    )


def return_attribution(
    events: DataFrame,
    prices: DataFrame,
    *,
    t1_col: str = "t1",
    bucket: str | timedelta | None = "1d",
) -> DataFrame:
    """Per-event return-attribution weight only (AFML 4.5.3); see
    ``sample_weights`` for semantics."""
    ts = column_names.timestamp
    symbol = column_names.symbol
    by = [symbol] if symbol in events.columns else []
    return sample_weights(events, prices, t1_col=t1_col, bucket=bucket).select(
        *by, ts, "ret_attr", "n_path"
    )


def time_decay(
    weights: DataFrame,
    *,
    weight_col: str = "avg_uniqueness",
    last_weight: float = 0.5,
    output_col: str = "decayed_weight",
) -> DataFrame:
    """Linear time-decay on cumulative uniqueness (AFML 4.5.4): the
    newest sample keeps factor 1.0, the oldest gets ``last_weight``, and
    the decay is linear in *cumulative sample information* (running sum
    of the weight column ordered by time) rather than calendar time, so
    dense periods decay faster than idle ones.

    ``last_weight`` in [0, 1] interpolates; negative values follow
    AFML's convention of zeroing out the oldest fraction of information.
    Per-symbol when the symbol column is present.  Pure window algebra —
    one shuffle on symbol, no Python.
    """
    ts, symbol = column_names.timestamp, column_names.symbol
    by = [symbol] if symbol in weights.columns else []
    w_cum = (
        Window.partitionBy(*(by or [F.lit(1)]))
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*(by or [F.lit(1)]))
    cum = F.sum(F.col(weight_col)).over(w_cum)
    total = F.sum(F.col(weight_col)).over(w_all)
    if last_weight >= 0:
        slope = (1.0 - last_weight) / total
        const = F.lit(float(last_weight))
    else:
        slope = 1.0 / ((float(last_weight) + 1.0) * total)
        const = F.lit(1.0) - slope * total
    factor = const + slope * cum
    return weights.withColumn(
        output_col,
        F.when(factor > 0, factor).otherwise(F.lit(0.0)) * F.col(weight_col),
    )
