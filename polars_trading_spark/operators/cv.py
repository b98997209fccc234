"""Purged K-fold cross-validation assignment with embargo (AFML ch.7).

Standard K-fold leaks on financial labels because an event's label spans
``[t0, t1]`` (e.g. a triple-barrier horizon, the reference's
``get_vertical_barrier_by_timedelta``, dynamic_labels.py:101): a train
event whose span overlaps the test block sees post-test information.
De Prado's PurgedKFold therefore (a) splits events into K contiguous
time blocks, (b) **purges** train events whose span overlaps the test
block's hull ``[min t0, max t1]``, and (c) **embargoes** train events
starting within a buffer just after the test block.

Spark-first shape: fold assignment is one ``ntile(K)`` window per
symbol; the per-(symbol, fold) test hulls are a tiny aggregate
(``n_symbols * K`` rows) that joins back **broadcast**, so the only
shuffle in the whole plan is the ntile window's hash partition on
symbol.  Output is the full assignment matrix — one row per
(event, fold) with a role — which downstream training loops filter per
fold; at 100 TB the matrix is events x K rows but never materializes
more than a projection + broadcast hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL, duration_to_interval

__all__ = ["purged_kfold"]


def purged_kfold(
    events: DataFrame,
    *,
    n_folds: int = 5,
    embargo: str | None = None,
    symbol_col: str = "symbol",
    t0_col: str = "ts_event",
    t1_col: str = "vertical_barrier",
) -> DataFrame:
    """Assign every (event, fold) pair a role: test / purged / embargo / train.

    ``events`` needs one row per labeled event with its span
    ``[t0_col, t1_col]``.  Folds are per-symbol contiguous ``ntile``
    blocks in ``t0`` order.  A null ``t1`` (open span, e.g. barrier past
    the end of data) is treated as extending to the end of the series —
    such events purge every later fold and are purged from every earlier
    one's test hull.

    Returns ``symbol, t0, fold, role``.
    """
    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds}")

    t0, t1 = F.col(t0_col), F.col(t1_col)
    order_cols = [t0_col, SEQ_COL] if SEQ_COL in events.columns else [t0_col]
    fold_w = Window.partitionBy(symbol_col).orderBy(*order_cols)

    # Open spans reach the end of the series: substitute the symbol's
    # true series end — max over all events of greatest(t0, t1) — not
    # the max non-null t1, which can precede later event starts and
    # would let an open-span event skip purging later folds.
    series_end = F.max(F.greatest(t0, F.coalesce(t1, t0))).over(
        Window.partitionBy(symbol_col)
    )
    ev = events.select(
        F.col(symbol_col).alias("symbol"),
        t0.alias("t0"),
        F.coalesce(t1, series_end).alias("t1"),
        F.ntile(n_folds).over(fold_w).alias("fold"),
    )

    hulls = ev.groupBy("symbol", "fold").agg(
        F.min("t0").alias("test_start"),
        F.max("t1").alias("test_end"),
    )

    emb_end = F.col("test_end")
    if embargo is not None:
        emb_end = F.col("test_end") + F.expr(f"INTERVAL {duration_to_interval(embargo)}")

    joined = ev.select("symbol", "t0", "t1", F.col("fold").alias("event_fold")).join(
        F.broadcast(hulls.withColumn("embargo_end", emb_end)),
        on="symbol",
    )
    role = (
        F.when(F.col("event_fold") == F.col("fold"), F.lit("test"))
        .when(
            (F.col("t0") <= F.col("test_end")) & (F.col("test_start") <= F.col("t1")),
            F.lit("purged"),
        )
        .when(
            (F.col("t0") > F.col("test_end")) & (F.col("t0") <= F.col("embargo_end")),
            F.lit("embargo"),
        )
        .otherwise(F.lit("train"))
    )
    return joined.select(
        "symbol",
        F.col("t0").alias(t0_col),
        F.col("fold").cast("int").alias("fold"),
        role.alias("role"),
    )
