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

__all__ = ["cpcv_assign", "purged_kfold", "walk_forward"]


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


def cpcv_assign(
    events: DataFrame,
    *,
    n_groups: int = 6,
    k_test: int = 2,
    embargo: str | None = None,
    symbol_col: str = "symbol",
    t0_col: str = "ts_event",
    t1_col: str = "vertical_barrier",
) -> DataFrame:
    """Combinatorial Purged Cross-Validation assignment (AFML ch.12).

    Events split into ``n_groups`` contiguous per-symbol time groups;
    every ``C(n_groups, k_test)`` combination of ``k_test`` groups forms
    one split whose test set is that combination.  Each backtest path
    then stitches test predictions across splits — the point of CPCV is
    that every group is tested ``C(n-1, k-1)`` times against different
    training sets, turning one backtest into a distribution.

    Purging/embargo follow ``purged_kfold`` but against EACH test
    group's hull separately (a train event is purged if its span
    overlaps ANY of the split's test hulls — the merged hull would
    over-purge the gap between non-adjacent test groups).

    Distributed shape: the splits table is ``C(n,k) * k_test`` rows
    (driver-built, broadcast), hulls are ``n_symbols * n_groups`` rows
    (broadcast); events fan out once to (event x split x test-hull) —
    bounded by the combinatorics, e.g. 30x for the canonical (6, 2) —
    then one hash aggregate folds the per-hull flags.  Output is one
    row per (event, split): ``symbol, t0, split_id, role``.
    """
    from itertools import combinations

    if n_groups < 2:
        raise ValueError(f"n_groups must be >= 2, got {n_groups}")
    if not (1 <= k_test < n_groups):
        raise ValueError(f"k_test must be in [1, n_groups), got {k_test}")

    t0, t1 = F.col(t0_col), F.col(t1_col)
    order_cols = [t0_col, SEQ_COL] if SEQ_COL in events.columns else [t0_col]
    group_w = Window.partitionBy(symbol_col).orderBy(*order_cols)

    series_end = F.max(F.greatest(t0, F.coalesce(t1, t0))).over(
        Window.partitionBy(symbol_col)
    )
    ev = events.select(
        F.col(symbol_col).alias("symbol"),
        t0.alias("t0"),
        F.coalesce(t1, series_end).alias("t1"),
        F.ntile(n_groups).over(group_w).alias("grp"),
    )

    spark = events.sparkSession
    splits = spark.createDataFrame(
        [
            (sid, g)
            for sid, combo in enumerate(combinations(range(1, n_groups + 1), k_test), 1)
            for g in combo
        ],
        "split_id int, test_grp int",
    )

    hulls = ev.groupBy("symbol", F.col("grp").alias("test_grp")).agg(
        F.min("t0").alias("h_start"),
        F.max("t1").alias("h_end"),
    )
    emb_end = F.col("h_end")
    if embargo is not None:
        emb_end = F.col("h_end") + F.expr(f"INTERVAL {duration_to_interval(embargo)}")
    split_hulls = F.broadcast(
        splits.join(hulls, on="test_grp").withColumn("emb_end", emb_end)
    )

    fan = ev.join(split_hulls, on="symbol")
    flags = fan.groupBy("symbol", "t0", "grp", "split_id").agg(
        F.max(F.when(F.col("grp") == F.col("test_grp"), True).otherwise(False)).alias("is_test"),
        F.max(
            (F.col("t0") <= F.col("h_end")) & (F.col("h_start") <= F.col("t1"))
        ).alias("overlaps"),
        F.max(
            (F.col("t0") > F.col("h_end")) & (F.col("t0") <= F.col("emb_end"))
        ).alias("embargoed"),
    )
    role = (
        F.when(F.col("is_test"), F.lit("test"))
        .when(F.col("overlaps"), F.lit("purged"))
        .when(F.col("embargoed"), F.lit("embargo"))
        .otherwise(F.lit("train"))
    )
    return flags.select(
        "symbol",
        F.col("t0").alias(t0_col),
        "split_id",
        role.alias("role"),
    )


def walk_forward(
    events: DataFrame,
    *,
    n_splits: int = 4,
    mode: str = "anchored",
    embargo: str | None = None,
    symbol_col: str = "symbol",
    t0_col: str = "ts_event",
    t1_col: str = "vertical_barrier",
) -> DataFrame:
    """Walk-forward evaluation splits — the out-of-sample sibling of
    ``purged_kfold`` (which shuffles test blocks through time; walk-
    forward only ever trains on the PAST, the deployment-faithful
    protocol of AFML ch.11/12's WF backtests).

    The per-symbol tape splits into ``n_splits + 1`` contiguous blocks
    in ``t0`` order.  Split ``s`` (1-based) tests on block ``s + 1``:

    * ``anchored`` — train on everything before the test block
      (expanding window, blocks ``1..s``);
    * ``rolling`` — train on block ``s`` only (fixed-width window);
      earlier blocks get role ``unused``.

    A train-candidate event whose span ``[t0, t1]`` reaches INTO the
    test block (``t1 >= test_start``) is ``purged`` — the walk-forward
    leak is label spans crossing the train/test boundary, the same
    failure PurgedKFold guards K-fold against.  ``embargo`` (a duration)
    additionally marks train events whose span ends within that gap
    BEFORE the test block (``t1 >= test_start - embargo``) — the
    serial-correlation buffer, applied on the train side since nothing
    is ever trained after the test block.  Events after the test block
    are ``future``.  Null ``t1`` extends to the symbol's series end,
    exactly as in ``purged_kfold``.

    Output one row per (event, split): ``symbol, t0, split, role`` with
    role in {train, test, purged, embargo, future, unused}.

    Distributed shape: one ``ntile`` window per symbol (the plan's only
    corpus shuffle), block starts are a ``n_symbols x (n_splits + 1)``
    aggregate joined back **broadcast** — the same shape as
    ``purged_kfold``, so the assignment matrix never materializes more
    than a projection + broadcast hash join at any scale.
    """
    if n_splits < 1:
        raise ValueError(f"n_splits must be >= 1, got {n_splits}")
    if mode not in ("anchored", "rolling"):
        raise ValueError(f"mode must be 'anchored' or 'rolling', got {mode!r}")

    t0, t1 = F.col(t0_col), F.col(t1_col)
    order_cols = [t0_col, SEQ_COL] if SEQ_COL in events.columns else [t0_col]
    block_w = Window.partitionBy(symbol_col).orderBy(*order_cols)

    series_end = F.max(F.greatest(t0, F.coalesce(t1, t0))).over(
        Window.partitionBy(symbol_col)
    )
    ev = events.select(
        F.col(symbol_col).alias("symbol"),
        t0.alias("t0"),
        F.coalesce(t1, series_end).alias("t1"),
        F.ntile(n_splits + 1).over(block_w).alias("blk"),
    )

    # one row per (symbol, split): the split's test-block start
    splits = (
        ev.groupBy("symbol", "blk")
        .agg(F.min("t0").alias("test_start"))
        .where(F.col("blk") >= 2)
        .select(
            "symbol",
            (F.col("blk") - 1).cast("int").alias("split"),
            "test_start",
        )
    )

    j = ev.join(F.broadcast(splits), on="symbol")
    gap_start = F.col("test_start")
    if embargo is not None:
        gap_start = F.col("test_start") - F.expr(
            f"INTERVAL {duration_to_interval(embargo)}"
        )
    role = (
        F.when(F.col("blk") == F.col("split") + 1, F.lit("test"))
        .when(F.col("blk") > F.col("split") + 1, F.lit("future"))
    )
    if mode == "rolling":
        role = role.when(F.col("blk") < F.col("split"), F.lit("unused"))
    role = (
        role.when(F.col("t1") >= F.col("test_start"), F.lit("purged"))
        .when(F.col("t1") >= gap_start, F.lit("embargo"))
        .otherwise(F.lit("train"))
    )
    return j.select(
        "symbol",
        F.col("t0").alias(t0_col),
        "split",
        role.alias("role"),
    )
