"""Probability of backtest overfitting via combinatorially symmetric
cross-validation (CSCV — Bailey, Borwein, López de Prado & Zhu 2017,
"The probability of backtest overfitting").

The question a strategy-selection pipeline must answer before shipping
the best backtest it found: *if I pick the top in-sample performer,
how often is it actually below-median out-of-sample?*  CSCV answers it
without parametric assumptions: split the return history into ``S``
equal time blocks, and for EVERY balanced combination of ``S/2``
in-sample blocks (the other half is out-of-sample), pick the strategy
with the best in-sample Sharpe and record its RELATIVE RANK
out-of-sample.  PBO is the fraction of combinations where that rank is
below the median — a selection procedure that generalizes has PBO near
0, pure overfitting drifts toward 0.5 (the selected strategy is random
OOS).

Strategy set: the classic parameter-sweep surface — per (symbol,
lookback) momentum sign rules.  ``pos_t = sign(close_{t-1} -
close_{t-1-L})``, ``ret_t = pos_t * (close_t / close_{t-1} - 1)`` —
the sweep over ``lookbacks`` is exactly the family of backtests a
researcher would grid-search, which is what CSCV is built to audit.

Spark-first shape (scale argument):

* the corpus-sized work is ONE pass: lookbacks exploded onto the bar
  frame (|lookbacks| fan-out), per-(symbol, lookback, block) moment
  sums as ``(ts)``-ordered running folds read at each block's last row
  — one exchange on the exploded frame, no corpus-sized global window;
* blocks come from the DISTINCT timestamp frame (bucket-count-sized,
  the ``rank_portfolio`` precedent) broadcast back onto the bars;
* everything after the block aggregate is data-independent
  combinatorics over a (strategies x S) frame: the ``C(S, S/2)`` masks
  are generated arithmetically, each mask's in-sample/out-of-sample
  Sharpe is a FIXED-ORDER fold over the block index (``F.aggregate``
  over ``sequence(0, S-1)`` — bit-identical on any engine), and the
  mask-level summary folds in mask order.  At 100x the data only the
  first pass grows.

Determinism: per-block moments are ordered ts folds; cross-block sums
fold in block-index order; the in-sample argmax breaks Sharpe ties by
HIGHEST strategy id via lexicographic struct max; the below-median
test is the INTEGER comparison ``2*rank < n_ranked + 1`` (never a
float 0.5 knife edge); mask-level means fold in mask order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pbo_cscv"]


def pbo_cscv(
    bars: DataFrame,
    *,
    n_blocks: int = 8,
    lookbacks: tuple[int, ...] = (1, 2, 3, 5, 8),
    ts_col: str = "ts_event",
    close_col: str = "close",
    symbol_col: str = "symbol",
) -> DataFrame:
    """One-row CSCV overfit audit of the (symbol x lookback) momentum
    sweep over ``bars``.

    Returns ``n_strategies, n_blocks, n_combos`` (valid balanced
    splits), ``pbo`` (share of splits whose in-sample winner ranks
    below the OOS median), ``mean_logit`` (mean rank logit — < 0 means
    systematic degradation), ``mean_sel_is_sharpe`` /
    ``mean_sel_oos_sharpe`` (the selected strategy's average per-block
    Sharpe in and out of sample — the haircut at a glance).
    """
    if n_blocks < 2 or n_blocks % 2:
        raise ValueError(f"n_blocks must be even and >= 2, got {n_blocks}")
    if n_blocks > 16:
        raise ValueError(
            f"n_blocks={n_blocks} generates {2 ** n_blocks} masks; keep <= 16"
        )
    if not lookbacks or any(lb < 1 for lb in lookbacks):
        raise ValueError(f"lookbacks must be positive ints, got {lookbacks}")
    S = int(n_blocks)

    # -- block ids from the distinct timestamp frame (bucket-sized) ----
    ts_frame = bars.select(ts_col).distinct()
    w_ts = Window.orderBy(ts_col)  # distinct-bucket frame: bounded
    ts_frame = ts_frame.select(
        ts_col,
        (F.row_number().over(w_ts) - 1).alias("__ti"),
        F.count(F.lit(1))
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("__nt"),
    ).select(
        ts_col,
        # floor of the double ratio on BOTH engines (a bare BIGINT cast
        # truncates in Spark but rounds in DuckDB)
        F.floor((F.col("__ti") * S) / F.col("__nt")).cast("long").alias("block"),
    )

    # -- strategy returns: one exploded pass over the bars -------------
    t = bars.select(
        F.col(symbol_col).alias("sym"),
        F.col(ts_col).alias("ts"),
        F.col(close_col).cast("double").alias("c"),
        F.explode(F.array(*[F.lit(int(lb)) for lb in lookbacks])).alias("lb"),
    )
    w_sl = Window.partitionBy("sym", "lb").orderBy("ts")
    t = t.select(
        "sym",
        "lb",
        "ts",
        "c",
        F.lag("c", 1).over(w_sl).alias("__p1"),
    )
    # the momentum anchor is lag(c, 1 + lb), but lb varies per row and
    # Spark's lag() offset must be a literal — lb IS constant within
    # each (sym, lb) partition, so a CASE over the (small, fixed)
    # lookback set picks each partition's own lag column, join-free.
    lbs = sorted(set(int(x) for x in lookbacks))
    anchor = F.lag("c", 1 + lbs[0]).over(w_sl)
    for lb in lbs[1:]:
        anchor = F.when(
            F.col("lb") == lb, F.lag("c", 1 + lb).over(w_sl)
        ).otherwise(anchor)
    t = t.withColumn("__pl", anchor)
    pos = (
        F.when(F.col("__p1") > F.col("__pl"), F.lit(1.0))
        .when(F.col("__p1") < F.col("__pl"), F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )
    t = t.withColumn(
        "ret",
        F.when(
            F.col("__p1").isNotNull() & F.col("__pl").isNotNull(),
            pos * (F.col("c") / F.col("__p1") - 1),
        ),
    ).where(F.col("ret").isNotNull())
    t = t.join(F.broadcast(ts_frame.withColumnRenamed(ts_col, "ts")), "ts")

    # -- per-(strategy, block) moments: ordered folds, last row --------
    w_b = Window.partitionBy("sym", "lb", "block").orderBy("ts")
    w_br = w_b.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g = t.select(
        "sym",
        "lb",
        "block",
        F.row_number().over(w_b).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("sym", "lb", "block")).alias("__n"),
        F.sum("ret").over(w_br).alias("__s1"),
        F.sum(F.col("ret") * F.col("ret")).over(w_br).alias("__s2"),
    ).where(F.col("__rn") == F.col("__n"))

    # -- pivot to aligned per-block arrays (strategies-sized frame) ----
    strat = g.groupBy("sym", "lb").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("block"),
                    F.struct(
                        F.col("__n").cast("long").alias("n"),
                        F.col("__s1").alias("s1"),
                        F.col("__s2").alias("s2"),
                    ),
                )
            )
        ).alias("__m")
    )
    empty = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("s1"),
        F.lit(0.0).alias("s2"),
    )
    seq = F.sequence(F.lit(0), F.lit(S - 1))
    strat = strat.select(
        F.concat_ws("_", "sym", "lb").alias("sid"),
        F.transform(
            seq, lambda b: F.coalesce(F.element_at("__m", b.cast("long")), empty)
        ).alias("blk"),
    )

    # -- balanced masks (data-independent combinatorics) ---------------
    masks = (
        strat.select(F.lit(1).alias("__one"))
        .limit(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(2 ** S - 1))).alias("mask"))
    )
    bit = lambda m, b: (  # noqa: E731 — exact for S <= 16
        F.floor(m / F.pow(F.lit(2.0), b)).cast("long") % 2
    )
    popcount = F.aggregate(
        seq, F.lit(0).cast("long"), lambda a, b: a + bit(F.col("mask"), b)
    )
    masks = masks.where(popcount == S // 2)

    cj = F.broadcast(masks).crossJoin(strat)

    def fold(field, cast_zero):
        return F.aggregate(
            seq,
            cast_zero,
            lambda a, b: a
            + F.when(
                bit(F.col("mask"), b) == 1,
                F.element_at("blk", (b + 1).cast("int"))[field],
            ).otherwise(cast_zero * 0),
        )

    zl, zd = F.lit(0).cast("long"), F.lit(0.0)
    cj = cj.select(
        "mask",
        "sid",
        fold("n", zl).alias("in_n"),
        fold("s1", zd).alias("in_s1"),
        fold("s2", zd).alias("in_s2"),
        F.aggregate(seq, zl, lambda a, b: a + F.element_at("blk", (b + 1).cast("int"))["n"]).alias("tot_n"),
        F.aggregate(seq, zd, lambda a, b: a + F.element_at("blk", (b + 1).cast("int"))["s1"]).alias("tot_s1"),
        F.aggregate(seq, zd, lambda a, b: a + F.element_at("blk", (b + 1).cast("int"))["s2"]).alias("tot_s2"),
    )

    def sharpe(n, s1, s2):
        nd = n.cast("double")
        var = (s2 - s1 * s1 / nd) / (nd - 1)
        return F.when((n >= 2) & (var > 0), (s1 / nd) / F.sqrt(var))

    cj = cj.select(
        "mask",
        "sid",
        sharpe(F.col("in_n"), F.col("in_s1"), F.col("in_s2")).alias("sh_is"),
        sharpe(
            F.col("tot_n") - F.col("in_n"),
            F.col("tot_s1") - F.col("in_s1"),
            F.col("tot_s2") - F.col("in_s2"),
        ).alias("sh_oos"),
    )

    # -- per-mask selection + OOS rank (strategies-bounded windows) ----
    w_mask = Window.partitionBy("mask")
    sel = F.max(
        F.when(
            F.col("sh_is").isNotNull() & F.col("sh_oos").isNotNull(),
            F.struct(F.col("sh_is"), F.col("sid"), F.col("sh_oos")),
        )
    ).over(w_mask)
    cj = cj.withColumn("__sel", sel)
    per_mask = (
        cj.where(F.col("__sel").isNotNull())
        .groupBy("mask")
        .agg(
            F.first(F.col("__sel")["sh_is"]).alias("sel_is"),
            F.first(F.col("__sel")["sh_oos"]).alias("sel_oos"),
            F.sum(
                (F.col("sh_oos") <= F.col("__sel")["sh_oos"]).cast("long")
            ).alias("r"),
            F.sum(F.col("sh_oos").isNotNull().cast("long")).alias("nr"),
        )
    )
    # omega = r / (nr + 1); logit = ln(omega / (1 - omega));
    # below-median via the INTEGER test 2r < nr + 1
    om = F.col("r").cast("double") / (F.col("nr") + 1).cast("double")
    per_mask = per_mask.where(F.col("nr") >= 1).select(
        "mask",
        "sel_is",
        "sel_oos",
        (2 * F.col("r") < F.col("nr") + 1).cast("long").alias("below"),
        F.log(om / (1 - om)).alias("lgt"),
    )

    # -- one-row summary: mask-ordered folds over <= C(S, S/2) rows ----
    w_m = Window.orderBy("mask")  # combos-bounded frame
    w_mr = w_m.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_strats = strat.select(F.count(F.lit(1)).alias("ns"))
    out = per_mask.select(
        F.row_number().over(w_m).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__nc"),
        F.sum("below").over(w_all).alias("__nb"),
        F.sum("lgt").over(w_mr).alias("__sl"),
        F.sum("sel_is").over(w_mr).alias("__si"),
        F.sum("sel_oos").over(w_mr).alias("__so"),
    ).where(F.col("__rn") == F.col("__nc"))
    nc = F.col("__nc").cast("double")
    return out.crossJoin(F.broadcast(n_strats)).select(
        F.col("ns").cast("int").alias("n_strategies"),
        F.lit(S).cast("int").alias("n_blocks"),
        F.col("__nc").cast("int").alias("n_combos"),
        (F.col("__nb").cast("double") / nc).alias("pbo"),
        (F.col("__sl") / nc).alias("mean_logit"),
        (F.col("__si") / nc).alias("mean_sel_is_sharpe"),
        (F.col("__so") / nc).alias("mean_sel_oos_sharpe"),
    )
