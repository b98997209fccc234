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

    # -- balanced masks + mask folds: DRIVER-side (round 15) -----------
    # Everything below the (strategies x S) ``strat`` frame is
    # data-independent combinatorics over a BOUNDED frame (the module
    # contract above) — previously expressed as mask explode + crossJoin
    # + per-mask windows + mask-ordered folds, ~10 sequential AQE stage
    # rounds whose executor work totaled 3.5s CPU for 3.6s wall at
    # bench scale (pure scheduling).  The bounded frame is collected
    # once and the mask arithmetic folds on the driver with the
    # IDENTICAL IEEE operation sequence the Column expressions
    # performed: left-associated adds over the block index (including
    # the ``+ 0.0`` of unselected blocks, which is NOT a no-op for
    # signed zeros), the same divide/sqrt per Sharpe, tuple max for the
    # lexicographic (sh_is, sid, sh_oos) selection (ASCII sid ==
    # UTF8String order), integer rank tests, and mask-ascending summary
    # folds — the quality_classifier round-14 bounded-collect pattern.
    # The corpus-sized pass above is untouched; only the combinatorial
    # tail moved.
    import math

    rows = strat.collect()
    spark = bars.sparkSession
    out_schema = (
        "n_strategies int, n_blocks int, n_combos int, pbo double, "
        "mean_logit double, mean_sel_is_sharpe double, "
        "mean_sel_oos_sharpe double"
    )

    def sharpe(n, s1, s2):
        if n < 2:
            return None
        nd = float(n)
        var = (s2 - s1 * s1 / nd) / (nd - 1)
        if not var > 0:
            return None
        return (s1 / nd) / math.sqrt(var)

    strat_stats = []
    for row in rows:
        blk = row["blk"]
        tot_n, tot_s1, tot_s2 = 0, 0.0, 0.0
        for b in range(S):  # block-index order, left-associated
            tot_n = tot_n + blk[b]["n"]
            tot_s1 = tot_s1 + blk[b]["s1"]
            tot_s2 = tot_s2 + blk[b]["s2"]
        strat_stats.append((row["sid"], blk, tot_n, tot_s1, tot_s2))

    per_mask = []
    for mask in range(2 ** S):  # ascending mask order
        if bin(mask).count("1") != S // 2:
            continue
        best = None  # (sh_is, sid, sh_oos) lexicographic max
        scored = []
        for sid, blk, tot_n, tot_s1, tot_s2 in strat_stats:
            in_n, in_s1, in_s2 = 0, 0.0, 0.0
            for b in range(S):
                if (mask >> b) & 1:
                    in_n = in_n + blk[b]["n"]
                    in_s1 = in_s1 + blk[b]["s1"]
                    in_s2 = in_s2 + blk[b]["s2"]
                else:  # the Column fold added an explicit zero here
                    in_n = in_n + 0
                    in_s1 = in_s1 + 0.0
                    in_s2 = in_s2 + 0.0
            sh_is = sharpe(in_n, in_s1, in_s2)
            sh_oos = sharpe(tot_n - in_n, tot_s1 - in_s1, tot_s2 - in_s2)
            scored.append(sh_oos)
            if sh_is is not None and sh_oos is not None:
                cand = (sh_is, sid, sh_oos)
                if best is None or cand > best:
                    best = cand
        if best is None:
            continue
        sel_is, _, sel_oos = best
        r = sum(1 for s in scored if s is not None and s <= sel_oos)
        nr = sum(1 for s in scored if s is not None)
        if nr < 1:
            continue
        om = float(r) / float(nr + 1)
        per_mask.append(
            (
                sel_is,
                sel_oos,
                1 if 2 * r < nr + 1 else 0,
                math.log(om / (1 - om)),
            )
        )

    if not per_mask:
        return spark.createDataFrame([], out_schema)
    nc = len(per_mask)
    nb = sum(p[2] for p in per_mask)
    sl = si = so = 0.0
    for sel_is, sel_oos, _below, lgt in per_mask:  # mask-ascending folds
        sl = sl + lgt
        si = si + sel_is
        so = so + sel_oos
    ncd = float(nc)
    return spark.createDataFrame(
        [
            (
                len(rows),
                S,
                nc,
                float(nb) / ncd,
                sl / ncd,
                si / ncd,
                so / ncd,
            )
        ],
        out_schema,
    )
