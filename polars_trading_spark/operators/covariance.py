"""Ledoit-Wolf shrunk covariance of bar returns, computed pairwise.

Portfolio construction (mean-variance, risk parity, HRP) consumes a
covariance matrix whose sample estimate is badly conditioned when the
universe is wide relative to history.  Ledoit & Wolf (2004, "A
well-conditioned estimator for large-dimensional covariance matrices")
shrink the sample matrix toward a scaled identity with a closed-form
optimal intensity — the estimator sklearn ships as ``LedoitWolf``.

The matrix never materializes as a matrix here: every quantity is a
per-pair aggregate —

    S_ij = Σ_t x_it·x_jt / n          (sample covariance, demeaned x)
    q_ij = Σ_t (x_it·x_jt)²           (the only extra moment needed)

    m  = trace(S)/p                    (identity target scale)
    d² = Σ_ij (S_ij − m·δ_ij)² / p     (sample-target distance)
    b̄² = (Σ_ij q_ij/n² − Σ_ij S_ij²/n) / p   (estimation noise)
    shrink = min(b̄², d²) / d²,  Σ* = shrink·m·I + (1−shrink)·S

so a million-symbol universe is: one timestamp-aligned pair join
(O(pairs × bars) — quadratic in WIDTH, the irreducible output size),
ONE hash aggregate per pair, one tiny global aggregate over pairs, and
a broadcast of the two scalars back.  No driver-side matrix, no
eigendecomposition, no Python.

Alignment contract: only timestamps observed for EVERY symbol enter
(complete-case alignment, enforced with a per-timestamp count) — the
estimator assumes a dense observation matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ledoit_wolf_cov", "risk_contributions"]


def ledoit_wolf_cov(
    bars: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Pairwise Ledoit-Wolf shrunk covariance of per-bar log returns.

    Returns one row per unordered pair incl. the diagonal (``sym_a ≤
    sym_b``): ``n_obs, cov_sample, cov_shrunk, shrinkage, mu`` (the
    latter two are the global intensity and identity scale, repeated on
    every row for self-containedness).  Needs ≥ 2 aligned observations
    and ≥ 1 symbol; degenerate inputs yield ``shrinkage`` null and
    ``cov_shrunk = cov_sample``.
    """
    c = F.col(close_col).cast("double")
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    r = bars.select(
        F.col(symbol_col).alias("__s"),
        F.col(ts_col).alias("__ts"),
        F.log(c / F.lag(c).over(order)).alias("__r"),
    ).where(F.col("__r").isNotNull())

    # Complete-case alignment: a timestamp enters iff every symbol has a
    # return there.  The universe size rides as a broadcast one-row
    # aggregate (no driver collect, no job at plan build).  The per-ts
    # presence count is DISTINCT symbols (collect_set size — window
    # aggregates reject COUNT(DISTINCT)), so a duplicated (symbol, ts)
    # row cannot mask another symbol's absence and sneak a misaligned
    # bucket past the check.
    nsym = r.agg(F.count_distinct("__s").alias("__nsym"))
    per_ts = F.size(F.collect_set("__s").over(Window.partitionBy("__ts")))
    r = (
        r.withColumn("__cts", per_ts)
        .join(F.broadcast(nsym))
        .where(F.col("__cts") == F.col("__nsym"))
        .drop("__cts", "__nsym")
    )

    # Demean per symbol over the aligned sample (one projection — each
    # extra DataFrame op is a full eager re-analysis of the plan).
    mean_s = F.avg("__r").over(Window.partitionBy("__s"))
    x = r.select("__s", "__ts", (F.col("__r") - mean_s).alias("__x"))

    a = x.select(F.col("__s").alias("sym_a"), "__ts", F.col("__x").alias("__xa"))
    b = x.select(F.col("__s").alias("sym_b"), "__ts", F.col("__x").alias("__xb"))
    paired = a.join(b, on="__ts").where(F.col("sym_a") <= F.col("sym_b"))

    prod = F.col("__xa") * F.col("__xb")
    per_pair = paired.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(prod).alias("__sp"),
        F.sum(prod * prod).alias("__q"),
    )
    per_pair = per_pair.withColumn("__sij", F.col("__sp") / F.col("__n"))

    # Global scalars over the pair table (off-diagonal entries count
    # twice — S is symmetric).
    diag = F.col("sym_a") == F.col("sym_b")
    w2 = F.when(diag, F.lit(1.0)).otherwise(F.lit(2.0))
    glob = per_pair.agg(
        F.max("__n").alias("__nn"),
        F.sum(F.when(diag, F.col("__sij"))).alias("__tr"),
        F.count(F.when(diag, F.lit(1))).alias("__p"),
        F.sum(w2 * F.col("__sij") * F.col("__sij")).alias("__ss2"),
        F.sum(w2 * F.col("__q")).alias("__sq"),
    )
    m = F.col("__tr") / F.col("__p")
    p_ = F.col("__p").cast("double")
    n_ = F.col("__nn").cast("double")
    # d² = (Σ_ij S_ij² − 2m·tr(S) + p·m²)/p  — expand ||S − mI||²_F
    d2 = (F.col("__ss2") - 2 * m * F.col("__tr") + p_ * m * m) / p_
    b2raw = (F.col("__sq") / (n_ * n_) - F.col("__ss2") / n_) / p_
    b2 = F.least(F.greatest(b2raw, F.lit(0.0)), d2)
    shrink = F.when((F.col("__nn") >= 2) & (d2 > 0), b2 / d2)
    scalars = glob.select(
        shrink.alias("shrinkage"), m.alias("mu"), F.lit(1).alias("__one")
    )

    out = per_pair.crossJoin(F.broadcast(scalars.drop("__one")))
    target = F.when(diag, F.col("mu")).otherwise(F.lit(0.0))
    shrunk = F.when(
        F.col("shrinkage").isNotNull(),
        F.col("shrinkage") * target + (1 - F.col("shrinkage")) * F.col("__sij"),
    ).otherwise(F.col("__sij"))
    return out.select(
        "sym_a",
        "sym_b",
        F.col("__n").cast("long").alias("n_obs"),
        F.col("__sij").alias("cov_sample"),
        shrunk.alias("cov_shrunk"),
        "shrinkage",
        "mu",
    )


def risk_contributions(
    bars: DataFrame,
    *,
    use_shrunk: bool = True,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Inverse-variance portfolio risk decomposition over the pairwise
    (Ledoit-Wolf) covariance — the risk-budgeting report HRP's
    bisection uses implicitly, as a fully declarative frame:

    * ``weight``   — inverse-variance weights ``(1/sigma_ii) / sum``
    * ``mrc``      — marginal risk contribution ``(Sigma w)_i``
    * ``rc``       — risk contribution ``w_i * (Sigma w)_i``
    * ``rc_share`` — ``rc_i / w' Sigma w`` (sums to 1)

    Everything is computed from the pair table without materializing a
    matrix; every float reduction that fans into the outputs (the
    inverse-variance total, each row's ``Sigma w`` dot product, the
    portfolio variance) is an ORDER-DETERMINISTIC running fold over the
    symbol order read at its last row — bit-identical on any engine or
    partitioning, which is what lets the DuckDB oracle gate it exactly.

    Scale shape: the pair join + hash agg of ``ledoit_wolf_cov`` (the
    data-sized work), then symbol- and pair-table-sized windows; the
    weight table rides a broadcast join.  Zero Python.
    """
    from polars_trading_spark._utils import persist_tracked

    cov_col = "cov_shrunk" if use_shrunk else "cov_sample"
    # the pair table is universe-sized (N(N+1)/2 rows) but feeds FOUR
    # consumers (both union branches, the diagonal, the weight join) —
    # unpersisted, each re-executes the full bar scan + pair join
    pairs = persist_tracked(
        ledoit_wolf_cov(
            bars, symbol_col=symbol_col, ts_col=ts_col, close_col=close_col
        ).select("sym_a", "sym_b", F.col(cov_col).alias("__cov")),
        eager=True,  # the 4 consumers are AQE-concurrent: lazily
        # persisted, each re-ran the bar scan + pair join (r15 §5.3)
    )

    sym_pairs = pairs.union(
        pairs.where(F.col("sym_a") != F.col("sym_b")).select(
            F.col("sym_b").alias("sym_a"),
            F.col("sym_a").alias("sym_b"),
            "__cov",
        )
    )

    # inverse-variance weights via an ordered fold over the symbol order
    diag = pairs.where(F.col("sym_a") == F.col("sym_b")).select(
        F.col("sym_a").alias("__sym"), F.col("__cov").alias("__var")
    )
    wrun = Window.orderBy("__sym").rowsBetween(Window.unboundedPreceding, 0)
    wfull = Window.orderBy("__sym").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # stage the running fold as a real column first (a window cannot
    # nest inside another window), then read its last value
    weights = (
        diag.withColumn("__irun", F.sum(1.0 / F.col("__var")).over(wrun))
        .withColumn("__itot", F.last("__irun").over(wfull))
        .select(
            "__sym",
            "__var",
            ((1.0 / F.col("__var")) / F.col("__itot")).alias("__w"),
        )
    )

    # mrc_i = (Sigma w)_i: per-sym_a ordered fold over sym_b
    j = sym_pairs.join(
        F.broadcast(weights.select(F.col("__sym").alias("sym_b"), "__w")),
        "sym_b",
    )
    orun = Window.partitionBy("sym_a").orderBy("sym_b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ofull = Window.partitionBy("sym_a").orderBy("sym_b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mrc = (
        j.withColumn(
            "__drun", F.sum(F.col("__cov") * F.col("__w")).over(orun)
        )
        .select(
            "sym_a",
            F.last("__drun").over(ofull).alias("__mrc"),
            F.row_number()
            .over(Window.partitionBy("sym_a").orderBy("sym_b"))
            .alias("__rn"),
        )
        .where(F.col("__rn") == 1)
        .select(F.col("sym_a").alias("__sym"), "__mrc")
    )

    out = weights.join(mrc, "__sym")
    # portfolio variance: ordered fold of w_i * mrc_i over symbols
    out = out.withColumn(
        "__pvrun", F.sum(F.col("__w") * F.col("__mrc")).over(wrun)
    ).withColumn("__pv", F.last("__pvrun").over(wfull))
    return out.select(
        F.col("__sym").alias("symbol"),
        F.col("__w").alias("weight"),
        F.col("__var").alias("variance"),
        F.col("__mrc").alias("mrc"),
        (F.col("__w") * F.col("__mrc")).alias("rc"),
        (F.col("__w") * F.col("__mrc") / F.col("__pv")).alias("rc_share"),
        F.col("__pv").alias("portfolio_variance"),
    )
