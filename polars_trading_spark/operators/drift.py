"""Feature drift monitoring: Population Stability Index per symbol.

A deployed model's features drift; the PSI is the standard production
monitor: bin the feature on a reference window, compare the current
window's bin proportions,

    PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)

with the usual traffic-light reading (< 0.1 stable, 0.1–0.2 watch,
> 0.2 drifted).  Bins are equal-width over the REFERENCE min/max
(deterministic on every engine — quantile bins are engine-dependent);
out-of-range current values clamp into the edge bins, and proportions
are ε-smoothed so empty bins stay finite.

Distributed shape: one conditional aggregate finds per-key reference
ranges, a broadcast join attaches them, one (key, bin) hash aggregate
counts both sides map-side, one per-key reduce sums the PSI — no
windows, no Python, state per key is O(bins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ks_drift", "psi_drift"]


def ks_drift(
    df: DataFrame,
    value_col: str,
    *,
    split_ts,
    alpha_coeff: float = 1.358,  # c(alpha) for alpha = 0.05
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift test of ``value_col``
    per symbol: rows before ``split_ts`` are the reference sample, rows
    at/after the current one.  Complements ``psi_drift`` — KS is
    binning-free (no reference-range or bin-count dial) and comes with
    a distribution-free critical value.

    Output: ``symbol, n_ref, n_cur, ks, ks_critical, drifted`` where
    ``ks_critical = alpha_coeff * sqrt((n_ref + n_cur) /
    (n_ref * n_cur))`` (the large-sample two-sample threshold;
    1.358 ~ alpha 0.05) and ``drifted = ks > ks_critical``.  Symbols
    with an empty side emit null ``ks``/``drifted``.

    Distributed shape: ONE (symbol, value) hash aggregate collapses
    ties, then running side-counts over the per-symbol value ordering
    give both empirical CDFs in a single window pass; the KS statistic
    is the partition max.  Integer cumulative sums make the statistic
    bit-identical across engines.  No joins, no Python; state per
    symbol is the distinct-value count, never the row count.
    """
    x = F.col(value_col).cast("double")
    is_ref = F.col(ts_col) < F.lit(split_ts)
    t = df.where(x.isNotNull()).select(
        F.col(symbol_col), x.alias("__x"), is_ref.alias("__ref")
    )
    g = t.groupBy(symbol_col, "__x").agg(
        F.count(F.when(F.col("__ref"), F.lit(1))).alias("__r"),
        F.count(F.when(~F.col("__ref"), F.lit(1))).alias("__c"),
    )
    w = Window.partitionBy(symbol_col).orderBy("__x")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    g = (
        g.withColumn("__nr", F.sum("__r").over(full))
        .withColumn("__nc", F.sum("__c").over(full))
        .withColumn("__cr", F.sum("__r").over(run))
        .withColumn("__cc", F.sum("__c").over(run))
    )
    ok = (F.col("__nr") > 0) & (F.col("__nc") > 0)
    diff = F.when(
        ok, F.abs(F.col("__cr") / F.col("__nr") - F.col("__cc") / F.col("__nc"))
    )
    per = g.withColumn("__d", diff).groupBy(symbol_col).agg(
        F.max("__nr").alias("n_ref"),
        F.max("__nc").alias("n_cur"),
        F.max("__d").alias("ks"),
    )
    n_r, n_c = F.col("n_ref").cast("double"), F.col("n_cur").cast("double")
    ok2 = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    crit = F.when(ok2, F.lit(float(alpha_coeff)) * F.sqrt((n_r + n_c) / (n_r * n_c)))
    return per.select(
        F.col(symbol_col),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.when(ok2, F.col("ks")).alias("ks"),
        crit.alias("ks_critical"),
        F.when(ok2, F.col("ks") > crit).alias("drifted"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    *,
    split_ts,
    bins: int = 10,
    epsilon: float = 1e-4,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
) -> DataFrame:
    """PSI of ``value_col`` per symbol: rows before ``split_ts`` are the
    reference population, rows at/after are the current one.

    Output: ``symbol, n_ref, n_cur, psi, drifted`` (PSI > 0.2).  Keys
    with an empty CURRENT side or a degenerate reference range emit a
    row with null psi; keys with no reference rows at all are OMITTED —
    binning is defined by the reference range, so there is nothing to
    compare a current population against (the inner join to the
    per-symbol range table drops them).
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")

    x = F.col(value_col).cast("double")
    is_ref = F.col(ts_col) < F.lit(split_ts)
    t = df.where(x.isNotNull()).select(
        F.col(symbol_col), x.alias("__x"), is_ref.alias("__ref")
    )

    rng = t.where("__ref").groupBy(symbol_col).agg(
        F.min("__x").alias("__mn"), F.max("__x").alias("__mx")
    )
    j = t.join(F.broadcast(rng), symbol_col)
    raw = F.floor((F.col("__x") - F.col("__mn")) / (F.col("__mx") - F.col("__mn")) * bins)
    bin_ = F.when(
        F.col("__mx") > F.col("__mn"),
        F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)),
    ).otherwise(F.lit(0))
    g = j.withColumn("__bin", bin_).groupBy(symbol_col, "__bin").agg(
        F.count(F.when(F.col("__ref"), F.lit(1))).alias("__cr"),
        F.count(F.when(~F.col("__ref"), F.lit(1))).alias("__cc"),
    )

    tot = g.groupBy(symbol_col).agg(
        F.sum("__cr").alias("n_ref"), F.sum("__cc").alias("n_cur")
    )
    e = float(epsilon)
    scored = g.join(tot, symbol_col)
    # guarded: an empty side must yield null psi, not an ANSI
    # divide-by-zero error
    p_ref = F.when(F.col("n_ref") > 0, F.col("__cr") / F.col("n_ref") + e)
    p_cur = F.when(F.col("n_cur") > 0, F.col("__cc") / F.col("n_cur") + e)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    out = scored.groupBy(symbol_col, "n_ref", "n_cur").agg(
        F.sum(term).alias("__psi")
    )
    ok = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    psi = F.when(ok, F.col("__psi"))
    return out.select(
        F.col(symbol_col),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        psi.alias("psi"),
        F.when(ok, F.col("__psi") > 0.2).alias("drifted"),
    )
