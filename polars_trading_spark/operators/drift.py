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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["psi_drift"]


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
