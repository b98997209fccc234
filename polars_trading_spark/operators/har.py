"""HAR-RV realized-volatility forecasting regression (Corsi 2009).

The Heterogeneous AutoRegressive model of Realized Volatility is the
workhorse vol forecaster: realized variance per time bucket,

    RV_{t+1} = c + b_s RV_t + b_m mean(RV_{t-1..t-p_mid})
                 + b_l mean(RV_{t-1..t-p_long}) + eps,

captures the cascade from long-horizon to short-horizon traders with
one OLS over three lag aggregates.  This operator fits it per symbol
and returns the coefficient row (plus fit diagnostics).

Distributed / determinism shape:

* squared log returns aggregate to per-(symbol, bucket) realized
  variance with one hash aggregate (map-side combinable);
* the mid/long lag means come from a RUNNING prefix sum of RV —
  ``(P_{t-1} - P_{t-1-p}) / p`` — never a sliding re-aggregation
  (SCALING.md rule 18b: bounded frames re-fold per row in Spark and
  segment-tree reassociate in other engines; prefix differences are
  both O(n) and fold-order deterministic);
* the OLS normal-equation sums run as bucket-ordered RUNNING sums
  read off each symbol's last row — the same left-to-right fold in
  any engine replaying the order — then the 3x3 centered system is
  solved in closed form (Cramer), intercept recovered from the means;
* lags are over OBSERVED buckets (row lags): empty buckets do not
  produce zero-RV rows.  One exchange on the symbol key end-to-end;
  zero joins, zero Python.

Guards: symbols with fewer than ``min_obs`` complete feature rows or
a singular (near-zero-determinant) design emit nulls for the
coefficients; n_obs is always reported.

Reference scope: the reference repo has no volatility forecasting
surface; this extends the risk/vol family (SURVEY.md §2-ext, next to
daily_vol / bar_volatility / corwin_schultz).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import truncate

__all__ = ["har_rv"]


def har_rv(
    df: DataFrame,
    *,
    bucket: str = "6h",
    p_mid: int = 4,
    p_long: int = 28,
    min_obs: int = 12,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
    seq_col: str | None = None,
    det_eps: float = 1e-30,
) -> DataFrame:
    """Fit HAR-RV per symbol; one output row per symbol.

    Output: ``symbol``, ``n_buckets`` (RV observations), ``n_obs``
    (complete feature rows fitted), ``c``, ``b_s``, ``b_m``, ``b_l``,
    ``r2`` (nulls when under ``min_obs`` or singular).
    """
    if p_long <= p_mid or p_mid < 1:
        raise ValueError(
            f"need p_long > p_mid >= 1, got p_mid={p_mid} p_long={p_long}"
        )
    if min_obs < 5:
        raise ValueError(f"min_obs must be >= 5 (4 parameters), got {min_obs}")

    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w_sym = Window.partitionBy(symbol_col).orderBy(*order)
    r = F.log(F.col(price_col) / F.lag(price_col).over(w_sym))
    rv = (
        df.withColumn("__r2", r * r)
        .withColumn("__b", truncate(F.col(ts_col), bucket))
        .where(F.col("__r2").isNotNull())
        .groupBy(symbol_col, "__b")
        .agg(F.sum("__r2").alias("rv"))
    )

    w_b = Window.partitionBy(symbol_col).orderBy("__b")
    w_run = w_b.rowsBetween(Window.unboundedPreceding, 0)
    feat = (
        rv.withColumn("__rn", F.row_number().over(w_b))
        .withColumn("__p", F.sum("rv").over(w_run))
        .withColumn("__xs", F.lag("rv", 1).over(w_b))
        .withColumn(
            "__xm",
            (
                F.lag("__p", 1).over(w_b)
                - F.coalesce(F.lag("__p", p_mid + 1).over(w_b), F.lit(0.0))
            )
            / p_mid,
        )
        .withColumn(
            "__xl",
            (
                F.lag("__p", 1).over(w_b)
                - F.coalesce(F.lag("__p", p_long + 1).over(w_b), F.lit(0.0))
            )
            / p_long,
        )
        .where(F.col("__rn") >= p_long + 1)
    )

    y = F.col("rv")
    xs, xm, xl = F.col("__xs"), F.col("__xm"), F.col("__xl")
    run = w_b.rowsBetween(Window.unboundedPreceding, 0)
    full = w_b.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sums = (
        feat.withColumn("__n", F.count(F.lit(1)).over(run))
        .withColumn("__nn", F.count(F.lit(1)).over(full))
        .withColumn("__ss", F.sum(xs).over(run))
        .withColumn("__sm", F.sum(xm).over(run))
        .withColumn("__sl", F.sum(xl).over(run))
        .withColumn("__sy", F.sum(y).over(run))
        .withColumn("__sss", F.sum(xs * xs).over(run))
        .withColumn("__smm", F.sum(xm * xm).over(run))
        .withColumn("__sll", F.sum(xl * xl).over(run))
        .withColumn("__ssm", F.sum(xs * xm).over(run))
        .withColumn("__ssl", F.sum(xs * xl).over(run))
        .withColumn("__sml", F.sum(xm * xl).over(run))
        .withColumn("__ssy", F.sum(xs * y).over(run))
        .withColumn("__smy", F.sum(xm * y).over(run))
        .withColumn("__sly", F.sum(xl * y).over(run))
        .withColumn("__syy", F.sum(y * y).over(run))
        .where(F.col("__n") == F.col("__nn"))
    )

    n = F.col("__n").cast("double")
    # centered second moments
    css = F.col("__sss") - F.col("__ss") * F.col("__ss") / n
    cmm = F.col("__smm") - F.col("__sm") * F.col("__sm") / n
    cll = F.col("__sll") - F.col("__sl") * F.col("__sl") / n
    csm = F.col("__ssm") - F.col("__ss") * F.col("__sm") / n
    csl = F.col("__ssl") - F.col("__ss") * F.col("__sl") / n
    cml = F.col("__sml") - F.col("__sm") * F.col("__sl") / n
    csy = F.col("__ssy") - F.col("__ss") * F.col("__sy") / n
    cmy = F.col("__smy") - F.col("__sm") * F.col("__sy") / n
    cly = F.col("__sly") - F.col("__sl") * F.col("__sy") / n
    cyy = F.col("__syy") - F.col("__sy") * F.col("__sy") / n

    det = (
        css * (cmm * cll - cml * cml)
        - csm * (csm * cll - cml * csl)
        + csl * (csm * cml - cmm * csl)
    )
    b_s = (
        csy * (cmm * cll - cml * cml)
        - csm * (cmy * cll - cml * cly)
        + csl * (cmy * cml - cmm * cly)
    ) / det
    b_m = (
        css * (cmy * cll - cly * cml)
        - csy * (csm * cll - cml * csl)
        + csl * (csm * cly - cmy * csl)
    ) / det
    b_l = (
        css * (cmm * cly - cml * cmy)
        - csm * (csm * cly - cmy * csl)
        + csy * (csm * cml - cmm * csl)
    ) / det
    c = (
        F.col("__sy") - b_s * F.col("__ss") - b_m * F.col("__sm")
        - b_l * F.col("__sl")
    ) / n
    sse = cyy - (b_s * csy + b_m * cmy + b_l * cly)
    r2 = F.when(cyy > 0, F.lit(1.0) - sse / cyy)

    ok = (F.col("__n") >= min_obs) & (F.abs(det) > det_eps)
    counts = rv.groupBy(symbol_col).agg(F.count(F.lit(1)).alias("n_buckets"))
    out = sums.select(
        symbol_col,
        F.col("__n").alias("n_obs"),
        F.when(ok, c).alias("c"),
        F.when(ok, b_s).alias("b_s"),
        F.when(ok, b_m).alias("b_m"),
        F.when(ok, b_l).alias("b_l"),
        F.when(ok, r2).alias("r2"),
    )
    return counts.join(out, symbol_col, "left").select(
        symbol_col, "n_buckets",
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        "c", "b_s", "b_m", "b_l", "r2",
    )
