"""Regime diagnostics: Lo-MacKinlay variance ratio and the Hurst
exponent (aggregated-variance method).

Both answer the same production question — is this series trending,
mean-reverting, or a random walk right now? — and both are pure
multi-scale moment algebra, so they distribute as a handful of lag
windows plus one hash aggregate per symbol:

* ``variance_ratio`` — VR(q) = Var(r_t^(q)) / (q·Var(r_t^(1))) over
  overlapping q-period log returns (Lo & MacKinlay 1988).  VR < 1 ⇒
  mean reversion, VR > 1 ⇒ trending.  Emits the heteroskedasticity-
  robust-free z-statistic under the iid null:
  z = (VR − 1) / sqrt(2(2q−1)(q−1) / (3q·n)).
* ``hurst_exponent`` — aggregated-variance estimate: regress
  log Var(r^(q)) on log q over a dyadic scale ladder; H = slope/2.
  H ≈ 0.5 random walk, > 0.5 persistent/trending, < 0.5 anti-
  persistent/mean-reverting.

Distributed shape: the scale ladder is materialized as one lag window
per q over ONE per-symbol partitioning (the exchange is shared), then a
single hash aggregate collects every scale's moments; the tiny OLS
solve for H is scalar algebra on aggregate outputs.  No joins, no
Python, state per symbol is O(|ladder|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hurst_exponent", "return_acf", "runs_test", "variance_ratio"]


def _q_returns(x, order, q: int):
    return x - F.lag(x, q).over(order)


def variance_ratio(
    bars: DataFrame,
    *,
    q: int = 4,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Per-symbol Lo-MacKinlay variance ratio at horizon ``q``.

    Overlapping q-period returns; both variances are mean-corrected
    with their own sample means, matching the original estimator.
    Output: ``symbol, n_obs, vr, z`` — null unless at least two
    q-period returns exist (with gap-free prices that means ``q + 2``
    price rows; null closes reduce the return counts independently)
    and the base variance is positive.
    """
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")

    x = F.log(F.col(close_col).cast("double"))
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    r = bars.select(
        F.col(symbol_col),
        _q_returns(x, order, 1).alias("__r1"),
        _q_returns(x, order, q).alias("__rq"),
    )
    g = r.groupBy(symbol_col).agg(
        F.count("__r1").alias("__n1"),
        F.sum("__r1").alias("__s1"),
        F.sum(F.col("__r1") * F.col("__r1")).alias("__s11"),
        F.count("__rq").alias("__nq"),
        F.sum("__rq").alias("__sq"),
        F.sum(F.col("__rq") * F.col("__rq")).alias("__sqq"),
    )
    n1 = F.col("__n1").cast("double")
    nq = F.col("__nq").cast("double")
    var1 = (F.col("__s11") - F.col("__s1") * F.col("__s1") / n1) / n1
    varq = (F.col("__sqq") - F.col("__sq") * F.col("__sq") / nq) / nq
    ok = (F.col("__nq") >= 2) & (var1 > 0)
    vr = F.when(ok, varq / (q * var1))
    z = F.when(
        ok, (vr - 1) / F.sqrt(F.lit(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)) / n1)
    )
    return g.select(
        F.col(symbol_col),
        F.col("__n1").cast("long").alias("n_obs"),
        vr.alias("vr"),
        z.alias("z"),
    )


def hurst_exponent(
    bars: DataFrame,
    *,
    scales: tuple[int, ...] = (1, 2, 4, 8, 16),
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Per-symbol Hurst exponent via the aggregated-variance method.

    For each scale q, the variance of overlapping q-period log returns
    is computed; H is half the OLS slope of log Var against log q.
    Output: ``symbol, n_obs, hurst, r2`` (fit quality; both null when
    any scale has < 2 observations or zero variance).
    """
    if len(scales) < 2 or any(s < 1 for s in scales) or len(set(scales)) != len(scales):
        raise ValueError(f"scales must be >= 2 distinct positive ints, got {scales}")

    x = F.log(F.col(close_col).cast("double"))
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    cols = [F.col(symbol_col)]
    for q in scales:
        cols.append(_q_returns(x, order, q).alias(f"__r{q}"))
    r = bars.select(*cols)

    aggs = []
    for q in scales:
        c = F.col(f"__r{q}")
        aggs += [
            F.count(c).alias(f"__n{q}"),
            F.sum(c).alias(f"__s{q}"),
            F.sum(c * c).alias(f"__ss{q}"),
        ]
    g = r.groupBy(symbol_col).agg(*aggs)

    import math

    # log-variance per scale; validity requires every scale populated.
    lvs = []
    ok = F.lit(True)
    for q in scales:
        n = F.col(f"__n{q}").cast("double")
        var = (F.col(f"__ss{q}") - F.col(f"__s{q}") * F.col(f"__s{q}") / n) / n
        ok = ok & (F.col(f"__n{q}") >= 2) & (var > 0)
        lvs.append((math.log(float(q)), F.log(var)))

    k = float(len(scales))
    sx = sum(lx for lx, _ in lvs)
    sxx = sum(lx * lx for lx, _ in lvs)
    sy = lvs[0][1]
    sxy = lvs[0][0] * lvs[0][1]
    syy = lvs[0][1] * lvs[0][1]
    for lx, ly in lvs[1:]:
        sy = sy + ly
        sxy = sxy + lx * ly
        syy = syy + ly * ly
    den = k * sxx - sx * sx
    slope = (k * sxy - sx * sy) / den
    # r² of the log-log fit
    ss_tot = syy - sy * sy / k
    ss_res = ss_tot - slope * (sxy - sx * sy / k)
    r2 = F.when(ss_tot > 0, 1 - ss_res / ss_tot)

    hurst = F.when(ok, slope / 2)
    return g.select(
        F.col(symbol_col),
        F.col(f"__n{scales[0]}").cast("long").alias("n_obs"),
        hurst.alias("hurst"),
        F.when(ok, r2).alias("r2"),
    )


def return_acf(
    bars: DataFrame,
    *,
    lags: tuple[int, ...] = (1, 2, 3, 5, 10),
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Per-symbol autocorrelation function of log returns at the given
    lags, plus the Ljung-Box portmanteau statistic

        Q = n(n+2) · Σ_k ρ_k² / (n − k)

    (the classic "is there any linear predictability" test; under the
    iid null Q ~ χ²(#lags)).  ρ_k is the standard ACF estimator:
    lag-k autocovariance over the full-sample variance, both around the
    full-sample mean.

    One lag chain + ONE hash aggregate per symbol (every lag's products
    are columns of the same pass).  Output: ``symbol, n_obs,
    acf_<k>..., ljung_box_q`` (nulls when fewer than ``max(lags)+2``
    returns or zero variance).
    """
    if not lags or any(k < 1 for k in lags) or len(set(lags)) != len(lags):
        raise ValueError(f"lags must be distinct positive ints, got {lags}")

    c = F.col(close_col).cast("double")
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    r = F.log(c / F.lag(c).over(order))
    cols = [F.col(symbol_col), r.alias("__r")]
    for k in lags:
        cols.append(F.lag(r, k).over(order).alias(f"__l{k}"))
    base = bars.select(*cols).where(F.col("__r").isNotNull())

    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum("__r").alias("__s"),
        F.sum(F.col("__r") * F.col("__r")).alias("__ss"),
    ]
    for k in lags:
        lk = F.col(f"__l{k}")
        aggs.append(F.sum(F.when(lk.isNotNull(), F.col("__r") * lk)).alias(f"__p{k}"))
        aggs.append(F.sum(F.when(lk.isNotNull(), F.col("__r"))).alias(f"__a{k}"))
        aggs.append(F.sum(F.when(lk.isNotNull(), lk)).alias(f"__b{k}"))
        aggs.append(F.count(lk).alias(f"__n{k}"))
    g = base.groupBy(symbol_col).agg(*aggs)

    n = F.col("__n").cast("double")
    mean = F.col("__s") / n
    # full-sample denominator: Σ(r - r̄)² = ss - n·mean²
    den = F.col("__ss") - n * mean * mean
    kmax = max(lags)
    ok = (F.col("__n") >= kmax + 2) & (den > 0)

    out_cols = [F.col(symbol_col), F.col("__n").cast("long").alias("n_obs")]
    rhos = []
    for k in lags:
        # Σ (r_t - r̄)(r_{t-k} - r̄) over the n-k overlapping pairs
        num = (
            F.col(f"__p{k}")
            - mean * F.col(f"__a{k}")
            - mean * F.col(f"__b{k}")
            + F.col(f"__n{k}") * mean * mean
        )
        rho = F.when(ok, num / den)
        rhos.append((k, rho))
        out_cols.append(rho.alias(f"acf_{k}"))
    q = F.lit(0.0)
    for k, rho in rhos:
        q = q + rho * rho / (n - k)
    out_cols.append(F.when(ok, n * (n + 2) * q).alias("ljung_box_q"))
    return g.select(*out_cols)


def runs_test(
    bars: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Wald-Wolfowitz runs test on the sign sequence of bar returns —
    the classic distribution-free randomness gate: too FEW runs means
    trending/persistent signs, too MANY means mean-reverting flipping;
    |z| > ~2 rejects the i.i.d.-sign null either way.  Complements
    ``sign_autocorr`` (which measures lag-1 dependence; this measures
    the whole run-length structure).

    With ``n1`` up moves, ``n2`` down moves (zero returns excluded),
    ``n = n1 + n2`` and ``R`` observed runs:

        E[R]   = 1 + 2·n1·n2 / n
        Var[R] = 2·n1·n2·(2·n1·n2 − n) / (n² · (n − 1))
        z      = (R − E[R]) / sqrt(Var[R])

    Output per symbol: ``n_up, n_down, n_runs, expected_runs, z`` (z
    null when either side is empty or the variance degenerates).

    Shape: one lag window for returns, one ordered lag over the
    nonzero-sign rows to count sign changes (integer-exact), one hash
    aggregate.  The only float arithmetic is the final closed form
    from exact integers — engine-identical without ordered folds.
    """
    c = F.col(close_col).cast("double")
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    ret = F.log(c / F.lag(c).over(order))
    r = bars.withColumn("__ret", ret).where(
        F.col("__ret").isNotNull() & (F.col("__ret") != 0)
    )
    sign = F.when(F.col("__ret") > 0, F.lit(1)).otherwise(F.lit(-1))
    r = r.withColumn("__sgn", sign)
    prev = F.lag("__sgn").over(order)
    r = r.withColumn(
        "__new_run", F.when(prev.isNull() | (prev != F.col("__sgn")), 1).otherwise(0)
    )
    g = r.groupBy(symbol_col).agg(
        F.sum(F.when(F.col("__sgn") == 1, 1).otherwise(0)).cast("long").alias("n_up"),
        F.sum(F.when(F.col("__sgn") == -1, 1).otherwise(0)).cast("long").alias("n_down"),
        F.sum("__new_run").cast("long").alias("n_runs"),
    )
    n1 = F.col("n_up").cast("double")
    n2 = F.col("n_down").cast("double")
    n = n1 + n2
    e_r = 1 + 2 * n1 * n2 / n
    var_r = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    ok = (F.col("n_up") > 0) & (F.col("n_down") > 0) & (n > 1) & (var_r > 0)
    return g.select(
        F.col(symbol_col),
        "n_up",
        "n_down",
        "n_runs",
        F.when(n > 0, e_r).alias("expected_runs"),
        F.when(ok, (F.col("n_runs") - e_r) / F.sqrt(var_r)).alias("z"),
    )
