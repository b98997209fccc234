"""Structural breaks: rolling supremum Dickey-Fuller statistic (SADF,
AFML ch.17; Phillips/Wu/Yu 2011 explosive-bubble test).

At each observation, regress ``dy_k = alpha + beta * y_{k-1} [+ sum_j
gamma_j * dy_{k-j}]`` over the trailing window of length ``l`` for every
``l`` in ``[min_span, max_span]`` and take the supremum of beta's
t-statistic — values above the PWY critical surface flag explosive
(bubble) regimes.  ``lags`` selects the ADF augmentation order: 0 is
the plain Dickey-Fuller member, 1–2 add lagged-difference regressors
(standard PWY practice corrects serial correlation with ADF(1–2)).

Dataflow twin of ``trend_scan`` mirrored backward: ONE
(symbol)-partitioned window pass materializes the trailing price vector
``y_t, ..., y_{t-max_span-lags}`` via ``lag``; an Arrow-batched numpy
kernel computes every window-length t-stat from row-wise ``np.cumsum``
prefix sums over the **newest-first** matrix (so every trailing window
is a prefix — no suffix/total subtraction whose float association would
diverge from the oracle's chains) and takes the sup in the same pass.
numpy's sequential row-wise accumulation reproduces the SQL oracle's
left-associated newest-first chains bit-for-bit, and the lags<=1 paths
solve the normal equations with explicitly-parenthesized Cramer
formulas written identically in the DuckDB oracle, so the sup over raw
doubles — ties to the shortest window — selects the identical
(stat, span) on both engines with no rounding needed.  lags=2 uses a
batched ``np.linalg`` solve (property-tested against direct per-window
OLS; a 4x4 Cramer expansion has no readable SQL twin).  No joins, no
shuffle beyond the window sort, and the selection costs one ``argmax``
per row instead of a 31-candidate expression forest (measured
13s -> ~6s at sf0.1 vs the Column-algebra selection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bde_cusum", "csw_explosiveness", "sadf"]


def _df_stats_lag0(m: np.ndarray, spans: np.ndarray) -> np.ndarray:
    """t-stat matrix (rows x spans) for the plain DF regression."""
    y = m[:, :-1]       # y_k   (newest first: y_t ... y_{t-max+1})
    x = m[:, 1:]        # y_{k-1}
    d = y - x           # dy_k
    sx = np.cumsum(x, axis=1)
    sxx = np.cumsum(x * x, axis=1)
    sd = np.cumsum(d, axis=1)
    sxd = np.cumsum(x * d, axis=1)
    sdd = np.cumsum(d * d, axis=1)
    stats = np.empty((m.shape[0], len(spans)), dtype=np.float64)
    for i, l in enumerate(spans):
        n = float(l)
        a, b, c, e, g = sx[:, l - 1], sxx[:, l - 1], sd[:, l - 1], sxd[:, l - 1], sdd[:, l - 1]
        denom = n * b - a * a
        with np.errstate(invalid="ignore", divide="ignore"):
            beta = (n * e - a * c) / denom
            alpha = (c - beta * a) / n
            sse = np.maximum(g - alpha * c - beta * e, 0.0)
            se2 = (sse / (n - 2.0)) / (b - a * a / n)
            t = beta / np.sqrt(se2)
        t[~(se2 > 0) | ~(np.abs(denom) > 0)] = np.nan
        stats[:, i] = t
    return stats


def _df_stats_lag1(m: np.ndarray, spans: np.ndarray, max_span: int) -> np.ndarray:
    """t-stat matrix for ADF(1): dy_k = a + b*y_{k-1} + g*dy_{k-1}.

    Cramer's rule on the 3x3 normal system, every formula parenthesized
    exactly as the DuckDB oracle writes it (bit-exact across engines).
    """
    c0 = m  # rows x (max_span + 2), newest first
    d = c0[:, 0:max_span] - c0[:, 1 : max_span + 1]       # dy_k
    x = c0[:, 1 : max_span + 1]                           # y_{k-1}
    z = c0[:, 1 : max_span + 1] - c0[:, 2 : max_span + 2] # dy_{k-1}
    sx = np.cumsum(x, axis=1)
    sxx = np.cumsum(x * x, axis=1)
    sz = np.cumsum(z, axis=1)
    szz = np.cumsum(z * z, axis=1)
    sxz = np.cumsum(x * z, axis=1)
    sd = np.cumsum(d, axis=1)
    sxd = np.cumsum(x * d, axis=1)
    szd = np.cumsum(z * d, axis=1)
    sdd = np.cumsum(d * d, axis=1)
    stats = np.empty((m.shape[0], len(spans)), dtype=np.float64)
    for i, l in enumerate(spans):
        n = float(l)
        k = l - 1
        A, B, Z, ZZ, XZ = sx[:, k], sxx[:, k], sz[:, k], szz[:, k], sxz[:, k]
        D, XD, ZD, DD = sd[:, k], sxd[:, k], szd[:, k], sdd[:, k]
        with np.errstate(invalid="ignore", divide="ignore"):
            det = (n * ((B * ZZ) - (XZ * XZ))) - (A * ((A * ZZ) - (XZ * Z))) + (
                Z * ((A * XZ) - (B * Z))
            )
            det_b = (n * ((XD * ZZ) - (XZ * ZD))) - (D * ((A * ZZ) - (XZ * Z))) + (
                Z * ((A * ZD) - (XD * Z))
            )
            det_a = (D * ((B * ZZ) - (XZ * XZ))) - (A * ((XD * ZZ) - (XZ * ZD))) + (
                Z * ((XD * XZ) - (B * ZD))
            )
            det_g = (n * ((B * ZD) - (XD * XZ))) - (A * ((A * ZD) - (XD * Z))) + (
                D * ((A * XZ) - (B * Z))
            )
            beta = det_b / det
            alpha = det_a / det
            gamma = det_g / det
            sse = np.maximum(((DD - (alpha * D)) - (beta * XD)) - (gamma * ZD), 0.0)
            se2 = ((sse / (n - 3.0)) * ((n * ZZ) - (Z * Z))) / det
            t = beta / np.sqrt(se2)
        t[~(se2 > 0) | ~(np.abs(det) > 0)] = np.nan
        stats[:, i] = t
    return stats


def _df_stats_general(
    m: np.ndarray, spans: np.ndarray, max_span: int, lags: int
) -> np.ndarray:
    """t-stat matrix for ADF(p), p >= 2: batched normal-equation solve.

    Regressors per observation: [1, y_{k-1}, dy_{k-1}, ..., dy_{k-p}].
    Singular windows are masked to NaN (same validity contract as the
    closed-form paths).
    """
    c0 = m  # rows x (max_span + 1 + lags)
    d = c0[:, 0:max_span] - c0[:, 1 : max_span + 1]
    regs = [np.ones_like(d), c0[:, 1 : max_span + 1]]
    for j in range(1, lags + 1):
        regs.append(c0[:, j : max_span + j] - c0[:, j + 1 : max_span + j + 1])
    k = len(regs)
    cross = [[np.cumsum(regs[a] * regs[b], axis=1) for b in range(k)] for a in range(k)]
    rhs = [np.cumsum(regs[a] * d, axis=1) for a in range(k)]
    sdd = np.cumsum(d * d, axis=1)
    rows = m.shape[0]
    stats = np.empty((rows, len(spans)), dtype=np.float64)
    eye = np.eye(k)
    for i, l in enumerate(spans):
        idx = l - 1
        M = np.empty((rows, k, k))
        for a in range(k):
            for b in range(k):
                M[:, a, b] = cross[a][b][:, idx]
        v = np.stack([rhs[a][:, idx] for a in range(k)], axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            det = np.linalg.det(M)
            bad = ~(np.abs(det) > 0) | ~np.isfinite(det)
            Msafe = np.where(bad[:, None, None], eye, M)
            sol = np.linalg.solve(Msafe, v)
            inv = np.linalg.inv(Msafe)
            fitted = np.einsum("rk,rk->r", sol, v)
            sse = np.maximum(sdd[:, idx] - fitted, 0.0)
            sigma2 = sse / (float(l) - float(k))
            se2 = sigma2 * inv[:, 1, 1]
            t = sol[:, 1] / np.sqrt(se2)
        t[bad | ~(se2 > 0)] = np.nan
        stats[:, i] = t
    return stats


def _sadf_kernel(min_span: int, max_span: int, lags: int):
    """Trailing-price matrix (newest first, width max_span+1+lags) ->
    (sup t-stat, winning span); nulls where no window is valid."""
    spans = np.arange(min_span, max_span + 1)

    @F.pandas_udf("stat double, span int")
    def kernel(hist: pd.Series) -> pd.DataFrame:
        m = np.array(hist.tolist(), dtype=np.float64)  # rows x (max_span+1+lags)
        if m.ndim != 2 or m.shape[0] == 0:
            return pd.DataFrame({"stat": [], "span": []})
        if lags == 0:
            stats = _df_stats_lag0(m, spans)
        elif lags == 1:
            stats = _df_stats_lag1(m, spans, max_span)
        else:
            stats = _df_stats_general(m, spans, max_span, lags)
        # validity must mirror the oracle's WHERE exactly (NaN = invalid);
        # +/-inf stats, if they ever occur, stay comparable on both sides
        valid = ~np.isnan(stats)
        any_valid = valid.any(axis=1)
        masked = np.where(valid, stats, -np.inf)
        idx = np.argmax(masked, axis=1)  # first max -> smallest span on ties
        rows = np.arange(m.shape[0])
        stat = pd.Series(stats[rows, idx], dtype="Float64")
        span = pd.Series(spans[idx], dtype="Int32")
        stat[~any_valid] = pd.NA
        span[~any_valid] = pd.NA
        return pd.DataFrame({"stat": stat, "span": span})

    return kernel


def sadf(
    df: DataFrame,
    *,
    min_span: int = 10,
    max_span: int = 40,
    lags: int = 0,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
) -> DataFrame:
    """Rolling sup-DF statistic per observation.

    Returns ``symbol, ts_event, sadf_stat, sadf_span`` where
    ``sadf_stat`` is the supremum trailing ADF(``lags``) t-statistic and
    ``sadf_span`` the window length attaining it (smallest on ties).
    Rows with insufficient preceding observations get nulls.
    """
    if min_span < 3 + lags:
        raise ValueError(f"min_span must be >= {3 + lags} for lags={lags}, got {min_span}")
    if max_span < min_span:
        raise ValueError(f"max_span ({max_span}) < min_span ({min_span})")
    if lags < 0:
        raise ValueError(f"lags must be >= 0, got {lags}")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    p0 = F.col(price_col).cast("double")
    hist = [p0] + [F.lag(p0, k).over(order) for k in range(1, max_span + 1 + lags)]

    base = df.select(symbol_col, ts_col, F.array(*hist).alias("__hist"))
    # Round 14 (guide §2.5/§2.6): the lag window partitions by symbol,
    # so the CPU-dense ADF kernel downstream inherits at most
    # n_symbols-way parallelism — a handful of tasks on a small input.
    # Kernel rows are independent once ``__hist`` is built, so when the
    # SOURCE is a small single-split scan (bench scale; real-scale scans
    # have thousands of splits and skip this) rebalance the hist table
    # round-robin across every core.  One extra exchange of the hist
    # arrays, bounded by the small-input guard.
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < min(sc.defaultParallelism, 8):
        base = base.repartition(sc.defaultParallelism)
    kernel = _sadf_kernel(min_span, max_span, lags)
    return base.withColumn("__r", kernel("__hist")).select(
        symbol_col,
        ts_col,
        F.col("__r.stat").alias("sadf_stat"),
        F.col("__r.span").cast("int").alias("sadf_span"),
    )


def csw_explosiveness(
    df: DataFrame,
    *,
    max_lag: int = 25,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
) -> DataFrame:
    """Chu-Stinchcombe-White one-sided explosiveness statistic (AFML
    17.3.2): ``S_{n,t} = (y_t - y_n) / (sigma_t * sqrt(t - n))`` over log
    prices, supremum over the bounded lookback ``n in [t - max_lag,
    t - 1]``, with ``sigma_t^2`` the expanding mean of squared log-price
    increments up to t.

    Unlike SADF (a full regression per window) this is pure arithmetic
    per lag, so it stays entirely inside whole-stage codegen: one
    (symbol)-ordered window pass materializes the lag columns and the
    expanding variance, the sup is a ``greatest`` over ``max_lag``
    candidate expressions, and the winning lag is the first (smallest)
    lag attaining it.  The sup's argmax is invariant to the last-ulp
    association of ``sigma_t`` because every candidate shares the same
    ``1/sigma_t`` factor.

    Returns ``symbol, ts, csw_stat, csw_lag, csw_crit`` where
    ``csw_crit = sqrt(4.6 + ln(csw_lag))`` is the one-sided 5%%
    time-varying critical boundary (b_alpha = 4.6, AFML 17.3.2) — a
    regime is flagged explosive when ``csw_stat > csw_crit``.  Rows with
    no valid lag (start of series, zero variance) get nulls.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")

    from polars_trading_spark._utils import SEQ_COL, with_seq

    df = with_seq(df)
    order = Window.partitionBy(symbol_col).orderBy(ts_col, SEQ_COL)
    expanding = order.rowsBetween(Window.unboundedPreceding, 0)
    y = F.log(F.col(price_col).cast("double"))
    base = df.select(symbol_col, ts_col, SEQ_COL, y.alias("__y"))
    dy = F.col("__y") - F.lag("__y").over(order)
    base = base.withColumn("__sq", dy * dy)
    sigma2 = F.avg("__sq").over(expanding)
    base = base.withColumn("__s2", sigma2)

    stats = []
    for k in range(1, max_lag + 1):
        num = F.col("__y") - F.lag("__y", k).over(order)
        s = F.when(
            F.col("__s2") > 0, num / F.sqrt(F.col("__s2") * F.lit(float(k)))
        )
        stats.append(s.alias(f"__s{k}"))
    base = base.select(symbol_col, ts_col, *stats)

    sup = F.greatest(*[F.col(f"__s{k}") for k in range(1, max_lag + 1)]) if max_lag > 1 else F.col("__s1")
    base = base.withColumn("__sup", sup)
    win = F.coalesce(
        *[
            F.when(F.col(f"__s{k}") == F.col("__sup"), F.lit(k))
            for k in range(1, max_lag + 1)
        ]
    )
    return base.select(
        symbol_col,
        ts_col,
        F.col("__sup").alias("csw_stat"),
        win.cast("int").alias("csw_lag"),
        F.when(
            F.col("__sup").isNotNull(), F.sqrt(F.lit(4.6) + F.log(win.cast("double")))
        ).alias("csw_crit"),
    )


def bde_cusum(
    df: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
) -> DataFrame:
    """Brown-Durbin-Evans CUSUM test on recursive residuals (Brown,
    Durbin & Evans 1975; AFML 17.3.1) over log prices, per symbol.

    Model: expanding-window OLS of ``y_t = b0 + b1 * t`` (intercept +
    linear trend, k=2 regressors).  The recursive residual at ``t`` is

        w_t = (y_t - x_t' b_{t-1}) / sqrt(1 + x_t' (X'X)_{t-1}^{-1} x_t)

    computed entirely from expanding prefix sums (n, Σj, Σj², Σy, Σjy
    over rows < t) — the 2×2 normal equations solve in closed form, so
    the whole test is one (symbol)-ordered window pass with zero Python
    and no joins.  Under the null of parameter stability the w_t are
    i.i.d. N(0, σ²); the statistic is the running CUSUM of w
    standardized by the *expanding* sample std of w (the online variant
    — the classical fixed-sample σ_w is a full-pass estimate; with the
    expanding σ the operator stays single-pass and
    streaming-resumable).

    Returns ``symbol, ts, bde_w, bde_stat, bde_crit`` where ``bde_crit``
    is the classical two-sided 5% boundary ``0.948 * (sqrt(T-k) +
    2*(t-k)/sqrt(T-k))`` (T = per-symbol length via a whole-partition
    count — no extra shuffle); a regime change is signalled when
    ``|bde_stat| > bde_crit``.  Rows before the third observation (the
    2-regressor model needs two prior points) get nulls.

    Reference parity: the reference ships no structural-break tests;
    this extends its labeling toolkit along AFML ch.17 (see also
    ``sadf``, ``csw_explosiveness``).
    """
    from polars_trading_spark._utils import SEQ_COL, with_seq

    df = with_seq(df)
    order = Window.partitionBy(symbol_col).orderBy(ts_col, SEQ_COL)
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.partitionBy(symbol_col)

    base = df.select(
        symbol_col, ts_col, SEQ_COL, F.log(F.col(price_col).cast("double")).alias("__y")
    )
    base = base.withColumn("__i", F.row_number().over(order).cast("double"))

    i = F.col("__i")
    n = F.count("__y").over(prev).cast("double")
    st = F.sum(i).over(prev)
    st2 = F.sum(i * i).over(prev)
    sy = F.sum("__y").over(prev)
    sty = F.sum(i * F.col("__y")).over(prev)
    det = n * st2 - st * st
    b0 = (st2 * sy - st * sty) / det
    b1 = (n * sty - st * sy) / det
    lev = (st2 - 2 * i * st + i * i * n) / det
    w = F.when(det > 0, (F.col("__y") - (b0 + b1 * i)) / F.sqrt(1 + lev))
    base = base.withColumn("__w", w)

    cw = F.count("__w").over(run).cast("double")
    sw1 = F.sum("__w").over(run)
    sw2 = F.sum(F.col("__w") * F.col("__w")).over(run)
    var_w = F.when(cw > 1, (sw2 - sw1 * sw1 / cw) / (cw - 1))
    sigma = F.sqrt(F.when(var_w > 0, var_w))
    stat = sw1 / sigma

    t_total = F.count(F.lit(1)).over(whole).cast("double")
    span = t_total - 2.0
    crit = F.when(
        F.col("__w").isNotNull() & (span > 0),
        F.lit(0.948) * (F.sqrt(span) + 2.0 * (i - 2.0) / F.sqrt(span)),
    )

    return base.select(
        symbol_col,
        ts_col,
        F.col("__w").alias("bde_w"),
        stat.alias("bde_stat"),
        crit.alias("bde_crit"),
    )
