"""Backtest performance statistics per symbol (AFML ch.14-15).

The reference's labeling operators feed strategy backtests but ship no
evaluation layer (its README roadmap stops at labels,
polars_trading/labels/). A pipeline that produces labels and bet sizes
at 100 TB also needs the closing statistics, computed *inside* the
engine so the returns series never leaves the cluster:

* annualized return / volatility and the **Sharpe ratio**;
* the **Probabilistic Sharpe Ratio** z-statistic (Bailey & López de
  Prado 2012; AFML 14.4): ``SR * sqrt(n-1) / sqrt(1 - g3*SR +
  (g4-1)/4 * SR^2)`` with per-period SR and the population skew ``g3``
  / kurtosis ``g4`` of the return distribution — reported as the
  z-score so no normal-CDF primitive is needed (apply ``Phi`` outside);
* **hit ratio** (fraction of up periods among non-zero periods);
* **maximum drawdown** (fractional, from the running peak of the
  cumulative log-return path) and the **longest time under water**
  (AFML 14.3: most periods between consecutive high-water marks).

Everything is one (symbol)-ordered window pass (cumulative return,
running peak, high-water-mark counter) followed by one hash aggregate
using sum-of-powers central moments — zero Python, one shuffle for the
window sort which the final ``groupBy(symbol)`` reuses under AQE.

Scale notes: output is one row per symbol; the window state is O(1) per
row; the aggregate is map-side partial. Nothing grows with history
length except the scan itself.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["backtest_stats", "deflated_sharpe", "drawdown_path", "ma_crossover_signal", "risk_ratios", "ulcer_index", "var_cvar"]


def backtest_stats(
    bars: DataFrame,
    *,
    periods_per_year: float,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Per-symbol performance statistics from a bar frame's close path.

    Log returns between consecutive bars define the period returns.
    Returns one row per symbol with ``n_periods``, ``ann_return``,
    ``ann_vol``, ``sharpe``, ``psr_z``, ``skew``, ``kurtosis``,
    ``hit_ratio``, ``max_drawdown`` (fractional, >= 0) and ``max_tuw``
    (longest time under water, in periods).

    ``psr_z`` is null when the PSR variance correction term
    ``1 - g3*SR + (g4-1)/4*SR^2`` is non-positive (fat-tailed edge
    case) or ``n < 2``.
    """
    if periods_per_year <= 0:
        raise ValueError(f"periods_per_year must be > 0, got {periods_per_year}")

    c = F.col(close_col)
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    running = order.rowsBetween(Window.unboundedPreceding, 0)

    ret = F.log(c / F.lag(c).over(order))
    df = bars.withColumn("__ret", ret).filter(F.col("__ret").isNotNull())

    # Drawdown path: cumulative log return, running peak, underwater gap.
    order2 = Window.partitionBy(symbol_col).orderBy(ts_col)
    running2 = order2.rowsBetween(Window.unboundedPreceding, 0)
    df = (
        df.withColumn("__cum", F.sum("__ret").over(running2))
        .withColumn("__peak", F.max(F.greatest("__cum", F.lit(0.0))).over(running2))
        .withColumn("__dd", F.col("__cum") - F.col("__peak"))
        # High-water-mark counter: rows sharing a value form one
        # underwater spell (the high itself plus every row below it).
        .withColumn(
            "__hwm",
            F.sum(F.when(F.col("__dd") >= 0, F.lit(1)).otherwise(F.lit(0))).over(running2),
        )
    )

    # Spell lengths: periods strictly underwater after each high-water
    # mark.  hwm=0 (underwater since inception, no high yet) counts every
    # row; hwm>0 spells exclude the high row itself.
    spells = (
        df.groupBy(symbol_col, "__hwm")
        .agg(F.count(F.lit(1)).alias("__len"))
        .withColumn(
            "__tuw",
            F.when(F.col("__hwm") == 0, F.col("__len")).otherwise(F.col("__len") - 1),
        )
        .groupBy(symbol_col)
        .agg(F.max("__tuw").alias("max_tuw"))
    )

    r = F.col("__ret")
    stats = df.groupBy(symbol_col).agg(
        F.count(r).alias("__n"),
        F.sum(r).alias("__s1"),
        F.sum(r * r).alias("__s2"),
        F.sum(r * r * r).alias("__s3"),
        F.sum(r * r * r * r).alias("__s4"),
        F.sum(F.when(r > 0, 1).otherwise(0)).alias("__n_up"),
        F.sum(F.when(r != 0, 1).otherwise(0)).alias("__n_nz"),
        F.min("__dd").alias("__min_dd"),
    )

    n = F.col("__n").cast("double")
    mu = F.col("__s1") / n
    # Population central moments from raw power sums.
    m2 = F.col("__s2") / n - mu * mu
    m3 = F.col("__s3") / n - 3 * mu * F.col("__s2") / n + 2 * mu * mu * mu
    m4 = (
        F.col("__s4") / n
        - 4 * mu * F.col("__s3") / n
        + 6 * mu * mu * F.col("__s2") / n
        - 3 * mu * mu * mu * mu
    )
    var_s = F.when(n > 1, (F.col("__s2") - n * mu * mu) / (n - 1))
    sd_s = F.sqrt(F.when(var_s > 0, var_s))
    sr = mu / sd_s  # per-period Sharpe (rf = 0)

    g3 = F.when(m2 > 0, m3 / F.pow(m2, F.lit(1.5)))
    g4 = F.when(m2 > 0, m4 / (m2 * m2))
    psr_var = 1 - g3 * sr + (g4 - 1) / 4 * sr * sr
    psr_z = F.when((n > 1) & (psr_var > 0), sr * F.sqrt(n - 1) / F.sqrt(psr_var))

    ann = F.lit(float(periods_per_year))
    sqrt_ann = F.lit(math.sqrt(periods_per_year))

    out = stats.select(
        F.col(symbol_col),
        F.col("__n").alias("n_periods"),
        (mu * ann).alias("ann_return"),
        (sd_s * sqrt_ann).alias("ann_vol"),
        (sr * sqrt_ann).alias("sharpe"),
        psr_z.alias("psr_z"),
        g3.alias("skew"),
        g4.alias("kurtosis"),
        F.when(F.col("__n_nz") > 0, F.col("__n_up") / F.col("__n_nz").cast("double")).alias(
            "hit_ratio"
        ),
        (F.lit(1.0) - F.exp(F.col("__min_dd"))).alias("max_drawdown"),
    )
    return out.join(spells, on=symbol_col, how="left")


def drawdown_path(
    bars: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Per-row drawdown features from the close path — the running
    diagnostics behind ``backtest_stats``, exposed as a frame so they
    can feed risk features and labeling (e.g. drawdown-conditional bet
    sizing) instead of only end-of-run summaries.

    Returns ``symbol, ts, cum_return`` (cumulative log return),
    ``drawdown`` (fractional, >= 0, from the running peak anchored at
    inception), and ``underwater`` (consecutive periods below the
    high-water mark, 0 on rows that set a new high).  One window pass,
    zero Python.
    """
    c = F.col(close_col)
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    running = order.rowsBetween(Window.unboundedPreceding, 0)

    ret = F.log(c / F.lag(c).over(order))
    df = bars.withColumn("__ret", ret).filter(F.col("__ret").isNotNull())
    df = (
        df.withColumn("__cum", F.sum("__ret").over(running))
        .withColumn("__peak", F.max(F.greatest("__cum", F.lit(0.0))).over(running))
        .withColumn("__dd", F.col("__cum") - F.col("__peak"))
        .withColumn(
            "__hwm",
            F.sum(F.when(F.col("__dd") >= 0, F.lit(1)).otherwise(F.lit(0))).over(running),
        )
    )
    spell = Window.partitionBy(symbol_col, "__hwm").orderBy(ts_col)
    under = F.when(F.col("__dd") >= 0, F.lit(0)).otherwise(
        # Within a spell the high row (if any) is row 1; count rows past it.
        F.row_number().over(spell) - F.when(F.col("__hwm") > 0, 1).otherwise(0)
    )
    return df.select(
        F.col(symbol_col),
        F.col(ts_col),
        F.col("__cum").alias("cum_return"),
        (F.lit(1.0) - F.exp(F.col("__dd"))).alias("drawdown"),
        under.cast("long").alias("underwater"),
    )


def ma_crossover_signal(
    bars: DataFrame,
    *,
    fast: int = 10,
    slow: int = 50,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Moving-average crossover trend signal with one-bar-lagged P&L —
    the single-asset companion to ``spread_zscore_signal``: together
    they close the loop from features to a backtestable strategy for
    both the momentum and mean-reversion styles.

    Position is ``sign(SMA_fast − SMA_slow)`` once ``slow`` bars exist
    (0 before).  P&L per bar is the previous bar's position times the
    bar log return — the standard no-lookahead convention; feed the
    output straight into ``backtest_stats`` for Sharpe/PSR/drawdown.

    Shape: two rolling sums over ONE per-symbol window partitioning and
    a lag — single shuffle, zero Python, any number of symbols.
    """
    if not (0 < fast < slow):
        raise ValueError(f"need 0 < fast < slow, got fast={fast} slow={slow}")

    c = F.col(close_col).cast("double")
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    # SMAs from running prefix sums, not sliding-frame avg(): one O(n)
    # running fold instead of O(n·w) per-row re-aggregation, and —
    # because a running sum is a SEQUENTIAL fold in every engine — the
    # values are bit-identical to the differential oracle (sliding-frame
    # aggregates associate differently per engine and flip rounding
    # ties).
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(c).over(run)
    cnt = F.count(c).over(run)

    def sma(k: int):
        prev = F.coalesce(F.lag(cum, k).over(order), F.lit(0.0))
        prev_n = F.coalesce(F.lag(cnt, k).over(order), F.lit(0))
        return (cum - prev) / (cnt - prev_n)

    sma_f, sma_s = sma(fast), sma(slow)
    n_slow = cnt - F.coalesce(F.lag(cnt, slow).over(order), F.lit(0))
    pos = F.when(n_slow >= slow, F.signum(sma_f - sma_s)).otherwise(F.lit(0.0))
    out = bars.select(
        F.col(symbol_col),
        F.col(ts_col),
        c.alias("close"),
        sma_f.alias("sma_fast"),
        sma_s.alias("sma_slow"),
        pos.alias("pos"),
    )
    ret = F.log(F.col("close") / F.lag("close").over(order))
    prev_pos = F.lag("pos").over(order)
    pnl = F.when(prev_pos.isNotNull() & ret.isNotNull(), prev_pos * ret)
    return out.withColumn("pnl", pnl)


def var_cvar(
    bars: DataFrame,
    *,
    alpha: float = 0.05,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Empirical Value-at-Risk and Expected Shortfall (CVaR) of per-bar
    log returns, per symbol.

    Count-based definition (exact on every engine, no interpolation
    ambiguity): with ``k = max(1, floor(alpha · n))``, VaR is the k-th
    worst return and CVaR the mean of the k worst (ties broken by
    timestamp so the k-set is deterministic).  Losses are reported as
    negative returns — ``var_alpha ≤ cvar_alpha ≤ 0`` on any
    loss-bearing series... (strictly: cvar ≤ var ≤ 0 in return space).

    Shape: one lag window, one rank window, one aggregate — the rank
    window shuffles on the symbol key only.
    """
    if not (0.0 < alpha < 0.5):
        raise ValueError(f"alpha must be in (0, 0.5), got {alpha}")

    c = F.col(close_col).cast("double")
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    r = bars.select(
        F.col(symbol_col),
        F.col(ts_col),
        F.log(c / F.lag(c).over(order)).alias("__r"),
    ).where(F.col("__r").isNotNull())

    rank_w = Window.partitionBy(symbol_col).orderBy(F.asc("__r"), F.asc(ts_col))
    n_w = Window.partitionBy(symbol_col)
    ranked = r.withColumn("__rk", F.row_number().over(rank_w)).withColumn(
        "__n", F.count(F.lit(1)).over(n_w)
    )
    k = F.greatest(F.floor(F.lit(float(alpha)) * F.col("__n")), F.lit(1))
    worst = ranked.where(F.col("__rk") <= k)
    g = worst.groupBy(symbol_col).agg(
        F.max("__n").cast("long").alias("n_obs"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("__r").alias("var"),
        F.avg("__r").alias("cvar"),
    )
    return g.select(
        F.col(symbol_col),
        "n_obs",
        "k",
        F.col("var").alias(f"var_{int(alpha * 100)}"),
        F.col("cvar").alias(f"cvar_{int(alpha * 100)}"),
    )


# Abramowitz & Stegun 7.1.26 erf approximation (|err| < 1.5e-7): the
# SAME polynomial evaluates in the SQL oracle, so cross-engine values
# are identical by construction (unlike a library erf, which this
# container's engines do not share).
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _norm_cdf(z):
    """Standard normal CDF via the A&S erf polynomial (column expr)."""
    import math as _math

    x = z / _math.sqrt(2.0)
    sign = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * ax)
    a1, a2, a3, a4, a5 = _AS_A
    poly = (
        (((F.lit(a5) * t + F.lit(a4)) * t + F.lit(a3)) * t + F.lit(a2)) * t
        + F.lit(a1)
    ) * t
    erf = F.lit(1.0) - poly * F.exp(-ax * ax)
    return F.lit(0.5) * (F.lit(1.0) + sign * erf)


def deflated_sharpe(
    bars: DataFrame,
    *,
    periods_per_year: float,
    n_trials: int,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Probabilistic and Deflated Sharpe Ratio (Bailey & López de
    Prado 2012/2014) per symbol — multiple-testing-aware performance
    evaluation on top of ``backtest_stats``:

    * ``psr_prob`` = Phi(psr_z): probability the true Sharpe exceeds 0
      given skew/kurtosis-adjusted estimation error;
    * ``sr0`` = E[max Sharpe of ``n_trials`` zero-skill trials]
      = sqrt(V_trials) * ((1-gamma) * z_{1-1/N} + gamma * z_{1-1/(Ne)})
      with ``V_trials`` the observed cross-trial variance of the
      per-period Sharpe and the quantiles PYTHON-computed constants
      (``statistics.NormalDist``);
    * ``dsr_z`` / ``dsr_prob``: the PSR statistic re-centered at
      ``sr0`` — the probability the strategy beats the best of N
      uninformed trials.  ``dsr_prob < 0.95`` means the track record
      is explainable by selection bias alone.

    ``n_trials`` is the number of configurations TRIED (>= the number
    of surviving symbols; pass it explicitly — it is unknowable from
    the data).  Normal CDF values use the A&S 7.1.26 erf polynomial so
    both engines produce bit-identical probabilities.

    Distributed shape: one pass of ``backtest_stats`` (per-symbol hash
    aggregate), then the cross-trial variance folds SYMBOL-ORDERED
    running sums over the aggregate-bounded stats frame and broadcasts
    one row back.  Zero Python, zero extra scans of the bar frame.
    """
    import math as _math
    from statistics import NormalDist

    if n_trials < 2:
        raise ValueError(f"n_trials must be >= 2, got {n_trials}")

    stats = backtest_stats(
        bars,
        periods_per_year=periods_per_year,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
    )
    sqrt_ann = _math.sqrt(periods_per_year)
    sr = F.col("sharpe") / F.lit(sqrt_ann)  # back to per-period units

    valid = stats.where(F.col("sharpe").isNotNull()).withColumn("__sr", sr)
    w_g = Window.orderBy(symbol_col)
    run = w_g.rowsBetween(Window.unboundedPreceding, 0)
    full = w_g.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    vrow = (
        valid.withColumn("__rn", F.row_number().over(w_g))
        .withColumn("__k", F.count(F.lit(1)).over(full))
        .withColumn("__s1", F.sum("__sr").over(run))
        .withColumn("__s2", F.sum(F.col("__sr") * F.col("__sr")).over(run))
        .where(F.col("__rn") == F.col("__k"))
        .select(
            F.when(
                F.col("__k") > 1,
                (
                    F.col("__s2")
                    - F.col("__k") * (F.col("__s1") / F.col("__k"))
                    * (F.col("__s1") / F.col("__k"))
                )
                / (F.col("__k") - 1),
            ).alias("__v")
        )
    )

    nd = NormalDist()
    gamma = 0.5772156649015329  # Euler-Mascheroni
    z1 = nd.inv_cdf(1.0 - 1.0 / n_trials)
    z2 = nd.inv_cdf(1.0 - 1.0 / (n_trials * _math.e))
    sr0 = F.sqrt(F.when(F.col("__v") > 0, F.col("__v"))) * F.lit(
        (1.0 - gamma) * z1 + gamma * z2
    )

    n = F.col("n_periods").cast("double")
    psr_var = (
        F.lit(1.0)
        - F.col("skew") * F.col("__sr")
        + (F.col("kurtosis") - 1) / 4 * F.col("__sr") * F.col("__sr")
    )
    dsr_z = F.when(
        (F.col("n_periods") > 1) & (psr_var > 0),
        (F.col("__sr") - F.col("__sr0")) * F.sqrt(n - 1) / F.sqrt(psr_var),
    )
    out = (
        valid.crossJoin(F.broadcast(vrow))
        .withColumn("__sr0", sr0)
        .withColumn("__dsr_z", dsr_z)
        .select(
            symbol_col,
            "n_periods",
            "sharpe",
            "psr_z",
            _norm_cdf(F.col("psr_z")).alias("psr_prob"),
            F.col("__sr0").alias("sr0"),
            F.col("__dsr_z").alias("dsr_z"),
            _norm_cdf(F.col("__dsr_z")).alias("dsr_prob"),
            F.lit(int(n_trials)).cast("int").alias("n_trials"),
        )
    )
    return out


def risk_ratios(
    bars: DataFrame,
    *,
    periods_per_year: float,
    target_return: float = 0.0,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Downside-aware performance ratios per symbol — the standard
    complements to ``backtest_stats``'s Sharpe:

    * **Sortino** (Sortino & Price 1994): excess return over the
      annualized DOWNSIDE deviation ``sqrt(mean(min(r - tgt, 0)^2))``
      — volatility above target is not risk.
    * **Calmar**: annualized return over the maximum fractional
      drawdown — the trend-follower's headline ratio.
    * **Omega** (Keating & Shadwick 2002): probability-weighted gains
      over losses around the target, ``sum(max(r - tgt, 0)) /
      sum(max(tgt - r, 0))`` — uses the whole distribution, no
      normality assumption.

    ``target_return`` is per period (log return).  Output per symbol:
    ``n_periods, ann_return, downside_dev_ann, sortino, max_drawdown,
    calmar, omega`` (each ratio null when its denominator is zero or
    ``n < 2``).

    Shape: the same single (symbol, ts)-ordered window pass as
    ``backtest_stats`` — drawdown path + running folds read at the last
    row (fold-order deterministic, SCALING.md rule 24/27); zero joins,
    zero Python.  ``sqrt(periods_per_year)`` is pinned python-side so
    both engines consume the identical literal.
    """
    import math

    if periods_per_year <= 0:
        raise ValueError(f"periods_per_year must be > 0, got {periods_per_year}")

    ppy = float(periods_per_year)
    sqrt_ppy = math.sqrt(ppy)
    tgt = float(target_return)

    c = F.col(close_col)
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    ret = F.log(c / F.lag(c).over(order))
    df = bars.withColumn("__ret", ret).filter(F.col("__ret").isNotNull())

    running = Window.partitionBy(symbol_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    df = (
        df.withColumn("__cum", F.sum("__ret").over(running))
        .withColumn("__peak", F.max(F.greatest("__cum", F.lit(0.0))).over(running))
        .withColumn("__dd", F.col("__cum") - F.col("__peak"))
    )

    r = F.col("__ret")
    excess = r - F.lit(tgt)
    w_ord = Window.partitionBy(symbol_col).orderBy(ts_col)
    w_all = Window.partitionBy(symbol_col)
    folded = df.select(
        F.col(symbol_col),
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.sum(r).over(running).alias("__s1"),
        # x*x, not pow(x, 2): pow is not correctly-rounded in general,
        # so the multiply form is the cross-engine-reproducible one
        F.sum(
            F.least(excess, F.lit(0.0)) * F.least(excess, F.lit(0.0))
        ).over(running).alias("__sdn2"),
        F.sum(F.greatest(excess, F.lit(0.0))).over(running).alias("__sup"),
        F.sum(F.greatest(F.lit(tgt) - r, F.lit(0.0))).over(running).alias("__sdown"),
        F.min("__dd").over(w_all).alias("__mindd"),
    ).where(F.col("__rn") == F.col("__n"))

    n = F.col("__n").cast("double")
    ok = F.col("__n") >= 2
    mu_ann = F.col("__s1") / n * ppy
    down_ann = F.sqrt(F.col("__sdn2") / n) * sqrt_ppy
    max_dd = 1 - F.exp(F.col("__mindd"))
    sortino = F.when(
        ok & (down_ann > 0), (F.col("__s1") / n - tgt) * ppy / down_ann
    )
    calmar = F.when(ok & (max_dd > 0), mu_ann / max_dd)
    omega = F.when(ok & (F.col("__sdown") > 0), F.col("__sup") / F.col("__sdown"))
    return folded.select(
        F.col(symbol_col),
        F.col("__n").cast("long").alias("n_periods"),
        F.when(ok, mu_ann).alias("ann_return"),
        F.when(ok, down_ann).alias("downside_dev_ann"),
        sortino.alias("sortino"),
        F.when(ok, max_dd).alias("max_drawdown"),
        calmar.alias("calmar"),
        omega.alias("omega"),
    )


def ulcer_index(
    bars: DataFrame,
    *,
    periods_per_year: float,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Ulcer index and Martin ratio per symbol — the drawdown-DEPTH-
    weighted risk pair (Martin & McCann 1989): where max_drawdown keeps
    only the single worst point, the ulcer index is the RMS of the
    whole fractional-drawdown path,

        ulcer  = sqrt( mean( dd_frac_t^2 ) ),
        martin = ann_return / ulcer

    so long shallow underwater spells (the slow bleed a Calmar ratio
    ignores) are priced in.

    Output per symbol: ``n_periods, ann_return, ulcer, martin``
    (``martin`` null when the path never draws down or ``n < 2``).

    Shape: the same single (symbol, ts)-ordered window pass as
    ``backtest_stats``/``risk_ratios`` — drawdown path + ordered
    running folds read at the last row; zero joins, zero Python.
    """
    if periods_per_year <= 0:
        raise ValueError(f"periods_per_year must be > 0, got {periods_per_year}")
    ppy = float(periods_per_year)

    c = F.col(close_col)
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    ret = F.log(c / F.lag(c).over(order))
    df = bars.withColumn("__ret", ret).filter(F.col("__ret").isNotNull())

    running = Window.partitionBy(symbol_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    df = (
        df.withColumn("__cum", F.sum("__ret").over(running))
        .withColumn("__peak", F.max(F.greatest("__cum", F.lit(0.0))).over(running))
        # fractional drawdown depth at t (>= 0)
        .withColumn("__ddf", 1 - F.exp(F.col("__cum") - F.col("__peak")))
    )
    w_ord = Window.partitionBy(symbol_col).orderBy(ts_col)
    w_all = Window.partitionBy(symbol_col)
    folded = df.select(
        F.col(symbol_col),
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.sum("__ret").over(running).alias("__s1"),
        F.sum(F.col("__ddf") * F.col("__ddf")).over(running).alias("__sdd2"),
    ).where(F.col("__rn") == F.col("__n"))

    n = F.col("__n").cast("double")
    ok = F.col("__n") >= 2
    mu_ann = F.col("__s1") / n * ppy
    ulcer = F.sqrt(F.col("__sdd2") / n)
    return folded.select(
        F.col(symbol_col),
        F.col("__n").cast("long").alias("n_periods"),
        F.when(ok, mu_ann).alias("ann_return"),
        F.when(ok, ulcer).alias("ulcer"),
        F.when(ok & (ulcer > 0), mu_ann / ulcer).alias("martin"),
    )
