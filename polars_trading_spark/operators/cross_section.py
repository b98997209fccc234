"""Cross-sectional features: market beta and momentum ranks.

The reference (and everything in operators/ so far) is per-symbol; a
multi-asset feature pipeline also needs the cross-sectional axis —
features defined against the whole universe at each point in time:

* ``rolling_beta`` — CAPM-style beta/correlation of each symbol's bar
  returns against the equal-weight universe return, over a rolling bar
  window.
* ``momentum_rank`` — each bar's cross-sectional rank of trailing
  k-bar return (1 = strongest momentum in the universe).

Distributed shape: the universe return is a per-bucket aggregate (one
row per distinct bar timestamp — small for daily bars, but minute-bar
multi-year universes reach millions of rows, so the join-back is left
to AQE rather than force-broadcast); ranks are null-guarded window
expressions over the bucket partition — no self-join.  Explicit-sum
covariance (not ``covar_samp``) keeps null handling engine-identical
for the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cross_sectional_zscore", "fama_macbeth",
    "fama_macbeth_summary", "momentum_rank", "lead_lag_corr", "pairs_distance", "portfolio_capacity", "rank_ic", "rank_portfolio_backtest", "rank_portfolio_backtest_net", "rank_portfolio_tearsheet", "rolling_beta", "rolling_pair_correlation"]


def fama_macbeth(
    bars: DataFrame,
    *,
    lookback: int = 5,
    min_obs: int = 3,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Fama-MacBeth first pass for a momentum factor: at every bar
    timestamp, the cross-sectional OLS of each symbol's NEXT-bar return
    on its trailing ``lookback``-bar return.  The per-timestamp slope
    ``gamma1`` is the period's factor return — its time-series mean and
    t-stat (the second FM pass) are one aggregate away downstream.

    Output: one row per timestamp with at least ``min_obs`` complete
    (factor, forward-return) pairs — ``ts, n_obs, gamma0, gamma1``;
    both coefficients null when the factor is cross-sectionally
    degenerate (zero variance).

    Distributed shape: two per-symbol window passes (lead + lag over
    the SAME partitioning/ordering — one exchange) and ONE per-timestamp
    hash aggregate of explicit OLS sums.  No joins, no Python; state per
    timestamp is five running sums regardless of universe size.
    """
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    if min_obs < 2:
        raise ValueError(f"min_obs must be >= 2, got {min_obs}")

    c = F.col(close_col).cast("double")
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    r = bars.select(
        F.col(ts_col),
        (F.lead(c).over(w) / c - 1).alias("__fwd"),
        (c / F.lag(c, lookback).over(w) - 1).alias("__fac"),
    ).where(F.col("__fwd").isNotNull() & F.col("__fac").isNotNull())

    g = r.groupBy(ts_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__fac").alias("__sx"),
        F.sum("__fwd").alias("__sy"),
        F.sum(F.col("__fac") * F.col("__fac")).alias("__sxx"),
        F.sum(F.col("__fac") * F.col("__fwd")).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    den = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    gamma1 = F.when(den > 0, (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / den)
    gamma0 = F.when(den > 0, (F.col("__sy") - gamma1 * F.col("__sx")) / n)
    return (
        g.where(F.col("__n") >= int(min_obs))
        .select(
            F.col(ts_col),
            F.col("__n").cast("long").alias("n_obs"),
            gamma0.alias("gamma0"),
            gamma1.alias("gamma1"),
        )
    )


def rolling_beta(
    bars: DataFrame,
    *,
    window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Rolling beta and correlation of each symbol vs the equal-weight
    universe return.

    Universe return at bucket t is the mean bar log return over symbols
    present in that bucket.  Returns ``symbol, ts, beta, corr`` (null
    until ``window`` paired returns exist per symbol).
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    c = F.col(close_col)
    r = bars.withColumn("__r", F.log(c / F.lag(c).over(order)))

    mkt = (
        r.where(F.col("__r").isNotNull())
        .groupBy(ts_col)
        .agg(F.avg("__r").alias("__m"))
    )
    # No broadcast hint: the per-bucket table has one row per distinct
    # bar timestamp across the whole universe, which can exceed
    # broadcast limits on fine-grained bars — AQE picks broadcast when
    # it actually fits.
    j = r.join(mkt, on=ts_col, how="left")

    x = F.when(F.col("__r").isNotNull() & F.col("__m").isNotNull(), F.col("__m"))
    y = F.when(F.col("__r").isNotNull() & F.col("__m").isNotNull(), F.col("__r"))
    j = j.withColumn("__x", x).withColumn("__y", y)
    roll = order.rowsBetween(-(window - 1), 0)
    n = F.count("__x").over(roll)
    sx = F.sum("__x").over(roll)
    sy = F.sum("__y").over(roll)
    sxx = F.sum(F.col("__x") * F.col("__x")).over(roll)
    syy = F.sum(F.col("__y") * F.col("__y")).over(roll)
    sxy = F.sum(F.col("__x") * F.col("__y")).over(roll)
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    cov = n * sxy - sx * sy
    beta = F.when((n == window) & (var_x > 0), cov / var_x)
    corr = F.when(
        (n == window) & (var_x > 0) & (var_y > 0), cov / F.sqrt(var_x * var_y)
    )
    return j.select(
        symbol_col,
        ts_col,
        beta.alias("beta"),
        corr.alias("corr"),
    )


def momentum_rank(
    bars: DataFrame,
    *,
    lookback: int = 5,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Cross-sectional momentum rank per bucket: 1 = largest trailing
    ``lookback``-bar log return among symbols ranked in that bucket.

    Symbols without ``lookback`` prior bars in their own series get a
    null momentum and are excluded from the ranking (rank and n_ranked
    null).  Ties break deterministically by symbol name.

    Single pass: null-momentum rows are pushed to the end of the rank
    window's ordering (``desc_nulls_last``) and their ranks nulled by a
    ``when`` guard, so no join of the ranked frame back to the base
    frame is needed — one symbol-window shuffle, one bucket-window
    shuffle, zero joins.
    """
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    c = F.col(close_col)
    mom = F.log(c / F.lag(c, lookback).over(order))
    r = bars.withColumn("__mom", mom)

    rank_w = Window.partitionBy(ts_col).orderBy(
        F.desc_nulls_last("__mom"), F.asc(symbol_col)
    )
    has_mom = F.col("__mom").isNotNull()
    # nulls sort last, so row_number over non-null rows is unaffected;
    # count("__mom") ignores nulls — both guarded to null on null rows.
    mom_rank = F.when(has_mom, F.row_number().over(rank_w))
    n_ranked = F.when(has_mom, F.count("__mom").over(Window.partitionBy(ts_col)))
    return r.select(
        symbol_col,
        ts_col,
        F.col("__mom").alias("momentum"),
        mom_rank.cast("int").alias("mom_rank"),
        n_ranked.cast("int").alias("n_ranked"),
    )


def rolling_pair_correlation(
    bars: DataFrame,
    *,
    window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Rolling return correlation for every unordered symbol pair — the
    input to covariance-driven portfolio construction (risk parity,
    mean-variance, hierarchical clustering) done *inside* the engine.

    Shape: per-symbol log returns (one window pass), then a self-join on
    the bar timestamp restricted to ``sym_a < sym_b`` — the join is
    co-partitioned on the bucket key, so the shuffle is one exchange per
    side, and the output is O(n_pairs · bars): quadratic in the universe
    *width* (deliberate and visible), never in history length.  Rolling
    explicit-sum moments over the (pair)-partitioned window finish the
    job; only windows with ``window`` paired returns emit.

    Returns ``sym_a, sym_b, ts, corr`` (null until the window fills).
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    c = F.col(close_col)
    r = bars.select(
        F.col(symbol_col),
        F.col(ts_col),
        F.log(c / F.lag(c).over(order)).alias("__r"),
    ).where(F.col("__r").isNotNull())

    a = r.select(
        F.col(symbol_col).alias("sym_a"), F.col(ts_col), F.col("__r").alias("__ra")
    )
    b = r.select(
        F.col(symbol_col).alias("sym_b"), F.col(ts_col), F.col("__r").alias("__rb")
    )
    joined = a.join(b, on=ts_col).where(F.col("sym_a") < F.col("sym_b"))

    pair = Window.partitionBy("sym_a", "sym_b").orderBy(ts_col)
    roll = pair.rowsBetween(-(window - 1), 0)
    n = F.count("__ra").over(roll)
    sa = F.sum("__ra").over(roll)
    sb = F.sum("__rb").over(roll)
    sab = F.sum(F.col("__ra") * F.col("__rb")).over(roll)
    saa = F.sum(F.col("__ra") * F.col("__ra")).over(roll)
    sbb = F.sum(F.col("__rb") * F.col("__rb")).over(roll)
    va = n * saa - sa * sa
    vb = n * sbb - sb * sb
    corr = F.when(
        (n == window) & (va > 0) & (vb > 0),
        (n * sab - sa * sb) / F.sqrt(va * vb),
    )
    return joined.select(
        "sym_a", "sym_b", F.col(ts_col), corr.alias("corr")
    )


def cross_sectional_zscore(
    df: DataFrame,
    value_col: str,
    *,
    clip_sigmas: float = 3.0,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
) -> DataFrame:
    """Cross-sectional standardization of a feature at each timestamp —
    the normalization step every factor pipeline runs before combining
    signals: z = (x − mean_bucket)/std_bucket, winsorized at
    ``±clip_sigmas`` so a single blown-up name cannot dominate the
    factor.

    Null feature values pass through as null z and do not contaminate
    the bucket moments; buckets with < 2 non-null values (or zero
    dispersion) emit null.  Explicit-sum sample std keeps the
    arithmetic engine-identical for the differential oracle.

    Shape: one window over the bucket partition — a single shuffle on
    the timestamp key, zero joins, zero Python.
    """
    if clip_sigmas <= 0:
        raise ValueError(f"clip_sigmas must be positive, got {clip_sigmas}")

    x = F.col(value_col).cast("double")
    w = Window.partitionBy(ts_col)
    n = F.count(x).over(w)
    s = F.sum(x).over(w)
    s2 = F.sum(x * x).over(w)
    var = (s2 - s * s / n) / (n - 1)
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(x.isNotNull() & (n >= 2) & (sd > 0), (x - s / n) / sd)
    c = float(clip_sigmas)
    # greatest/least skip nulls in Spark (and DuckDB), so guard: a null
    # z must stay null, not collapse to the clip boundary.
    zc = F.when(z.isNotNull(), F.least(F.greatest(z, F.lit(-c)), F.lit(c)))
    return df.select(
        F.col(symbol_col),
        F.col(ts_col),
        x.alias(value_col),
        z.alias("z"),
        zc.alias("z_clipped"),
    )


def _rank_members(
    bars: DataFrame,
    *,
    lookback: int,
    top_n: int,
    symbol_col: str,
    ts_col: str,
    close_col: str,
) -> DataFrame:
    """Momentum-book membership shared by ``rank_portfolio_backtest``
    and its cost-aware net variant: one row per (bucket, member) with
    ``__side`` (+1 long / -1 short) and ``__fwd`` (next-bar log return).
    Persisted (tracked) — it has only ``2 * top_n`` rows per bucket but
    multiple downstream consumers (P&L, bucket lag, both sides of the
    turnover self-join, and the net variant's trade sets)."""
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    c = F.col(close_col).cast("double")
    mom = F.log(c / F.lag(c, lookback).over(order))
    fwd = F.log(F.lead(c).over(order) / c)
    r = bars.select(
        F.col(symbol_col), F.col(ts_col), mom.alias("__mom"), fwd.alias("__fwd")
    ).where(F.col("__mom").isNotNull())

    rank_up = F.row_number().over(
        Window.partitionBy(ts_col).orderBy(F.desc("__mom"), F.asc(symbol_col))
    )
    rank_dn = F.row_number().over(
        Window.partitionBy(ts_col).orderBy(F.asc("__mom"), F.asc(symbol_col))
    )
    n_in_bucket = F.count(F.lit(1)).over(Window.partitionBy(ts_col))
    m = r.select(
        F.col(symbol_col),
        F.col(ts_col),
        "__fwd",
        rank_up.alias("__ru"),
        rank_dn.alias("__rd"),
        n_in_bucket.alias("__nb"),
    ).where((F.col("__nb") >= 2 * top_n))
    side = (
        F.when(F.col("__ru") <= top_n, F.lit(1.0))
        .when(F.col("__rd") <= top_n, F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )
    from polars_trading_spark._utils import persist_tracked

    # NOTE (round 15, measured negative): eager-persisting this frame
    # (to stop its 4-6 AQE-concurrent consumers re-running the momentum
    # chain) SLOWED the net backtest 2.0->3.3s and the tearsheet
    # 2.4->3.9s fresh-JVM isolated — at bench scale the duplicated
    # subtrees overlap on idle cores, while the eager count() serializes
    # a full pipeline round before the first consumer.  Reverted; the
    # duplicate-work-vs-latency trade re-opens only when profiles show
    # the racing consumers CONTENDING (the cluster_keywords case).
    return persist_tracked(
        m.withColumn("__side", side).where(F.col("__side") != 0)
    )


def rank_portfolio_backtest(
    bars: DataFrame,
    *,
    lookback: int = 5,
    top_n: int = 1,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Cross-sectional momentum portfolio: long the ``top_n`` strongest
    trailing-momentum names, short the ``top_n`` weakest, equal weight,
    rebalanced every bar — the canonical factor backtest built entirely
    from window algebra (momentum → rank → weights → next-bar P&L →
    turnover).

    Per bucket t the portfolio formed at t earns each member's log
    return over (t, t+1] — a no-lookahead convention enforced with
    ``lead``.  Output per bucket: ``n_long, n_short, pnl`` (mean long
    return − mean short return) and ``turnover`` (fraction of the
    previous bucket's membership replaced, long and short books
    combined; null on the first formed bucket).

    Shape: symbol-window momentum, bucket-window ranks, one bucket
    aggregate for P&L, and membership turnover via a self-join of the
    (tiny) per-bucket membership sets on consecutive bucket indexes.
    The membership frame is persisted (tracked): it has only
    ``2 * top_n`` rows per bucket but FOUR downstream consumers (P&L,
    bucket lag, and both sides of the turnover self-join) — unpersisted,
    each consumer re-executes the full input scan + momentum windows
    (measured ~4x the single-pass wall at sf0.1, round 8).
    """
    members = _rank_members(
        bars,
        lookback=lookback,
        top_n=top_n,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
    )

    pnl = members.groupBy(ts_col).agg(
        F.count(F.when(F.col("__side") > 0, 1)).cast("int").alias("n_long"),
        F.count(F.when(F.col("__side") < 0, 1)).cast("int").alias("n_short"),
        (
            F.avg(F.when(F.col("__side") > 0, F.col("__fwd")))
            - F.avg(F.when(F.col("__side") < 0, F.col("__fwd")))
        ).alias("pnl"),
    )

    # turnover: compare membership (symbol, side) against the previous
    # formed bucket.  The previous-bucket mapping comes from a lag over
    # the DISTINCT bucket frame (one row per bucket — the only global
    # window here, bounded by bucket count, never by rows), then the
    # membership sets join on (prev_ts, symbol, side).
    buckets = members.select(ts_col).distinct()
    prev_map = buckets.withColumn(
        "__prev_ts", F.lag(ts_col).over(Window.orderBy(ts_col))
    )
    mem = members.select(F.col(ts_col), F.col(symbol_col), "__side").join(
        prev_map, ts_col
    )
    prev = members.select(
        F.col(ts_col).alias("__prev_ts"),
        F.col(symbol_col).alias("__psym"),
        F.col("__side").alias("__pside"),
    )
    kept = (
        mem.join(
            prev,
            (mem["__prev_ts"] == prev["__prev_ts"])
            & (mem[symbol_col] == prev["__psym"])
            & (mem["__side"] == prev["__pside"]),
            "left",
        )
        .groupBy(ts_col)
        .agg(
            F.count(F.lit(1)).alias("__nm"),
            F.count("__psym").alias("__nkept"),
            F.max(mem["__prev_ts"]).alias("__pts"),
        )
    )
    turn = F.when(
        F.col("__pts").isNotNull(), 1.0 - F.col("__nkept") / F.col("__nm")
    )
    to = kept.select(F.col(ts_col), turn.alias("turnover"))
    return pnl.join(to, ts_col).select(
        ts_col, "n_long", "n_short", "pnl", "turnover"
    )


def rank_portfolio_backtest_net(
    bars: DataFrame,
    *,
    lookback: int = 5,
    top_n: int = 1,
    cs_window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    high_col: str = "high",
    low_col: str = "low",
) -> DataFrame:
    """Cost-aware cross-sectional momentum backtest:
    ``rank_portfolio_backtest`` P&L NET of rebalancing costs priced
    from the rolling Corwin-Schultz spread estimator — turnover is the
    factor backtest's cost driver, and this states it in return units.

    Cost model: every membership change at bucket ``t`` (an entry OR an
    exit of a (symbol, side) slot; a side flip is both) trades one book
    slot of notional ``1 / top_n``, crossing HALF that symbol's
    estimated relative spread at the rebalance bar.  Per-trade
    half-spreads are quantized to 1e-6 ("micro-spread" integers) and
    SUMMED IN INTEGER SPACE before one final division — an unordered
    float sum over a bucket's trades would be fold-order-sensitive
    across engines (the SCALING float-association rule)::

        cost_t  = sum_trades round(cs_sym_t * 1e6) / 1e6 / (2 * top_n)
        net_pnl = coalesce(pnl, 0) - cost

    The FIRST formed bucket buys the entire book (full entry cost,
    turnover null — same convention split as the gross operator); the
    LAST bucket's exit is never charged (the book is still held).  Null
    CS estimates (warmup) price as zero.

    Output per bucket: ``ts, n_long, n_short, pnl, turnover, cost,
    net_pnl``.

    Shape: the gross backtest's plan (the persisted 2*top_n-per-bucket
    membership frame now has SIX consumers — the two trade-set
    anti-joins are bucket-count-sized) plus one CS window pass over the
    bars and a lookup join of CS onto the tiny trade set.
    """
    from polars_trading_spark.operators.microstructure import corwin_schultz

    members = _rank_members(
        bars,
        lookback=lookback,
        top_n=top_n,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
    )

    pnl = members.groupBy(ts_col).agg(
        F.count(F.when(F.col("__side") > 0, 1)).cast("int").alias("n_long"),
        F.count(F.when(F.col("__side") < 0, 1)).cast("int").alias("n_short"),
        (
            F.avg(F.when(F.col("__side") > 0, F.col("__fwd")))
            - F.avg(F.when(F.col("__side") < 0, F.col("__fwd")))
        ).alias("pnl"),
    )

    buckets = members.select(ts_col).distinct()
    bucket_w = Window.orderBy(ts_col)
    bmap = buckets.select(
        F.col(ts_col),
        F.lag(ts_col).over(bucket_w).alias("__prev_ts"),
        F.lead(ts_col).over(bucket_w).alias("__next_ts"),
    )

    cur = members.select(F.col(ts_col), F.col(symbol_col), "__side").join(
        F.broadcast(bmap), ts_col
    )
    prev = members.select(
        F.col(ts_col).alias("__pts"),
        F.col(symbol_col).alias("__psym"),
        F.col("__side").alias("__pside"),
    )
    # turnover (same convention as the gross operator)
    kept = (
        cur.join(
            prev,
            (cur["__prev_ts"] == prev["__pts"])
            & (cur[symbol_col] == prev["__psym"])
            & (cur["__side"] == prev["__pside"]),
            "left",
        )
        .groupBy(ts_col)
        .agg(
            F.count(F.lit(1)).alias("__nm"),
            F.count("__psym").alias("__nkept"),
            F.max(cur["__prev_ts"]).alias("__prev_seen"),
        )
    )
    turnover = F.when(
        F.col("__prev_seen").isNotNull(),
        1.0 - F.col("__nkept") / F.col("__nm"),
    )
    to = kept.select(F.col(ts_col), turnover.alias("turnover"))

    # entries at t: current member with no same-(symbol, side) slot in
    # the previous bucket (the whole first bucket enters)
    entries = cur.join(
        prev,
        (cur["__prev_ts"] == prev["__pts"])
        & (cur[symbol_col] == prev["__psym"])
        & (cur["__side"] == prev["__pside"]),
        "left_anti",
    ).select(F.col(ts_col).alias("__trade_ts"), F.col(symbol_col).alias("__tsym"))
    # exits charged at the NEXT bucket's rebalance: member of t absent
    # from t's successor (the final bucket's book is held, not sold)
    nxt = members.select(
        F.col(ts_col).alias("__nts"),
        F.col(symbol_col).alias("__nsym"),
        F.col("__side").alias("__nside"),
    )
    exits = (
        cur.where(F.col("__next_ts").isNotNull())
        .join(
            nxt,
            (cur["__next_ts"] == nxt["__nts"])
            & (cur[symbol_col] == nxt["__nsym"])
            & (cur["__side"] == nxt["__nside"]),
            "left_anti",
        )
        .select(
            F.col("__next_ts").alias("__trade_ts"),
            F.col(symbol_col).alias("__tsym"),
        )
    )
    trades = entries.unionByName(exits)

    cs = corwin_schultz(
        bars,
        window=cs_window,
        symbol_col=symbol_col,
        ts_col=ts_col,
        high_col=high_col,
        low_col=low_col,
    ).select(
        F.col(symbol_col).alias("__tsym"),
        F.col(ts_col).alias("__trade_ts"),
        F.round(F.col("cs_spread") * 1e6, 0).cast("long").alias("__micro"),
    )
    costs = (
        trades.join(cs.hint("shuffle_hash"), on=["__trade_ts", "__tsym"], how="left")
        .groupBy("__trade_ts")
        .agg(F.sum(F.coalesce("__micro", F.lit(0))).alias("__micro_sum"))
        .select(
            F.col("__trade_ts").alias(ts_col),
            (
                F.col("__micro_sum").cast("double")
                / F.lit(1e6)
                / F.lit(2.0 * top_n)
            ).alias("cost"),
        )
    )

    return (
        pnl.join(to, ts_col)
        .join(costs, ts_col, "left")
        .select(
            ts_col,
            "n_long",
            "n_short",
            "pnl",
            "turnover",
            F.coalesce("cost", F.lit(0.0)).alias("cost"),
            (
                F.coalesce("pnl", F.lit(0.0))
                - F.coalesce("cost", F.lit(0.0))
            ).alias("net_pnl"),
        )
    )


def lead_lag_corr(
    bars: DataFrame,
    *,
    lag: int = 1,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Lead-lag cross-correlation for every unordered symbol pair:
    corr(r_a(t), r_b(t+lag)) and corr(r_b(t), r_a(t+lag)) — the classic
    price-discovery screen (a symbol whose returns correlate with the
    OTHER's future returns leads it; the asymmetry
    ``llr = corr_a_leads − corr_b_leads`` signs the direction).

    Alignment is by bar INDEX within each symbol's own series (a
    row_number over the symbol window), so mixed trading calendars
    shift consistently; the pair join is a co-partitioned equi-join on
    the index, O(pairs × bars) like the other pair operators.

    Output per pair: ``sym_a, sym_b, n_obs, n_obs_b_leads,
    corr_a_leads, corr_b_leads, llr`` (nulls under degenerate
    variance).  ``n_obs`` is the a-leads leg's pair count; when the two
    series differ in length the b-leads leg aligns a different number
    of index pairs, surfaced separately as ``n_obs_b_leads`` so ``llr``
    never silently mixes correlations over unequal samples.
    """
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    c = F.col(close_col).cast("double")
    r = bars.select(
        F.col(symbol_col),
        F.log(c / F.lag(c).over(order)).alias("__r"),
        (F.row_number().over(order)).alias("__i"),
    ).where(F.col("__r").isNotNull())

    a = r.select(
        F.col(symbol_col).alias("sym_a"), F.col("__i"), F.col("__r").alias("__ra")
    )
    b = r.select(
        F.col(symbol_col).alias("sym_b"),
        (F.col("__i") - lag).alias("__i"),
        F.col("__r").alias("__rb_fwd"),
    )
    # pair (a_t, b_{t+lag}) for EVERY ordered pair a != b, then fold the
    # two directions of each unordered pair into one row.
    j = a.join(b, on="__i").where(F.col("sym_a") != F.col("sym_b"))
    g = j.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__ra").alias("__sx"),
        F.sum("__rb_fwd").alias("__sy"),
        F.sum(F.col("__ra") * F.col("__ra")).alias("__sxx"),
        F.sum(F.col("__rb_fwd") * F.col("__rb_fwd")).alias("__syy"),
        F.sum(F.col("__ra") * F.col("__rb_fwd")).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    corr = F.when(
        (F.col("__n") >= 3) & (vx > 0) & (vy > 0),
        (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / F.sqrt(vx * vy),
    )
    directed = g.select("sym_a", "sym_b", F.col("__n").alias("__n"), corr.alias("__c"))

    fwd = directed.where(F.col("sym_a") < F.col("sym_b")).select(
        "sym_a", "sym_b", F.col("__n").alias("n_obs"), F.col("__c").alias("corr_a_leads")
    )
    rev = directed.where(F.col("sym_a") > F.col("sym_b")).select(
        F.col("sym_b").alias("sym_a"),
        F.col("sym_a").alias("sym_b"),
        F.col("__n").alias("n_obs_b_leads"),
        F.col("__c").alias("corr_b_leads"),
    )
    out = fwd.join(rev, ["sym_a", "sym_b"], "left")
    return out.select(
        "sym_a",
        "sym_b",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.col("n_obs_b_leads").cast("long").alias("n_obs_b_leads"),
        "corr_a_leads",
        "corr_b_leads",
        (F.col("corr_a_leads") - F.col("corr_b_leads")).alias("llr"),
    )


def fama_macbeth_summary(
    bars: DataFrame,
    *,
    lookback: int = 5,
    min_obs: int = 3,
    nw_lags: int = 4,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Fama-MacBeth second pass: the time-series mean of the
    per-period factor returns from ``fama_macbeth`` with a
    Newey-West (1987) HAC t-statistic — the publication-grade answer
    to "is the factor priced?", robust to autocorrelation in the
    gamma series up to ``nw_lags`` (Bartlett kernel).

        t_NW = mean(g) / sqrt( (c0 + 2 * sum_l w_l c_l) / T^2 ),
        w_l = 1 - l/(L+1),  c_l = sum_t (g_t - mean)(g_{t-l} - mean)

    Output: ONE row — ``n_periods``, ``gamma1_mean``, ``gamma1_t_nw``,
    ``gamma0_mean``, ``nw_lags``; t-stat null when T <= nw_lags + 1 or
    the variance estimate is non-positive (possible with HAC weights).

    Distributed shape: the gamma series is one row per bar timestamp —
    the per-timestamp OLS aggregate has ALREADY collapsed cardinality,
    so the summary's global windows run over aggregate-bounded input
    (the plan-contract detector verifies exactly this).  Lag products
    and moment sums fold as timestamp-ordered running sums read off the
    last row: engine-independent fold order.
    """
    if nw_lags < 0:
        raise ValueError(f"nw_lags must be >= 0, got {nw_lags}")

    g = fama_macbeth(
        bars,
        lookback=lookback,
        min_obs=min_obs,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
    ).where(F.col("gamma1").isNotNull())

    w_ts = Window.orderBy(ts_col)
    full = w_ts.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    run = w_ts.rowsBetween(Window.unboundedPreceding, 0)

    staged = (
        g.withColumn("__T", F.count(F.lit(1)).over(full))
        .withColumn("__mu1", F.sum("gamma1").over(full) / F.col("__T"))
        .withColumn("__mu0", F.sum("gamma0").over(full) / F.col("__T"))
        .withColumn("__d", F.col("gamma1") - F.col("__mu1"))
    )
    # stage the lagged deviations first — a window result cannot nest
    # inside the next window aggregate (same restriction in the oracle)
    for l in range(1, nw_lags + 1):
        staged = staged.withColumn(f"__dl{l}", F.lag("__d", l).over(w_ts))
    staged = staged.withColumn("__c0", F.sum(F.col("__d") * F.col("__d")).over(run))
    for l in range(1, nw_lags + 1):
        staged = staged.withColumn(
            f"__c{l}", F.sum(F.col("__d") * F.col(f"__dl{l}")).over(run)
        )
    staged = staged.withColumn("__rn", F.row_number().over(w_ts)).where(
        F.col("__rn") == F.col("__T")
    )

    T = F.col("__T").cast("double")
    var_sum = F.col("__c0")
    for l in range(1, nw_lags + 1):
        w_l = 1.0 - l / (nw_lags + 1.0)
        var_sum = var_sum + F.lit(2.0 * w_l) * F.coalesce(F.col(f"__c{l}"), F.lit(0.0))
    var_mean = var_sum / (T * T)
    t_nw = F.when(
        (F.col("__T") > nw_lags + 1) & (var_mean > 0),
        F.col("__mu1") / F.sqrt(var_mean),
    )
    return staged.select(
        F.col("__T").cast("long").alias("n_periods"),
        F.col("__mu1").alias("gamma1_mean"),
        t_nw.alias("gamma1_t_nw"),
        F.col("__mu0").alias("gamma0_mean"),
        F.lit(nw_lags).cast("int").alias("nw_lags"),
    )


def pairs_distance(
    bars: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    min_obs: int = 2,
) -> DataFrame:
    """Pairs-selection distance screen — Gatev, Goetzmann & Rouwenhorst
    (2006), "Pairs trading: performance of a relative-value arbitrage
    rule": normalize every symbol's price path to a cumulative-return
    index (close / first close), then score every unordered symbol pair
    by the sum of squared differences (SSD) of the two indices over
    their shared bar timestamps.  The lowest-SSD pairs are the classic
    formation-period candidates for the spread/cointegration stages
    (``spread_signal``, ``cointegration``).

    Output: one row per pair — ``sym_a < sym_b``, ``n_obs`` (shared
    bars), ``ssd``, ``rmsd`` = sqrt(ssd / n_obs) (scale-free ranking
    metric).  Pairs with fewer than ``min_obs`` shared bars are
    dropped.

    Scale shape: one per-symbol window pass (first_value) and a
    ts-co-partitioned self-join restricted to ``sym_a < sym_b`` —
    O(pairs x bars) like ``rolling_pair_correlation``, quadratic in
    universe *width* only, never in history.  The SSD float reduce is a
    ts-ORDERED running fold read at the pair's last row (fold-order
    deterministic across engines/layouts, SCALING.md rule 24/27); no
    global window, so the operator holds at any pair count.
    """
    if min_obs < 1:
        raise ValueError(f"min_obs must be >= 1, got {min_obs}")

    w_ord = Window.partitionBy(symbol_col).orderBy(ts_col)
    w_first = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c = F.col(close_col).cast("double")
    norm = bars.select(
        F.col(symbol_col),
        F.col(ts_col),
        (c / F.first(c).over(w_first)).alias("__p"),
    ).where(F.col("__p").isNotNull())

    a = norm.select(
        F.col(symbol_col).alias("sym_a"), F.col(ts_col), F.col("__p").alias("__pa")
    )
    b = norm.select(
        F.col(symbol_col).alias("sym_b"), F.col(ts_col), F.col("__p").alias("__pb")
    )
    joined = a.join(b, on=ts_col).where(F.col("sym_a") < F.col("sym_b"))

    d = F.col("__pa") - F.col("__pb")
    pair_ord = Window.partitionBy("sym_a", "sym_b").orderBy(ts_col)
    pair_run = pair_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pair_all = Window.partitionBy("sym_a", "sym_b")
    folded = joined.select(
        "sym_a",
        "sym_b",
        F.row_number().over(pair_ord).alias("__rn"),
        F.count(F.lit(1)).over(pair_all).alias("__n"),
        F.sum(d * d).over(pair_run).alias("__ssd"),
    )
    return (
        folded.where((F.col("__rn") == F.col("__n")) & (F.col("__n") >= min_obs))
        .select(
            "sym_a",
            "sym_b",
            F.col("__n").cast("long").alias("n_obs"),
            F.col("__ssd").alias("ssd"),
            F.sqrt(F.col("__ssd") / F.col("__n")).alias("rmsd"),
        )
    )


def rank_ic(
    bars: DataFrame,
    *,
    momentum_lag: int = 5,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Per-period rank information coefficient of a momentum signal —
    the standard alpha-research diagnostic: Spearman correlation,
    within each bar timestamp, between the cross-sectional ranks of the
    trailing ``momentum_lag``-bar log return (the signal) and the next
    bar's log return (the realization).  Grinold & Kahn's IC; an
    |IC| of a few percent is already a tradeable signal.

    Ranks are ``row_number`` over ``(value, symbol)`` — the symbol
    tiebreak makes the ranking total, so with tie-free integer ranks
    Spearman reduces to the exact rational.  NOTE: tied signal or
    forward-return values are therefore tie-broken BY SYMBOL NAME, not
    averaged — under ties this deviates from the tie-corrected
    (fractional-rank) Spearman, by design: the total order keeps the
    statistic exact-rational and bit-identical across engines, and with
    continuous log returns exact ties have measure zero.

        ic = 1 - 6 * sum(d^2) / (n * (n^2 - 1)),   d = rank_sig - rank_fwd

    and the only float is one final division: bit-identical on any
    engine.  Output per period: ``ts, n_sym, ic`` (ic null when fewer
    than 3 symbols are rankable that period).

    Scale shape: one per-symbol lag chain (shared exchange), two
    per-period ``row_number`` windows over the SAME per-period
    partitioning (cross-section width rows each, never data-sized), one
    integer hash aggregate per period.  No joins, no Python.
    """
    if momentum_lag < 1:
        raise ValueError(f"momentum_lag must be >= 1, got {momentum_lag}")

    c = F.col(close_col).cast("double")
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    base = bars.select(
        F.col(symbol_col),
        F.col(ts_col).alias("ts"),
        F.log(c / F.lag(c, momentum_lag).over(order)).alias("__sig"),
        F.log(F.lead(c).over(order) / c).alias("__fwd"),
    ).where(F.col("__sig").isNotNull() & F.col("__fwd").isNotNull())

    by_ts_sig = Window.partitionBy("ts").orderBy("__sig", symbol_col)
    by_ts_fwd = Window.partitionBy("ts").orderBy("__fwd", symbol_col)
    ranked = base.select(
        "ts",
        F.row_number().over(by_ts_sig).alias("__rs"),
        F.row_number().over(by_ts_fwd).alias("__rf"),
    )
    d = (F.col("__rs") - F.col("__rf")).cast("long")
    g = ranked.groupBy("ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_sym"),
        F.sum(d * d).cast("long").alias("__ssd"),
    )
    n = F.col("n_sym").cast("double")
    return g.select(
        "ts",
        "n_sym",
        F.when(
            F.col("n_sym") >= 3,
            F.lit(1.0) - F.lit(6.0) * F.col("__ssd").cast("double") / (n * (n * n - 1)),
        ).alias("ic"),
    )


def portfolio_capacity(
    bars: DataFrame,
    *,
    lookback: int = 5,
    top_n: int = 1,
    adv_window: int = 20,
    max_participation: float = 0.05,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    volume_col: str = "volume",
) -> DataFrame:
    """Capacity and turnover diagnostics for the cross-sectional
    momentum book (the `rank_portfolio_backtest` membership rule):
    how much capital the strategy can deploy before its own trading
    dominates the tape, and how fast the book churns.

    Per formed bucket t (every bucket with >= ``2*top_n`` ranked
    symbols; the long and short books are then exactly ``top_n`` names
    each, disjoint):

    * ``n_members``       — always ``2*top_n`` once formed
    * ``n_changed``       — members whose (symbol, side) was NOT in the
                            previous formed bucket (null on the first)
    * ``turnover``        — ``n_changed / n_members``
    * ``min_member_adv``  — the smallest member's trailing
                            ``adv_window``-bar average dollar volume
                            (null until every member has a full ADV
                            window — capacity on a partial window would
                            overstate tradability)
    * ``capacity_dollars``— ``max_participation * min_member_adv *
                            n_members``: the equal-weight book size at
                            which the WORST name hits the participation
                            cap (each name trades ``book/n_members``
                            per rebalance).

    Scale shape: one symbol-window pass (momentum + ADV share the same
    partitioning/ordering — one exchange), two bucket-rank windows, and
    the tiny members frame (``2*top_n`` rows per bucket) persisted once
    and self-joined on consecutive buckets, exactly like
    ``rank_portfolio_backtest``.  ADV uses an ORDERED sliding frame so
    the float fold is deterministic on any engine/partitioning.
    """
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if adv_window < 1:
        raise ValueError(f"adv_window must be >= 1, got {adv_window}")
    if not (0.0 < max_participation <= 1.0):
        raise ValueError(
            f"max_participation must be in (0, 1], got {max_participation}"
        )

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    run_w = order.rowsBetween(Window.unboundedPreceding, 0)
    c = F.col(close_col).cast("double")
    dv = c * F.col(volume_col).cast("double")
    # ADV as a PREFIX-SUM difference, not a sliding avg: running sums
    # accumulate in one deterministic order on any engine, where sliding
    # frames may fold in segment-tree order (cross-engine ulp drift).
    # The cumsum is staged as a real column first (a window expression
    # cannot nest inside another window).
    staged = bars.select(
        F.col(symbol_col),
        F.col(ts_col),
        F.log(c / F.lag(c, lookback).over(order)).alias("__mom"),
        F.sum(dv).over(run_w).alias("__cdv"),
        F.count(F.lit(1)).over(run_w).alias("__rn"),
    )
    adv = F.when(
        F.col("__rn") >= adv_window,
        (
            F.col("__cdv")
            - F.coalesce(F.lag("__cdv", adv_window).over(order), F.lit(0.0))
        )
        / adv_window,
    )
    r = staged.select(
        F.col(symbol_col), F.col(ts_col), "__mom", adv.alias("__adv")
    ).where(F.col("__mom").isNotNull())

    rank_up = F.row_number().over(
        Window.partitionBy(ts_col).orderBy(F.desc("__mom"), F.asc(symbol_col))
    )
    rank_dn = F.row_number().over(
        Window.partitionBy(ts_col).orderBy(F.asc("__mom"), F.asc(symbol_col))
    )
    n_in_bucket = F.count(F.lit(1)).over(Window.partitionBy(ts_col))
    m = r.select(
        F.col(symbol_col),
        F.col(ts_col),
        "__adv",
        rank_up.alias("__ru"),
        rank_dn.alias("__rd"),
        n_in_bucket.alias("__nb"),
    ).where(F.col("__nb") >= 2 * top_n)
    side = (
        F.when(F.col("__ru") <= top_n, F.lit(1.0))
        .when(F.col("__rd") <= top_n, F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )
    from polars_trading_spark._utils import persist_tracked

    members = persist_tracked(
        m.withColumn("__side", side).where(F.col("__side") != 0)
    )

    prev_map = (
        members.select(ts_col)
        .distinct()
        .withColumn("__prev_ts", F.lag(ts_col).over(Window.orderBy(ts_col)))
    )
    mem = members.select(F.col(ts_col), F.col(symbol_col), "__side", "__adv").join(
        prev_map, ts_col
    )
    prev = members.select(
        F.col(ts_col).alias("__prev_ts"),
        F.col(symbol_col).alias("__psym"),
        F.col("__side").alias("__pside"),
    )
    g = (
        mem.join(
            prev,
            (mem["__prev_ts"] == prev["__prev_ts"])
            & (mem[symbol_col] == prev["__psym"])
            & (mem["__side"] == prev["__pside"]),
            "left",
        )
        .groupBy(ts_col)
        .agg(
            F.count(F.lit(1)).alias("__nm"),
            F.count("__psym").alias("__nkept"),
            F.max(mem["__prev_ts"]).alias("__pts"),
            F.min("__adv").alias("__minadv"),
            F.count(F.when(F.col("__adv").isNull(), 1)).alias("__nulladv"),
        )
    )
    formed_prev = F.col("__pts").isNotNull()
    min_adv = F.when(F.col("__nulladv") == 0, F.col("__minadv"))
    return g.select(
        F.col(ts_col),
        F.col("__nm").cast("int").alias("n_members"),
        F.when(formed_prev, F.col("__nm") - F.col("__nkept"))
        .cast("int")
        .alias("n_changed"),
        F.when(
            formed_prev,
            (F.col("__nm") - F.col("__nkept")) / F.col("__nm").cast("double"),
        ).alias("turnover"),
        min_adv.alias("min_member_adv"),
        (F.lit(float(max_participation)) * min_adv * F.col("__nm")).alias(
            "capacity_dollars"
        ),
    )


def rank_portfolio_tearsheet(
    bars: DataFrame,
    *,
    lookback: int = 5,
    top_n: int = 1,
    cs_window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    high_col: str = "high",
    low_col: str = "low",
) -> DataFrame:
    """ONE-ROW gross-vs-net tearsheet of the cost-aware momentum book —
    the strategy-level summary over ``rank_portfolio_backtest_net``'s
    per-bucket series: ``n_buckets, gross_pnl, total_cost, net_pnl,
    gross_sharpe, net_sharpe`` (per-bucket mean/std over buckets with a
    defined P&L, unannualized), ``avg_turnover`` (mean over formed
    buckets with a previous book) and ``max_drawdown`` of the running
    NET equity curve (<= 0).

    Float discipline matches ``spread_band_tearsheet``: ordered running
    folds read at the last row, drawdown staged equity -> peak ->
    excursion.  The global ordered window is BUCKET-count-sized — the
    same bounded-global-window posture as the backtest's turnover lag —
    never row-sized.
    """
    net = rank_portfolio_backtest_net(
        bars,
        lookback=lookback,
        top_n=top_n,
        cs_window=cs_window,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
        high_col=high_col,
        low_col=low_col,
    )
    # Round 15 (the quality_classifier/pbo bounded-collect pattern, r14
    # verdict item 2): the one-row summary previously ran a
    # single-partition global-window family (t2→t5 chained windows +
    # last-row filter) on top of the backtest — 3-4 extra sequential
    # AQE stage rounds on an already driver-bound query.  The per-bucket
    # series is BUCKET-count-sized (the same boundedness the old global
    # ``Window.orderBy(ts)`` asserted), so it is collected once and the
    # summary folds on the driver with the IDENTICAL IEEE operation
    # sequence: ts-ascending left-associated running sums (including
    # the coalesced ``+ 0.0`` terms), running-peak drawdown staging,
    # and the same divide/sqrt Sharpe arithmetic — bit-identical
    # outputs.
    import math

    spark = bars.sparkSession
    out_schema = (
        "n_buckets long, gross_pnl double, total_cost double, "
        "net_pnl double, gross_sharpe double, net_sharpe double, "
        "avg_turnover double, max_drawdown double"
    )
    rows = net.select(
        F.col(ts_col), "pnl", "turnover", "cost", "net_pnl"
    ).collect()
    if not rows:
        return spark.createDataFrame([], out_schema)
    rows.sort(key=lambda r: r[0])  # ts ascending — the old window order
    cnt = len(rows)
    nto = 0
    sg = sg2 = sn = sn2 = sc = sto = 0.0
    peak = None
    mdd = None
    for r in rows:
        g = r["pnl"] if r["pnl"] is not None else 0.0
        nv = r["net_pnl"]
        to = r["turnover"] if r["turnover"] is not None else 0.0
        if r["turnover"] is not None:
            nto += 1
        sg = sg + g
        sg2 = sg2 + g * g
        sn = sn + nv
        sn2 = sn2 + nv * nv
        sc = sc + r["cost"]
        sto = sto + to
        peak = sn if (peak is None or sn > peak) else peak
        dd = sn - peak
        mdd = dd if (mdd is None or dd < mdd) else mdd

    def sharpe(s, s2):
        if cnt < 2:
            return None
        n = float(cnt)
        var = (s2 - s * s / n) / (n - 1)
        sd = math.sqrt(var if var > 0.0 else 0.0)
        return (s / n) / sd if sd > 0 else None

    return spark.createDataFrame(
        [
            (
                cnt,
                sg,
                sc,
                sn,
                sharpe(sg, sg2),
                sharpe(sn, sn2),
                (sto / float(nto)) if nto > 0 else None,
                mdd,
            )
        ],
        out_schema,
    )


def ic_decay(
    bars: DataFrame,
    *,
    momentum_lag: int = 5,
    horizons: tuple[int, ...] = (1, 2, 4, 8),
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
) -> DataFrame:
    """Information-coefficient DECAY profile of the momentum signal —
    the alpha-research question after ``rank_ic`` says the signal
    works: *how long does it keep working?*  The per-period Spearman
    rank IC is computed against the ``H``-bar forward return for every
    horizon in ``horizons`` and summarized per horizon, so the decay
    (and the optimal holding period / turnover trade-off it implies)
    reads off one small frame.

    One row per horizon: ``horizon, n_periods, mean_ic, ic_t`` (the
    Grinold-Kahn t-stat of the per-period IC series; null under 2
    periods or zero variance) and ``hit_rate`` (share of periods with
    positive IC — an integer ratio on exact-rational ICs).

    Determinism/scale shape: the horizon ladder is exploded onto the
    bars (|horizons| fan-out) so every horizon shares ONE (symbol, h)
    exchange; forward returns are a CASE over the fixed ladder (lead
    offsets must be literals); per-period ICs are exact rationals
    (tie-free integer ranks — the ``rank_ic`` discipline); the per-
    horizon moments fold in ts order over the PERIOD-count-bounded
    frame.  No joins, no Python.
    """
    if momentum_lag < 1:
        raise ValueError(f"momentum_lag must be >= 1, got {momentum_lag}")
    if (
        not horizons
        or any(h < 1 for h in horizons)
        or len(set(horizons)) != len(horizons)
    ):
        raise ValueError(
            f"horizons must be distinct positive ints, got {horizons}"
        )
    hs = sorted(int(h) for h in horizons)

    c = F.col(close_col).cast("double")
    t = bars.select(
        F.col(symbol_col).alias("__sym"),
        F.col(ts_col).alias("ts"),
        c.alias("__c"),
        F.explode(F.array(*[F.lit(h) for h in hs])).alias("h"),
    )
    o = Window.partitionBy("__sym", "h").orderBy("ts")
    fwd = None
    for h in hs:
        expr = F.log(F.lead("__c", h).over(o) / F.col("__c"))
        fwd = (
            expr
            if fwd is None
            else F.when(F.col("h") == h, F.log(F.lead("__c", h).over(o) / F.col("__c"))).otherwise(fwd)
        )
    base = t.select(
        "__sym",
        "h",
        "ts",
        F.log(F.col("__c") / F.lag("__c", momentum_lag).over(o)).alias("__sig"),
        fwd.alias("__fwd"),
    ).where(F.col("__sig").isNotNull() & F.col("__fwd").isNotNull())

    by_sig = Window.partitionBy("h", "ts").orderBy("__sig", "__sym")
    by_fwd = Window.partitionBy("h", "ts").orderBy("__fwd", "__sym")
    ranked = base.select(
        "h",
        "ts",
        F.row_number().over(by_sig).alias("__rs"),
        F.row_number().over(by_fwd).alias("__rf"),
    )
    d = (F.col("__rs") - F.col("__rf")).cast("long")
    g = ranked.groupBy("h", "ts").agg(
        F.count(F.lit(1)).cast("long").alias("__nsym"),
        F.sum(d * d).cast("long").alias("__ssd"),
    )
    nsym = F.col("__nsym").cast("double")
    per = g.select(
        "h",
        "ts",
        F.when(
            F.col("__nsym") >= 3,
            1 - 6 * F.col("__ssd").cast("double") / (nsym * (nsym * nsym - 1)),
        ).alias("__ic"),
    ).where(F.col("__ic").isNotNull())
    w = Window.partitionBy("h").orderBy("ts")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("h")
    fin = per.select(
        "h",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.sum("__ic").over(w_run).alias("__s1"),
        F.sum(F.col("__ic") * F.col("__ic")).over(w_run).alias("__s2"),
        F.sum((F.col("__ic") > 0).cast("long")).over(w_all).alias("__hits"),
    ).where(F.col("__rn") == F.col("__n"))
    n = F.col("__n").cast("double")
    mean = F.col("__s1") / n
    var = (F.col("__s2") - F.col("__s1") * F.col("__s1") / n) / (n - 1)
    ok = (F.col("__n") >= 2) & (var > 0)
    return fin.select(
        F.col("h").cast("int").alias("horizon"),
        F.col("__n").cast("long").alias("n_periods"),
        mean.alias("mean_ic"),
        F.when(ok, mean / F.sqrt(var / n)).alias("ic_t"),
        (F.col("__hits").cast("double") / n).alias("hit_rate"),
    )
