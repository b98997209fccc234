"""Ornstein-Uhlenbeck / AR(1) mean-reversion fit per symbol.

AFML ch.13 frames optimal trading rules around an O-U price process;
the practical first step on real data is estimating the discrete AR(1)
form per instrument:

    x_t = a + phi * x_{t-1} + eps_t,   x = log price

from which the O-U quantities follow in closed form:

* ``phi``        — AR(1) slope (mean-reversion speed; < 1 reverts)
* ``mu``         — long-run equilibrium level ``a / (1 - phi)``
* ``half_life``  — ``-ln 2 / ln phi`` observations to close half the
                   gap to equilibrium (the classic pairs-trading filter:
                   trade only instruments with a short half-life)
* ``sigma``      — residual std (per-step innovation scale)
* ``sigma_eq``   — stationary std ``sigma / sqrt(1 - phi^2)`` (entry/
                   exit band width in O-U optimal-rule grids)

Distributed shape: one lag window per symbol, then ONE hash aggregate
of explicit sums (n, Σx, Σy, Σxx, Σyy, Σxy) — the OLS solve is scalar
algebra on aggregate outputs, so a million-symbol universe is one
shuffle regardless of history length.  Explicit sums (not covar_samp)
keep null handling engine-identical for the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cointegration_fit",
    "ou_fit",
    "spread_band_backtest",
    "spread_band_backtest_net",
    "spread_band_tearsheet",
    "spread_zscore_signal",
]


def ou_fit(
    bars: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    use_log: bool = True,
) -> DataFrame:
    """Per-symbol AR(1)/O-U fit of (log) close prices.

    Returns one row per symbol: ``symbol, n_obs, phi, mu, half_life,
    sigma, sigma_eq``.  ``n_obs`` counts the (x_{t-1}, x_t) pairs; fits
    with fewer than 3 pairs or a degenerate regressor emit nulls.
    ``half_life``/``sigma_eq`` are null unless ``0 < phi < 1`` (no
    mean reversion to speak of otherwise).
    """
    c = F.col(close_col).cast("double")
    x = F.log(c) if use_log else c
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    pairs = bars.select(
        F.col(symbol_col), x.alias("__y"), F.lag(x).over(order).alias("__x")
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())

    g = pairs.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )

    n = F.col("__n").cast("double")
    sx, sy = F.col("__sx"), F.col("__sy")
    sxx, syy, sxy = F.col("__sxx"), F.col("__syy"), F.col("__sxy")
    den = n * sxx - sx * sx
    ok = (F.col("__n") >= 3) & (den > 0)
    phi = F.when(ok, (n * sxy - sx * sy) / den)
    a = F.when(ok, (sy - phi * sx) / n)
    # SSE via aggregate sums only: Σ(y - a - phi·x)²
    sse = syy + n * a * a + phi * phi * sxx - 2 * a * sy - 2 * phi * sxy + 2 * a * phi * sx
    # n >= 3 suffices: the residual variance divides by (n - 2), which
    # is 1 at exactly three pairs — same gate as phi/mu above.
    sigma = F.when(ok, F.sqrt(F.greatest(sse, F.lit(0.0)) / (n - 2)))
    reverts = ok & (phi > 0) & (phi < 1)
    mu = F.when(ok & (phi != 1.0), a / (1 - phi))
    half_life = F.when(reverts, -F.log(F.lit(2.0)) / F.log(phi))
    sigma_eq = F.when(reverts, sigma / F.sqrt(1 - phi * phi))

    return g.select(
        F.col(symbol_col),
        F.col("__n").cast("long").alias("n_obs"),
        phi.alias("phi"),
        mu.alias("mu"),
        half_life.alias("half_life"),
        sigma.alias("sigma"),
        sigma_eq.alias("sigma_eq"),
    )


def _log_paired(
    bars: DataFrame,
    *,
    symbol_col: str,
    ts_col: str,
    close_col: str,
    use_log: bool,
) -> DataFrame:
    """The co-partitioned timestamp self-join every pair operator builds
    on: one row per (sym_a < sym_b, shared ts) with both (log) closes."""
    c = F.col(close_col).cast("double")
    x = F.log(c) if use_log else c
    r = bars.select(F.col(symbol_col), F.col(ts_col), x.alias("__x"))
    a = r.select(
        F.col(symbol_col).alias("sym_a"), F.col(ts_col), F.col("__x").alias("__xa")
    )
    b = r.select(
        F.col(symbol_col).alias("sym_b"), F.col(ts_col), F.col("__x").alias("__xb")
    )
    return a.join(b, on=ts_col).where(F.col("sym_a") < F.col("sym_b"))


def _eg_stage1_coefs(paired: DataFrame) -> DataFrame:
    """Engle-Granger step-1 OLS coefficients per pair — the FIRST
    aggregate of ``cointegration_fit``, factored out so consumers that
    need only α/β (the spread-signal family) skip the residual/AR(1)
    second pass over the pair frame entirely (guide §1.2 "don't compute
    things you throw away").  Expressions are identical to the inline
    form this replaces, so every downstream value is bit-unchanged."""
    s1 = paired.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__xa").alias("__sa"),
        F.sum("__xb").alias("__sb"),
        F.sum(F.col("__xb") * F.col("__xb")).alias("__sbb"),
        F.sum(F.col("__xa") * F.col("__xb")).alias("__sab"),
    )
    n = F.col("__n").cast("double")
    den = n * F.col("__sbb") - F.col("__sb") * F.col("__sb")
    ok = (F.col("__n") >= 3) & (den > 0)
    beta = F.when(ok, (n * F.col("__sab") - F.col("__sa") * F.col("__sb")) / den)
    alpha = F.when(ok, (F.col("__sa") - beta * F.col("__sb")) / n)
    return s1.select(
        "sym_a", "sym_b", F.col("__n").cast("long").alias("n_obs"),
        beta.alias("beta"), alpha.alias("alpha"),
    )


def cointegration_fit(
    bars: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    use_log: bool = True,
) -> DataFrame:
    """Engle-Granger step-1 cointegration fit for every unordered symbol
    pair, plus the AR(1) mean-reversion speed of the spread — the
    stat-arb pair screen run *inside* the engine.

    For each pair (a < b) over timestamps both symbols share:

    * ``beta``/``alpha`` — OLS hedge ratio of x_a on x_b (x = log close)
    * ``resid_std``      — std of the spread e = x_a − α − β·x_b
    * ``phi``            — AR(1) slope of e (mean-reversion speed; the
      Engle-Granger unit-root check is ``phi`` far below 1)
    * ``half_life``      — ``−ln 2 / ln phi`` bars (null unless 0<phi<1)

    Distributed shape: a co-partitioned timestamp self-join builds the
    paired frame (O(pairs × bars) — quadratic in universe WIDTH, never
    in history), then TWO hash aggregates over the pair key with one
    coefficient join-back between them.  Compare ``ou_fit``: the same
    explicit-sum algebra on the spread instead of the raw series.
    """
    paired = _log_paired(
        bars, symbol_col=symbol_col, ts_col=ts_col, close_col=close_col,
        use_log=use_log,
    )
    coefs = _eg_stage1_coefs(paired)

    j = paired.join(coefs, on=["sym_a", "sym_b"])
    e = F.col("__xa") - F.col("alpha") - F.col("beta") * F.col("__xb")
    order = Window.partitionBy("sym_a", "sym_b").orderBy(ts_col)
    j = j.withColumn("__e", e).withColumn("__el", F.lag("__e").over(order))

    both = F.col("__e").isNotNull() & F.col("__el").isNotNull()
    s2 = j.groupBy("sym_a", "sym_b", "n_obs", "beta", "alpha").agg(
        F.sum("__e").alias("__se_all"),
        F.sum(F.col("__e") * F.col("__e")).alias("__se2_all"),
        F.count("__e").alias("__n_all"),
        F.sum(F.when(both, F.col("__el"))).alias("__sl"),
        F.sum(F.when(both, F.col("__e"))).alias("__sc"),
        F.sum(F.when(both, F.col("__el") * F.col("__el"))).alias("__sll"),
        F.sum(F.when(both, F.col("__e") * F.col("__el"))).alias("__scl"),
        F.count(F.when(both, F.lit(1))).alias("__np"),
    )
    n_all = F.col("__n_all").cast("double")
    var_e = (F.col("__se2_all") - F.col("__se_all") * F.col("__se_all") / n_all) / (
        n_all - 1
    )
    resid_std = F.when(F.col("__n_all") >= 2, F.sqrt(F.greatest(var_e, F.lit(0.0))))
    np_ = F.col("__np").cast("double")
    den2 = np_ * F.col("__sll") - F.col("__sl") * F.col("__sl")
    ok2 = (F.col("__np") >= 3) & (den2 > 0)
    phi = F.when(ok2, (np_ * F.col("__scl") - F.col("__sc") * F.col("__sl")) / den2)
    reverts = ok2 & (phi > 0) & (phi < 1)
    half_life = F.when(reverts, -F.log(F.lit(2.0)) / F.log(phi))

    return s2.select(
        "sym_a",
        "sym_b",
        "n_obs",
        "alpha",
        "beta",
        resid_std.alias("resid_std"),
        phi.alias("phi"),
        half_life.alias("half_life"),
    )


def spread_zscore_signal(
    bars: DataFrame,
    *,
    entry_z: float = 2.0,
    window: int = 50,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    use_log: bool = True,
    coef_round_digits: int | None = 6,
    include_coefs: bool = False,
) -> DataFrame:
    """Per-pair spread z-score signal and its one-bar-lagged P&L — the
    standard stateless pairs-trading backtest over every cointegrated
    pair candidate.  ``include_coefs`` adds the hedge ratio ``beta`` to
    the output (consumed by the cost-aware net backtest, which prices
    the hedge leg's share of each trade).

    Builds the spread ``e_t = x_a − α − β·x_b`` from the full-sample
    Engle-Granger fit (``cointegration_fit``), z-scores it against a
    ROLLING ``window``-bar mean/std (so the signal is locally adaptive
    and usable out-of-sample), and takes the memoryless position
    ``pos_t = −sign(z_t)·1{|z_t| ≥ entry_z}``.  P&L per bar is the
    previous bar's position times the spread change — the classic
    no-lookahead convention.

    Stateless by design: no entry/exit hysteresis, so each row's signal
    is a pure window expression (a stateful band strategy belongs in the
    streaming layer).  Output per (pair, ts): ``spread, z, pos, pnl``.

    ``coef_round_digits`` quantizes α/β before the spread is built (the
    same engine-reproducibility trick as the per-iteration-rounded
    k-means): the raw OLS coefficients are global-aggregate ratios whose
    last ulp depends on float summation order, and that ulp would fan
    out into every spread row; rounding to 1e-6 (far below any trading
    significance) makes the whole per-row surface bit-identical across
    engines and across re-runs with different partitioning.

    Distributed shape: everything ``cointegration_fit`` does plus one
    rolling window over the pair partition — still O(pairs × bars).
    """
    if entry_z <= 0:
        raise ValueError(f"entry_z must be positive, got {entry_z}")
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    paired = _log_paired(
        bars, symbol_col=symbol_col, ts_col=ts_col, close_col=close_col,
        use_log=use_log,
    )

    # Round 14 (guide §1.2): only α/β are consumed here; the full
    # ``cointegration_fit`` would also run its residual/AR(1) SECOND
    # pass over the pair frame (another pair-join + lag window + hash
    # aggregate) and throw the outputs away.  The stage-1 coefficients
    # are computed by the identical expressions, so the spread surface
    # is bit-unchanged (oracle-verified).
    coefs = _eg_stage1_coefs(paired).select("sym_a", "sym_b", "alpha", "beta")
    if coef_round_digits is not None:
        coefs = coefs.select(
            "sym_a",
            "sym_b",
            F.round("alpha", coef_round_digits).alias("alpha"),
            F.round("beta", coef_round_digits).alias("beta"),
        )

    j = paired.join(coefs, on=["sym_a", "sym_b"])
    spread = F.col("__xa") - F.col("alpha") - F.col("beta") * F.col("__xb")
    j = j.withColumn("spread", spread)

    order = Window.partitionBy("sym_a", "sym_b").orderBy(ts_col)
    roll = order.rowsBetween(-(window - 1), 0)
    n = F.count("spread").over(roll)
    s = F.sum("spread").over(roll)
    s2 = F.sum(F.col("spread") * F.col("spread")).over(roll)
    var = (s2 - s * s / n) / (n - 1)
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when((n >= window) & (sd > 0), (F.col("spread") - s / n) / sd)
    j = j.withColumn("z", z)

    pos = F.when(F.col("z") >= entry_z, F.lit(-1.0)).when(
        F.col("z") <= -entry_z, F.lit(1.0)
    ).when(F.col("z").isNotNull(), F.lit(0.0))
    j = j.withColumn("pos", pos)
    prev_pos = F.lag("pos").over(order)
    dspread = F.col("spread") - F.lag("spread").over(order)
    pnl = F.when(prev_pos.isNotNull(), prev_pos * dspread)
    extra = ["beta"] if include_coefs else []
    return j.select(
        "sym_a", "sym_b", F.col(ts_col), *extra,
        "spread", "z", "pos", pnl.alias("pnl"),
    )


def spread_band_backtest(
    bars: DataFrame,
    *,
    entry_z: float = 2.0,
    exit_z: float = 0.5,
    window: int = 50,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    use_log: bool = True,
    coef_round_digits: int | None = 6,
    include_coefs: bool = False,
) -> DataFrame:
    """Pairs-trading band backtest WITH entry/exit hysteresis — the rule
    desks actually run: enter short(long) the spread when z crosses
    ``+entry_z`` (``-entry_z``), HOLD through the band, exit only when
    ``|z|`` falls to ``exit_z``.

    The position looks stateful but is a pure window expression: each
    row emits an EVENT (``-1``/``+1`` beyond the entry bands, ``0``
    inside the exit band, null in the hold band where nothing fires),
    and the position is the LAST NON-NULL event over the running frame
    — ``last(event, ignorenulls)`` — which every engine evaluates
    identically, no ``applyInPandas``, no state store.  ``z`` is
    ROUNDED to 6 before every band comparison so a 1-ulp cross-engine
    difference cannot flip an entry (round-before-compare).

    Output per (pair, ts): ``spread, z, position, traded`` (position
    changed this bar), ``pnl`` (previous position times spread change —
    no lookahead).  Rows with null z (warmup, zero dispersion) emit no
    event and hold.

    Shape: everything ``spread_zscore_signal`` does plus one running
    (unbounded-preceding) frame per pair — no extra exchange.
    """
    if exit_z < 0 or exit_z >= entry_z:
        raise ValueError(
            f"need 0 <= exit_z < entry_z, got exit_z={exit_z} entry_z={entry_z}"
        )
    base = spread_zscore_signal(
        bars,
        entry_z=entry_z,
        window=window,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
        use_log=use_log,
        coef_round_digits=coef_round_digits,
        include_coefs=include_coefs,
    ).select(
        "sym_a", "sym_b", ts_col,
        *(["beta"] if include_coefs else []),
        "spread", "z",
    )

    zr = F.round(F.col("z"), 6)
    event = (
        F.when(zr >= entry_z, F.lit(-1.0))
        .when(zr <= -entry_z, F.lit(1.0))
        .when(F.abs(zr) <= exit_z, F.lit(0.0))
    )
    order = Window.partitionBy("sym_a", "sym_b").orderBy(ts_col)
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    staged = base.withColumn("__evt", event).withColumn(
        "position", F.coalesce(F.last("__evt", ignorenulls=True).over(run), F.lit(0.0))
    )
    prev_pos = F.lag("position").over(order)
    prev_spread = F.lag("spread").over(order)
    return staged.select(
        "sym_a",
        "sym_b",
        F.col(ts_col),
        *(["beta"] if include_coefs else []),
        "spread",
        "z",
        "position",
        (F.coalesce(prev_pos, F.lit(0.0)) != F.col("position")).alias("traded"),
        (F.coalesce(prev_pos, F.lit(0.0)) * (F.col("spread") - prev_spread)).alias(
            "pnl"
        ),
    )


def spread_band_backtest_net(
    bars: DataFrame,
    *,
    entry_z: float = 2.0,
    exit_z: float = 0.5,
    window: int = 50,
    cs_window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    high_col: str = "high",
    low_col: str = "low",
    use_log: bool = True,
    coef_round_digits: int | None = 6,
) -> DataFrame:
    """Cost-aware pairs band backtest: ``spread_band_backtest`` P&L NET
    of transaction costs priced from the Corwin-Schultz spread
    estimator — the composition a desk actually evaluates, since gross
    band P&L is exactly the quantity spread costs eat.

    Cost model (per bar, per pair): each position change trades one
    unit of leg A and ``|beta|`` units of leg B (the hedge ratio the
    spread is built with), each leg crossing HALF its estimated
    relative bid-ask spread.  Spreads are the per-(symbol, bar)
    rolling Corwin-Schultz estimates (AFML 19.4) from the SAME bars;
    because the traded "spread" is in log-price units, a leg's relative
    spread IS its cost in those units::

        cost_t = |pos_t - pos_{t-1}| * (cs_a + |beta| * cs_b) / 2
        net_pnl_t = pnl_t - cost_t          (pnl null -> 0 on bar one)

    Null CS estimates (warmup bars) price as zero cost — the honest
    alternative (dropping the bar) would silently skip early trades.
    CS spreads and beta are rounded to 6 before the cost arithmetic so
    the composed surface stays engine-reproducible (round-before-
    combine, the same trick as the band events).

    Output per (pair, ts): ``beta, spread, z, position, traded, pnl,
    cost, net_pnl``.

    Distributed shape: the band backtest's plan (pair join + two window
    passes) plus one CS window pass over the bars and two
    ``shuffle_hash`` lookup joins of the (symbols x bars)-sized CS
    frame onto the (pairs x bars)-sized backtest frame — the CS side is
    the build side (smaller by a factor of ~n_symbols/2), and the probe
    side is never sorted.
    """
    from polars_trading_spark.operators.microstructure import corwin_schultz

    base = spread_band_backtest(
        bars,
        entry_z=entry_z,
        exit_z=exit_z,
        window=window,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
        use_log=use_log,
        coef_round_digits=coef_round_digits,
        include_coefs=True,
    )
    cs = corwin_schultz(
        bars,
        window=cs_window,
        symbol_col=symbol_col,
        ts_col=ts_col,
        high_col=high_col,
        low_col=low_col,
    ).select(
        F.col(symbol_col).alias("__sym"),
        F.col(ts_col).alias("__ts"),
        F.round("cs_spread", 6).alias("__cs"),
    )
    j = base.join(
        cs.hint("shuffle_hash").select(
            F.col("__sym").alias("sym_a"),
            F.col("__ts").alias(ts_col),
            F.col("__cs").alias("__cs_a"),
        ),
        on=["sym_a", ts_col],
        how="left",
    ).join(
        cs.hint("shuffle_hash").select(
            F.col("__sym").alias("sym_b"),
            F.col("__ts").alias(ts_col),
            F.col("__cs").alias("__cs_b"),
        ),
        on=["sym_b", ts_col],
        how="left",
    )
    order = Window.partitionBy("sym_a", "sym_b").orderBy(ts_col)
    turnover = F.abs(
        F.col("position") - F.coalesce(F.lag("position").over(order), F.lit(0.0))
    )
    half = (
        F.coalesce(F.col("__cs_a"), F.lit(0.0))
        + F.abs(F.col("beta")) * F.coalesce(F.col("__cs_b"), F.lit(0.0))
    ) / F.lit(2.0)
    cost = turnover * half
    return j.select(
        "sym_a",
        "sym_b",
        F.col(ts_col),
        "beta",
        "spread",
        "z",
        "position",
        "traded",
        "pnl",
        cost.alias("cost"),
        (F.coalesce(F.col("pnl"), F.lit(0.0)) - cost).alias("net_pnl"),
    )


def spread_band_tearsheet(
    bars: DataFrame,
    *,
    entry_z: float = 2.0,
    exit_z: float = 0.5,
    window: int = 50,
    cs_window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    high_col: str = "high",
    low_col: str = "low",
    use_log: bool = True,
    coef_round_digits: int | None = 6,
) -> DataFrame:
    """Per-pair gross-vs-net TEARSHEET of the cost-aware band backtest —
    the one-row-per-strategy summary a desk reads before anything else:
    did costs eat the edge?

    Per (sym_a, sym_b): ``n_bars, n_trades, gross_pnl, total_cost,
    net_pnl, gross_sharpe, net_sharpe`` (per-bar mean/std over ALL
    ``n_bars`` bars — the pair's single warmup bar with undefined gross
    P&L contributes 0, matching ``rank_portfolio_tearsheet``'s
    convention so both tearsheets' Sharpes and their net sums fold over
    the same denominator; unannualized — multiply by sqrt(bars/yr)
    downstream) and ``max_drawdown`` (most negative excursion of the
    running NET equity curve from its running peak, in spread units,
    <= 0).

    Float discipline: every sum that fans into a ratio folds as an
    ORDERED running window over the pair's bar sequence read at its
    last row (the SCALING float-association rule); the drawdown stages
    the running equity, then its running peak, then the excursion —
    window results become real columns before the next window consumes
    them (the nested-window restriction on both engines).

    Shape: the net backtest's plan plus one window family per pair —
    no new joins, no Python.
    """
    net = spread_band_backtest_net(
        bars,
        entry_z=entry_z,
        exit_z=exit_z,
        window=window,
        cs_window=cs_window,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
        high_col=high_col,
        low_col=low_col,
        use_log=use_log,
        coef_round_digits=coef_round_digits,
    )
    w = Window.partitionBy("sym_a", "sym_b").orderBy(ts_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g = F.coalesce(F.col("pnl"), F.lit(0.0))
    nv = F.col("net_pnl")
    t2 = net.select(
        "sym_a",
        "sym_b",
        F.col(ts_col),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(full).alias("__cnt"),
        F.sum(F.col("traded").cast("long")).over(full).alias("__ntr"),
        F.sum(g).over(run).alias("__sg"),
        F.sum(g * g).over(run).alias("__sg2"),
        F.sum(nv).over(run).alias("__sn"),
        F.sum(nv * nv).over(run).alias("__sn2"),
        F.sum(F.col("cost")).over(run).alias("__sc"),
    )
    t3 = t2.withColumn("__peak", F.max("__sn").over(run))
    t4 = t3.withColumn("__dd", F.col("__sn") - F.col("__peak"))
    t5 = t4.withColumn("__mdd", F.min("__dd").over(full))
    last = t5.where(F.col("__rn") == F.col("__cnt"))

    def sharpe(s, s2):
        n = F.col("__cnt").cast("double")
        var = (s2 - s * s / n) / (n - 1)
        sd = F.sqrt(F.greatest(var, F.lit(0.0)))
        return F.when(
            (F.col("__cnt") >= 2) & (sd > 0), (s / n) / sd
        )

    return last.select(
        "sym_a",
        "sym_b",
        F.col("__cnt").cast("long").alias("n_bars"),
        F.col("__ntr").cast("long").alias("n_trades"),
        F.col("__sg").alias("gross_pnl"),
        F.col("__sc").alias("total_cost"),
        F.col("__sn").alias("net_pnl"),
        sharpe(F.col("__sg"), F.col("__sg2")).alias("gross_sharpe"),
        sharpe(F.col("__sn"), F.col("__sn2")).alias("net_sharpe"),
        F.col("__mdd").alias("max_drawdown"),
    )
