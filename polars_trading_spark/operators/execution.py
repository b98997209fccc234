"""Execution analytics: Almgren-Chriss schedules and VWAP slippage.

The labeling/feature layers answer "what to trade"; these answer "how
did/should the execution go" — the other half of a production trading
stack, and pure relational algebra at any scale.

* ``almgren_chriss_schedule`` — the closed-form optimal liquidation
  trajectory (Almgren & Chriss 2000, "Optimal execution of portfolio
  transactions"): for risk aversion λ, temporary-impact η and
  per-period variance σ², the remaining position follows

      x_j = X · sinh(κ·(N − j)) / sinh(κ·N),
      κ = acosh(κ̃²/2 + 1),  κ̃² = λσ²/η

  (the discrete-time solution).  Each symbol gets its own κ from its
  own volatility, so the schedule is a per-(symbol, bucket) Column
  expression over a tiny (symbols × buckets) frame — no driver math.
* ``vwap_slippage`` — realized per-trade slippage against the
  symbol/bucket VWAP benchmark, plus signed shortfall in basis points;
  the standard execution-quality report.  One window over the bucket
  partition, one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL
from polars_trading_spark.config import column_names

__all__ = [
    "almgren_chriss_schedule",
    "vwap_slippage",
    "session_vwap",
    "implementation_shortfall",
    "execution_tearsheet",
    "market_impact_fit",
]


def almgren_chriss_schedule(
    vols: DataFrame,
    *,
    n_buckets: int,
    total_shares: float = 1.0,
    risk_aversion: float = 1e-6,
    eta: float = 2.5e-6,
    symbol_col: str = "symbol",
    sigma_col: str = "sigma",
) -> DataFrame:
    """Optimal liquidation schedule per symbol from its per-period
    volatility.

    ``vols``: one row per symbol with ``sigma_col`` = per-period return
    volatility in PRICE units (σ of price changes over one bucket).
    Returns one row per (symbol, bucket j ∈ [0, n_buckets)): ``kappa``,
    ``x_remaining`` (position still held entering bucket j) and
    ``shares`` (to execute in bucket j); ``Σ shares = total_shares``.
    λ → 0 degrades to the risk-neutral linear (TWAP) schedule — handled
    via the κ → 0 limit explicitly so tiny λ stays numerically exact.

    Scale shape: a ``sequence``/``explode`` over a per-symbol frame —
    output is symbols × buckets rows; everything is codegen Columns.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if eta <= 0:
        raise ValueError(f"eta must be positive, got {eta}")
    if risk_aversion < 0:
        raise ValueError(f"risk_aversion must be >= 0, got {risk_aversion}")

    sig = F.col(sigma_col).cast("double")
    kt2 = F.lit(float(risk_aversion)) * sig * sig / F.lit(float(eta))
    # acosh(1 + k̃²/2); guard k̃² = 0 (risk-neutral) -> κ = 0 -> TWAP.
    z = 1 + kt2 / 2
    kappa = F.when(kt2 > 0, F.log(z + F.sqrt(z * z - 1))).otherwise(F.lit(0.0))

    base = vols.select(
        F.col(symbol_col),
        sig.alias("sigma"),
        kappa.alias("kappa"),
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"),
    )
    N = float(n_buckets)
    j = F.col("bucket").cast("double")
    k = F.col("kappa")

    def sinh(xcol):
        return (F.exp(xcol) - F.exp(-xcol)) / 2

    frac = F.when(k > 0, sinh(k * (N - j)) / sinh(k * F.lit(N))).otherwise(
        (N - j) / N
    )
    frac_next = F.when(
        k > 0, sinh(k * (N - j - 1)) / sinh(k * F.lit(N))
    ).otherwise((N - j - 1) / N)
    X = F.lit(float(total_shares))
    return base.select(
        symbol_col,
        "sigma",
        "kappa",
        "bucket",
        (X * frac).alias("x_remaining"),
        (X * (frac - frac_next)).alias("shares"),
    )


def vwap_slippage(df: DataFrame, *, bucket: str = "15 minutes") -> DataFrame:
    """Per-symbol execution-quality report against the bucket-VWAP
    benchmark.

    Every trade is compared to the VWAP of its (symbol, time-bucket):
    slippage_bps = 1e4 · (price − bucket_vwap)/bucket_vwap.  Returns one
    row per symbol: ``n_trades``, ``volume``, ``vw_slippage_bps``
    (volume-weighted — positive means paying above VWAP), and
    ``worst_bps``/``best_bps`` extremes.

    Shape: the bucket VWAP is a window aggregate over the bucket
    partition (no join), then one symbol aggregate — two shuffles total,
    zero Python.  Column names follow the ``Config`` convention.

    Every float reduction here is an ORDER-DETERMINISTIC running fold
    over (ts, seq) read at the partition's last row, not an unordered
    ``sum``: the bucket benchmark and the volume-weighted report both
    add O(1e6)-magnitude terms whose unordered fold order varies with
    partition layout, which flipped a round-to-6 knife edge between
    engines (round-5 driver red).  Ordered folds make the result
    bit-identical regardless of shuffle layout.
    """
    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    order_cols = [ts] + ([SEQ_COL] if SEQ_COL in df.columns else [])
    t = df.na.drop(subset=[price]).withColumn(
        "__bucket", F.window(F.col(ts), bucket)["start"]
    )
    sz = F.col(size).cast("double")
    wb_run = (
        Window.partitionBy(symbol, "__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb_full = (
        Window.partitionBy(symbol, "__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    t = t.withColumns(
        {
            "__rpv": F.sum(sz * F.col(price)).over(wb_run),
            "__rv": F.sum(sz).over(wb_run),
        }
    )
    bench = F.last("__rpv").over(wb_full) / F.last("__rv").over(wb_full)
    t = t.withColumn("__slip", (F.col(price) - bench) / bench * 1e4)

    ws_ord = Window.partitionBy(symbol).orderBy(*order_cols)
    ws_run = ws_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ws_all = Window.partitionBy(symbol)
    rep = t.select(
        F.col(symbol),
        F.row_number().over(ws_ord).alias("__rn"),
        F.count(F.lit(1)).over(ws_all).alias("__n"),
        F.sum(F.col("__slip") * sz).over(ws_run).alias("__rss"),
        F.sum(sz).over(ws_run).alias("__rsv"),
        F.max("__slip").over(ws_all).alias("worst_bps"),
        F.min("__slip").over(ws_all).alias("best_bps"),
    )
    return rep.where(F.col("__rn") == F.col("__n")).select(
        symbol,
        F.col("__n").alias("n_trades"),
        F.col("__rsv").cast("long").alias("volume"),
        (F.col("__rss") / F.col("__rsv")).alias("vw_slippage_bps"),
        "worst_bps",
        "best_bps",
    )


def session_vwap(
    df: DataFrame,
    *,
    symbol_col: str | None = None,
    ts_col: str | None = None,
    price_col: str | None = None,
    size_col: str | None = None,
    seq_col: str | None = SEQ_COL,
) -> DataFrame:
    """Session-anchored running VWAP — the intraday execution benchmark
    every desk quotes against: per (symbol, UTC session day), the
    cumulative ``sum(price*size) / sum(size)`` up to and including each
    trade, plus the cumulative volume.

    Appends ``session_day``, ``cum_volume`` (long) and ``session_vwap``.

    Scale/determinism shape: the day is staged as a real column so the
    running frame partitions on (symbol, day) — one exchange, no joins,
    no Python; both running sums are (ts, seq)-ordered folds, so the
    float result is engine- and layout-independent (the ordered-fold
    rule that fixed vwap_slippage, SCALING §27), and ``cum_volume`` is
    an exact INTEGER fold.
    """
    symbol = symbol_col or column_names.symbol
    ts = ts_col or column_names.timestamp
    price = price_col or column_names.price
    size = size_col or column_names.size
    order = [F.col(ts)] + ([F.col(seq_col)] if seq_col else [])
    staged = df.withColumn("session_day", F.to_date(ts))
    w = (
        Window.partitionBy(symbol, "session_day")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pv = F.sum(F.col(price) * F.col(size)).over(w)
    v = F.sum(size).over(w)
    return staged.withColumn("cum_volume", v.cast("long")).withColumn(
        "session_vwap", pv / v
    )


def implementation_shortfall(
    df: DataFrame,
    *,
    trades_per_parent: int = 50,
) -> DataFrame:
    """Per-PARENT-ORDER implementation shortfall against the arrival
    price (Perold 1988) — the execution benchmark desks actually
    report: how much did working the order cost versus trading the
    whole size at the decision price?

    Parent orders are carved deterministically from the tape: each
    symbol's trades in ``(ts, seq)`` order are grouped into consecutive
    runs of ``trades_per_parent`` fills (``parent_id = rn //
    trades_per_parent``), with side alternating by parent parity
    (even = buy, odd = sell) — a reproducible synthetic order flow any
    engine replays exactly, standing in for the parent-order ids a
    production OMS would supply.

    Per (symbol, parent_id): ``side, n_fills, qty, arrival_price``
    (first fill's price = the decision price), ``fill_vwap``
    (size-weighted, ORDER-DETERMINISTIC running fold read at the last
    fill — the vwap_slippage float discipline), ``shortfall_bps``
    (``side * 1e4 * (fill_vwap - arrival)/arrival``; positive = the
    execution cost money) and ``market_move_bps`` (last fill vs
    arrival, signed the same way — how much of the shortfall was just
    the market moving).

    Shape: ONE window family per stage — a per-symbol ``row_number``
    to carve parents, then per-(symbol, parent) ordered folds; one
    final filter to the last row of each parent.  Two shuffles (symbol,
    then symbol x parent), zero Python, zero joins.
    """
    if trades_per_parent < 1:
        raise ValueError(
            f"trades_per_parent must be >= 1, got {trades_per_parent}"
        )
    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    order_cols = [ts] + ([SEQ_COL] if SEQ_COL in df.columns else [])
    t = df.na.drop(subset=[price]).withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy(symbol).orderBy(*order_cols))
        - 1,
    )
    t = t.withColumn(
        "parent_id",
        (F.col("__rn") / int(trades_per_parent)).cast("long"),
    ).withColumn(
        "side",
        F.when(F.col("parent_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1)),
    )
    wp_ord = Window.partitionBy(symbol, "parent_id").orderBy(*order_cols)
    wp_run = wp_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sz = F.col(size).cast("double")
    t = t.select(
        symbol,
        "parent_id",
        "side",
        F.row_number().over(wp_ord).alias("__prn"),
        F.count(F.lit(1))
        .over(Window.partitionBy(symbol, "parent_id"))
        .alias("__pn"),
        F.first(price).over(wp_run).alias("arrival_price"),
        F.col(price).alias("__last_px"),
        F.sum(sz * F.col(price)).over(wp_run).alias("__rpv"),
        F.sum(sz).over(wp_run).alias("__rv"),
    )
    last = t.where(F.col("__prn") == F.col("__pn"))
    fill_vwap = F.col("__rpv") / F.col("__rv")
    arr = F.col("arrival_price")
    return last.select(
        symbol,
        "parent_id",
        "side",
        F.col("__pn").cast("int").alias("n_fills"),
        F.col("__rv").cast("long").alias("qty"),
        arr,
        fill_vwap.alias("fill_vwap"),
        (F.col("side") * F.lit(1e4) * (fill_vwap - arr) / arr).alias(
            "shortfall_bps"
        ),
        (
            F.col("side") * F.lit(1e4) * (F.col("__last_px") - arr) / arr
        ).alias("market_move_bps"),
    )


def execution_tearsheet(
    df: DataFrame,
    *,
    trades_per_parent: int = 50,
) -> DataFrame:
    """Per-symbol one-row summary of ``implementation_shortfall`` — the
    execution-quality tearsheet: ``n_orders, total_qty,
    vw_shortfall_bps`` (qty-weighted over parents, ordered fold),
    ``avg_shortfall_bps, worst_bps, best_bps, hit_rate`` (share of
    parents that beat or matched arrival, shortfall <= 0) and
    ``avg_market_move_bps`` (was the cost execution or just drift?).

    Shape: the parent frame plus one window family per symbol (parent
    counts are tape/50-sized); every fanning float reduce folds in
    ``parent_id`` order on both engines.
    """
    symbol = column_names.symbol
    par = implementation_shortfall(df, trades_per_parent=trades_per_parent)
    w_ord = Window.partitionBy(symbol).orderBy("parent_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(symbol)
    qty = F.col("qty").cast("double")
    t = par.select(
        symbol,
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.sum(qty).over(w_run).alias("__rq"),
        F.sum(F.col("shortfall_bps") * qty).over(w_run).alias("__rsq"),
        F.sum("shortfall_bps").over(w_run).alias("__rs"),
        F.sum("market_move_bps").over(w_run).alias("__rm"),
        F.max("shortfall_bps").over(w_all).alias("worst_bps"),
        F.min("shortfall_bps").over(w_all).alias("best_bps"),
        F.sum((F.col("shortfall_bps") <= 0).cast("long"))
        .over(w_all)
        .alias("__hits"),
    )
    last = t.where(F.col("__rn") == F.col("__n"))
    n = F.col("__n").cast("double")
    return last.select(
        symbol,
        F.col("__n").cast("int").alias("n_orders"),
        F.col("__rq").cast("long").alias("total_qty"),
        (F.col("__rsq") / F.col("__rq")).alias("vw_shortfall_bps"),
        (F.col("__rs") / n).alias("avg_shortfall_bps"),
        "worst_bps",
        "best_bps",
        (F.col("__hits") / n).alias("hit_rate"),
        (F.col("__rm") / n).alias("avg_market_move_bps"),
    )


def market_impact_fit(
    df: DataFrame,
    *,
    trades_per_parent: int = 50,
) -> DataFrame:
    """Per-symbol market-impact POWER-LAW fit over the parent-order
    shortfall frame — the empirical test of the square-root law
    (Almgren et al. 2005; Tóth et al. 2011): regress

        ln(shortfall_bps) = alpha + beta * ln(participation)

    across parents with POSITIVE realized cost, where ``participation``
    is the parent's share of the symbol's total tape volume (the
    self-contained stand-in for Q/ADV).  ``beta ~= 0.5`` is the
    square-root law; ``exp(alpha)`` prices a full-tape order in bps.

    Output, one row per symbol: ``n_orders`` (all parents), ``n_used``
    (positive-cost parents in the fit), ``impact_exponent`` (beta),
    ``ln_impact_coef`` (alpha), ``impact_at_1pct_bps`` (the predicted
    cost of a 1%-of-tape order — ``exp(alpha + beta*ln(0.01))``) and
    ``impact_r2``.  Fewer than 3 usable parents or a degenerate x/y
    spread nulls the fit columns rather than emitting a knife-edge
    ratio.

    Determinism: the participation denominator is an INTEGER volume
    sum; every float OLS moment (Σx, Σy, Σxy, Σx², Σy²) folds in
    ``parent_id`` order and is read at the last row, so both engines
    fold bit-identically (the ``zipf_fit`` log-log discipline).  Shape:
    the two parent-frame shuffles plus one per-symbol window family —
    parents are tape/``trades_per_parent``-sized, zero joins, zero
    Python.
    """
    symbol = column_names.symbol
    par = implementation_shortfall(df, trades_per_parent=trades_per_parent)
    w_all = Window.partitionBy(symbol)
    w_ord = Window.partitionBy(symbol).orderBy("parent_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = par.withColumn("__tq", F.sum("qty").over(w_all))
    used = (F.col("shortfall_bps") > 0) & (F.col("qty") > 0)
    t = t.withColumn(
        "__x",
        F.when(used, F.log(F.col("qty").cast("double") / F.col("__tq"))),
    ).withColumn("__y", F.when(used, F.log("shortfall_bps")))
    t = t.select(
        symbol,
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.sum(F.col("__x").isNotNull().cast("long")).over(w_all).alias("__nu"),
        F.sum("__x").over(w_run).alias("__sx"),
        F.sum("__y").over(w_run).alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).over(w_run).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).over(w_run).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).over(w_run).alias("__syy"),
    )
    last = t.where(F.col("__rn") == F.col("__n"))
    nu = F.col("__nu").cast("double")
    sx, sy = F.col("__sx"), F.col("__sy")
    cov_n = nu * F.col("__sxy") - sx * sy
    var_x = nu * F.col("__sxx") - sx * sx
    var_y = nu * F.col("__syy") - sy * sy
    ok = (F.col("__nu") >= 3) & (var_x > 0)
    beta = F.when(ok, cov_n / var_x)
    alpha = F.when(ok, (sy - beta * sx) / nu)
    ln001 = F.lit(float(__import__("math").log(0.01)))
    return last.select(
        symbol,
        F.col("__n").cast("int").alias("n_orders"),
        F.col("__nu").cast("int").alias("n_used"),
        beta.alias("impact_exponent"),
        alpha.alias("ln_impact_coef"),
        F.when(ok, F.exp(alpha + beta * ln001)).alias("impact_at_1pct_bps"),
        F.when(ok & (var_y > 0), cov_n * cov_n / (var_x * var_y)).alias(
            "impact_r2"
        ),
    )
