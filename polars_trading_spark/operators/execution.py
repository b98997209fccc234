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

__all__ = ["almgren_chriss_schedule", "vwap_slippage", "session_vwap"]


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
