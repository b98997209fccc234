"""Classic bar-level technical indicators: ATR, Bollinger bands, MACD.

The reference repo has none of these (its surface stops at bars/labels/
features, SURVEY.md §2); they extend the signal family (§2-ext) with the
three staple indicators every trading stack ships, computed over OHLC
bars (``operators/bars.py`` output).

All exponential smoothers follow the repo-wide ``adjust=True`` EWM
convention (weights ``d^(t-i)``, explicit weight normalizer — same as
``operators/ewm.py`` / ``operators/rsi.py``); the recursive
``adjust=False`` form converges to it geometrically.

Distributed shape: one exchange on the symbol key; every EWM is the
*segment-renormalized* closed form (chunked row index so materialized
exponents stay under ~e^32, two prior chunk totals damped by e^-32 /
e^-64 — exact-in-double truncation for unbounded tapes, see
operators/ewm.py for the derivation), entirely inside whole-stage
codegen: zero joins, zero Python.  MACD cascades three such folds
(fast EMA, slow EMA, then the signal EMA over the MACD line staged as a
real column); all reuse the single symbol partitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["atr", "bollinger", "macd", "stochastic", "obv", "donchian"]

_CARRIED = 2  # prior chunks carried; dropped relative weight <= e^-96


def _chunk_len(d: float) -> int:
    """Rows per chunk so the within-chunk exponent (1/d)^j stays ~<= e^32."""
    return max(2, int(32.0 / -math.log(d)) + 1)


def _ewm_mean(
    df: DataFrame,
    value_col: str,
    out_col: str,
    *,
    alpha: float,
    symbol_col: str,
    order,
    tag: str,
) -> DataFrame:
    """Append ``out_col`` = adjust=True EWM mean of ``value_col`` per symbol.

    Requires ``value_col`` non-null on every row (bar series are dense),
    so the weight normalizer has the closed form B_t = (1-d^(t+1))/(1-d)
    and needs no data pass.  ``tag`` namespaces the scratch columns so
    folds can cascade.
    """
    d = 1.0 - alpha
    r = 1.0 / d
    L = _chunk_len(d)
    t, k, j = f"__{tag}_t", f"__{tag}_k", f"__{tag}_j"
    loc, tot = f"__{tag}_loc", f"__{tag}_tot"

    w_ord = Window.partitionBy(symbol_col).orderBy(*order)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    staged = (
        df.withColumn(t, F.count(F.lit(1)).over(w_run) - 1)
        .withColumn(k, F.floor(F.col(t) / L))
        .withColumn(j, (F.col(t) - F.col(k) * L).cast("double"))
    )
    w_chunk = (
        Window.partitionBy(symbol_col, k)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rj = F.pow(F.lit(r), F.col(j))
    staged = staged.withColumn(loc, F.sum(rj * F.col(value_col)).over(w_chunk)).withColumn(
        tot, F.sum(rj * F.col(value_col)).over(Window.partitionBy(symbol_col, k))
    )
    w_k = Window.partitionBy(symbol_col).orderBy(k)
    carry = sum(
        (
            F.coalesce(F.max(tot).over(w_k.rangeBetween(-l, -l)), F.lit(0.0))
            * (d ** (l * L))
            for l in range(1, _CARRIED + 1)
        ),
        F.lit(0.0),
    )
    s = F.pow(F.lit(d), F.col(j)) * (F.col(loc) + carry)
    b = (1.0 - F.pow(F.lit(d), F.col(t) + 1)) / (1.0 - d)
    return staged.withColumn(out_col, s / b).drop(t, k, j, loc, tot)


def atr(
    bars: DataFrame,
    *,
    period: int = 14,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
) -> DataFrame:
    """Average True Range (Wilder 1978) over OHLC bars.

    True range per bar is ``max(high-low, |high-prev_close|,
    |low-prev_close|)`` (first bar: ``high-low``); ATR smooths it with
    Wilder's ``alpha = 1/period`` EWM mean.  Appends ``tr``, ``atr`` and
    ``natr`` (= 100·atr/close, the normalized form comparable across
    price levels).
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    pc = F.lag("close").over(w)
    tr = F.when(
        pc.isNull(), F.col("high") - F.col("low")
    ).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - pc),
            F.abs(F.col("low") - pc),
        )
    )
    out = _ewm_mean(
        bars.withColumn("tr", tr),
        "tr",
        "atr",
        alpha=1.0 / period,
        symbol_col=symbol_col,
        order=[F.col(ts_col)],
        tag="atr",
    )
    return out.withColumn("natr", F.lit(100.0) * F.col("atr") / F.col("close"))


def bollinger(
    bars: DataFrame,
    *,
    window: int = 20,
    num_std: float = 2.0,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
) -> DataFrame:
    """Bollinger bands over the close: ``window``-bar SMA ± ``num_std``
    sample standard deviations.

    Appends ``bb_mid``, ``bb_upper``, ``bb_lower``, ``pct_b``
    (position of close inside the band) and ``bb_bandwidth``
    ((upper-lower)/mid); null until a full window exists —
    partial-window values would not be comparable across the tape.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    w = (
        Window.partitionBy(symbol_col)
        .orderBy(ts_col)
        .rowsBetween(-(window - 1), 0)
    )
    full = F.count(F.lit(1)).over(w) == window
    mid = F.when(full, F.avg("close").over(w))
    sd = F.when(full, F.stddev_samp("close").over(w))
    out = (
        bars.withColumn("bb_mid", mid)
        .withColumn("__sd", sd)
        .withColumn("bb_upper", F.col("bb_mid") + num_std * F.col("__sd"))
        .withColumn("bb_lower", F.col("bb_mid") - num_std * F.col("__sd"))
    )
    width = F.col("bb_upper") - F.col("bb_lower")
    return (
        out.withColumn(
            "pct_b",
            F.when(width > 0, (F.col("close") - F.col("bb_lower")) / width),
        )
        .withColumn(
            "bb_bandwidth", F.when(F.col("bb_mid") != 0, width / F.col("bb_mid"))
        )
        .drop("__sd")
    )


def macd(
    bars: DataFrame,
    *,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
) -> DataFrame:
    """MACD (Appel): fast/slow EMA spread plus its signal EMA.

    Spans use the standard ``alpha = 2/(span+1)`` mapping.  Appends
    ``macd`` (fast EMA − slow EMA), ``macd_signal`` (EMA of the MACD
    line) and ``macd_hist`` (their difference).  Three cascaded
    segment-renormalized folds over one symbol exchange.
    """
    if not (1 < fast < slow):
        raise ValueError(f"need 1 < fast < slow, got fast={fast} slow={slow}")
    if signal < 1:
        raise ValueError(f"signal must be >= 1, got {signal}")
    order = [F.col(ts_col)]
    out = _ewm_mean(
        bars, "close", "__ema_f",
        alpha=2.0 / (fast + 1), symbol_col=symbol_col, order=order, tag="mf",
    )
    out = _ewm_mean(
        out, "close", "__ema_s",
        alpha=2.0 / (slow + 1), symbol_col=symbol_col, order=order, tag="ms",
    )
    out = out.withColumn("macd", F.col("__ema_f") - F.col("__ema_s"))
    out = _ewm_mean(
        out, "macd", "macd_signal",
        alpha=2.0 / (signal + 1), symbol_col=symbol_col, order=order, tag="mg",
    )
    return out.withColumn(
        "macd_hist", F.col("macd") - F.col("macd_signal")
    ).drop("__ema_f", "__ema_s")


def stochastic(
    bars: DataFrame,
    *,
    k_window: int = 14,
    d_window: int = 3,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
) -> DataFrame:
    """Stochastic oscillator (Lane): ``%K = 100 * (close - LL) /
    (HH - LL)`` over the trailing ``k_window`` bars' low/high range,
    ``%D`` = ``d_window``-bar SMA of %K.

    Appends ``pct_k`` and ``pct_d``; null until the respective window
    is full and when the range is degenerate (``HH == LL``).  %K is
    staged as a real column before the %D average — a window expression
    cannot nest inside another window aggregate (Spark and DuckDB both
    reject it).  Two rolling frames over one symbol exchange, zero
    Python.
    """
    if k_window < 2:
        raise ValueError(f"k_window must be >= 2, got {k_window}")
    if d_window < 1:
        raise ValueError(f"d_window must be >= 1, got {d_window}")
    wk = (
        Window.partitionBy(symbol_col)
        .orderBy(ts_col)
        .rowsBetween(-(k_window - 1), 0)
    )
    full_k = F.count(F.lit(1)).over(wk) == k_window
    ll = F.min("low").over(wk)
    hh = F.max("high").over(wk)
    staged = bars.withColumn(
        "pct_k",
        F.when(
            full_k & (hh > ll),
            F.lit(100.0) * (F.col("close") - ll) / (hh - ll),
        ),
    )
    wd = (
        Window.partitionBy(symbol_col)
        .orderBy(ts_col)
        .rowsBetween(-(d_window - 1), 0)
    )
    return staged.withColumn(
        "pct_d",
        F.when(F.count("pct_k").over(wd) == d_window, F.avg("pct_k").over(wd)),
    )


def obv(
    bars: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
) -> DataFrame:
    """On-balance volume (Granville): running sum of volume signed by
    the close-to-close direction (first bar contributes 0).

    Appends ``obv`` as a LONG — the fold is an INTEGER cumulative sum,
    exact and engine-independent at any tape length (no float
    association risk).  One ordered window over one symbol exchange.
    """
    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    diff = F.col("close") - F.lag("close").over(w)
    signed = (
        F.when(diff > 0, F.col("volume"))
        .when(diff < 0, -F.col("volume"))
        .otherwise(F.lit(0))
        .cast("long")
    )
    return bars.withColumn(
        "obv", F.sum(F.coalesce(signed, F.lit(0))).over(w_run).cast("long")
    )


def donchian(
    bars: DataFrame,
    *,
    window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
) -> DataFrame:
    """Donchian channel (the turtle-trading channel): highest high and
    lowest low over the trailing ``window`` bars, the mid line, and the
    classic breakout flags against the PREVIOUS bar's channel (a close
    above yesterday's upper band is the turtle entry — comparing
    against the current bar's own channel could never fire, the close
    is inside it by construction).

    Appends ``dc_upper``, ``dc_lower``, ``dc_mid`` (null until a full
    window exists) and ``breakout_up`` / ``breakout_down`` booleans
    (false when the previous channel is not yet defined).  Two rolling
    extrema plus one lag over a single symbol exchange, zero Python.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    w_ord = Window.partitionBy(symbol_col).orderBy(ts_col)
    w = w_ord.rowsBetween(-(window - 1), 0)
    full = F.count(F.lit(1)).over(w) == window
    upper = F.when(full, F.max("high").over(w))
    lower = F.when(full, F.min("low").over(w))
    staged = bars.withColumn("dc_upper", upper).withColumn("dc_lower", lower)
    staged = staged.withColumn(
        "dc_mid", (F.col("dc_upper") + F.col("dc_lower")) / 2.0
    )
    prev_u = F.lag("dc_upper").over(w_ord)
    prev_l = F.lag("dc_lower").over(w_ord)
    return staged.withColumn(
        "breakout_up",
        F.coalesce(F.col("close") > prev_u, F.lit(False)),
    ).withColumn(
        "breakout_down",
        F.coalesce(F.col("close") < prev_l, F.lit(False)),
    )
