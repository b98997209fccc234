"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark._utils import SEQ_COL
from polars_trading_spark.operators import bars as bars_ops
from polars_trading_spark.operators.indicators import _chunk_len as _ind_chunk_len
from polars_trading_spark.sources.tables import TRADES_CTE
from polars_trading_spark.sources.tables import trades_from_events
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from polars_trading_spark.oracles._shared import (  # noqa: F401
    feature_bars,
    TIME_BAR_SIZE,
    _trades_config,
    register,
)
from polars_trading_spark.oracles.bars import (  # noqa: F401
    _FEATURE_BARS_CTE,
)
from polars_trading_spark.oracles.portfolio import (  # noqa: F401
    _BT_PPY,
)



# --------------------------------------------------------------------------
# C-ext. MA-crossover trend signal (operators/backtest.py::
# ma_crossover_signal)
# --------------------------------------------------------------------------

_MAC_F, _MAC_S = 10, 50



@register(
    "ma_crossover",
    f"""
WITH
{_FEATURE_BARS_CTE},
m0 AS (
  SELECT symbol, ts, close,
    sum(close) OVER w AS cum, count(close) OVER w AS cnt
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
m AS (
  SELECT symbol, ts, close,
    (cum - coalesce(lag(cum, {_MAC_F}) OVER o, 0.0))
      / (cnt - coalesce(lag(cnt, {_MAC_F}) OVER o, 0)) AS sma_fast,
    (cum - coalesce(lag(cum, {_MAC_S}) OVER o, 0.0))
      / (cnt - coalesce(lag(cnt, {_MAC_S}) OVER o, 0)) AS sma_slow,
    cnt - coalesce(lag(cnt, {_MAC_S}) OVER o, 0) AS n_slow
  FROM m0
  WINDOW o AS (PARTITION BY symbol ORDER BY ts)
),
p AS (
  SELECT symbol, ts, close, sma_fast, sma_slow,
    CASE WHEN n_slow >= {_MAC_S} THEN sign(sma_fast - sma_slow) ELSE 0.0 END AS pos
  FROM m
),
fin AS (
  SELECT *,
    lag(pos) OVER w * ln(close / lag(close) OVER w) AS pnl
  FROM p
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
)
SELECT symbol, ts, sma_fast + 0 AS sma_fast,
  sma_slow + 0 AS sma_slow, pos + 0 AS pos,
  round(pnl, 6) + 0 AS pnl
FROM fin
""",
    f"SMA({_MAC_F})/SMA({_MAC_S}) crossover trend signal with one-bar-"
    "lagged log-return P&L per symbol",
)
def q_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.backtest import ma_crossover_signal

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = ma_crossover_signal(
        bars, fast=_MAC_F, slow=_MAC_S, ts_col="ts_event", close_col="close"
    )
    # smas are UNROUNDED: the prefix-sum fold makes them bit-identical
    # doubles on both engines, while round-to-6 hits exact .5 decimal
    # ties (3-decimal prices / small ints) where Spark's BigDecimal
    # HALF_UP and DuckDB's multiply-based round disagree.  pnl carries
    # an ln(), whose last ulp is engine-specific -> rounded.
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        F.col("ts_event").alias("ts"),
        (F.col("sma_fast") + z0).alias("sma_fast"),
        (F.col("sma_slow") + z0).alias("sma_slow"),
        (F.col("pos") + z0).alias("pos"),
        (F.round("pnl", 6) + z0).alias("pnl"),
    )



# --------------------------------------------------------------------------
# C-ext. Wilder RSI (operators/rsi.py) — segment-renormalized EWM gain/loss
# ratio; the weight normalizer cancels, so the oracle replays only the two
# weighted running sums with identical constants.
# --------------------------------------------------------------------------

_RSI_N = 14

_RSI_D = 1.0 - 1.0 / _RSI_N

_RSI_R = 1.0 / _RSI_D

_RSI_L = 32 * _RSI_N



@register(
    "rsi",
    f"""
WITH trades AS ({{TRADES_CTE}}),
s AS (
  SELECT symbol, ts_event, seq, price,
    price - lag(price) OVER (PARTITION BY symbol ORDER BY ts_event, seq) AS diff
  FROM trades
),
g AS (
  SELECT *,
    CASE WHEN diff > 0 THEN diff ELSE 0.0 END AS up,
    CASE WHEN diff < 0 THEN -diff ELSE 0.0 END AS dn,
    count(diff) OVER (PARTITION BY symbol ORDER BY ts_event, seq
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS t
  FROM s
),
h AS (
  SELECT *, CAST(floor(t / {_RSI_L}) AS BIGINT) AS k,
    CAST(t - CAST(floor(t / {_RSI_L}) AS BIGINT) * {_RSI_L} AS DOUBLE) AS j
  FROM g
),
e AS (
  SELECT *, CASE WHEN diff IS NOT NULL THEN pow({_RSI_R!r}, j) END AS rj FROM h
),
rr AS (
  SELECT *,
    sum(rj * up) OVER wc AS u_loc,
    sum(rj * dn) OVER wc AS d_loc,
    sum(rj * up) OVER (PARTITION BY symbol, k) AS u_tot,
    sum(rj * dn) OVER (PARTITION BY symbol, k) AS d_tot
  FROM e
  WINDOW wc AS (PARTITION BY symbol, k ORDER BY ts_event, seq
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
c AS (
  SELECT *,
    coalesce(max(u_tot) OVER (PARTITION BY symbol ORDER BY k
                              RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING), 0.0)
      * {_RSI_D ** _RSI_L!r}
    + coalesce(max(u_tot) OVER (PARTITION BY symbol ORDER BY k
                                RANGE BETWEEN 2 PRECEDING AND 2 PRECEDING), 0.0)
      * {_RSI_D ** (2 * _RSI_L)!r} AS carry_u,
    coalesce(max(d_tot) OVER (PARTITION BY symbol ORDER BY k
                              RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING), 0.0)
      * {_RSI_D ** _RSI_L!r}
    + coalesce(max(d_tot) OVER (PARTITION BY symbol ORDER BY k
                                RANGE BETWEEN 2 PRECEDING AND 2 PRECEDING), 0.0)
      * {_RSI_D ** (2 * _RSI_L)!r} AS carry_d
  FROM rr
),
f AS (
  SELECT symbol, ts_event, seq, diff,
    pow({_RSI_D!r}, j) * (u_loc + carry_u) AS s_up,
    pow({_RSI_D!r}, j) * (d_loc + carry_d) AS s_dn
  FROM c
)
SELECT symbol, ts_event, seq,
  round(CASE WHEN diff IS NULL OR (s_up + s_dn) <= 0 THEN NULL
             ELSE 100.0 * s_up / (s_up + s_dn) END, 6) + 0 AS rsi
FROM f
""".format(TRADES_CTE=TRADES_CTE),
    f"Wilder RSI (period {_RSI_N}, adjust=True EWM) — momentum "
    "oscillator; segment-renormalized, overflow-free for unbounded "
    "tapes, one symbol exchange, zero Python",
)
def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.rsi import rsi

    t = trades_from_events(spark, sf_dir)
    out = rsi(t, period=_RSI_N, seq_col=SEQ_COL)
    return out.select(
        "symbol",
        "ts_event",
        F.col(SEQ_COL).alias("seq"),
        (F.round("rsi", 6) + F.lit(0.0)).alias("rsi"),
    )



# --------------------------------------------------------------------------
# C-ext (round 6). Ulcer index / Martin ratio (operators/backtest.py)
# and the Wald-Wolfowitz runs test (operators/regime.py).
# --------------------------------------------------------------------------


@register(
    "ulcer_index",
    f"""
WITH
{_FEATURE_BARS_CTE},
rets AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS ret
  FROM bars
),
r2 AS (SELECT symbol, ts, ret FROM rets WHERE ret IS NOT NULL),
path AS (
  SELECT symbol, ts, ret, sum(ret) OVER w AS cum
  FROM r2
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pathd AS (
  SELECT symbol, ts, ret,
    1 - exp(cum - max(greatest(cum, 0.0)) OVER w) AS ddf
  FROM path
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
-- ts-ordered running folds read at the last row (SCALING rule 24/27)
f AS (
  SELECT symbol,
    row_number() OVER word AS rn,
    count(*) OVER wall AS n,
    sum(ret) OVER wrun AS s1,
    sum(ddf * ddf) OVER wrun AS sdd2
  FROM pathd
  WINDOW word AS (PARTITION BY symbol ORDER BY ts),
         wrun AS (PARTITION BY symbol ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY symbol)
)
SELECT symbol, CAST(n AS BIGINT) AS n_periods,
  CASE WHEN n >= 2 THEN round(s1 / n * {_BT_PPY!r}, 6) + 0 END AS ann_return,
  CASE WHEN n >= 2 THEN round(sqrt(sdd2 / n), 6) + 0 END AS ulcer,
  CASE WHEN n >= 2 AND sqrt(sdd2 / n) > 0
       THEN round(s1 / n * {_BT_PPY!r} / sqrt(sdd2 / n), 6) + 0 END AS martin
FROM f WHERE rn = n
""",
    "Ulcer index (RMS of the fractional drawdown path) and Martin "
    "ratio per symbol — drawdown-depth-weighted risk, ordered folds",
)
def q_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.backtest import ulcer_index

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = ulcer_index(bars, periods_per_year=_BT_PPY, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_periods",
        (F.round("ann_return", 6) + z0).alias("ann_return"),
        (F.round("ulcer", 6) + z0).alias("ulcer"),
        (F.round("martin", 6) + z0).alias("martin"),
    )



def _sql_ewm_fold(src: str, val: str, out: str, alpha: float, p: str) -> str:
    """One segment-renormalized EWM-mean fold as a CTE chain ending in
    CTE ``{p}`` that carries every ``src`` column plus ``{out}``.
    Mirrors operators/indicators.py::_ewm_mean exactly (identical
    Python-float constants on both engines)."""
    d = 1.0 - alpha
    r = 1.0 / d
    L = _ind_chunk_len(d)
    return f"""{p}0 AS (
  SELECT *, count(*) OVER (PARTITION BY symbol ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS {p}_t
  FROM {src}
),
{p}1 AS (
  SELECT *, CAST(floor({p}_t / {L}) AS BIGINT) AS {p}_k,
    CAST({p}_t - CAST(floor({p}_t / {L}) AS BIGINT) * {L} AS DOUBLE) AS {p}_j
  FROM {p}0
),
{p}2 AS (
  SELECT *,
    sum(pow({r!r}, {p}_j) * ({val})) OVER (PARTITION BY symbol, {p}_k ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {p}_loc,
    sum(pow({r!r}, {p}_j) * ({val})) OVER (PARTITION BY symbol, {p}_k) AS {p}_tot
  FROM {p}1
),
{p}3 AS (
  SELECT *,
    coalesce(max({p}_tot) OVER (PARTITION BY symbol ORDER BY {p}_k
      RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING), 0.0) * {d ** L!r}
    + coalesce(max({p}_tot) OVER (PARTITION BY symbol ORDER BY {p}_k
      RANGE BETWEEN 2 PRECEDING AND 2 PRECEDING), 0.0) * {d ** (2 * L)!r} AS {p}_carry
  FROM {p}2
),
{p} AS (
  SELECT *, pow({d!r}, {p}_j) * ({p}_loc + {p}_carry)
            / ((1.0 - pow({d!r}, {p}_t + 1)) / {1.0 - d!r}) AS {out}
  FROM {p}3
)"""



_ATR_N = 14

_BB_W, _BB_K = 20, 2.0

_MACD_F, _MACD_S, _MACD_G = 12, 26, 9



@register(
    "atr",
    f"""
WITH
{_FEATURE_BARS_CTE},
trd0 AS (
  SELECT symbol, ts, close, high, low,
    lag(close) OVER (PARTITION BY symbol ORDER BY ts) AS pc
  FROM bars
),
trd AS (
  SELECT symbol, ts, close,
    CASE WHEN pc IS NULL THEN high - low
         ELSE greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
  FROM trd0
),
{_sql_ewm_fold('trd', 'tr', 'atr', 1.0 / _ATR_N, 'at')}
SELECT symbol, ts AS ts_event,
  round(tr, 6) + 0 AS tr,
  round(atr, 6) + 0 AS atr,
  round(100.0 * atr / close, 6) + 0 AS natr
FROM at
""",
    f"Wilder ATR (period {_ATR_N}, adjust=True EWM mean of true range) "
    "plus normalized NATR over 15m bars — segment-renormalized, "
    "overflow-free, one symbol exchange, zero Python",
)
def q_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.indicators import atr

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = atr(bars, period=_ATR_N, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "ts_event",
        (F.round("tr", 6) + z0).alias("tr"),
        (F.round("atr", 6) + z0).alias("atr"),
        (F.round("natr", 6) + z0).alias("natr"),
    )



@register(
    "bollinger",
    f"""
WITH
{_FEATURE_BARS_CTE},
bb0 AS (
  SELECT symbol, ts, close,
    count(*) OVER r AS n_,
    avg(close) OVER r AS mid,
    stddev_samp(close) OVER r AS sd
  FROM bars
  WINDOW r AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN {_BB_W - 1} PRECEDING AND CURRENT ROW)
),
bb1 AS (
  SELECT symbol, ts, close,
    CASE WHEN n_ = {_BB_W} THEN mid END AS bb_mid,
    CASE WHEN n_ = {_BB_W} THEN mid + {_BB_K!r} * sd END AS bb_upper,
    CASE WHEN n_ = {_BB_W} THEN mid - {_BB_K!r} * sd END AS bb_lower
  FROM bb0
),
bb2 AS (SELECT *, bb_upper - bb_lower AS width FROM bb1)
SELECT symbol, ts AS ts_event,
  round(bb_mid, 6) + 0 AS bb_mid,
  round(bb_upper, 6) + 0 AS bb_upper,
  round(bb_lower, 6) + 0 AS bb_lower,
  round(CASE WHEN width > 0 THEN (close - bb_lower) / width END, 6) + 0 AS pct_b,
  round(CASE WHEN bb_mid != 0 THEN width / bb_mid END, 6) + 0 AS bb_bandwidth
FROM bb2
""",
    f"Bollinger bands ({_BB_W}-bar SMA ± {_BB_K}σ sample std) with %B and "
    "bandwidth over 15m bars; full-window gate, single rolling frame, "
    "zero Python",
)
def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.indicators import bollinger

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = bollinger(bars, window=_BB_W, num_std=_BB_K, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "ts_event",
        *[
            (F.round(c, 6) + z0).alias(c)
            for c in ("bb_mid", "bb_upper", "bb_lower", "pct_b", "bb_bandwidth")
        ],
    )



@register(
    "macd",
    f"""
WITH
{_FEATURE_BARS_CTE},
mbase AS (SELECT symbol, ts, close FROM bars),
{_sql_ewm_fold('mbase', 'close', 'ema_f', 2.0 / (_MACD_F + 1), 'mf')},
{_sql_ewm_fold('mf', 'close', 'ema_s', 2.0 / (_MACD_S + 1), 'ms')},
md AS (SELECT *, ema_f - ema_s AS macd FROM ms),
{_sql_ewm_fold('md', 'macd', 'macd_signal', 2.0 / (_MACD_G + 1), 'mg')}
SELECT symbol, ts AS ts_event,
  round(macd, 6) + 0 AS macd,
  round(macd_signal, 6) + 0 AS macd_signal,
  round(macd - macd_signal, 6) + 0 AS macd_hist
FROM mg
""",
    f"MACD({_MACD_F},{_MACD_S},{_MACD_G}) over 15m bars — three cascaded "
    "segment-renormalized EWM folds (fast/slow/signal), one symbol "
    "exchange, zero joins, zero Python",
)
def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.indicators import macd

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = macd(bars, fast=_MACD_F, slow=_MACD_S, signal=_MACD_G, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "ts_event",
        (F.round("macd", 6) + z0).alias("macd"),
        (F.round("macd_signal", 6) + z0).alias("macd_signal"),
        (F.round("macd_hist", 6) + z0).alias("macd_hist"),
    )



# --------------------------------------------------------------------------
# C-ext. Stochastic oscillator + on-balance volume
# (operators/indicators.py) over the shared 15m bar frame.
# --------------------------------------------------------------------------

_STO_K, _STO_D = 14, 3



@register(
    "stochastic",
    f"""
WITH
{_FEATURE_BARS_CTE},
st0 AS (
  SELECT symbol, ts, close,
    count(*) OVER wk AS nk,
    min(low) OVER wk AS ll,
    max(high) OVER wk AS hh
  FROM bars
  WINDOW wk AS (PARTITION BY symbol ORDER BY ts
                ROWS BETWEEN {_STO_K - 1} PRECEDING AND CURRENT ROW)
),
st1 AS (
  SELECT symbol, ts,
    CASE WHEN nk = {_STO_K} AND hh > ll
         THEN 100.0 * (close - ll) / (hh - ll) END AS pct_k
  FROM st0
),
st2 AS (
  SELECT symbol, ts, pct_k,
    count(pct_k) OVER wd AS nd_,
    avg(pct_k) OVER wd AS d_
  FROM st1
  WINDOW wd AS (PARTITION BY symbol ORDER BY ts
                ROWS BETWEEN {_STO_D - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts AS ts_event,
  round(pct_k, 6) + 0 AS pct_k,
  round(CASE WHEN nd_ = {_STO_D} THEN d_ END, 6) + 0 AS pct_d
FROM st2
""",
    f"Stochastic oscillator %K({_STO_K}) / %D({_STO_D}) over 15m bars — "
    "two rolling frames, %K staged before the %D average (no nested "
    "window), degenerate-range null guard, zero Python",
)
def q_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.indicators import stochastic

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = stochastic(bars, k_window=_STO_K, d_window=_STO_D, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "ts_event",
        (F.round("pct_k", 6) + z0).alias("pct_k"),
        (F.round("pct_d", 6) + z0).alias("pct_d"),
    )



@register(
    "obv",
    f"""
WITH
{_FEATURE_BARS_CTE},
ob0 AS (
  SELECT symbol, ts, volume,
    close - lag(close) OVER (PARTITION BY symbol ORDER BY ts) AS d_
  FROM bars
),
ob1 AS (
  SELECT symbol, ts,
    CASE WHEN d_ > 0 THEN volume WHEN d_ < 0 THEN -volume ELSE 0 END AS sv
  FROM ob0
)
SELECT symbol, ts AS ts_event,
  CAST(sum(sv) OVER (PARTITION BY symbol ORDER BY ts
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
FROM ob1
""",
    "On-balance volume over 15m bars — INTEGER cumulative fold, exact "
    "and engine-independent at any tape length; one ordered window, "
    "zero Python",
)
def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.indicators import obv

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = obv(bars, ts_col="ts_event")
    return out.select("symbol", "ts_event", "obv")



# --------------------------------------------------------------------------
# C-ext. Session-anchored running VWAP (operators/execution.py::session_vwap)
# — (ts, seq)-ordered running folds per (symbol, UTC day), replayed verbatim.
# --------------------------------------------------------------------------


@register(
    "session_vwap",
    f"""
WITH trades AS ({TRADES_CTE}),
sv0 AS (
  SELECT symbol, ts_event, seq, price, size,
    CAST(ts_event AS DATE) AS session_day
  FROM trades
),
sv1 AS (
  SELECT symbol, ts_event, seq, session_day,
    sum(price * size) OVER w AS pv,
    sum(size) OVER w AS v
  FROM sv0
  WINDOW w AS (PARTITION BY symbol, session_day ORDER BY ts_event, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts_event, seq, session_day,
  CAST(v AS BIGINT) AS cum_volume,
  round(pv / v, 6) + 0 AS session_vwap
FROM sv1
""",
    "Session-anchored running VWAP per (symbol, UTC day) — the intraday "
    "execution benchmark; (ts, seq)-ordered running folds (layout-"
    "independent floats, INTEGER cumulative volume), one exchange, "
    "zero Python",
)
def q_session_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.execution import session_vwap

    with _trades_config():
        out = session_vwap(trades_from_events(spark, sf_dir), seq_col=SEQ_COL)
    return out.select(
        "symbol",
        "ts_event",
        F.col(SEQ_COL).alias("seq"),
        "session_day",
        "cum_volume",
        (F.round("session_vwap", 6) + F.lit(0.0)).alias("session_vwap"),
    )



# --------------------------------------------------------------------------
# C-ext. Donchian channel + turtle breakout flags
# (operators/indicators.py::donchian) over the shared 15m bar frame.
# Flags cast to int for the driver's value hash (no boolean oracle
# outputs anywhere in the registry).
# --------------------------------------------------------------------------

_DC_W = 20



@register(
    "donchian",
    f"""
WITH
{_FEATURE_BARS_CTE},
dc0 AS (
  SELECT symbol, ts, close,
    count(*) OVER w AS n_,
    max(high) OVER w AS hh,
    min(low) OVER w AS ll
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN {_DC_W - 1} PRECEDING AND CURRENT ROW)
),
dc1 AS (
  SELECT symbol, ts, close,
    CASE WHEN n_ = {_DC_W} THEN hh END AS dc_upper,
    CASE WHEN n_ = {_DC_W} THEN ll END AS dc_lower
  FROM dc0
),
dc2 AS (
  SELECT symbol, ts, close, dc_upper, dc_lower,
    (dc_upper + dc_lower) / 2.0 AS dc_mid,
    lag(dc_upper) OVER (PARTITION BY symbol ORDER BY ts) AS pu,
    lag(dc_lower) OVER (PARTITION BY symbol ORDER BY ts) AS pl
  FROM dc1
)
SELECT symbol, ts AS ts_event,
  round(dc_upper, 6) + 0 AS dc_upper,
  round(dc_lower, 6) + 0 AS dc_lower,
  round(dc_mid, 6) + 0 AS dc_mid,
  CAST(coalesce(close > pu, FALSE) AS INTEGER) AS breakout_up,
  CAST(coalesce(close < pl, FALSE) AS INTEGER) AS breakout_down
FROM dc2
""",
    f"Donchian channel ({_DC_W}-bar high/low bands + mid) with turtle "
    "breakout flags vs the PREVIOUS bar's channel; two rolling extrema "
    "+ one lag over one symbol exchange, zero Python",
)
def q_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.indicators import donchian

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = donchian(bars, window=_DC_W, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "ts_event",
        (F.round("dc_upper", 6) + z0).alias("dc_upper"),
        (F.round("dc_lower", 6) + z0).alias("dc_lower"),
        (F.round("dc_mid", 6) + z0).alias("dc_mid"),
        F.col("breakout_up").cast("int").alias("breakout_up"),
        F.col("breakout_down").cast("int").alias("breakout_down"),
    )
