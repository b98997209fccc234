"""The query registry: every implemented operator as a (Spark, oracle) pair.

This is the single source of truth behind ``__spark_entry__.py`` and the
local differential test suite.  Each entry pairs

* ``spark``  — a callable ``(spark, sf_dir) -> DataFrame`` running the
  operator through the real engine code path, and
* ``oracle`` — an equivalent self-contained DuckDB SQL string over the
  same parquet tables (pre-registered views), or ``None`` for operators
  whose semantics are genuinely not SQL-expressible (sequential state),
  which the driver then checks rows-only.

Cross-engine comparability rules used throughout:
* every computed float that involves a multi-term sum (vwap, EWM, dot
  products, cosine) is ROUNDed identically on both sides — raw picks,
  single divisions and integer aggregates are left exact;
* ordered-aggregation semantics use the deterministic ``seq`` tiebreaker
  from the trades mapping on both sides;
* column names are aliased identically on both sides (the driver hashes
  after sorting columns by name).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL
from polars_trading_spark.config import Config
from polars_trading_spark.operators import bars as bars_ops
from polars_trading_spark.operators import dynamic_labels as dyn_ops
from polars_trading_spark.operators.features import frac_diff, frac_diff_sql_expr
from polars_trading_spark.operators.labels import (
    fixed_time_return,
    fixed_time_return_classification,
)
from polars_trading_spark.sources.tables import TRADES_CTE, trades_from_events

__all__ = ["QUERIES", "Query", "register"]


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    description: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: Optional[str], description: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name=name, spark=fn, oracle=oracle, description=description)
        return fn

    return deco


def _trades_config() -> Config:
    return Config(timestamp_column="ts_event")


_OHLCV_ORACLE = """
    min(ts_event) AS ts_event_start,
    max(ts_event) AS ts_event_end,
    first(price ORDER BY ts_event, seq) AS open,
    max(price) AS high,
    min(price) AS low,
    last(price ORDER BY ts_event, seq) AS close,
    CAST(sum(size) AS BIGINT) AS volume,
    round(sum(size * price) / sum(size), 4) AS vwap,
    CAST(count(*) AS INTEGER) AS n_trades
"""


def _round_vwap(df: DataFrame) -> DataFrame:
    return df.withColumn("vwap", F.round("vwap", 4))


# --------------------------------------------------------------------------
# A1. time_bars (SURVEY §2.A-A1)
# --------------------------------------------------------------------------

TIME_BAR_SIZE = "15m"
_TIME_BUCKET_US = 15 * 60 * 1_000_000


@register(
    "time_bars",
    f"""
WITH trades AS ({TRADES_CTE}),
bucketed AS (
  SELECT *, make_timestamp((epoch_us(ts_event) // {_TIME_BUCKET_US}) * {_TIME_BUCKET_US}) AS bucket
  FROM trades
)
SELECT
    bucket AS ts_event_bucket,
    symbol,
    {_OHLCV_ORACLE}
FROM bucketed
GROUP BY bucket, symbol
""",
    "OHLCV bars over 15-minute buckets (reference bars.py:91-139)",
)
def q_time_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        out = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    return _round_vwap(out.withColumnRenamed("ts_event", "ts_event_bucket"))


# --------------------------------------------------------------------------
# A2. tick_bars (SURVEY §2.A-A2)
# --------------------------------------------------------------------------

TICK_BAR_SIZE = 20


@register(
    "tick_bars",
    f"""
WITH trades AS ({TRADES_CTE}),
numbered AS (
  SELECT *,
         CAST(ts_event AS DATE) AS d,
         row_number() OVER (PARTITION BY symbol, CAST(ts_event AS DATE) ORDER BY ts_event, seq) - 1 AS rn
  FROM trades
)
SELECT
    symbol,
    {_OHLCV_ORACLE}
FROM numbered
GROUP BY symbol, d, rn // {TICK_BAR_SIZE}
""",
    "OHLCV bars every 20 ticks per symbol/date (reference bars.py:142-191)",
)
def q_tick_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        out = bars_ops.tick_bars(trades_from_events(spark, sf_dir), bar_size=TICK_BAR_SIZE)
    return _round_vwap(out)


# --------------------------------------------------------------------------
# A3. volume_bars (SURVEY §2.A-A3) — closed-form split math on both sides
# --------------------------------------------------------------------------

VOLUME_BAR_SIZE = 200_000


@register(
    "volume_bars",
    f"""
WITH trades AS ({TRADES_CTE}),
cum AS (
  SELECT *,
         CAST(ts_event AS DATE) AS d,
         CAST(sum(size) OVER (PARTITION BY symbol, CAST(ts_event AS DATE)
                              ORDER BY ts_event, seq ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
  FROM trades
),
spans AS (
  SELECT *, cs - size AS prev FROM cum
),
pieces AS (
  SELECT *,
         unnest(generate_series(prev // {VOLUME_BAR_SIZE},
                                CASE WHEN cs % {VOLUME_BAR_SIZE} = 0 THEN cs // {VOLUME_BAR_SIZE} - 1
                                     ELSE cs // {VOLUME_BAR_SIZE} END)) AS bar
  FROM spans
),
amounts AS (
  SELECT *,
         least(cs, (bar + 1) * {VOLUME_BAR_SIZE}) - greatest(prev, bar * {VOLUME_BAR_SIZE}) AS piece
  FROM pieces
)
SELECT
    symbol,
    min(ts_event) AS ts_event_start,
    max(ts_event) AS ts_event_end,
    first(price ORDER BY ts_event, seq) AS open,
    max(price) AS high,
    min(price) AS low,
    last(price ORDER BY ts_event, seq) AS close,
    CAST(sum(piece) AS BIGINT) AS volume,
    round(sum(piece * price) / sum(piece), 4) AS vwap,
    CAST(count(*) AS INTEGER) AS n_trades
FROM amounts
GROUP BY symbol, d, bar
""",
    "OHLCV bars per 200k traded volume, split semantics (reference bars.py:194-244 + src/bars.rs split mode)",
)
def q_volume_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        out = bars_ops.volume_bars(trades_from_events(spark, sf_dir), bar_size=VOLUME_BAR_SIZE)
    return _round_vwap(out)


# --------------------------------------------------------------------------
# A4. dollar_bars (SURVEY §2.A-A4) — history-dependent overflow state;
# not SQL-expressible, driver records the rows-only check.
# --------------------------------------------------------------------------

DOLLAR_BAR_SIZE = 50_000_000.0


@register(
    "dollar_bars",
    None,
    "OHLCV bars per $50M traded, share-granularity overflow semantics "
    "(reference bars.py:247-316; sequential per (symbol, date) — rows-only check)",
)
def q_dollar_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        out = bars_ops.dollar_bars(trades_from_events(spark, sf_dir), bar_size=DOLLAR_BAR_SIZE)
    return _round_vwap(out)


# --------------------------------------------------------------------------
# A5/A6. fixed_time_return (+ classification, both threshold and sign
# modes) — pure window arithmetic; results are bit-exact across engines
# (single division / subtraction, no multi-term sums), so no rounding.
# --------------------------------------------------------------------------

FTR_WINDOW, FTR_OFFSET, FTR_THRESHOLD = 20, 1, 0.05


@register(
    "fixed_time_return",
    f"""
WITH trades AS ({TRADES_CTE}),
led AS (
  SELECT symbol, ts_event,
         lead(price, {FTR_OFFSET + FTR_WINDOW}) OVER w / lead(price, {FTR_OFFSET}) OVER w - 1
           AS fixed_time_return
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
)
SELECT symbol, ts_event, fixed_time_return,
       CAST(CASE WHEN fixed_time_return > {FTR_THRESHOLD} THEN 1
                 WHEN fixed_time_return < -{FTR_THRESHOLD} THEN -1
                 WHEN fixed_time_return BETWEEN -{FTR_THRESHOLD} AND {FTR_THRESHOLD} THEN 0
                 ELSE NULL END AS INTEGER) AS label,
       CAST(sign(fixed_time_return) AS INTEGER) AS label_sign
FROM led
""",
    "Forward return t+1 → t+21 per symbol with threshold and sign labels "
    "(reference labels.py:30-104)",
)
def q_fixed_time_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        t = trades_from_events(spark, sf_dir)
        order = ["ts_event", SEQ_COL]
        out = t.select(
            "symbol",
            "ts_event",
            fixed_time_return(
                "price", FTR_WINDOW, FTR_OFFSET, "symbol", order_by=order
            ).alias("fixed_time_return"),
            fixed_time_return_classification(
                "price", FTR_WINDOW, FTR_THRESHOLD, FTR_OFFSET, "symbol", order_by=order
            ).alias("label"),
            fixed_time_return_classification(
                "price", FTR_WINDOW, None, FTR_OFFSET, "symbol", order_by=order
            ).alias("label_sign"),
        )
    return out


# --------------------------------------------------------------------------
# A7. daily_vol — backward as-of self-join + EWM std.  The oracle uses the
# closed-form cumulative-sum EWM formulation (valid at sf0.01 lengths);
# the engine runs pandas ewm inside applyInPandas.  Both rounded to 6dp.
# --------------------------------------------------------------------------

DAILY_VOL_SPAN = 100
_ALPHA = 2.0 / (DAILY_VOL_SPAN + 1.0)
_R = 1.0 / (1.0 - _ALPHA)

EWM_STD_SQL = f"""
valid AS (
  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY ts_event, seq) - 1 AS t
  FROM rets WHERE ret IS NOT NULL
),
acc AS (
  SELECT symbol, seq, t,
         sum(ret * power({_R!r}, t)) OVER w AS wa,
         sum(power({_R!r}, t)) OVER w AS wb,
         sum(ret * ret * power({_R!r}, t)) OVER w AS wc,
         sum(power({_R * _R!r}, t)) OVER w AS wd
  FROM valid
  WINDOW w AS (PARTITION BY symbol ORDER BY t ROWS UNBOUNDED PRECEDING)
),
vol AS (
  SELECT r0.symbol, r0.ts_event, r0.seq, r0.price, r0.ret,
         CASE WHEN r0.ret IS NULL THEN NULL
              WHEN a.t = 0 THEN 0.0
              ELSE sqrt(greatest((a.wc/a.wb - (a.wa/a.wb)*(a.wa/a.wb))
                                 * (a.wb*a.wb/(a.wb*a.wb - a.wd)), 0))
         END AS trgt
  FROM rets r0 LEFT JOIN acc a ON r0.symbol = a.symbol AND r0.seq = a.seq
)
"""

LOOKBACK_SQL = f"""
trades AS ({TRADES_CTE}),
probes AS (
  SELECT *, ts_event - INTERVAL 24 HOURS AS lookback FROM trades
),
lk AS (
  SELECT p.symbol, p.ts_event, p.seq, p.price, r.price AS lookback_price
  FROM probes p
  ASOF LEFT JOIN trades r ON p.symbol = r.symbol AND p.lookback >= r.ts_event
),
rets AS (
  SELECT *, price / lookback_price - 1 AS ret FROM lk
)
"""


@register(
    "daily_vol",
    f"""
WITH
{LOOKBACK_SQL},
{EWM_STD_SQL}
SELECT symbol, ts_event, round(trgt, 6) AS daily_return_volatility
FROM vol
""",
    "EWM std (span=100) of 24h-lookback returns per symbol "
    "(reference dynamic_labels.py:14-86, AFML pg. 44)",
)
def q_daily_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        out = dyn_ops.daily_vol(trades_from_events(spark, sf_dir), span=DAILY_VOL_SPAN)
    return out.withColumn(
        "daily_return_volatility", F.round("daily_return_volatility", 6)
    )


# --------------------------------------------------------------------------
# A8. vertical barrier — forward as-of self-join; timestamps, exact.
# --------------------------------------------------------------------------

BARRIER_OFFSET = "4h"


@register(
    "vertical_barrier",
    f"""
WITH trades AS ({TRADES_CTE}),
offs AS (
  SELECT symbol, ts_event, ts_event + INTERVAL 4 HOURS AS off FROM trades
)
SELECT o.symbol, o.ts_event, b.vertical_barrier
FROM offs o
ASOF LEFT JOIN (SELECT symbol, ts_event AS vertical_barrier FROM trades) b
  ON o.symbol = b.symbol AND o.off <= b.vertical_barrier
""",
    "First timestamp at-or-after ts+4h per symbol "
    "(reference dynamic_labels.py:89-145)",
)
def q_vertical_barrier(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        out = dyn_ops.get_vertical_barrier_by_timedelta(
            trades_from_events(spark, sf_dir), BARRIER_OFFSET
        )
    return out


# --------------------------------------------------------------------------
# A11. frac_diff — FFD linear combination of lags; identical left-folded
# sum on both sides → bit-exact, no rounding.
# --------------------------------------------------------------------------

FRAC_D, FRAC_THRESHOLD = 0.5, 0.01


@register(
    "frac_diff",
    f"""
WITH trades AS ({TRADES_CTE})
SELECT symbol, ts_event,
       {frac_diff_sql_expr('price', FRAC_D, FRAC_THRESHOLD)} AS frac_diff
FROM trades
WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
""",
    "Fixed-width-window fractional differentiation d=0.5 thr=0.01 "
    "(reference features/frac_diff.py + src/frac_diff.rs)",
)
def q_frac_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        t = trades_from_events(spark, sf_dir)
        out = t.select(
            "symbol",
            "ts_event",
            frac_diff(
                "price", FRAC_D, FRAC_THRESHOLD, "symbol", order_by=["ts_event", SEQ_COL]
            ).alias("frac_diff"),
        )
    return out


# --------------------------------------------------------------------------
# A9/A10. triple barrier — the flagship pipeline: vol target → vertical
# barrier → first touch (range scan) → label.  Touch returns are exact
# single divisions; label flips only within ~1e-15 of a barrier, so no
# rounding is needed on the output columns.
# --------------------------------------------------------------------------

TB_SPAN, TB_OFFSET = 100, "4h"


@register(
    "triple_barrier",
    f"""
WITH
{LOOKBACK_SQL},
{EWM_STD_SQL},
barrier AS (
  SELECT o.symbol, o.ts_event, b.vb AS t1
  FROM (SELECT symbol, ts_event, ts_event + INTERVAL 4 HOURS AS off FROM trades) o
  ASOF LEFT JOIN (SELECT symbol, ts_event AS vb FROM trades) b
    ON o.symbol = b.symbol AND o.off <= b.vb
),
ev AS (
  SELECT v.symbol, v.ts_event AS t0, v.seq, v.price AS entry, v.trgt,
         coalesce(bar.t1, m.max_ts) AS t1
  FROM vol v
  JOIN barrier bar ON v.symbol = bar.symbol AND v.ts_event = bar.ts_event
  JOIN (SELECT symbol, max(ts_event) AS max_ts FROM vol WHERE trgt IS NOT NULL GROUP BY symbol) m
    ON v.symbol = m.symbol
  WHERE v.trgt IS NOT NULL
),
touch AS (
  SELECT e.symbol, e.t0, e.seq, e.entry, e.t1,
         min(CASE WHEN p.price / e.entry - 1 > e.trgt THEN p.ts_event END) AS pt_time,
         min(CASE WHEN p.price / e.entry - 1 < -e.trgt THEN p.ts_event END) AS sl_time
  FROM ev e
  JOIN trades p ON p.symbol = e.symbol AND p.ts_event >= e.t0 AND p.ts_event <= e.t1
  GROUP BY 1, 2, 3, 4, 5
),
labeled AS (
  SELECT symbol, t0, entry, pt_time, sl_time, t1,
         least(coalesce(pt_time, t1), coalesce(sl_time, t1), t1) AS touch_ts
  FROM touch
)
SELECT l.symbol,
       l.t0 AS "timestamp",
       l.touch_ts AS touch_timestamp,
       tp.price / l.entry - 1 AS return,
       CAST(CASE WHEN l.pt_time IS NOT NULL AND l.pt_time = l.touch_ts THEN 1
                 WHEN l.sl_time IS NOT NULL AND l.sl_time = l.touch_ts THEN -1
                 ELSE 0 END AS INTEGER) AS label
FROM labeled l
JOIN (SELECT symbol, ts_event, first(price ORDER BY seq) AS price
      FROM trades GROUP BY symbol, ts_event) tp
  ON tp.symbol = l.symbol AND tp.ts_event = l.touch_ts
""",
    "Triple-barrier labels: daily_vol target, 4h vertical barrier, "
    "pt/sl=1 first touch (completes reference dynamic_labels.py:148-186; "
    "AFML pg. 45-46)",
)
def q_triple_barrier(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        out = dyn_ops.get_triple_barrier_label(
            trades_from_events(spark, sf_dir),
            span=TB_SPAN,
            barrier_offset=TB_OFFSET,
            profit_take=1.0,
            stop_loss=1.0,
        )
    return out
