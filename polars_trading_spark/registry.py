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

from polars_trading_spark.config import Config
from polars_trading_spark.operators import bars as bars_ops
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
