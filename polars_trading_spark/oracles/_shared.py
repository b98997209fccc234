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



# Lazy shared bar PLANS keyed by (applicationId, sf_dir, bar_size) — the
# same plan-only memo as sources/tables.py (no rows, no persisted
# blocks; every action still computes from the events parquet).
_BARS_MEMO: dict[tuple, DataFrame] = {}


def feature_bars(spark: SparkSession, sf_dir: str, bar_size: str | None = None) -> DataFrame:
    """The shared OHLCV time-bar frame every feature/portfolio query
    builds on, constructed ONCE per (session, sf_dir, bar_size).

    ~50 registered queries open with the identical
    ``time_bars(trades_from_events(...), TIME_BAR_SIZE)`` chain; in
    PySpark's classic mode each construction is ~1200 py4j round trips
    plus an eager re-analysis per DataFrame op (~0.3 s of pure driver
    time here).  A real application declares this table once — the memo
    holds only the lazy plan, so execution is unchanged and the bar
    aggregation itself still runs per action.
    """
    if bar_size is None:
        bar_size = TIME_BAR_SIZE
    try:
        key = (spark.sparkContext.applicationId, sf_dir, bar_size)
    except Exception:  # stopped/defunct context: build uncached
        key = None
    cached = _BARS_MEMO.get(key) if key is not None else None
    if cached is not None:
        return cached
    with _trades_config():
        bars = bars_ops.time_bars(
            trades_from_events(spark, sf_dir), bar_size=bar_size
        )
    if key is not None:
        _BARS_MEMO[key] = bars
    return bars


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
