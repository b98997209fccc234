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
# A4. dollar_bars (SURVEY §2.A-A4) — history-dependent overflow state.
# The per-trade state transition IS closed-form (entering dollar balance ->
# bars closed + exit balance), so a recursive CTE that advances one trade
# per (symbol, date) group per iteration expresses the sequential scan in
# SQL: recursion carries only (c_in, gid_in); piece fan-out and OHLCV are
# ordinary relational algebra on top.  Float ops mirror the Spark island
# exactly (same IEEE ops in the same order), so values are bit-comparable.
# --------------------------------------------------------------------------

DOLLAR_BAR_SIZE = 50_000_000.0


@register(
    "dollar_bars",
    f"""
WITH RECURSIVE trades AS ({TRADES_CTE}),
ordered AS (
  SELECT symbol, CAST(ts_event AS DATE) AS d, ts_event, seq, price, size,
         row_number() OVER (PARTITION BY symbol, CAST(ts_event AS DATE)
                            ORDER BY ts_event, seq) AS rn
  FROM trades
  WHERE price IS NOT NULL
),
state AS (
  SELECT symbol, d, 1 AS rn, CAST(0.0 AS DOUBLE) AS c_in, CAST(0 AS BIGINT) AS gid_in
  FROM (SELECT DISTINCT symbol, d FROM ordered)
  UNION ALL
  SELECT symbol, d, rn, c_in, gid_in FROM (
    SELECT o.symbol AS symbol, o.d AS d, o.rn + 1 AS rn,
           CAST(ceil(({DOLLAR_BAR_SIZE} - s.c_in) / o.price) AS BIGINT) AS need1,
           CAST(ceil({DOLLAR_BAR_SIZE} / o.price) AS BIGINT) AS need_f,
           o.size - need1 AS rem,
           rem // need_f AS kfull,
           rem - kfull * need_f AS r,
           CASE WHEN o.size < need1 THEN s.c_in + o.size * o.price
                ELSE r * o.price END AS c_in,
           CASE WHEN o.size < need1 THEN s.gid_in
                ELSE s.gid_in + 1 + kfull END AS gid_in
    FROM state s
    JOIN ordered o ON o.symbol = s.symbol AND o.d = s.d AND o.rn = s.rn
  )
),
expanded AS (
  SELECT o.symbol, o.d, o.ts_event, o.seq, o.price,
         CAST(ceil(({DOLLAR_BAR_SIZE} - s.c_in) / o.price) AS BIGINT) AS need1,
         CAST(ceil({DOLLAR_BAR_SIZE} / o.price) AS BIGINT) AS need_f,
         o.size - need1 AS rem,
         rem // need_f AS kfull,
         rem - kfull * need_f AS r,
         CASE WHEN o.size < need1
              THEN [{{'b': s.gid_in, 'sh': o.size}}]
              ELSE [{{'b': s.gid_in, 'sh': need1}}]
                   || [{{'b': s.gid_in + j, 'sh': need_f}} for j in range(1, kfull + 1)]
                   || (CASE WHEN r > 0 THEN [{{'b': s.gid_in + 1 + kfull, 'sh': r}}]
                            ELSE [] END)
         END AS pcs
  FROM ordered o
  JOIN state s ON s.symbol = o.symbol AND s.d = o.d AND s.rn = o.rn
),
pieces AS (
  SELECT symbol, d, ts_event, seq, price, unnest(pcs) AS pc FROM expanded
)
SELECT symbol,
       min(ts_event) AS ts_event_start,
       max(ts_event) AS ts_event_end,
       first(price ORDER BY ts_event, seq) AS open,
       max(price) AS high,
       min(price) AS low,
       last(price ORDER BY ts_event, seq) AS close,
       CAST(sum(pc.sh) AS BIGINT) AS volume,
       round(sum(pc.sh * price) / sum(pc.sh), 4) AS vwap,
       CAST(count(*) AS INTEGER) AS n_trades
FROM pieces
GROUP BY symbol, d, pc.b
""",
    "OHLCV bars per $50M traded, share-granularity overflow semantics "
    "(reference bars.py:247-316 + src/bars.rs:53-65; oracle = recursive-CTE "
    "state scan over the same trades mapping)",
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
# cusum_filter — AFML 2.5.2.1 symmetric CUSUM event sampling.  The scan
# is history-dependent (per-side resets), so the oracle replays the
# exact sequential recursion as a recursive CTE advancing every symbol
# one row per iteration; the Spark side runs the chunked closed-form
# numpy scan inside an applyInPandas island.
# --------------------------------------------------------------------------

CUSUM_H = 150.0


@register(
    "cusum_filter",
    f"""
WITH RECURSIVE trades AS ({TRADES_CTE}),
t AS (
  SELECT symbol, ts_event,
         row_number() OVER (PARTITION BY symbol ORDER BY ts_event, seq) AS rn,
         price - lag(price) OVER (PARTITION BY symbol ORDER BY ts_event, seq) AS d
  FROM trades
),
rec(symbol, rn, spos, sneg, fired, side) AS (
  SELECT symbol, rn, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), FALSE, 0
  FROM t WHERE rn = 1
  UNION ALL
  SELECT x.symbol, x.rn,
         CASE WHEN NOT (x.n < -{CUSUM_H}) AND x.p > {CUSUM_H} THEN 0.0 ELSE x.p END,
         CASE WHEN x.n < -{CUSUM_H} THEN 0.0 ELSE x.n END,
         (x.n < -{CUSUM_H}) OR (x.p > {CUSUM_H}),
         CASE WHEN x.n < -{CUSUM_H} THEN -1 WHEN x.p > {CUSUM_H} THEN 1 ELSE 0 END
  FROM (
    SELECT tt.symbol, tt.rn,
           greatest(0.0, r.spos + tt.d) AS p,
           least(0.0, r.sneg + tt.d) AS n
    FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.rn = r.rn + 1
  ) x
)
SELECT r.symbol, tt.ts_event, CAST(r.side AS INTEGER) AS side
FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.rn = r.rn
WHERE r.fired
""",
    "Symmetric CUSUM event sampling (AFML 2.5.2.1): emit ±1 events when "
    "the running excursion exceeds the threshold — chunked closed-form "
    "numpy scan per symbol vs sequential recursive-CTE oracle",
)
def q_cusum_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.sampling import cusum_filter

    with _trades_config():
        out = cusum_filter(trades_from_events(spark, sf_dir), CUSUM_H)
    return out


# --------------------------------------------------------------------------
# sample_weights — AFML ch.4 extension of the labeling pipeline: label
# concurrency via one horizon-bucketed span join, average uniqueness,
# return attribution, linear time decay.  Oracle mirrors the span join +
# window concurrency + running-sum decay exactly.
# --------------------------------------------------------------------------


@register(
    "sample_weights",
    f"""
WITH trades AS ({TRADES_CTE}),
offs AS (
  SELECT symbol, ts_event, ts_event + INTERVAL 4 HOURS AS off FROM trades
),
ev0 AS (
  SELECT o.symbol, o.ts_event AS t0, b.t1
  FROM offs o
  ASOF LEFT JOIN (SELECT symbol, ts_event AS t1 FROM trades) b
    ON o.symbol = b.symbol AND o.off <= b.t1
),
ev AS (
  SELECT symbol, t0, coalesce(t1, max(t0) OVER (PARTITION BY symbol)) AS t1
  FROM ev0
),
rets AS (
  SELECT symbol, ts_event AS pt,
         ln(price / lag(price) OVER (PARTITION BY symbol ORDER BY ts_event)) AS r
  FROM trades
),
joined AS (
  SELECT e.symbol, e.t0, p.pt, p.r
  FROM ev e
  JOIN rets p ON p.symbol = e.symbol AND p.pt BETWEEN e.t0 AND e.t1
),
conc AS (
  SELECT *, count(*) OVER (PARTITION BY symbol, pt) AS c FROM joined
),
weights AS (
  SELECT symbol, t0 AS ts_event,
         avg(1.0 / c) AS w,
         CAST(count(*) AS BIGINT) AS n_path,
         abs(sum(CASE WHEN pt > t0 THEN r / c END)) AS ra
  FROM conc
  GROUP BY symbol, t0
)
SELECT symbol, ts_event,
       round(w, 6) AS avg_uniqueness,
       n_path,
       round(ra, 6) AS ret_attr,
       round((0.5 + 0.5 * sum(w) OVER (PARTITION BY symbol ORDER BY ts_event
                                       ROWS UNBOUNDED PRECEDING)
                    / sum(w) OVER (PARTITION BY symbol)) * w, 6) AS decayed_weight
FROM weights
""",
    "AFML ch.4 sample weights over 4h-barrier events: average uniqueness "
    "(1/concurrency), return attribution, linear time decay — one "
    "horizon-bucketed span join, zero Python",
)
def q_sample_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators import sample_weights as sw_ops

    with _trades_config():
        trades = trades_from_events(spark, sf_dir)
        events = dyn_ops.get_vertical_barrier_by_timedelta(trades, BARRIER_OFFSET)
        out = sw_ops.sample_weights(
            events, trades, t1_col="vertical_barrier", bucket=BARRIER_OFFSET
        )
        out = sw_ops.time_decay(out, weight_col="avg_uniqueness", last_weight=0.5)
    return out.select(
        "symbol",
        "ts_event",
        F.round("avg_uniqueness", 6).alias("avg_uniqueness"),
        "n_path",
        F.round("ret_attr", 6).alias("ret_attr"),
        F.round("decayed_weight", 6).alias("decayed_weight"),
    )


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


# --------------------------------------------------------------------------
# A10 meta-labeling mode: a deterministic ±1 bet side (seq parity) rides
# along; path returns are side-adjusted before barrier detection and the
# label answers act/pass (AFML ch. 3.6; reference stub dynamic_labels.py
# :173-186 documents the two-class mode, _testing/labels.py:28-33 the
# side-adjusted path return).
# --------------------------------------------------------------------------


@register(
    "triple_barrier_meta",
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
         CASE WHEN v.seq % 2 = 0 THEN 1.0 ELSE -1.0 END AS side,
         coalesce(bar.t1, m.max_ts) AS t1
  FROM vol v
  JOIN barrier bar ON v.symbol = bar.symbol AND v.ts_event = bar.ts_event
  JOIN (SELECT symbol, max(ts_event) AS max_ts FROM vol WHERE trgt IS NOT NULL GROUP BY symbol) m
    ON v.symbol = m.symbol
  WHERE v.trgt IS NOT NULL
),
touch AS (
  SELECT e.symbol, e.t0, e.seq, e.entry, e.side, e.t1,
         min(CASE WHEN (p.price / e.entry - 1) * e.side > e.trgt THEN p.ts_event END) AS pt_time,
         min(CASE WHEN (p.price / e.entry - 1) * e.side < -e.trgt THEN p.ts_event END) AS sl_time
  FROM ev e
  JOIN trades p ON p.symbol = e.symbol AND p.ts_event >= e.t0 AND p.ts_event <= e.t1
  GROUP BY 1, 2, 3, 4, 5, 6
),
labeled AS (
  SELECT symbol, t0, entry, side, pt_time, sl_time, t1,
         least(coalesce(pt_time, t1), coalesce(sl_time, t1), t1) AS touch_ts
  FROM touch
)
SELECT l.symbol,
       l.t0 AS "timestamp",
       l.touch_ts AS touch_timestamp,
       l.side,
       (tp.price / l.entry - 1) * l.side AS return,
       CAST(CASE WHEN (tp.price / l.entry - 1) * l.side > 0 THEN 1 ELSE 0 END AS INTEGER) AS label
FROM labeled l
JOIN (SELECT symbol, ts_event, first(price ORDER BY seq) AS price
      FROM trades GROUP BY symbol, ts_event) tp
  ON tp.symbol = l.symbol AND tp.ts_event = l.touch_ts
""",
    "Meta-labels (act/pass) over a deterministic ±1 bet side: "
    "side-adjusted barrier detection, realized bet return, label=1 iff "
    "positive (completes reference dynamic_labels.py:173-186 two-class "
    "mode; AFML ch. 3.6)",
)
def q_triple_barrier_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        t = trades_from_events(spark, sf_dir).withColumn(
            "side", F.when(F.col(SEQ_COL) % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        )
        out = dyn_ops.get_triple_barrier_label(
            t,
            span=TB_SPAN,
            barrier_offset=TB_OFFSET,
            profit_take=1.0,
            stop_loss=1.0,
            label_style="meta",
            side_col="side",
        )
    return out


# ==========================================================================
# Extension operators (SURVEY §2.C): text analysis, dedup, similarity,
# multimodal — the LLM-training-data pipeline layer over documents /
# embeddings.
# ==========================================================================

from polars_trading_spark.functions import corpus as corpus_ops  # noqa: E402
from polars_trading_spark.functions import dedup as dedup_ops  # noqa: E402
from polars_trading_spark.functions import multimodal as mm_ops  # noqa: E402
from polars_trading_spark.functions import similarity as sim_ops  # noqa: E402
from polars_trading_spark.functions import text as text_ops  # noqa: E402
from polars_trading_spark.functions.dedup import MERSENNE31, _coeffs  # noqa: E402
from polars_trading_spark.functions.text import STOPWORDS  # noqa: E402
from polars_trading_spark.sources.tables import read_table  # noqa: E402

# Shared DuckDB fragments — the exact SQL twins of functions/text.py.
_DOCS_TOK_CTE = """
docs AS (
  SELECT doc_id, text, lang, source, n_chars,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
),
tok AS (
  SELECT *, list_filter(string_split(norm, ' '), x -> x != '') AS toks FROM docs
)
"""


def _sql_hash60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _sql_shingle_sh_cte(n: int) -> str:
    """DuckDB twin of ``dedup.shingle_hashes``: per-token 31-bit hashes
    combined arithmetically over each n-token window (list named
    ``sh`` keyed by doc_id; expects the ``tok`` CTE in scope).  The
    fold order and modulus match the Spark zip_with chain exactly, and
    every intermediate stays below 2^36 (DuckDB BIGINTs trap on
    overflow rather than wrapping)."""
    combined = "hs[i+1]"
    for j in range(2, n + 1):
        combined = f"(({combined}) * 31 + hs[i+{j}]) % {MERSENNE31}"
    return f"""hs AS (
  SELECT doc_id, [{_sql_hash60("t")} % {MERSENNE31} for t in toks] AS hs FROM tok
),
sh AS (
  SELECT doc_id, list_distinct([{combined} for i in range(0, len(hs) - {n - 1})]) AS sh
  FROM hs
)"""


def _sql_stopword_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(toks, t -> list_contains([{words}], t)))"


# --------------------------------------------------------------------------
# text_analysis: token counting, fingerprinting, language-ID, quality.
# --------------------------------------------------------------------------

_CJK_SQL = (
    "CASE WHEN length(text) > 0 THEN "
    "(length(text) - length(regexp_replace(text, '[\\x{4E00}-\\x{9FFF}]', '', 'g')))"
    " / length(text) ELSE 0.0 END"
)

_LANG_CASE = (
    f"CASE WHEN {_CJK_SQL} >= 0.3 THEN 'zh' WHEN greatest("
    + ", ".join(f"c_{lang}" for lang in STOPWORDS)
    + ") = 0 THEN 'unknown' "
    + " ".join(
        f"WHEN c_{lang} = greatest(" + ", ".join(f"c_{l2}" for l2 in STOPWORDS) + f") THEN '{lang}'"
        for lang in STOPWORDS
    )
    + " END"
)


# Text feature CTEs + the quality formula, shared by text_analysis and
# corpus_filter (expects the docs/tok CTEs in scope).
_TEXT_FEAT_CTES = f"""hits AS (
  SELECT *,
         {", ".join(f"{_sql_stopword_hits(lang)} AS c_{lang}" for lang in STOPWORDS)}
  FROM tok
),
feat AS (
  SELECT doc_id, lang, toks, c_en, c_de, c_fr, c_es, text,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         md5(norm) AS fingerprint,
         {_LANG_CASE} AS lang_guess,
         CASE WHEN len(toks) > 0 THEN c_en / len(toks) ELSE 0.0 END AS sw_ratio,
         CASE WHEN len(toks) > 0
              THEN list_sum([length(t) for t in toks]) / len(toks) ELSE 0.0 END AS mean_len,
         CASE WHEN length(text) > 0
              THEN (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
                    / length(text)
              ELSE 0.0 END AS punct_ratio
  FROM hits
)"""

_QUALITY_SQL = """0.3 * least(n_tokens / 100.0, 1.0)
           + 0.3 * greatest(0.0, 1 - abs(mean_len - 5.0) / 5.0)
           + 0.3 * least(sw_ratio / 0.4, 1.0)
           + 0.1 * (1 - least(punct_ratio / 0.2, 1.0))"""


@register(
    "text_analysis",
    f"""
WITH
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES}
SELECT doc_id, lang, n_tokens, fingerprint, lang_guess,
       round(sw_ratio, 6) AS stopword_ratio,
       round({_QUALITY_SQL}, 6) AS quality_score
FROM feat
""",
    "Token counts, content fingerprint, stopword language-ID, heuristic "
    "quality score — one codegen-only pass over documents",
)
def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = text_ops.text_profile(docs, text_col="text", keep=("doc_id", "lang"))
    return out.select(
        "doc_id",
        "lang",
        "n_tokens",
        "fingerprint",
        "lang_guess",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# repetition_profile — Gopher-style within-doc repetition quality rules
# (duplicate n-gram / sentence fractions).  Pure HOF array math: zero
# shuffles, so the oracle is list-comprehension arithmetic per row.
# --------------------------------------------------------------------------


def _rep_gram_sql(n: int) -> str:
    gram = " || ' ' || ".join(f"toks[i+{j + 1}]" for j in range(n))
    seq = f"[{gram} for i in range(0, len(toks) - {n - 1})]"
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"1.0 - len(list_distinct({seq})) / (len(toks) - {n - 1}) "
        f"ELSE 0.0 END"
    )


@register(
    "repetition_profile",
    f"""
WITH
{_DOCS_TOK_CTE},
sent AS (
  SELECT *, list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                       x -> trim(x)), x -> x != '') AS sents
  FROM tok
)
SELECT doc_id, lang,
  round({_rep_gram_sql(2)}, 6) AS rep_2gram_frac,
  round({_rep_gram_sql(3)}, 6) AS rep_3gram_frac,
  round({_rep_gram_sql(4)}, 6) AS rep_4gram_frac,
  round(CASE WHEN len(sents) > 0
        THEN 1.0 - len(list_distinct(sents)) / len(sents) ELSE 0.0 END, 6) AS dup_sentence_frac
FROM sent
""",
    "Within-doc duplicate n-gram / sentence fractions (Gopher repetition "
    "rules) — zero-shuffle higher-order-function array math",
)
def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import repetition_profile

    docs = read_table(spark, sf_dir, "documents")
    out = repetition_profile(docs, text_col="text", keep=("doc_id", "lang"))
    return out.select(
        "doc_id",
        "lang",
        *[
            F.round(c, 6).alias(c)
            for c in (
                "rep_2gram_frac",
                "rep_3gram_frac",
                "rep_4gram_frac",
                "dup_sentence_frac",
            )
        ],
    )


# --------------------------------------------------------------------------
# corpus_stats — per-language corpus profile: counts, distinct
# fingerprints, token percentiles, mean quality.  Exact percentile /
# count-distinct here (oracle-checkable); the operator's exact=False
# flips the same aggregate to t-digest + HLL sketches for 100 TB runs.
# --------------------------------------------------------------------------


@register(
    "corpus_stats",
    f"""
WITH
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES},
q AS (
  SELECT lang, n_tokens, fingerprint, {_QUALITY_SQL} AS quality FROM feat
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT fingerprint) AS BIGINT) AS distinct_fingerprints,
       round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
       round(quantile_cont(n_tokens, 0.9), 6) AS p90_tokens,
       round(quantile_cont(n_tokens, 0.99), 6) AS p99_tokens,
       round(avg(n_tokens), 6) AS avg_tokens,
       round(avg(quality), 6) AS avg_quality
FROM q
GROUP BY lang
""",
    "Per-language corpus dashboard: doc counts, post-exact-dedup size, "
    "token percentiles, mean quality — one hash aggregate; sketch "
    "variants (t-digest/HLL) behind exact=False",
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = corpus_ops.corpus_stats(docs, exact=True)
    return out.select(
        "lang",
        "n_docs",
        "distinct_fingerprints",
        *[F.round(c, 6).alias(c) for c in ("p50_tokens", "p90_tokens", "p99_tokens")],
        F.round("avg_tokens", 6).alias("avg_tokens"),
        F.round("avg_quality", 6).alias("avg_quality"),
    )


# --------------------------------------------------------------------------
# tfidf_topk / vocab_topk — TF-IDF keyword extraction and ranked
# vocabulary building (tokenizer-training / coverage-audit inputs).
# Both reduce to explode → hash aggregates → one token join; the global
# vocabulary top-k is a distributed TakeOrderedAndProject, not a
# single-partition sort.
# --------------------------------------------------------------------------

TFIDF_K = 5
VOCAB_K = 100

_TF_CTES = """
toksx AS (
  SELECT doc_id, unnest(toks) AS token FROM tok
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toksx GROUP BY doc_id, token
),
dfq AS (
  SELECT token, count(*) AS doc_freq, sum(tf) AS total_count FROM tf GROUP BY token
)
"""


@register(
    "tfidf_topk",
    f"""
WITH
{_DOCS_TOK_CTE},
{_TF_CTES},
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfq.doc_freq,
         tf.tf * (ln((n.n_docs + 1.0) / (dfq.doc_freq + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN dfq ON tf.token = dfq.token CROSS JOIN n
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(doc_freq AS BIGINT) AS doc_freq,
       round(tfidf, 6) AS tfidf, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
  FROM scored
)
WHERE rn <= {TFIDF_K}
""",
    "Top-5 smoothed-TF-IDF terms per document — keyword extraction via "
    "explode, two hash aggregates and a token join; no Python",
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions import tfidf as tfidf_ops

    docs = read_table(spark, sf_dir, "documents")
    out = tfidf_ops.tfidf_topk(docs, k=TFIDF_K)
    return out.withColumn("tfidf", F.round("tfidf", 6))


@register(
    "vocab_topk",
    f"""
WITH
{_DOCS_TOK_CTE},
{_TF_CTES}
SELECT token, CAST(doc_freq AS BIGINT) AS doc_freq,
       CAST(total_count AS BIGINT) AS total_count, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY doc_freq DESC, total_count DESC, token) AS rn
  FROM dfq
)
WHERE rn <= {VOCAB_K}
""",
    "Top-100 vocabulary by document frequency — distributed top-k "
    "(per-partition heaps), rank attached after the k-row reduce",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions import tfidf as tfidf_ops

    docs = read_table(spark, sf_dir, "documents")
    return tfidf_ops.vocabulary(docs, top_k=VOCAB_K)


# --------------------------------------------------------------------------
# dedup_exact: fingerprint-group keeper assignment.
# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    f"""
WITH
{_DOCS_TOK_CTE},
fp AS (SELECT doc_id, md5(norm) AS fingerprint FROM docs)
SELECT doc_id, fingerprint,
       CAST(min(doc_id) OVER (PARTITION BY fingerprint) AS BIGINT) AS keep_id,
       CAST(count(*) OVER (PARTITION BY fingerprint) AS INTEGER) AS n_copies,
       doc_id <> min(doc_id) OVER (PARTITION BY fingerprint) AS is_duplicate
FROM fp
""",
    "Exact dedup on the normalized-content fingerprint (hash groupBy)",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup_ops.exact_dedup(docs).select(
        "doc_id", "fingerprint", "keep_id", "n_copies", "is_duplicate"
    )


# --------------------------------------------------------------------------
# dedup_minhash_lsh: banded MinHash candidates + exact Jaccard verify.
# --------------------------------------------------------------------------

_MH_K, _MH_BANDS, _MH_NGRAM, _MH_THRESHOLD = 12, 4, 3, 0.2
_ROWS_PER_BAND = _MH_K // _MH_BANDS

_SIG_SQL = ", ".join(
    f"coalesce(list_min([({a} * h + {b}) % {MERSENNE31} for h in sh]), {MERSENNE31}) AS s{i}"
    for i, (a, b) in enumerate(_coeffs(_MH_K))
)
_BAND_KEYS_SQL = ", ".join(
    "concat_ws(',', "
    + ", ".join(f"s{i}" for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND))
    + f") AS band{b}"
    for b in range(_MH_BANDS)
)
_BAND_UNION_SQL = " UNION ALL ".join(
    f"SELECT doc_id, sh, {b} AS band, concat_ws(',', "
    + ", ".join(f"s{i}" for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND))
    + ") AS key FROM sig"
    for b in range(_MH_BANDS)
)


# The minhash pair-generation CTE chain (sans docs/tok, so composites
# can prepend their own shared scan CTEs), used by the pairs oracle, the
# connected-components (dedup_clusters) oracle, and corpus_filter.
_MH_PAIR_TAIL = f"""{_sql_shingle_sh_cte(_MH_NGRAM)},
sig AS (SELECT doc_id, sh, {_SIG_SQL} FROM sh),
banded AS ({_BAND_UNION_SQL}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.id_a, c.id_b,
         CASE WHEN len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) > 0
              THEN len(list_intersect(x.sh, y.sh))::DOUBLE
                   / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
              ELSE 0.0 END AS jaccard
  FROM cand c JOIN sh x ON c.id_a = x.doc_id JOIN sh y ON c.id_b = y.doc_id
)"""

_MH_PAIR_CTES = f"""{_DOCS_TOK_CTE},
{_MH_PAIR_TAIL}"""

# Transitive closure of the verified pairs (recursive CTE) down to the
# per-document canonical label — shared by dedup_clusters/corpus_filter.
_CC_TAIL = f"""pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= {_MH_THRESHOLD}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS doc_id, min(dst) AS mind FROM reach GROUP BY src),
labeled AS (
  SELECT d.doc_id,
         coalesce(least(c.doc_id, c.mind), d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
)"""


@register(
    "dedup_minhash_lsh",
    f"""
WITH
{_MH_PAIR_CTES}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard
FROM verified WHERE jaccard >= {_MH_THRESHOLD}
""",
    "Near-dup pairs: word-3-gram shingles → 12-perm MinHash → 4-band LSH "
    "buckets → exact-Jaccard verification",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = dedup_ops.minhash_lsh_pairs(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    return out.withColumn("jaccard", F.round("jaccard", 6))


# --------------------------------------------------------------------------
# dedup_clusters: transitive closure of the near-dup pairs -> keep/drop.
# --------------------------------------------------------------------------


@register(
    "dedup_clusters",
    f"""
WITH RECURSIVE
{_MH_PAIR_CTES},
{_CC_TAIL}
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS INTEGER) AS cluster_size,
       doc_id <> cluster_id AS is_duplicate
FROM labeled
""",
    "Duplicate clusters: MinHash-LSH pairs -> connected components "
    "(min-label propagation) -> canonical keeper per cluster, singletons "
    "included",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup_ops.minhash_lsh_pairs(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    return dedup_ops.connected_components(pairs, nodes=docs)


# --------------------------------------------------------------------------
# corpus_filter: the composite training-data cleanse (gates + dedup).
# --------------------------------------------------------------------------

_CF_LANGS = ("en", "de", "fr", "es")
_CF_MIN_TOKENS, _CF_MAX_TOKENS, _CF_MIN_QUALITY = 20, 100_000, 0.5
_CF_LANGS_SQL = ", ".join(f"'{lang}'" for lang in _CF_LANGS)
_CF_GATES_SQL = f"""s.lang_guess IN ({_CF_LANGS_SQL})
        AND s.n_tokens BETWEEN {_CF_MIN_TOKENS} AND {_CF_MAX_TOKENS}
        AND s.q >= {_CF_MIN_QUALITY}"""


@register(
    "corpus_filter",
    f"""
WITH RECURSIVE
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES},
{_MH_PAIR_TAIL},
{_CC_TAIL},
scored AS (
  SELECT doc_id, lang_guess, n_tokens, fingerprint,
         {_QUALITY_SQL} AS q
  FROM feat
),
ex AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY fingerprint) AS keep_id
  FROM scored
)
SELECT s.doc_id, s.lang_guess, s.n_tokens,
       round(s.q, 6) AS quality_score,
       s.lang_guess IN ({_CF_LANGS_SQL}) AS pass_lang,
       s.n_tokens BETWEEN {_CF_MIN_TOKENS} AND {_CF_MAX_TOKENS} AS pass_tokens,
       s.q >= {_CF_MIN_QUALITY} AS pass_quality,
       s.doc_id <> e.keep_id AS is_exact_dup,
       s.doc_id <> l.cluster_id AS is_near_dup,
       ({_CF_GATES_SQL}
        AND s.doc_id = e.keep_id
        AND s.doc_id = l.cluster_id) AS keep
FROM scored s JOIN ex e USING (doc_id) JOIN labeled l USING (doc_id)
""",
    "Training-data cleanse: language/token/quality gates + exact-dedup "
    "keeper + near-dup cluster keeper -> keep decision with audit trail",
)
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = corpus_ops.corpus_filter(
        docs,
        langs=_CF_LANGS,
        min_tokens=_CF_MIN_TOKENS,
        max_tokens=_CF_MAX_TOKENS,
        min_quality=_CF_MIN_QUALITY,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    return out.withColumn("quality_score", F.round("quality_score", 6))


# --------------------------------------------------------------------------
# corpus_split: deterministic hash-based train/val/test assignment.
# --------------------------------------------------------------------------

_SPLIT_MOD = 1 << 30
_SPLIT_SALT = "pts-split"
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@register(
    "corpus_split",
    f"""
WITH u AS (
  SELECT doc_id,
         ({_sql_hash60(f"concat('{_SPLIT_SALT}', CAST(doc_id AS VARCHAR))")} % {_SPLIT_MOD})
           / {float(_SPLIT_MOD)} AS u
  FROM documents
)
SELECT doc_id,
       CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM u
""",
    "Deterministic, engine-portable train/val/test split by salted id "
    "hash — stable under re-ingestion, leakage-safe",
)
def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return corpus_ops.hash_split(docs, weights=_SPLIT_WEIGHTS, salt=_SPLIT_SALT).select(
        "doc_id", "split"
    )


# --------------------------------------------------------------------------
# dedup_simhash: 32-bit simhash, pigeonhole-blocked hamming pairs.
# --------------------------------------------------------------------------

_SH_BITS, _SH_MAXHAM = 48, 3
_SH_BLOCKS = _SH_MAXHAM + 1
_SH_BLOCK_BITS = _SH_BITS // _SH_BLOCKS

_SIMHASH_SQL = " + ".join(
    f"CASE WHEN list_sum([CAST(((h >> {b}) & 1) * 2 - 1 AS BIGINT) for h in hs]) > 0 "
    f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
    for b in range(_SH_BITS)
)
_SH_BLOCK_UNION = " UNION ALL ".join(
    f"SELECT doc_id, sh, {b} AS blk, (sh >> {b * _SH_BLOCK_BITS}) & {(1 << _SH_BLOCK_BITS) - 1} AS key FROM sh"
    for b in range(_SH_BLOCKS)
)


@register(
    "dedup_simhash",
    f"""
WITH
{_DOCS_TOK_CTE},
hashes AS (SELECT doc_id, [{_sql_hash60("t")} for t in toks] AS hs FROM tok),
sh AS (SELECT doc_id, {_SIMHASH_SQL} AS sh FROM hashes),
blocked AS ({_SH_BLOCK_UNION}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
  FROM blocked a JOIN blocked b
    ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= {_SH_MAXHAM}
""",
    "SimHash near-dup pairs: 48-bit token-majority sketch, hamming ≤ 3 via "
    "pigeonhole block joins (no cross product)",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup_ops.simhash_pairs(docs, bits=_SH_BITS, max_hamming=_SH_MAXHAM)


# --------------------------------------------------------------------------
# dedup_ngram_jaccard: exact Jaccard within (lang) blocks.
# --------------------------------------------------------------------------

_NJ_THRESHOLD = 0.2


@register(
    "dedup_ngram_jaccard",
    f"""
WITH
{_DOCS_TOK_CTE},
{_sql_shingle_sh_cte(3)},
ng AS (
  SELECT s.doc_id, t.lang, s.sh AS g
  FROM sh s JOIN tok t ON s.doc_id = t.doc_id
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CASE WHEN len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) > 0
              THEN len(list_intersect(a.g, b.g))::DOUBLE
                   / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
              ELSE 0.0 END AS jaccard
  FROM ng a JOIN ng b ON a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM pairs WHERE jaccard >= {_NJ_THRESHOLD}
""",
    "Exact word-3-gram Jaccard pairs within language blocks",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = dedup_ops.ngram_jaccard_pairs(docs, threshold=_NJ_THRESHOLD, block_cols=("lang",))
    return out.withColumn("jaccard", F.round("jaccard", 6))


# --------------------------------------------------------------------------
# similarity_topk (brute-force exact) and similarity_topk_lsh (SRP-bucketed).
# --------------------------------------------------------------------------

_TOPK, _N_QUERIES, _N_PLANES = 5, 10, 4

_EMB_CTE = """
c AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
)
"""
_DOT = "list_sum([qv[i+1] * v[i+1] for i in range(0, len(v))])"
_NORM_Q = "sqrt(list_sum([x * x for x in qv]))"
_NORM_V = "sqrt(list_sum([x * x for x in v]))"


@register(
    "similarity_topk",
    f"""
WITH
{_EMB_CTE},
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_N_QUERIES}),
sims AS (
  SELECT q.query_id, c.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_TOPK}
""",
    "Exact brute-force cosine top-5 for the first 10 query vectors "
    "(broadcast queries, zip_with/aggregate dot products, no Python)",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    out = sim_ops.cosine_topk(emb, queries, k=_TOPK)
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "similarity_topk_lsh",
    f"""
WITH
{_EMB_CTE},
planes AS (
  SELECT v AS pv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_PLANES})
),
bucketed AS (
  SELECT c.vec_id, c.v,
         CAST(sum(CASE WHEN list_sum([pv[i+1] * v[i+1] for i in range(0, len(v))]) >= 0
                       THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
  FROM c CROSS JOIN planes
  GROUP BY c.vec_id, c.v
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed WHERE vec_id < {_N_QUERIES}),
sims AS (
  SELECT q.query_id, b.vec_id,
         round(list_sum([qv[i+1] * cv[i+1] for i in range(0, len(cv))])
               / ({_NORM_Q} * sqrt(list_sum([x * x for x in cv]))), 6) AS cosine_sim
  FROM (SELECT vec_id, v AS cv, bucket FROM bucketed) b
  JOIN q ON b.bucket = q.bucket
  WHERE b.vec_id <> q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_TOPK}
""",
    "Approximate cosine top-5 via signed-projection LSH buckets (planes = "
    "4 lowest-id corpus vectors; per-query scan limited to its bucket)",
)
def q_similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    out = sim_ops.srp_lsh_topk(emb, queries, k=_TOPK, num_planes=_N_PLANES)
    return out.withColumn("rank", F.col("rank").cast("int"))


# --------------------------------------------------------------------------
# similarity_topk_ivf: inverted-file coarse quantizer — the other canonical
# ANN layout next to SRP-LSH.  Corpus shuffles once on cell id; each query
# scans only its nprobe nearest cells.
# --------------------------------------------------------------------------

_N_CELLS, _NPROBE = 8, 2


@register(
    "similarity_topk_ivf",
    f"""
WITH
{_EMB_CTE},
cent AS (
  SELECT v AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_CELLS})
),
cell_sims AS (
  SELECT c.vec_id, c.v, cent.j,
         list_sum([cv[i+1] * v[i+1] for i in range(0, len(v))])
           / (sqrt(list_sum([x * x for x in cv])) * {_NORM_V}) AS csim
  FROM c CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, v AS qv, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims WHERE vec_id < {_N_QUERIES})
  WHERE rn <= {_NPROBE}
),
sims AS (
  SELECT p.query_id, a.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM (SELECT vec_id, v, cell FROM assigned) a
  JOIN probes p ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_TOPK}
""",
    "Approximate cosine top-5 via an IVF coarse quantizer (8 cells around "
    "the lowest-id corpus vectors, argmax-cosine assignment, nprobe=2)",
)
def q_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    # lowest_id centroids: the deterministic variant any engine can
    # reproduce exactly — this query is the differential-oracle gate for
    # the IVF plan shape (cell assignment, probing, ranking).
    out = sim_ops.ivf_topk(
        emb, queries, k=_TOPK, n_cells=_N_CELLS, nprobe=_NPROBE, centroid_method="lowest_id"
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# k-means training is deterministic and per-iteration rounded
# (kmeans_centroids), so the oracle replays it as UNROLLED Lloyd SQL:
# sample = 256 lowest-id normalized vectors, init = first 8, three
# iterations of argmax-dot assignment (ties to lowest cell) + mean +
# renormalize + round(6).  The per-iteration rounding is what makes this
# cross-engine exact: float-sum order differences (numpy pairwise vs
# SQL sequential) land below the rounding grid and reset every
# iteration instead of compounding.

_KM_SAMPLE, _KM_ITERS, _KM_RD = 256, 3, 6


def _km_iter_sql(i: int) -> str:
    prev = f"cent{i - 1}"
    return f"""
asg{i} AS (
  SELECT rid, sv, j FROM (
    SELECT s.rid, s.sv, ce.j,
           row_number() OVER (PARTITION BY s.rid ORDER BY
             list_sum([ce.cv[kk+1] * s.sv[kk+1] for kk in range(0, len(s.sv))]) DESC, ce.j) AS rn
    FROM samp s CROSS JOIN {prev} ce
  ) WHERE rn = 1
),
dm{i} AS (
  SELECT j, dim, avg(val) AS mv
  FROM (SELECT j, unnest(sv) AS val, generate_subscripts(sv, 1) AS dim FROM asg{i})
  GROUP BY j, dim
),
cm{i} AS (SELECT j, list(mv ORDER BY dim) AS mvec FROM dm{i} GROUP BY j),
cent{i} AS (
  SELECT ce.j,
         CASE WHEN cm.j IS NULL OR sqrt(list_sum([x * x for x in cm.mvec])) = 0 THEN ce.cv
              ELSE [round(x / sqrt(list_sum([y * y for y in cm.mvec])), {_KM_RD}) for x in cm.mvec] END AS cv
  FROM {prev} ce LEFT JOIN cm{i} cm ON cm.j = ce.j
)"""


@register(
    "similarity_topk_ivf_kmeans",
    f"""
WITH
{_EMB_CTE},
samp0 AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) AS rid
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_KM_SAMPLE})
),
samp AS (
  SELECT rid, CASE WHEN nrm = 0 THEN v ELSE [x / nrm for x in v] END AS sv
  FROM (SELECT rid, v, sqrt(list_sum([x * x for x in v])) AS nrm FROM samp0)
),
cent0 AS (
  SELECT CAST(rid - 1 AS INTEGER) AS j, [round(x, {_KM_RD}) for x in sv] AS cv
  FROM samp WHERE rid <= {_N_CELLS}
),
{','.join(_km_iter_sql(i) for i in range(1, _KM_ITERS + 1))},
cent AS (SELECT cv, j FROM cent{_KM_ITERS}),
cell_sims AS (
  SELECT c.vec_id, c.v, cent.j,
         list_sum([cv[i+1] * v[i+1] for i in range(0, len(v))])
           / (sqrt(list_sum([x * x for x in cv])) * {_NORM_V}) AS csim
  FROM c CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, v AS qv, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims WHERE vec_id < {_N_QUERIES})
  WHERE rn <= {_NPROBE}
),
sims AS (
  SELECT p.query_id, a.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM (SELECT vec_id, v, cell FROM assigned) a
  JOIN probes p ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_TOPK}
""",
    "IVF top-5 with sampled spherical k-means centroids (the production "
    "IVF recipe): deterministic per-iteration-rounded training, replayed "
    "by the oracle as unrolled Lloyd SQL",
)
def q_similarity_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    out = sim_ops.ivf_topk(
        emb, queries, k=_TOPK, n_cells=_N_CELLS, nprobe=_NPROBE, centroid_method="kmeans"
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# --------------------------------------------------------------------------
# multimodal_metadata: binary payload plumbing via mapInPandas; the fake
# decoder is deterministic, so it has an exact SQL oracle even though the
# engine path exercises the real Arrow-batched UDF machinery.
# --------------------------------------------------------------------------


@register(
    "multimodal_metadata",
    """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         text,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT media_id, media_type, n_bytes,
       CAST(CASE WHEN media_type IN ('image', 'video') THEN n_bytes % 640 + 16 ELSE 0 END AS INTEGER) AS width,
       CAST(CASE WHEN media_type IN ('image', 'video') THEN n_bytes % 480 + 16 ELSE 0 END AS INTEGER) AS height,
       CAST(CASE WHEN media_type <> 'image' THEN n_bytes * 40 ELSE 0 END AS BIGINT) AS duration_ms,
       md5(text) AS checksum
FROM media
""",
    "Opaque-binary media plumbing: payload synthesis + Arrow-batched "
    "mapInPandas metadata extraction (decode kernels stubbed — no codec "
    "libs in the container; schema/batch plumbing is real)",
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = mm_ops.synthesize_media(docs)
    return mm_ops.extract_media_metadata(media)


# ==========================================================================
# B-primitive queries: the underlying engine machinery exposed directly,
# so every SURVEY §2.B line has its own differential check.
# ==========================================================================

from polars_trading_spark.operators.asof import asof_join  # noqa: E402
from polars_trading_spark.operators.bars import BAR_AMOUNT, BAR_ID, bar_groups  # noqa: E402
from polars_trading_spark.operators.ewm import ewm_std  # noqa: E402


@register(
    "asof_join_backward",
    f"""
WITH trades AS ({TRADES_CTE}),
probes AS (
  SELECT symbol, ts_event, seq, ts_event - INTERVAL 90 MINUTES AS probe_key FROM trades
)
SELECT p.symbol, p.ts_event, r.price AS matched_price, r.ts_event AS matched_ts
FROM probes p
ASOF LEFT JOIN (SELECT symbol, ts_event, price FROM trades) r
  ON p.symbol = r.symbol AND p.probe_key >= r.ts_event
""",
    "Keyed backward as-of join (B5): last trade at-or-before ts-90m per "
    "symbol, via the union-marker running-window form",
)
def q_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = trades_from_events(spark, sf_dir)
    probes = t.select(
        "symbol", "ts_event", (F.col("ts_event") - F.expr("INTERVAL 90 MINUTES")).alias("probe_key")
    )
    right = t.select("symbol", F.col("ts_event").alias("r_ts"), "price")
    out = asof_join(
        probes, right, left_on="probe_key", right_on="r_ts", by="symbol", strategy="backward"
    )
    return out.select(
        "symbol",
        "ts_event",
        F.col("price").alias("matched_price"),
        F.col("r_ts").alias("matched_ts"),
    )


@register(
    "ewm_std_native",
    f"""
WITH trades AS ({TRADES_CTE}),
rets AS (
  SELECT symbol, ts_event, seq, price,
         price / lag(price) OVER (PARTITION BY symbol ORDER BY ts_event, seq) - 1 AS ret
  FROM trades
),
{EWM_STD_SQL.replace("FROM rets WHERE ret IS NOT NULL", "FROM rets WHERE ret IS NOT NULL").strip()}
SELECT symbol, ts_event, round(trgt, 6) AS ewm_std
FROM vol
""",
    "Closed-form native EWM std (B13) over tick-to-tick returns — stays "
    "in codegen, no Python stage (valid for bounded per-group lengths)",
)
def q_ewm_std_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = trades_from_events(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("ts_event", SEQ_COL)
    rets = t.withColumn("ret", F.col("price") / F.lag("price").over(w) - 1)
    out = ewm_std(
        rets, "ret", DAILY_VOL_SPAN, by=["symbol"], order_by=["ts_event", SEQ_COL],
        output_col="__e", method="native",
    )
    return out.select(
        "symbol",
        "ts_event",
        F.round(
            F.when(F.col("ret").isNotNull(), F.coalesce(F.col("__e"), F.lit(0.0))), 6
        ).alias("ewm_std"),
    )


@register(
    "bar_groups_split",
    f"""
WITH trades AS ({TRADES_CTE}),
cum AS (
  SELECT *, CAST(ts_event AS DATE) AS d,
         CAST(sum(size) OVER (PARTITION BY symbol, CAST(ts_event AS DATE)
                              ORDER BY ts_event, seq ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
  FROM trades
),
spans AS (SELECT *, cs - size AS prev FROM cum),
pieces AS (
  SELECT *, unnest(generate_series(prev // {VOLUME_BAR_SIZE},
                                   CASE WHEN cs % {VOLUME_BAR_SIZE} = 0 THEN cs // {VOLUME_BAR_SIZE} - 1
                                        ELSE cs // {VOLUME_BAR_SIZE} END)) AS bar
  FROM spans
)
SELECT seq, symbol, CAST(bar AS INTEGER) AS bar_group_id,
       CAST(least(cs, (bar + 1) * {VOLUME_BAR_SIZE}) - greatest(prev, bar * {VOLUME_BAR_SIZE}) AS BIGINT)
         AS bar_group_amount
FROM pieces
""",
    "The bar_groups kernel itself (B14 split mode): per-trade piece "
    "assignment as pure window arithmetic, matching src/bars.rs semantics",
)
def q_bar_groups_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = trades_from_events(spark, sf_dir).withColumn("__d", F.to_date("ts_event"))
    out = bar_groups(
        t, "size", VOLUME_BAR_SIZE, allow_splits=True,
        partition_by=["symbol", "__d"], order_by=["ts_event", SEQ_COL],
    )
    return out.select(
        F.col(SEQ_COL).alias("seq"),
        "symbol",
        F.col(BAR_ID).alias("bar_group_id"),
        F.col(BAR_AMOUNT).cast("long").alias("bar_group_amount"),
    )


_COMPOUND_US = (90 * 60) * 1_000_000  # "1h30m"


@register(
    "time_bars_compound_duration",
    f"""
WITH trades AS ({TRADES_CTE}),
bucketed AS (
  SELECT *, make_timestamp((epoch_us(ts_event) // {_COMPOUND_US}) * {_COMPOUND_US}) AS bucket
  FROM trades
)
SELECT bucket AS ts_event_bucket, symbol,
    {_OHLCV_ORACLE}
FROM bucketed
GROUP BY bucket, symbol
""",
    "Compound Polars-duration parsing ('1h30m', B16): arbitrary-width "
    "epoch-aligned buckets beyond date_trunc's vocabulary",
)
def q_time_bars_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _trades_config():
        out = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size="1h30m")
    return _round_vwap(out.withColumnRenamed("ts_event", "ts_event_bucket"))


@register(
    "multimodal_frame_sample",
    """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) * 40 AS duration_ms
  FROM documents
)
SELECT media_id,
       CAST(unnest(generate_series(0, greatest(duration_ms // 1000 - 1, 0))) AS BIGINT) AS frame_idx,
       CAST(unnest(generate_series(0, greatest(duration_ms // 1000 - 1, 0))) * 1000 AS BIGINT) AS offset_ms
FROM media WHERE media_type = 'video'
""",
    "Video frame-sampling plumbing: per-video frame rows at 1s spacing "
    "(explode over native sequence; the frame decode itself is the "
    "stubbed mapInPandas stage downstream)",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = mm_ops.synthesize_media(docs)
    out = mm_ops.sample_frames(media, every_ms=1000)
    return out.select(
        "media_id",
        F.col("frame_idx").cast("long"),
        F.col("offset_ms").cast("long"),
    )


# --------------------------------------------------------------------------
# dedup_embedding_cosine: the 5th dedup modality — near-dups in embedding
# space, SRP-bucketed candidates + exact cosine verify.
# --------------------------------------------------------------------------

_EC_THRESHOLD, _EC_PLANES = 0.42, 6


@register(
    "dedup_embedding_cosine",
    f"""
WITH
{_EMB_CTE},
planes AS (
  SELECT v AS pv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_EC_PLANES})
),
bucketed AS (
  SELECT c.vec_id, c.v,
         CAST(sum(CASE WHEN list_sum([pv[i+1] * v[i+1] for i in range(0, len(v))]) >= 0
                       THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
  FROM c CROSS JOIN planes
  GROUP BY c.vec_id, c.v
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_sum([a.v[i+1] * b.v[i+1] for i in range(0, len(a.v))])
               / (sqrt(list_sum([x * x for x in a.v])) * sqrt(list_sum([x * x for x in b.v]))), 6)
           AS cosine_sim
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= {_EC_THRESHOLD}
""",
    "Embedding-cosine near-dup pairs: SRP bucket candidates (6 planes), "
    "exact cosine verification at threshold 0.42",
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return sim_ops.embedding_cosine_pairs(
        emb, threshold=_EC_THRESHOLD, num_planes=_EC_PLANES
    )


# --------------------------------------------------------------------------
# C-ext. Range-based volatility estimators over bars (operators/volatility.py)
# --------------------------------------------------------------------------

_VOL_WINDOW = 20
_VOL_K = 0.34 / (1.34 + (_VOL_WINDOW + 1) / (_VOL_WINDOW - 1))

# The shared 15-minute bar frame both feature oracles roll over.  vwap is
# deliberately NOT rounded here (the features consume it numerically);
# first/last use the deterministic (ts_event, seq) order key.
_FEATURE_BARS_CTE = f"""
trades AS ({TRADES_CTE}),
bucketed AS (
  SELECT *, make_timestamp((epoch_us(ts_event) // {_TIME_BUCKET_US}) * {_TIME_BUCKET_US}) AS bucket
  FROM trades
),
bars AS (
  SELECT bucket AS ts, symbol,
    first(price ORDER BY ts_event, seq) AS open,
    max(price) AS high,
    min(price) AS low,
    last(price ORDER BY ts_event, seq) AS close,
    CAST(sum(size) AS BIGINT) AS volume,
    sum(size * price) / sum(size) AS vwap
  FROM bucketed
  GROUP BY bucket, symbol
)
"""


@register(
    "bar_volatility",
    f"""
WITH
{_FEATURE_BARS_CTE},
terms AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER w) AS r_cc,
    ln(open / lag(close) OVER w) AS r_on,
    ln(close / open) AS r_co,
    pow(ln(high / low), 2) AS hl2,
    ln(high / close) * ln(high / open) + ln(low / close) * ln(low / open) AS rs
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
rolled AS (
  SELECT symbol, ts,
    count(r_cc) OVER r AS n_cc,
    count(*) OVER r AS n_bar,
    var_samp(r_cc) OVER r AS v_cc,
    var_samp(r_on) OVER r AS v_on,
    var_samp(r_co) OVER r AS v_co,
    avg(hl2) OVER r AS m_hl2,
    avg(0.5 * hl2 - (2 * ln(2) - 1) * r_co * r_co) OVER r AS m_gk,
    avg(rs) OVER r AS m_rs
  FROM terms
  WINDOW r AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN {_VOL_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts AS ts_event,
  round(CASE WHEN n_cc = {_VOL_WINDOW} THEN sqrt(v_cc) END, 6) AS vol_cc,
  round(CASE WHEN n_bar = {_VOL_WINDOW} THEN sqrt(m_hl2 / (4 * ln(2))) END, 6) AS vol_parkinson,
  round(CASE WHEN n_bar = {_VOL_WINDOW} THEN sqrt(greatest(m_gk, 0)) END, 6) AS vol_gk,
  round(CASE WHEN n_bar = {_VOL_WINDOW} THEN sqrt(greatest(m_rs, 0)) END, 6) AS vol_rs,
  round(CASE WHEN n_cc = {_VOL_WINDOW}
        THEN sqrt(greatest(v_on + {_VOL_K!r} * v_co + {1.0 - _VOL_K!r} * m_rs, 0)) END, 6) AS vol_yz
FROM rolled
""",
    "Rolling Parkinson/Garman-Klass/Rogers-Satchell/Yang-Zhang/close-close "
    "volatility over 15m bars, 20-bar window (AFML range estimators)",
)
def q_bar_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.volatility import bar_volatility

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = bar_volatility(bars, window=_VOL_WINDOW, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        *[F.round(c, 6).alias(c) for c in ("vol_cc", "vol_parkinson", "vol_gk", "vol_rs", "vol_yz")],
    )


# --------------------------------------------------------------------------
# C-ext. Corwin-Schultz spread + Becker-Parkinson volatility
# (operators/microstructure.py::corwin_schultz, AFML 19.4)
# --------------------------------------------------------------------------

_CS_WINDOW = 20
_CS_DEN = 3.0 - 2.0 * (2.0**0.5)
_CS_C1 = 2.0**0.5 - 1.0
_CS_K2 = (8.0 / 3.141592653589793) ** 0.5
_CS_C2 = 2.0**-0.5 - 1.0


@register(
    "corwin_schultz",
    f"""
WITH
{_FEATURE_BARS_CTE},
terms AS (
  SELECT symbol, ts,
    pow(ln(high / low), 2) + lag(pow(ln(high / low), 2)) OVER w AS tb,
    pow(ln(greatest(high, lag(high) OVER w) / least(low, lag(low) OVER w)), 2) AS gm
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
rolled AS (
  SELECT symbol, ts, gm,
    count(tb) OVER r AS n_tb,
    avg(tb) OVER r AS beta
  FROM terms
  WINDOW r AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN {_CS_WINDOW - 1} PRECEDING AND CURRENT ROW)
),
calc AS (
  SELECT symbol, ts,
    CASE WHEN n_tb = {_CS_WINDOW} AND gm IS NOT NULL THEN
      greatest((({_CS_C1!r} * sqrt(beta)) / {_CS_DEN!r}) - sqrt(gm / {_CS_DEN!r}), 0.0)
    END AS a,
    CASE WHEN n_tb = {_CS_WINDOW} AND gm IS NOT NULL THEN
      greatest((({_CS_C2!r} * sqrt(beta)) / {_CS_K2 * _CS_DEN!r})
               + sqrt(gm / {_CS_K2 * _CS_K2 * _CS_DEN!r}), 0.0)
    END AS sg
  FROM rolled
)
SELECT symbol, ts AS ts_event,
  round((2.0 * (exp(a) - 1.0)) / (1.0 + exp(a)), 6) AS cs_spread,
  round(sg, 6) AS bp_sigma
FROM calc
""",
    f"Corwin-Schultz bid-ask spread + Becker-Parkinson volatility from "
    f"15m-bar highs/lows, {_CS_WINDOW}-bar beta window (AFML 19.4)",
)
def q_corwin_schultz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.microstructure import corwin_schultz

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = corwin_schultz(bars, window=_CS_WINDOW, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        F.round("cs_spread", 6).alias("cs_spread"),
        F.round("bp_sigma", 6).alias("bp_sigma"),
    )


# --------------------------------------------------------------------------
# C-ext. Chu-Stinchcombe-White explosiveness test
# (operators/structural_breaks.py::csw_explosiveness, AFML 17.3.2)
# --------------------------------------------------------------------------

_CSW_MAX_LAG = 20


def _csw_oracle(max_lag: int) -> str:
    lag_cols = ",\n    ".join(f"lag(y, {k}) OVER w AS yl{k}" for k in range(1, max_lag + 1))
    stat_cols = ",\n    ".join(
        f"CASE WHEN s2 > 0 THEN (y - yl{k}) / sqrt(s2 * {float(k)!r}) END AS s{k}"
        for k in range(1, max_lag + 1)
    )
    sup = ", ".join(f"s{k}" for k in range(1, max_lag + 1))
    win = ", ".join(
        f"CASE WHEN s{k} = sup THEN {k} END" for k in range(1, max_lag + 1)
    )
    return f"""
WITH trades AS ({TRADES_CTE}),
t AS (
  SELECT symbol, ts_event, seq, ln(price) AS y FROM trades
),
b AS (
  SELECT *, y - lag(y) OVER w AS dy
  FROM t
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
),
c AS (
  SELECT symbol, ts_event, seq, y,
    avg(dy * dy) OVER (PARTITION BY symbol ORDER BY ts_event, seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2,
    {lag_cols}
  FROM b
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
),
d AS (
  SELECT symbol, ts_event,
    {stat_cols}
  FROM c
),
e AS (
  SELECT *, greatest({sup}) AS sup FROM d
),
f AS (
  SELECT symbol, ts_event, sup, coalesce({win}) AS win FROM e
)
SELECT symbol, ts_event,
  round(sup, 6) AS csw_stat,
  CAST(win AS INTEGER) AS csw_lag,
  CASE WHEN sup IS NOT NULL THEN round(sqrt(4.6 + ln(CAST(win AS DOUBLE))), 6) END AS csw_crit
FROM f
"""


@register(
    "csw_explosiveness",
    _csw_oracle(_CSW_MAX_LAG),
    f"Chu-Stinchcombe-White one-sided explosiveness sup-statistic over a "
    f"{_CSW_MAX_LAG}-lag lookback with expanding variance (AFML 17.3.2)",
)
def q_csw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.structural_breaks import csw_explosiveness

    with _trades_config():
        out = csw_explosiveness(trades_from_events(spark, sf_dir), max_lag=_CSW_MAX_LAG)
    return out.select(
        "symbol",
        "ts_event",
        F.round("csw_stat", 6).alias("csw_stat"),
        "csw_lag",
        F.round("csw_crit", 6).alias("csw_crit"),
    )


# --------------------------------------------------------------------------
# C-ext. Microstructure features (operators/microstructure.py)
# --------------------------------------------------------------------------


@register(
    "microstructure",
    f"""
WITH
{_FEATURE_BARS_CTE},
terms AS (
  SELECT symbol, ts, volume, vwap,
    close - lag(close) OVER w AS dp,
    ln(close / lag(close) OVER w) AS ret
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
t2 AS (
  SELECT *,
    lag(dp) OVER w AS dp_prev,
    last_value(CASE WHEN dp > 0 THEN 1.0 WHEN dp < 0 THEN -1.0 END IGNORE NULLS)
      OVER (PARTITION BY symbol ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tick
  FROM terms
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
t3 AS (
  SELECT symbol, ts, dp, volume,
    CASE WHEN dp IS NOT NULL AND dp_prev IS NOT NULL THEN dp_prev END AS cx,
    CASE WHEN dp IS NOT NULL AND dp_prev IS NOT NULL THEN dp END AS cy,
    CASE WHEN dp IS NOT NULL AND tick IS NOT NULL THEN tick * volume END AS sv,
    CASE WHEN dp IS NOT NULL AND tick IS NOT NULL THEN dp END AS ly,
    CASE WHEN ret IS NOT NULL AND tick IS NOT NULL AND volume * vwap >= 0
         THEN tick * sqrt(volume * vwap) END AS hx,
    CASE WHEN ret IS NOT NULL AND tick IS NOT NULL AND volume * vwap >= 0
         THEN ret END AS hy,
    CASE WHEN ret IS NOT NULL AND volume * vwap > 0 THEN abs(ret) / (volume * vwap) END AS ami
  FROM t2
),
rolled AS (
  SELECT symbol, ts,
    count(cx) OVER r AS n_cov,
    sum(cx) OVER r AS s_cx, sum(cy) OVER r AS s_cy,
    sum(cx * cy) OVER r AS s_cxy,
    count(sv) OVER r AS n_lam,
    sum(sv) OVER r AS s_x, sum(ly) OVER r AS s_y,
    sum(sv * ly) OVER r AS s_xy, sum(sv * sv) OVER r AS s_xx,
    count(hx) OVER r AS n_has,
    sum(hx) OVER r AS h_x, sum(hy) OVER r AS h_y,
    sum(hx * hy) OVER r AS h_xy, sum(hx * hx) OVER r AS h_xx,
    count(ami) OVER r AS n_ami,
    avg(ami) OVER r AS m_ami
  FROM t3
  WINDOW r AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN {_VOL_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts AS ts_event,
  round(CASE WHEN n_cov = {_VOL_WINDOW}
        THEN 2 * sqrt(greatest(-((s_cxy - s_cx * s_cy / n_cov) / (n_cov - 1)), 0)) END, 6)
    AS roll_measure,
  round(CASE WHEN n_lam = {_VOL_WINDOW} AND n_lam * s_xx - s_x * s_x <> 0
        THEN 1e6 * (n_lam * s_xy - s_x * s_y) / (n_lam * s_xx - s_x * s_x) END, 6)
    AS kyle_lambda,
  round(CASE WHEN n_has = {_VOL_WINDOW} AND n_has * h_xx - h_x * h_x <> 0
        THEN 1e3 * (n_has * h_xy - h_x * h_y) / (n_has * h_xx - h_x * h_x) END, 6)
    AS hasbrouck_lambda,
  round(CASE WHEN n_ami = {_VOL_WINDOW} THEN 1e6 * m_ami END, 6) AS amihud
FROM rolled
""",
    "Rolling Roll measure, Kyle's lambda (x1e6), Hasbrouck's lambda (x1e3, "
    "tick-signed sqrt dollar volume) and Amihud illiquidity over 15m bars, "
    "20-bar window (AFML ch.19)",
)
def q_microstructure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.microstructure import microstructure_features

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = microstructure_features(bars, window=_VOL_WINDOW, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        F.round("roll_measure", 6).alias("roll_measure"),
        F.round(F.col("kyle_lambda") * 1e6, 6).alias("kyle_lambda"),
        F.round(F.col("hasbrouck_lambda") * 1e3, 6).alias("hasbrouck_lambda"),
        F.round("amihud", 6).alias("amihud"),
    )


# --------------------------------------------------------------------------
# C-ext. Trend-scanning labels (operators/trend_scan.py)
# --------------------------------------------------------------------------

_TS_MIN_SPAN, _TS_MAX_SPAN = 5, 20


def _trend_scan_oracle(min_span: int, max_span: int) -> str:
    """Generate the DuckDB oracle with the SAME left-associated expression
    trees the Spark kernel's row-wise cumsums evaluate, so every double
    is bitwise equal and the raw argmax-|t| key cannot diverge between
    engines."""
    lead_cols = ",\n    ".join(
        [f"lead(price, {k}) OVER w AS p{k}" for k in range(1, max_span)]
        + [f"lead(ts_event, {l - 1}) OVER w AS e{l}" for l in range(min_span, max_span + 1)]
    )
    sums, stats, tvals, unions = [], [], [], []
    sy, syy, sxy = "price", "(price * price)", "0.0"
    for l in range(2, max_span + 1):
        pk = f"p{l - 1}"
        sy = f"({sy} + {pk})"
        syy = f"({syy} + ({pk} * {pk}))"
        sxy = f"({sxy} + ({float(l - 1)!r} * {pk}))"
        if l < min_span:
            continue
        n, sx = float(l), l * (l - 1) / 2.0
        sxx = (l - 1) * l * (2 * l - 1) / 6.0
        sums.append(f"{sy} AS sy{l}, {syy} AS syy{l}, {sxy} AS sxy{l}")
        stats.append(
            f"(({n!r} * sxy{l}) - ({sx!r} * sy{l})) / {n * sxx - sx * sx!r} AS slope{l}"
        )
        stats.append(f"p{l - 1} IS NOT NULL AS valid{l}")
        tvals.append(
            f"greatest((syy{l} - (((sy{l} - (slope{l} * {sx!r})) / {n!r}) * sy{l}))"
            f" - (slope{l} * sxy{l}), 0.0)"
            f" / {n - 2.0!r} / {sxx - sx * sx / n!r} AS se2_{l}"
        )
        unions.append(
            f"SELECT symbol, ts_event, e{l} AS t1, {l} AS span,"
            f" slope{l} / sqrt(se2_{l}) AS tval"
            f" FROM s3 WHERE valid{l} AND se2_{l} > 0"
        )
    nl = ",\n    "
    return f"""
WITH trades AS ({TRADES_CTE}),
j AS (
  SELECT symbol, ts_event, price,
    {lead_cols}
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event)
),
s1 AS (
  SELECT *,
    {nl.join(sums)}
  FROM j
),
s2 AS (
  SELECT *,
    {nl.join(stats)}
  FROM s1
),
s3 AS (
  SELECT *,
    {nl.join(tvals)}
  FROM s2
),
cand AS (
  {' UNION ALL '.join(unions)}
),
winner AS (
  SELECT symbol, ts_event, t1, span, tval
  FROM cand
  QUALIFY row_number() OVER (PARTITION BY symbol, ts_event
                             ORDER BY abs(tval) DESC, span ASC) = 1
)
SELECT t.symbol, t.ts_event, w.t1, CAST(w.span AS INTEGER) AS span, w.tval,
  CASE WHEN w.tval > 0 THEN 1.0 WHEN w.tval < 0 THEN -1.0
       WHEN w.tval = 0 THEN 0.0 END AS label
FROM trades t
LEFT JOIN winner w ON t.symbol = w.symbol AND t.ts_event = w.ts_event
"""


@register(
    "trend_scan",
    _trend_scan_oracle(_TS_MIN_SPAN, _TS_MAX_SPAN),
    "Trend-scanning labels: argmax-|t| forward OLS trend over spans "
    f"[{_TS_MIN_SPAN},{_TS_MAX_SPAN}] (AFML ch.5)",
)
def q_trend_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.trend_scan import trend_scanning_labels

    with _trades_config():
        out = trend_scanning_labels(
            trades_from_events(spark, sf_dir),
            min_span=_TS_MIN_SPAN,
            max_span=_TS_MAX_SPAN,
        )
    return out


# --------------------------------------------------------------------------
# C-ext. Purged K-fold CV assignment (operators/cv.py)
# --------------------------------------------------------------------------

_CV_FOLDS = 5
_CV_EMBARGO = "30m"


@register(
    "purged_kfold",
    f"""
WITH trades AS ({TRADES_CTE}),
offs AS (
  SELECT symbol, ts_event, ts_event + INTERVAL 4 HOURS AS off FROM trades
),
barrier_events AS (
  SELECT o.symbol, o.ts_event, b.vertical_barrier
  FROM offs o
  ASOF LEFT JOIN (SELECT symbol, ts_event AS vertical_barrier FROM trades) b
    ON o.symbol = b.symbol AND o.off <= b.vertical_barrier
),
ev AS (
  SELECT symbol, ts_event AS t0,
    coalesce(vertical_barrier,
             max(greatest(ts_event, coalesce(vertical_barrier, ts_event)))
               OVER (PARTITION BY symbol)) AS t1,
    ntile({_CV_FOLDS}) OVER (PARTITION BY symbol ORDER BY ts_event) AS fold
  FROM barrier_events
),
hulls AS (
  SELECT symbol, fold, min(t0) AS test_start, max(t1) AS test_end
  FROM ev GROUP BY symbol, fold
),
j AS (
  SELECT e.symbol, e.t0, e.t1, e.fold AS event_fold,
         h.fold, h.test_start, h.test_end,
         h.test_end + INTERVAL 30 MINUTES AS embargo_end
  FROM ev e JOIN hulls h ON e.symbol = h.symbol
)
SELECT symbol, t0 AS ts_event, CAST(fold AS INTEGER) AS fold,
  CASE WHEN event_fold = fold THEN 'test'
       WHEN t0 <= test_end AND test_start <= t1 THEN 'purged'
       WHEN t0 > test_end AND t0 <= embargo_end THEN 'embargo'
       ELSE 'train' END AS role
FROM j
""",
    f"Purged {_CV_FOLDS}-fold CV assignment with {_CV_EMBARGO} embargo over "
    "4h-barrier events (AFML ch.7 PurgedKFold)",
)
def q_purged_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cv import purged_kfold

    with _trades_config():
        events = dyn_ops.get_vertical_barrier_by_timedelta(
            trades_from_events(spark, sf_dir), BARRIER_OFFSET
        )
        out = purged_kfold(events, n_folds=_CV_FOLDS, embargo=_CV_EMBARGO)
    return out


# --------------------------------------------------------------------------
# C-ext. Combinatorial purged CV (operators/cv.py::cpcv_assign, AFML
# ch.12) — every C(n,2) pair of groups forms one split's test set;
# purge/embargo run against EACH test hull separately.
# --------------------------------------------------------------------------

_CPCV_GROUPS = 4
_CPCV_EMBARGO = "30m"


@register(
    "cpcv_assign",
    f"""
WITH trades AS ({TRADES_CTE}),
offs AS (
  SELECT symbol, ts_event, ts_event + INTERVAL 4 HOURS AS off FROM trades
),
barrier_events AS (
  SELECT o.symbol, o.ts_event, b.vertical_barrier
  FROM offs o
  ASOF LEFT JOIN (SELECT symbol, ts_event AS vertical_barrier FROM trades) b
    ON o.symbol = b.symbol AND o.off <= b.vertical_barrier
),
ev AS (
  SELECT symbol, ts_event AS t0,
    coalesce(vertical_barrier,
             max(greatest(ts_event, coalesce(vertical_barrier, ts_event)))
               OVER (PARTITION BY symbol)) AS t1,
    ntile({_CPCV_GROUPS}) OVER (PARTITION BY symbol ORDER BY ts_event) AS grp
  FROM barrier_events
),
combos AS (
  SELECT CAST(row_number() OVER (ORDER BY a, b) AS INTEGER) AS split_id, a, b
  FROM (SELECT g1.g AS a, g2.g AS b
        FROM (SELECT unnest(generate_series(1, {_CPCV_GROUPS})) AS g) g1,
             (SELECT unnest(generate_series(1, {_CPCV_GROUPS})) AS g) g2
        WHERE g1.g < g2.g)
),
splits AS (
  SELECT split_id, a AS test_grp FROM combos
  UNION ALL
  SELECT split_id, b AS test_grp FROM combos
),
hulls AS (
  SELECT symbol, grp AS test_grp, min(t0) AS h_start, max(t1) AS h_end
  FROM ev GROUP BY symbol, grp
),
split_hulls AS (
  SELECT s.split_id, h.symbol, s.test_grp, h.h_start, h.h_end,
         h.h_end + INTERVAL 30 MINUTES AS emb_end
  FROM splits s JOIN hulls h ON s.test_grp = h.test_grp
),
flags AS (
  SELECT e.symbol, e.t0, e.grp, sh.split_id,
    bool_or(e.grp = sh.test_grp) AS is_test,
    bool_or(e.t0 <= sh.h_end AND sh.h_start <= e.t1) AS olap,
    bool_or(e.t0 > sh.h_end AND e.t0 <= sh.emb_end) AS embargoed
  FROM ev e JOIN split_hulls sh ON e.symbol = sh.symbol
  GROUP BY e.symbol, e.t0, e.grp, sh.split_id
)
SELECT symbol, t0 AS ts_event, split_id,
  CASE WHEN is_test THEN 'test'
       WHEN olap THEN 'purged'
       WHEN embargoed THEN 'embargo'
       ELSE 'train' END AS role
FROM flags
""",
    f"Combinatorial purged CV over C({_CPCV_GROUPS},2) split combinations "
    f"with {_CPCV_EMBARGO} embargo, per-test-hull purging (AFML ch.12)",
)
def q_cpcv_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cv import cpcv_assign

    with _trades_config():
        events = dyn_ops.get_vertical_barrier_by_timedelta(
            trades_from_events(spark, sf_dir), BARRIER_OFFSET
        )
        out = cpcv_assign(
            events, n_groups=_CPCV_GROUPS, k_test=2, embargo=_CPCV_EMBARGO
        )
    return out


# --------------------------------------------------------------------------
# C-ext. Tick imbalance bars (operators/imbalance.py) — static-threshold
# AFML 2.3.2 order-flow-imbalance clock.  The reset-on-breach recursion
# is sequential, so the oracle replays it exactly as a recursive CTE
# advancing every (symbol, date) partition one row per step; the Spark
# side runs the chunked closed-form numpy scan inside a slim
# applyInPandas island and keeps the OHLCV reduction native.
# --------------------------------------------------------------------------

_IMB_H = 6


@register(
    "imbalance_bars",
    f"""
WITH RECURSIVE trades AS ({TRADES_CTE}),
t0 AS (
  SELECT symbol, CAST(ts_event AS DATE) AS d, ts_event, seq, price, size,
    row_number() OVER w AS rn,
    CASE WHEN price - lag(price) OVER w > 0 THEN 1.0
         WHEN price - lag(price) OVER w < 0 THEN -1.0 END AS sgn_raw
  FROM trades
  WINDOW w AS (PARTITION BY symbol, CAST(ts_event AS DATE) ORDER BY ts_event, seq)
),
t AS (
  SELECT *, coalesce(last_value(sgn_raw IGNORE NULLS) OVER
      (PARTITION BY symbol, d ORDER BY ts_event, seq
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS b
  FROM t0
),
rec(symbol, d, rn, bar_id, theta_out, gid_next) AS (
  SELECT symbol, d, rn, CAST(0 AS BIGINT),
         CASE WHEN abs(b) >= {_IMB_H} THEN 0.0 ELSE b END,
         CAST(CASE WHEN abs(b) >= {_IMB_H} THEN 1 ELSE 0 END AS BIGINT)
  FROM t WHERE rn = 1
  UNION ALL
  SELECT x.symbol, x.d, x.rn, x.gid,
         CASE WHEN abs(x.tmp) >= {_IMB_H} THEN 0.0 ELSE x.tmp END,
         CASE WHEN abs(x.tmp) >= {_IMB_H} THEN x.gid + 1 ELSE x.gid END
  FROM (
    SELECT tt.symbol, tt.d, tt.rn, r.gid_next AS gid, r.theta_out + tt.b AS tmp
    FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.d = r.d AND tt.rn = r.rn + 1
  ) x
),
assigned AS (
  SELECT r.symbol, r.d, r.bar_id, tt.ts_event, tt.seq, tt.price, tt.size
  FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.d = r.d AND tt.rn = r.rn
)
SELECT symbol,
    {_OHLCV_ORACLE}
FROM assigned
GROUP BY symbol, d, bar_id
""",
    f"Tick imbalance bars (AFML 2.3.2, static threshold {_IMB_H}): close a "
    "bar when |running tick-rule signed sum| breaches — chunked numpy scan "
    "vs sequential recursive-CTE oracle",
)
def q_imbalance_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.imbalance import imbalance_bars

    with _trades_config():
        out = imbalance_bars(
            trades_from_events(spark, sf_dir), threshold=_IMB_H, mode="tick"
        )
    return _round_vwap(out)


# --------------------------------------------------------------------------
# C-ext. VPIN (operators/microstructure.py) — volume-synchronized order
# flow toxicity over equal-volume buckets (reuses the bar_groups split).
# --------------------------------------------------------------------------

_VPIN_BUCKET = 500_000
_VPIN_WINDOW = 10


@register(
    "vpin",
    f"""
WITH trades AS ({TRADES_CTE}),
signed0 AS (
  SELECT *, CAST(ts_event AS DATE) AS d,
    CASE WHEN price - lag(price) OVER w > 0 THEN 1.0
         WHEN price - lag(price) OVER w < 0 THEN -1.0 END AS sgn_raw
  FROM trades
  WINDOW w AS (PARTITION BY symbol, CAST(ts_event AS DATE) ORDER BY ts_event, seq)
),
signed AS (
  SELECT *, coalesce(last_value(sgn_raw IGNORE NULLS) OVER
      (PARTITION BY symbol, d ORDER BY ts_event, seq
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS b
  FROM signed0
),
cum AS (
  SELECT *, CAST(sum(size) OVER (PARTITION BY symbol, d ORDER BY ts_event, seq
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
  FROM signed
),
spans AS (SELECT *, cs - size AS prev FROM cum),
pieces AS (
  SELECT *,
         unnest(generate_series(prev // {_VPIN_BUCKET},
                                CASE WHEN cs % {_VPIN_BUCKET} = 0 THEN cs // {_VPIN_BUCKET} - 1
                                     ELSE cs // {_VPIN_BUCKET} END)) AS bar
  FROM spans
),
amounts AS (
  SELECT *,
         least(cs, (bar + 1) * {_VPIN_BUCKET}) - greatest(prev, bar * {_VPIN_BUCKET}) AS piece
  FROM pieces
),
buckets AS (
  SELECT symbol, d, bar,
    max(ts_event) AS ts_event_end,
    CAST(sum(piece) AS BIGINT) AS bucket_volume,
    sum(CASE WHEN b = 1.0 THEN piece ELSE 0 END) AS buy,
    sum(CASE WHEN b = -1.0 THEN piece ELSE 0 END) AS sell
  FROM amounts GROUP BY symbol, d, bar
),
r AS (
  SELECT symbol, ts_event_end, bucket_volume,
    abs(buy - sell) / bucket_volume AS imbalance,
    count(*) OVER rw AS n,
    avg(abs(buy - sell) / bucket_volume) OVER rw AS m
  FROM buckets
  WINDOW rw AS (PARTITION BY symbol ORDER BY d, bar
                ROWS BETWEEN {_VPIN_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts_event_end, bucket_volume, round(imbalance, 6) AS imbalance,
  round(CASE WHEN n = {_VPIN_WINDOW} THEN m END, 6) AS vpin_val
FROM r
""",
    f"VPIN over {_VPIN_BUCKET}-share volume buckets, {_VPIN_WINDOW}-bucket "
    "rolling mean (Easley/López de Prado/O'Hara 2012, AFML 19.5.3)",
)
def q_vpin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.microstructure import vpin

    with _trades_config():
        out = vpin(
            trades_from_events(spark, sf_dir),
            bucket_volume=_VPIN_BUCKET,
            window=_VPIN_WINDOW,
        )
    return out.select(
        "symbol",
        "ts_event_end",
        "bucket_volume",
        F.round("imbalance", 6).alias("imbalance"),
        F.round("vpin_val", 6).alias("vpin_val"),
    )


# --------------------------------------------------------------------------
# C-ext. Return-sign entropy (operators/entropy.py) — AFML ch.18 plug-in
# entropy over tumbling blocks of sign words.
# --------------------------------------------------------------------------

_ENT_WORD = 2
_ENT_BLOCK = 50


@register(
    "return_entropy",
    f"""
WITH trades AS ({TRADES_CTE}),
signs AS (
  SELECT symbol, ts_event, seq,
    CASE WHEN price - lag(price) OVER w > 0 THEN 'u'
         WHEN price - lag(price) OVER w < 0 THEN 'd'
         WHEN lag(price) OVER w IS NOT NULL THEN 'f' END AS s
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
),
words AS (
  SELECT symbol, ts_event, seq,
    (lag(s, {_ENT_WORD - 1}) OVER w || s) AS word
  FROM signs
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
),
blocks AS (
  SELECT symbol, ts_event, word,
    (row_number() OVER (PARTITION BY symbol ORDER BY ts_event, seq) - 1) // {_ENT_BLOCK} AS blk
  FROM words WHERE word IS NOT NULL
),
counts AS (
  SELECT symbol, blk, word, count(*) AS c,
         min(ts_event) AS wmin, max(ts_event) AS wmax
  FROM blocks GROUP BY symbol, blk, word
)
SELECT symbol,
  min(wmin) AS ts_event_start,
  max(wmax) AS ts_event_end,
  CAST(sum(c) AS BIGINT) AS n_words,
  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy,
  round((log2(sum(c)) - sum(c * log2(c)) / sum(c)) / {_ENT_WORD}, 6) AS entropy_rate
FROM counts
GROUP BY symbol, blk
""",
    f"Plug-in Shannon entropy of length-{_ENT_WORD} return-sign words over "
    f"{_ENT_BLOCK}-word tumbling blocks (AFML 18.3-18.4)",
)
def q_return_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.entropy import return_entropy

    with _trades_config():
        out = return_entropy(
            trades_from_events(spark, sf_dir), word_len=_ENT_WORD, block=_ENT_BLOCK
        )
    return out


# --------------------------------------------------------------------------
# C-ext. Stratified corpus sampling (functions/corpus.py) — deterministic
# per-language rebalancing by the same engine-portable salted hash the
# split assignment uses.
# --------------------------------------------------------------------------

_SAMPLE_SALT = "pts-sample"
_SAMPLE_FRACS = {"en": 0.25, "de": 0.75, "fr": 0.75, "es": 0.75}
_SAMPLE_DEFAULT = 1.0
_SAMPLE_MOD = 1 << 30

_SAMPLE_CASE = " ".join(
    [f"WHEN lang = '{k}' THEN {v!r}" for k, v in _SAMPLE_FRACS.items()]
)


@register(
    "stratified_sample",
    f"""
WITH u AS (
  SELECT doc_id, lang,
         ({_sql_hash60(f"concat('{_SAMPLE_SALT}', CAST(doc_id AS VARCHAR))")} % {_SAMPLE_MOD})
           / {float(_SAMPLE_MOD)} AS u
  FROM documents
)
SELECT doc_id, lang
FROM u
WHERE u < CASE {_SAMPLE_CASE} ELSE {_SAMPLE_DEFAULT!r} END
""",
    "Deterministic stratified corpus sample: downweight the dominant "
    "language via salted id hash — nested, engine-portable, zero-shuffle",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import stratified_sample

    docs = read_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs.select("doc_id", "lang"),
        stratum_col="lang",
        fractions=_SAMPLE_FRACS,
        default_fraction=_SAMPLE_DEFAULT,
        salt=_SAMPLE_SALT,
    )
    return out


# --------------------------------------------------------------------------
# C-ext. SADF structural-break statistic (operators/structural_breaks.py)
# --------------------------------------------------------------------------

_SADF_MIN, _SADF_MAX = 10, 40


def _sadf_oracle(min_span: int, max_span: int) -> str:
    """DuckDB oracle generated with the SAME newest-first left-associated
    chains as the numpy kernel's row-wise cumsums: every double is
    bitwise equal, so the sup over raw stats (ties to the smallest
    span) selects the identical winner on both engines."""
    lags = ",\n    ".join(
        f"lag(price, {k}) OVER w AS y{k}" for k in range(1, max_span + 1)
    )
    sums, stats, ses, unions = [], [], [], []
    sx, sxx, sd, sxd, sdd = None, None, None, None, None
    for l in range(1, max_span + 1):
        xk = f"y{l}"
        yk = "price" if l == 1 else f"y{l - 1}"
        dk = f"({yk} - {xk})"
        sx = xk if sx is None else f"({sx} + {xk})"
        sxx = f"({xk} * {xk})" if sxx is None else f"({sxx} + ({xk} * {xk}))"
        sd = dk if sd is None else f"({sd} + {dk})"
        sxd = f"({xk} * {dk})" if sxd is None else f"({sxd} + ({xk} * {dk}))"
        sdd = f"({dk} * {dk})" if sdd is None else f"({sdd} + ({dk} * {dk}))"
        if l < min_span:
            continue
        n = float(l)
        sums.append(
            f"{sx} AS sx{l}, {sxx} AS sxx{l}, {sd} AS sd{l}, {sxd} AS sxd{l}, {sdd} AS sdd{l}"
        )
        stats.append(f"({n!r} * sxx{l}) - (sx{l} * sx{l}) AS denom{l}")
        stats.append(f"(({n!r} * sxd{l}) - (sx{l} * sd{l})) / (({n!r} * sxx{l}) - (sx{l} * sx{l})) AS beta{l}")
        ses.append(
            f"greatest((sdd{l} - (((sd{l} - (beta{l} * sx{l})) / {n!r}) * sd{l}))"
            f" - (beta{l} * sxd{l}), 0.0)"
            f" / {n - 2.0!r} / (sxx{l} - ((sx{l} * sx{l}) / {n!r})) AS se2_{l}"
        )
        unions.append(
            f"SELECT symbol, ts_event, {l} AS span,"
            f" beta{l} / sqrt(se2_{l}) AS stat"
            f" FROM s3 WHERE y{l} IS NOT NULL AND denom{l} <> 0 AND se2_{l} > 0"
        )
    nl = ",\n    "
    return f"""
WITH trades AS ({TRADES_CTE}),
j AS (
  SELECT symbol, ts_event, price,
    {lags}
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event)
),
s1 AS (
  SELECT *,
    {nl.join(sums)}
  FROM j
),
s2 AS (
  SELECT *,
    {nl.join(stats)}
  FROM s1
),
s3 AS MATERIALIZED (
  SELECT *,
    {nl.join(ses)}
  FROM s2
),
cand AS (
  {' UNION ALL '.join(unions)}
),
winner AS (
  SELECT symbol, ts_event, span, stat
  FROM cand
  QUALIFY row_number() OVER (PARTITION BY symbol, ts_event
                             ORDER BY stat DESC, span ASC) = 1
)
SELECT t.symbol, t.ts_event, w.stat AS sadf_stat, CAST(w.span AS INTEGER) AS sadf_span
FROM trades t
LEFT JOIN winner w ON t.symbol = w.symbol AND t.ts_event = w.ts_event
"""


def _sadf_adf1_oracle(min_span: int, max_span: int) -> str:
    """ADF(1) twin of ``_sadf_oracle``: adds the lagged-difference
    regressor ``z_k = dy_{k-1}`` and solves the 3x3 normal system by
    Cramer's rule, with every formula parenthesized exactly as the numpy
    kernel's ``_df_stats_lag1`` writes it — bitwise-equal doubles, so
    the sup selects the identical (stat, span) on both engines.

    Structure note: one narrow nested-subquery branch per span (sums ->
    determinants -> coefficients -> sse -> se2 -> stat), unioned.  The
    wide-CTE layout the lag-0 oracle uses blows up here — 14 derived
    columns per span across five dependent projection levels made
    DuckDB's plan explode (3 minutes / OOM at 1000 rows); per-span
    branches keep every projection a dozen columns wide.
    """
    lag_cols = ",\n    ".join(
        f"lag(price, {k}) OVER w AS y{k}" for k in range(1, max_span + 2)
    )
    sums, branches = [], []
    sx = sxx = sz = szz = sxz = sd = sxd = szd = sdd = None
    for l in range(1, max_span + 1):
        xk = f"y{l}"
        yk = "price" if l == 1 else f"y{l - 1}"
        dk = f"({yk} - {xk})"
        zk = f"(y{l} - y{l + 1})"
        sx = xk if sx is None else f"({sx} + {xk})"
        sxx = f"({xk} * {xk})" if sxx is None else f"({sxx} + ({xk} * {xk}))"
        sz = zk if sz is None else f"({sz} + {zk})"
        szz = f"({zk} * {zk})" if szz is None else f"({szz} + ({zk} * {zk}))"
        sxz = f"({xk} * {zk})" if sxz is None else f"({sxz} + ({xk} * {zk}))"
        sd = dk if sd is None else f"({sd} + {dk})"
        sxd = f"({xk} * {dk})" if sxd is None else f"({sxd} + ({xk} * {dk}))"
        szd = f"({zk} * {dk})" if szd is None else f"({szd} + ({zk} * {dk}))"
        sdd = f"({dk} * {dk})" if sdd is None else f"({sdd} + ({dk} * {dk}))"
        if l < min_span:
            continue
        n = float(l)
        sums.append(
            f"{sx} AS sx{l}, {sxx} AS sxx{l}, {sz} AS sz{l}, {szz} AS szz{l}, "
            f"{sxz} AS sxz{l}, {sd} AS sd{l}, {sxd} AS sxd{l}, {szd} AS szd{l}, "
            f"{sdd} AS sdd{l}"
        )
        branches.append(f"""
SELECT symbol, ts_event, {l} AS span, beta / sqrt(se2) AS stat
FROM (
  SELECT *, ((sse / {n - 3.0!r}) * (({n!r} * szz) - (sz * sz))) / det AS se2
  FROM (
    SELECT *, greatest(((sdd - (alpha * sd)) - (beta * sxd)) - (gamma * szd), 0.0) AS sse
    FROM (
      SELECT *, detb / det AS beta, deta / det AS alpha, detg / det AS gamma
      FROM (
        SELECT *,
          ((({n!r} * ((sxx * szz) - (sxz * sxz))) - (sx * ((sx * szz) - (sxz * sz)))) + (sz * ((sx * sxz) - (sxx * sz)))) AS det,
          ((({n!r} * ((sxd * szz) - (sxz * szd))) - (sd * ((sx * szz) - (sxz * sz)))) + (sz * ((sx * szd) - (sxd * sz)))) AS detb,
          (((sd * ((sxx * szz) - (sxz * sxz))) - (sx * ((sxd * szz) - (sxz * szd)))) + (sz * ((sxd * sxz) - (sxx * szd)))) AS deta,
          ((({n!r} * ((sxx * szd) - (sxd * sxz))) - (sx * ((sx * szd) - (sxd * sz)))) + (sd * ((sx * sxz) - (sxx * sz)))) AS detg
        FROM (
          SELECT symbol, ts_event, y{l + 1} AS deep,
            sx{l} AS sx, sxx{l} AS sxx, sz{l} AS sz, szz{l} AS szz, sxz{l} AS sxz,
            sd{l} AS sd, sxd{l} AS sxd, szd{l} AS szd, sdd{l} AS sdd
          FROM s1
        )
      )
    )
  )
)
WHERE deep IS NOT NULL AND det <> 0 AND se2 > 0""")
    nl = ",\n    "
    return f"""
WITH trades AS ({TRADES_CTE}),
j AS MATERIALIZED (
  SELECT symbol, ts_event, price,
    {lag_cols}
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event)
),
s1 AS MATERIALIZED (
  SELECT *,
    {nl.join(sums)}
  FROM j
),
cand AS (
  {' UNION ALL '.join(branches)}
),
winner AS (
  SELECT symbol, ts_event, span, stat
  FROM cand
  QUALIFY row_number() OVER (PARTITION BY symbol, ts_event
                             ORDER BY stat DESC, span ASC) = 1
)
SELECT t.symbol, t.ts_event, w.stat AS sadf_stat, CAST(w.span AS INTEGER) AS sadf_span
FROM trades t
LEFT JOIN winner w ON t.symbol = w.symbol AND t.ts_event = w.ts_event
"""


@register(
    "sadf",
    _sadf_oracle(_SADF_MIN, _SADF_MAX),
    f"Rolling sup Dickey-Fuller statistic over trailing windows "
    f"[{_SADF_MIN},{_SADF_MAX}] (SADF, AFML ch.17 / PWY explosive test)",
)
def q_sadf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.structural_breaks import sadf

    with _trades_config():
        out = sadf(
            trades_from_events(spark, sf_dir), min_span=_SADF_MIN, max_span=_SADF_MAX
        )
    return out


@register(
    "sadf_adf1",
    _sadf_adf1_oracle(_SADF_MIN, _SADF_MAX),
    f"Rolling sup ADF(1) statistic over trailing windows "
    f"[{_SADF_MIN},{_SADF_MAX}] — one lagged-difference regressor "
    "(PWY standard practice), Cramer 3x3 normal solve on both engines",
)
def q_sadf_adf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.structural_breaks import sadf

    with _trades_config():
        out = sadf(
            trades_from_events(spark, sf_dir),
            min_span=_SADF_MIN,
            max_span=_SADF_MAX,
            lags=1,
        )
    return out


# --------------------------------------------------------------------------
# C-ext. Tick run bars (operators/imbalance.py::run_bars) — AFML 2.3.2.2
# one-sided flow clock, same recursive-CTE replay contract.
# --------------------------------------------------------------------------

_RUN_H = 6


@register(
    "run_bars",
    f"""
WITH RECURSIVE trades AS ({TRADES_CTE}),
t0 AS (
  SELECT symbol, CAST(ts_event AS DATE) AS d, ts_event, seq, price, size,
    row_number() OVER w AS rn,
    CASE WHEN price - lag(price) OVER w > 0 THEN 1.0
         WHEN price - lag(price) OVER w < 0 THEN -1.0 END AS sgn_raw
  FROM trades
  WINDOW w AS (PARTITION BY symbol, CAST(ts_event AS DATE) ORDER BY ts_event, seq)
),
t AS (
  SELECT *, coalesce(last_value(sgn_raw IGNORE NULLS) OVER
      (PARTITION BY symbol, d ORDER BY ts_event, seq
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS b
  FROM t0
),
rec(symbol, d, rn, bar_id, p_out, n_out, gid_next) AS (
  SELECT symbol, d, rn, CAST(0 AS BIGINT),
         CASE WHEN greatest(greatest(b, 0.0), -least(b, 0.0)) >= {_RUN_H}
              THEN 0.0 ELSE greatest(b, 0.0) END,
         CASE WHEN greatest(greatest(b, 0.0), -least(b, 0.0)) >= {_RUN_H}
              THEN 0.0 ELSE -least(b, 0.0) END,
         CAST(CASE WHEN greatest(greatest(b, 0.0), -least(b, 0.0)) >= {_RUN_H}
              THEN 1 ELSE 0 END AS BIGINT)
  FROM t WHERE rn = 1
  UNION ALL
  SELECT x.symbol, x.d, x.rn, x.gid,
         CASE WHEN greatest(x.p, x.q) >= {_RUN_H} THEN 0.0 ELSE x.p END,
         CASE WHEN greatest(x.p, x.q) >= {_RUN_H} THEN 0.0 ELSE x.q END,
         CASE WHEN greatest(x.p, x.q) >= {_RUN_H} THEN x.gid + 1 ELSE x.gid END
  FROM (
    SELECT tt.symbol, tt.d, tt.rn, r.gid_next AS gid,
           r.p_out + greatest(tt.b, 0.0) AS p,
           r.n_out - least(tt.b, 0.0) AS q
    FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.d = r.d AND tt.rn = r.rn + 1
  ) x
),
assigned AS (
  SELECT r.symbol, r.d, r.bar_id, tt.ts_event, tt.seq, tt.price, tt.size
  FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.d = r.d AND tt.rn = r.rn
)
SELECT symbol,
    {_OHLCV_ORACLE}
FROM assigned
GROUP BY symbol, d, bar_id
""",
    f"Tick run bars (AFML 2.3.2.2, static threshold {_RUN_H}): close a bar "
    "when either side's accumulated tick-rule flow breaches — chunked "
    "monotone scan vs sequential recursive-CTE oracle",
)
def q_run_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.imbalance import run_bars

    with _trades_config():
        out = run_bars(trades_from_events(spark, sf_dir), threshold=_RUN_H, mode="tick")
    return _round_vwap(out)


# --------------------------------------------------------------------------
# C-ext. Benchmark decontamination (functions/corpus.py::decontaminate)
# --------------------------------------------------------------------------

_DECON_NGRAM = 3


@register(
    "decontaminate",
    f"""
WITH {_DOCS_TOK_CTE},
{_sql_shingle_sh_cte(_DECON_NGRAM)},
bench AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 20 = 0
),
grams AS (
  SELECT doc_id, unnest(sh) AS g FROM sh
),
hits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM grams JOIN bench USING (g)
  GROUP BY doc_id
)
SELECT s.doc_id,
  CAST(len(s.sh) AS INTEGER) AS n_grams,
  CAST(coalesce(h.n_hits, 0) AS INTEGER) AS n_hits,
  CASE WHEN len(s.sh) > 0
       THEN CAST(coalesce(h.n_hits, 0) AS DOUBLE) / len(s.sh)
       ELSE 0.0 END AS contamination_ratio,
  coalesce(h.n_hits, 0) >= 1 AS is_contaminated
FROM sh s LEFT JOIN hits h USING (doc_id)
""",
    f"Benchmark decontamination: {_DECON_NGRAM}-gram shingle-hash overlap "
    "against the benchmark subset (doc_id % 20 = 0) via broadcast "
    "semi-probe (GPT-3 appx C / FineWeb hygiene pass)",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import decontaminate

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    return decontaminate(docs, bench, ngram=_DECON_NGRAM)


# --------------------------------------------------------------------------
# C-ext. Bet sizing: averaging active bets (operators/bet_sizing.py)
# --------------------------------------------------------------------------


@register(
    "bet_sizing",
    f"""
WITH base AS (
{_trend_scan_oracle(_TS_MIN_SPAN, _TS_MAX_SPAN)}
),
ev AS (
  SELECT symbol, ts_event AS t0, t1, tval / sqrt(1 + tval * tval) AS m
  FROM base WHERE tval IS NOT NULL AND t1 IS NOT NULL
),
pairs AS (
  SELECT e.symbol, e.t0 AS pt, j.m
  FROM ev e JOIN ev j
    ON e.symbol = j.symbol AND j.t0 <= e.t0 AND e.t0 <= j.t1
)
SELECT symbol, pt AS ts_event,
  round(avg(m), 6) AS avg_active_bet,
  CAST(count(*) AS INTEGER) AS n_active
FROM pairs GROUP BY symbol, pt
""",
    "Averaging active bets (AFML 10.2) over sigmoid-sized trend-scanning "
    "signals (AFML 10.3) — horizon-bucketed span join, one aggregate",
)
def q_bet_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.bet_sizing import (
        average_active_bets,
        bet_size_from_tstat,
    )
    from polars_trading_spark.operators.trend_scan import trend_scanning_labels

    with _trades_config():
        labels = trend_scanning_labels(
            trades_from_events(spark, sf_dir),
            min_span=_TS_MIN_SPAN,
            max_span=_TS_MAX_SPAN,
        )
        ev = labels.where(F.col("tval").isNotNull()).withColumn(
            "bet_size", bet_size_from_tstat(F.col("tval"))
        )
        out = average_active_bets(ev, bucket="4h")
    return out.select(
        "symbol",
        "ts_event",
        F.round("avg_active_bet", 6).alias("avg_active_bet"),
        "n_active",
    )


# --------------------------------------------------------------------------
# C-ext. Feature-matrix assembly (operators/feature_matrix.py)
# --------------------------------------------------------------------------


@register(
    "feature_matrix",
    f"""
WITH
{_FEATURE_BARS_CTE},
vterms AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER w) AS r_cc,
    ln(open / lag(close) OVER w) AS r_on,
    ln(close / open) AS r_co,
    pow(ln(high / low), 2) AS hl2,
    ln(high / close) * ln(high / open) + ln(low / close) * ln(low / open) AS rs
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
vrolled AS (
  SELECT symbol, ts,
    count(r_cc) OVER r AS n_cc, count(*) OVER r AS n_bar,
    var_samp(r_cc) OVER r AS v_cc, var_samp(r_on) OVER r AS v_on,
    var_samp(r_co) OVER r AS v_co, avg(hl2) OVER r AS m_hl2,
    avg(0.5 * hl2 - (2 * ln(2) - 1) * r_co * r_co) OVER r AS m_gk,
    avg(rs) OVER r AS m_rs
  FROM vterms
  WINDOW r AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN {_VOL_WINDOW - 1} PRECEDING AND CURRENT ROW)
),
vol AS (
  SELECT symbol, ts,
    round(CASE WHEN n_cc = {_VOL_WINDOW} THEN sqrt(v_cc) END, 6) AS vol_cc,
    round(CASE WHEN n_bar = {_VOL_WINDOW} THEN sqrt(m_hl2 / (4 * ln(2))) END, 6) AS vol_parkinson,
    round(CASE WHEN n_bar = {_VOL_WINDOW} THEN sqrt(greatest(m_gk, 0)) END, 6) AS vol_gk,
    round(CASE WHEN n_bar = {_VOL_WINDOW} THEN sqrt(greatest(m_rs, 0)) END, 6) AS vol_rs,
    round(CASE WHEN n_cc = {_VOL_WINDOW}
          THEN sqrt(greatest(v_on + {_VOL_K!r} * v_co + {1.0 - _VOL_K!r} * m_rs, 0)) END, 6) AS vol_yz
  FROM vrolled
),
mterms AS (
  SELECT symbol, ts, volume, vwap,
    close - lag(close) OVER w AS dp,
    ln(close / lag(close) OVER w) AS ret
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
mt2 AS (
  SELECT *,
    lag(dp) OVER w AS dp_prev,
    last_value(CASE WHEN dp > 0 THEN 1.0 WHEN dp < 0 THEN -1.0 END IGNORE NULLS)
      OVER (PARTITION BY symbol ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tick
  FROM mterms
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
mt3 AS (
  SELECT symbol, ts, dp, volume,
    CASE WHEN dp IS NOT NULL AND dp_prev IS NOT NULL THEN dp_prev END AS cx,
    CASE WHEN dp IS NOT NULL AND dp_prev IS NOT NULL THEN dp END AS cy,
    CASE WHEN dp IS NOT NULL AND tick IS NOT NULL THEN tick * volume END AS sv,
    CASE WHEN dp IS NOT NULL AND tick IS NOT NULL THEN dp END AS ly,
    CASE WHEN ret IS NOT NULL AND volume * vwap > 0 THEN abs(ret) / (volume * vwap) END AS ami
  FROM mt2
),
mrolled AS (
  SELECT symbol, ts,
    count(cx) OVER r AS n_cov, sum(cx) OVER r AS s_cx, sum(cy) OVER r AS s_cy,
    sum(cx * cy) OVER r AS s_cxy,
    count(sv) OVER r AS n_lam, sum(sv) OVER r AS s_x, sum(ly) OVER r AS s_y,
    sum(sv * ly) OVER r AS s_xy, sum(sv * sv) OVER r AS s_xx,
    count(ami) OVER r AS n_ami, avg(ami) OVER r AS m_ami
  FROM mt3
  WINDOW r AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN {_VOL_WINDOW - 1} PRECEDING AND CURRENT ROW)
),
micro AS (
  SELECT symbol, ts,
    round(CASE WHEN n_cov = {_VOL_WINDOW}
          THEN 2 * sqrt(greatest(-((s_cxy - s_cx * s_cy / n_cov) / (n_cov - 1)), 0)) END, 6)
      AS roll_measure,
    round(CASE WHEN n_lam = {_VOL_WINDOW} AND n_lam * s_xx - s_x * s_x <> 0
          THEN 1e6 * (n_lam * s_xy - s_x * s_y) / (n_lam * s_xx - s_x * s_x) END, 6)
      AS kyle_lambda,
    round(CASE WHEN n_ami = {_VOL_WINDOW} THEN 1e6 * m_ami END, 6) AS amihud
  FROM mrolled
),
target AS (
  SELECT symbol, ts,
    ln(lead(close) OVER w / close) AS fwd_return,
    CASE WHEN ln(lead(close) OVER w / close) > 0 THEN 1.0
         WHEN ln(lead(close) OVER w / close) < 0 THEN -1.0
         WHEN ln(lead(close) OVER w / close) = 0 THEN 0.0 END AS label
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
)
SELECT v.symbol, v.ts AS ts_event,
       v.vol_cc, v.vol_parkinson, v.vol_gk, v.vol_rs, v.vol_yz,
       m.roll_measure, m.kyle_lambda, m.amihud,
       t.fwd_return, t.label
FROM vol v
JOIN micro m ON v.symbol = m.symbol AND v.ts = m.ts
JOIN target t ON v.symbol = t.symbol AND v.ts = t.ts
""",
    "ML dataset assembly: range-volatility + microstructure features + "
    "forward-return target per 15m bar — the end-to-end training-matrix "
    "pipeline",
)
def q_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.feature_matrix import bar_feature_matrix

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = bar_feature_matrix(bars, window=_VOL_WINDOW, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        *[F.round(c, 6).alias(c) for c in ("vol_cc", "vol_parkinson", "vol_gk", "vol_rs", "vol_yz")],
        F.round("roll_measure", 6).alias("roll_measure"),
        F.round(F.col("kyle_lambda") * 1e6, 6).alias("kyle_lambda"),
        F.round("amihud", 6).alias("amihud"),
        "fwd_return",
        "label",
    )


# --------------------------------------------------------------------------
# C-ext. EWMA-adaptive imbalance bars.  Fully gated: the operator's own
# parameters (seed E[T], both alphas) determine the output, so the oracle
# replays the sequential state machine as a recursive CTE exactly like the
# static variant, with two bit-exactness requirements mirrored from the
# kernel:
#  * pandas ``ewm(alpha, adjust=False)`` round-trips alpha through the
#    center of mass (alpha_eff = 1/(1+(1-a)/a)), divides by
#    ((1-a_eff)+a_eff) and SKIPS the update when prev == x ("avoid
#    numerical errors on constant series") — all three replicated below,
#    verified bit-equal to pandas 2.2 on 200k-row sequences;
#  * every recursive state column is CAST to DOUBLE in the anchor member:
#    DuckDB fixes the CTE's column types from the anchor, and the tick
#    sign ``b`` is born DECIMAL(2,1) (from the 1.0/-1.0 literals), which
#    silently rounds the flow EWMA to one decimal each iteration.
# --------------------------------------------------------------------------

_ADP_T0 = 40
_ADP_AT = 0.1
_ADP_AW = 0.05
_ADP_AWEFF = 1.0 / (1.0 + (1.0 - _ADP_AW) / _ADP_AW)
_ADP_OWW = 1.0 - _ADP_AWEFF
_ADP_DENW = _ADP_OWW + _ADP_AWEFF
_ADP_OWT = 1.0 - _ADP_AT


@register(
    "imbalance_bars_adaptive",
    f"""
WITH RECURSIVE trades AS ({TRADES_CTE}),
t0 AS (
  SELECT symbol, CAST(ts_event AS DATE) AS d, ts_event, seq, price, size,
    row_number() OVER w AS rn,
    CASE WHEN price - lag(price) OVER w > 0 THEN 1.0
         WHEN price - lag(price) OVER w < 0 THEN -1.0 END AS sgn_raw
  FROM trades
  WINDOW w AS (PARTITION BY symbol, CAST(ts_event AS DATE) ORDER BY ts_event, seq)
),
t AS (
  SELECT *, CAST(coalesce(last_value(sgn_raw IGNORE NULLS) OVER
      (PARTITION BY symbol, d ORDER BY ts_event, seq
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS DOUBLE) AS b
  FROM t0
),
rec(symbol, d, rn, bar_id, theta_out, len_out, ew_out, et_out, gid_next) AS (
  SELECT symbol, d, rn, CAST(0 AS BIGINT),
         CAST(CASE WHEN closed THEN 0.0 ELSE b END AS DOUBLE),
         CASE WHEN closed THEN 0 ELSE 1 END,
         CAST(b AS DOUBLE),
         CASE WHEN closed THEN CAST('{_ADP_OWT!r}' AS DOUBLE) * {_ADP_T0} + CAST('{_ADP_AT!r}' AS DOUBLE) * 1
              ELSE CAST({_ADP_T0} AS DOUBLE) END,
         CAST(CASE WHEN closed THEN 1 ELSE 0 END AS BIGINT)
  FROM (SELECT *, abs(b) >= {_ADP_T0} * abs(b) AS closed FROM t WHERE rn = 1)
  UNION ALL
  SELECT x.symbol, x.d, x.rn, x.gid,
         CASE WHEN x.closed THEN CAST(0.0 AS DOUBLE) ELSE x.theta_new END,
         CASE WHEN x.closed THEN 0 ELSE x.len_new END,
         x.ew_new,
         CASE WHEN x.closed THEN CAST('{_ADP_OWT!r}' AS DOUBLE) * x.et + CAST('{_ADP_AT!r}' AS DOUBLE) * x.len_new
              ELSE x.et END,
         CASE WHEN x.closed THEN x.gid + 1 ELSE x.gid END
  FROM (
    SELECT y.*, abs(y.theta_new) >= y.et * abs(y.ew_new) AS closed
    FROM (
      SELECT tt.symbol, tt.d, tt.rn, r.gid_next AS gid,
             r.theta_out + tt.b AS theta_new,
             r.len_out + 1 AS len_new,
             CASE WHEN r.ew_out = tt.b THEN r.ew_out
                  ELSE (CAST('{_ADP_OWW!r}' AS DOUBLE) * r.ew_out + CAST('{_ADP_AWEFF!r}' AS DOUBLE) * tt.b)
                       / CAST('{_ADP_DENW!r}' AS DOUBLE) END AS ew_new,
             r.et_out AS et
      FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.d = r.d AND tt.rn = r.rn + 1
    ) y
  ) x
),
assigned AS (
  SELECT r.symbol, r.d, r.bar_id, tt.ts_event, tt.seq, tt.price, tt.size
  FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.d = r.d AND tt.rn = r.rn
)
SELECT symbol,
    {_OHLCV_ORACLE}
FROM assigned
GROUP BY symbol, d, bar_id
""",
    "EWMA-adaptive tick imbalance bars (full AFML 2.3.2.1 form): "
    "threshold E[T]*|E[w]| adapts per closed bar — sequential "
    "recursive-CTE replay with pandas-exact EWM arithmetic",
)
def q_imbalance_bars_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.imbalance import imbalance_bars_adaptive

    with _trades_config():
        out = imbalance_bars_adaptive(
            trades_from_events(spark, sf_dir),
            init_expected_ticks=40,
            alpha_ticks=0.1,
            alpha_flow=0.05,
            mode="tick",
        )
    return _round_vwap(out)


# --------------------------------------------------------------------------
# C-ext. Cross-sectional features (operators/cross_section.py)
# --------------------------------------------------------------------------

_BETA_WINDOW = 20
_MOM_LOOKBACK = 5


@register(
    "rolling_beta",
    f"""
WITH
{_FEATURE_BARS_CTE},
r AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS r
  FROM bars
),
mkt AS (
  SELECT ts, avg(r) AS m FROM r WHERE r IS NOT NULL GROUP BY ts
),
j AS (
  SELECT r.symbol, r.ts,
    CASE WHEN r.r IS NOT NULL AND k.m IS NOT NULL THEN k.m END AS x,
    CASE WHEN r.r IS NOT NULL AND k.m IS NOT NULL THEN r.r END AS y
  FROM r LEFT JOIN mkt k ON r.ts = k.ts
),
rolled AS (
  SELECT symbol, ts,
    count(x) OVER w AS n,
    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
    sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
    sum(x * y) OVER w AS sxy
  FROM j
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN {_BETA_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts AS ts_event,
  round(CASE WHEN n = {_BETA_WINDOW} AND n * sxx - sx * sx > 0
        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS beta,
  round(CASE WHEN n = {_BETA_WINDOW} AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        THEN (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS corr
FROM rolled
""",
    f"Rolling {_BETA_WINDOW}-bar beta/correlation of each symbol vs the "
    "equal-weight universe return (cross-sectional CAPM features)",
)
def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import rolling_beta

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = rolling_beta(bars, window=_BETA_WINDOW, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        F.round("beta", 6).alias("beta"),
        F.round("corr", 6).alias("corr"),
    )


@register(
    "momentum_rank",
    f"""
WITH
{_FEATURE_BARS_CTE},
r2 AS (
  SELECT symbol, ts,
    ln(close / lag(close, {_MOM_LOOKBACK}) OVER (PARTITION BY symbol ORDER BY ts)) AS mom
  FROM bars
),
ranked AS (
  SELECT symbol, ts,
    row_number() OVER (PARTITION BY ts ORDER BY mom DESC, symbol ASC) AS mom_rank,
    count(*) OVER (PARTITION BY ts) AS n_ranked
  FROM r2 WHERE mom IS NOT NULL
)
SELECT r2.symbol, r2.ts AS ts_event, r2.mom AS momentum,
  CAST(rk.mom_rank AS INTEGER) AS mom_rank,
  CAST(rk.n_ranked AS INTEGER) AS n_ranked
FROM r2 LEFT JOIN ranked rk ON r2.symbol = rk.symbol AND r2.ts = rk.ts
""",
    f"Cross-sectional momentum rank per bucket (trailing {_MOM_LOOKBACK}-bar "
    "log return, 1 = strongest; deterministic symbol tiebreak)",
)
def q_momentum_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import momentum_rank

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    return momentum_rank(bars, lookback=_MOM_LOOKBACK, ts_col="ts_event")


# --------------------------------------------------------------------------
# C-ext. Backtest statistics (operators/backtest.py, AFML ch.14-15)
# --------------------------------------------------------------------------

_BT_PPY = 35040.0  # 15-minute bars: 365 * 24 * 4 periods per year
_BT_SQRT_PPY = 187.18974330876145  # math.sqrt(_BT_PPY), pinned literal


@register(
    "backtest_stats",
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
path2 AS (
  SELECT symbol, ts, ret, cum,
    cum - max(greatest(cum, 0.0)) OVER w AS dd
  FROM path
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
path3 AS (
  SELECT symbol, ts, ret, dd,
    sum(CASE WHEN dd >= 0 THEN 1 ELSE 0 END) OVER w AS hwm
  FROM path2
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
spells AS (SELECT symbol, hwm, count(*) AS len FROM path3 GROUP BY symbol, hwm),
tuw AS (
  SELECT symbol, max(CASE WHEN hwm = 0 THEN len ELSE len - 1 END) AS max_tuw
  FROM spells GROUP BY symbol
),
agg AS (
  SELECT symbol,
    count(ret) AS n,
    sum(ret) AS s1, sum(ret * ret) AS s2,
    sum(ret * ret * ret) AS s3, sum(ret * ret * ret * ret) AS s4,
    sum(CASE WHEN ret > 0 THEN 1 ELSE 0 END) AS n_up,
    sum(CASE WHEN ret <> 0 THEN 1 ELSE 0 END) AS n_nz,
    min(dd) AS min_dd
  FROM path3 GROUP BY symbol
),
calc AS (
  SELECT symbol, n, n_up, n_nz, min_dd,
    s1 / n AS mu,
    s2 / n - (s1 / n) * (s1 / n) AS m2,
    s3 / n - 3 * (s1 / n) * s2 / n
      + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
    s4 / n - 4 * (s1 / n) * s3 / n
      + 6 * (s1 / n) * (s1 / n) * s2 / n
      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4,
    CASE WHEN n > 1 THEN (s2 - n * (s1 / n) * (s1 / n)) / (n - 1) END AS var_s
  FROM agg
),
calc2 AS (
  SELECT *,
    CASE WHEN var_s > 0 THEN sqrt(var_s) END AS sd,
    CASE WHEN m2 > 0 THEN m3 / power(m2, 1.5) END AS g3,
    CASE WHEN m2 > 0 THEN m4 / (m2 * m2) END AS g4
  FROM calc
),
calc3 AS (
  SELECT *, mu / sd AS sr,
    1 - (CASE WHEN m2 > 0 THEN m3 / power(m2, 1.5) END) * (mu / sd)
      + ((CASE WHEN m2 > 0 THEN m4 / (m2 * m2) END) - 1) / 4
        * (mu / sd) * (mu / sd) AS psr_var
  FROM calc2
)
SELECT c.symbol,
  n AS n_periods,
  round(mu * {_BT_PPY!r}, 6) AS ann_return,
  round(sd * {_BT_SQRT_PPY!r}, 6) AS ann_vol,
  round(sr * {_BT_SQRT_PPY!r}, 6) AS sharpe,
  round(CASE WHEN n > 1 AND psr_var > 0
        THEN sr * sqrt(n - 1) / sqrt(psr_var) END, 6) AS psr_z,
  round(g3, 6) AS skew,
  round(g4, 6) AS kurtosis,
  round(CASE WHEN n_nz > 0 THEN n_up / CAST(n_nz AS DOUBLE) END, 6) AS hit_ratio,
  round(1 - exp(min_dd), 6) AS max_drawdown,
  t.max_tuw
FROM calc3 c LEFT JOIN tuw t ON c.symbol = t.symbol
""",
    "Per-symbol Sharpe, PSR z-stat, skew/kurtosis, hit ratio, max drawdown "
    "and longest time-under-water from 15m-bar log returns (AFML ch.14-15)",
)
def q_backtest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.backtest import backtest_stats

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = backtest_stats(bars, periods_per_year=_BT_PPY, ts_col="ts_event")
    return out.select(
        "symbol",
        "n_periods",
        F.round("ann_return", 6).alias("ann_return"),
        F.round("ann_vol", 6).alias("ann_vol"),
        F.round("sharpe", 6).alias("sharpe"),
        F.round("psr_z", 6).alias("psr_z"),
        F.round("skew", 6).alias("skew"),
        F.round("kurtosis", 6).alias("kurtosis"),
        F.round("hit_ratio", 6).alias("hit_ratio"),
        F.round("max_drawdown", 6).alias("max_drawdown"),
        "max_tuw",
    )


# --------------------------------------------------------------------------
# C-ext. Brown-Durbin-Evans CUSUM (operators/structural_breaks.py, AFML 17.3.1)
# --------------------------------------------------------------------------


@register(
    "bde_cusum",
    f"""
WITH trades AS ({TRADES_CTE}),
base AS (
  SELECT symbol, ts_event, seq, ln(price) AS y,
    CAST(row_number() OVER (PARTITION BY symbol ORDER BY ts_event, seq) AS DOUBLE) AS i
  FROM trades
),
pre AS (
  SELECT symbol, ts_event, seq, y, i,
    CAST(count(y) OVER p AS DOUBLE) AS n,
    sum(i) OVER p AS st,
    sum(i * i) OVER p AS st2,
    sum(y) OVER p AS sy,
    sum(i * y) OVER p AS sty
  FROM base
  WINDOW p AS (PARTITION BY symbol ORDER BY ts_event, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
wres AS (
  SELECT symbol, ts_event, seq, i,
    CASE WHEN n * st2 - st * st > 0 THEN
      (y - ((st2 * sy - st * sty) / (n * st2 - st * st)
            + (n * sty - st * sy) / (n * st2 - st * st) * i))
      / sqrt(1 + (st2 - 2 * i * st + i * i * n) / (n * st2 - st * st))
    END AS w
  FROM pre
),
runw AS (
  SELECT symbol, ts_event, i, w,
    CAST(count(w) OVER r AS DOUBLE) AS cw,
    sum(w) OVER r AS sw1,
    sum(w * w) OVER r AS sw2,
    CAST(count(*) OVER (PARTITION BY symbol) AS DOUBLE) AS t_total
  FROM wres
  WINDOW r AS (PARTITION BY symbol ORDER BY ts_event, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts_event,
  round(w, 6) AS bde_w,
  round(sw1 / (CASE WHEN cw > 1 AND (sw2 - sw1 * sw1 / cw) / (cw - 1) > 0
               THEN sqrt((sw2 - sw1 * sw1 / cw) / (cw - 1)) END), 6) AS bde_stat,
  round(CASE WHEN w IS NOT NULL AND t_total - 2 > 0
        THEN 0.948 * (sqrt(t_total - 2) + 2 * (i - 2.0) / sqrt(t_total - 2)) END, 6)
    AS bde_crit
FROM runw
""",
    "Brown-Durbin-Evans CUSUM of recursive residuals from an expanding "
    "intercept+trend OLS on log price, with the classical 5% boundary "
    "(AFML 17.3.1)",
)
def q_bde_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.structural_breaks import bde_cusum

    with _trades_config():
        out = bde_cusum(trades_from_events(spark, sf_dir))
    return out.select(
        "symbol",
        "ts_event",
        F.round("bde_w", 6).alias("bde_w"),
        F.round("bde_stat", 6).alias("bde_stat"),
        F.round("bde_crit", 6).alias("bde_crit"),
    )


# --------------------------------------------------------------------------
# C-ext. Kontoyiannis LZ entropy (operators/entropy.py::lz_entropy, AFML 18.4)
# --------------------------------------------------------------------------

_LZ_WINDOW = 50
_LZ_LOG2W = 5.643856189774724  # math.log2(_LZ_WINDOW), pinned literal


@register(
    "lz_entropy",
    f"""
WITH trades AS ({TRADES_CTE}),
rets AS (
  SELECT symbol, ts_event, seq,
    CASE WHEN price > lag(price) OVER w THEN '1' ELSE '0' END AS b,
    row_number() OVER w AS rn
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
),
bits AS (
  SELECT symbol, ts_event, seq, b, rn - 1 AS i
  FROM rets WHERE rn > 1
),
strs AS (
  SELECT symbol, string_agg(b, '' ORDER BY i) AS s FROM bits GROUP BY symbol
),
cand AS (
  SELECT bi.symbol, bi.i,
    CASE WHEN substr(st.s, CAST(bi.i AS INT), m.m)
            = substr(st.s, CAST(bi.i - g.j AS INT), m.m)
         THEN m.m END AS hit
  FROM bits bi
  JOIN strs st USING (symbol)
  CROSS JOIN generate_series(1, {_LZ_WINDOW}) AS g(j)
  JOIN generate_series(1, {_LZ_WINDOW}) AS m(m) ON m.m <= g.j
  WHERE bi.i > {_LZ_WINDOW}
),
lmax AS (
  SELECT symbol, i, 1 + coalesce(max(hit), 0) AS L
  FROM cand GROUP BY symbol, i
),
run AS (
  SELECT b.symbol, b.ts_event, b.i, l.L,
    count(l.L) OVER r AS cnt,
    sum(l.L) OVER r AS sl
  FROM bits b LEFT JOIN lmax l USING (symbol, i)
  WINDOW r AS (PARTITION BY b.symbol ORDER BY b.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts_event,
  CAST(L AS INTEGER) AS lz_match_len,
  round(CASE WHEN cnt > 0 THEN {_LZ_LOG2W!r} * cnt / sl END, 6) AS lz_entropy
FROM run
""",
    f"Kontoyiannis sliding-window ({_LZ_WINDOW}-bit) match-length entropy "
    "rate of the binary return-sign sequence (AFML 18.4)",
)
def q_lz_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.entropy import lz_entropy

    with _trades_config():
        out = lz_entropy(trades_from_events(spark, sf_dir), window=_LZ_WINDOW)
    return out.select(
        "symbol",
        "ts_event",
        "lz_match_len",
        F.round("lz_entropy", 6).alias("lz_entropy"),
    )


# --------------------------------------------------------------------------
# C-ext. PII detection/scrubbing (functions/pii.py)
# --------------------------------------------------------------------------

from polars_trading_spark.functions.pii import PII_PATTERNS, PII_TOKENS  # noqa: E402


def _pii_oracle() -> str:
    t = "text"
    count_cols = []
    for name, pat in PII_PATTERNS.items():
        esc = pat.replace("'", "''")
        count_cols.append(
            f"CAST(len(regexp_extract_all({t}, '{esc}')) AS INTEGER) AS n_{name}"
        )
        t = f"regexp_replace({t}, '{esc}', '{PII_TOKENS[name]}', 'g')"
    total = " + ".join(f"n_{name}" for name in PII_PATTERNS)
    return f"""
WITH scrub AS (
  SELECT doc_id,
    {", ".join(count_cols)},
    md5({t}) AS scrub_md5
  FROM documents
)
SELECT doc_id, {", ".join(f"n_{n}" for n in PII_PATTERNS)},
  CAST({total} AS INTEGER) AS n_pii_total,
  ({total}) > 0 AS has_pii,
  scrub_md5
FROM scrub
"""


@register(
    "pii_scrub",
    _pii_oracle(),
    "Disjoint sequential regex PII counts (email/SSN/credit-card/IPv4/"
    "phone) and the scrubbed-text fingerprint per document",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.pii import pii_profile

    docs = read_table(spark, sf_dir, "documents")
    out = pii_profile(docs)
    return out.select(
        "doc_id",
        *[F.col(f"n_{n}").cast("int").alias(f"n_{n}") for n in PII_PATTERNS],
        F.col("n_pii_total").cast("int").alias("n_pii_total"),
        "has_pii",
        F.md5("text_scrubbed").alias("scrub_md5"),
    )


# --------------------------------------------------------------------------
# C-ext. C4/Gopher boilerplate flags (functions/text.py::boilerplate_profile)
# --------------------------------------------------------------------------


@register(
    "boilerplate",
    r"""
WITH lined AS (
  SELECT doc_id, text,
    list_filter(string_split(text, chr(10)), x -> trim(x) != '') AS lines,
    list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != '') AS sents,
    len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x != '')) AS n_tok
  FROM documents
)
SELECT doc_id,
  CAST(len(lines) AS INTEGER) AS n_lines,
  round(CASE WHEN len(lines) > 0 THEN
    len(list_filter(lines, x -> right(trim(x), 1) IN ('.', '!', '?', '"')))
      / CAST(len(lines) AS DOUBLE) END, 6) AS end_punct_frac,
  round(CASE WHEN len(lines) > 0 THEN
    len(list_filter(lines, x -> left(ltrim(x), 1) IN ('-', '*', '•')))
      / CAST(len(lines) AS DOUBLE) END, 6) AS bullet_frac,
  round(CASE WHEN len(lines) > 0 THEN n_tok / CAST(len(lines) AS DOUBLE) END, 6)
    AS mean_words_per_line,
  CAST(len(sents) AS INTEGER) AS n_sentences,
  contains(lower(text), 'lorem ipsum') AS has_lorem,
  contains(text, '{') AS has_curly,
  contains(lower(text), 'javascript') AS has_javascript,
  (len(sents) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
   AND NOT contains(text, '{') AND NOT contains(lower(text), 'javascript'))
    AS c4_keep
FROM lined
""",
    "C4/Gopher boilerplate flags: line punctuation/bullet fractions, "
    "sentence count, lorem/brace/javascript artifacts, document keep gate",
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import boilerplate_profile

    docs = read_table(spark, sf_dir, "documents")
    out = boilerplate_profile(docs, min_sentences=3)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("int").alias("n_lines"),
        F.round("end_punct_frac", 6).alias("end_punct_frac"),
        F.round("bullet_frac", 6).alias("bullet_frac"),
        F.round("mean_words_per_line", 6).alias("mean_words_per_line"),
        F.col("n_sentences").cast("int").alias("n_sentences"),
        "has_lorem",
        "has_curly",
        "has_javascript",
        "c4_keep",
    )


# --------------------------------------------------------------------------
# C-ext. Paragraph-level (unit) dedup (functions/dedup.py::unit_dedup)
# --------------------------------------------------------------------------

_UNIT_K = 10


@register(
    "dedup_paragraph",
    f"""
WITH
{_DOCS_TOK_CTE},
units AS (
  SELECT doc_id, g.i AS idx,
    array_to_string(toks[g.i * {_UNIT_K} + 1 : g.i * {_UNIT_K} + {_UNIT_K}], ' ') AS unit
  FROM tok
  CROSS JOIN generate_series(0, 4999) AS g(i)
  WHERE g.i < ceil(len(toks) / CAST({_UNIT_K} AS DOUBLE))
),
marked AS (
  SELECT doc_id, idx, unit,
    row_number() OVER (PARTITION BY md5(unit) ORDER BY doc_id, idx) = 1 AS is_first
  FROM units
),
per_doc AS (
  SELECT doc_id,
    count(*) AS n_units,
    sum(CASE WHEN is_first THEN 0 ELSE 1 END) AS n_dup,
    coalesce(string_agg(unit, ' ' ORDER BY idx) FILTER (WHERE is_first), '')
      AS text_deduped
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(p.n_units, 0) AS INTEGER) AS n_units,
  CAST(coalesce(p.n_dup, 0) AS INTEGER) AS n_dup_units,
  round(CASE WHEN p.n_units > 0 THEN p.n_dup / CAST(p.n_units AS DOUBLE) END, 6)
    AS dup_unit_frac,
  md5(p.text_deduped) AS dedup_md5
FROM docs d LEFT JOIN per_doc p USING (doc_id)
""",
    f"Paragraph-level exact dedup over {_UNIT_K}-token units: per-doc "
    "duplicated-unit fraction and the fingerprint of the deduped text "
    "(C4-style span dedup, splitter-agnostic)",
)
def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.dedup import unit_dedup

    docs = read_table(spark, sf_dir, "documents")
    out = unit_dedup(docs, unit_tokens=_UNIT_K)
    return out.select(
        "doc_id",
        "n_units",
        "n_dup_units",
        F.round("dup_unit_frac", 6).alias("dup_unit_frac"),
        F.md5("text_deduped").alias("dedup_md5"),
    )


# --------------------------------------------------------------------------
# C-ext. Unigram-LM scoring (functions/text.py::unigram_logprob)
# --------------------------------------------------------------------------

_LM_K = 0.5


@register(
    "unigram_logprob",
    f"""
WITH
{_DOCS_TOK_CTE},
ex AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
model AS (SELECT tok, count(*) AS c FROM ex GROUP BY tok),
totals AS (SELECT CAST(sum(c) AS DOUBLE) AS N, CAST(count(*) AS DOUBLE) AS V FROM model),
scored AS (
  SELECT e.doc_id, ln((m.c + {_LM_K}) / (t.N + {_LM_K} * t.V)) AS lp
  FROM ex e JOIN model m USING (tok) CROSS JOIN totals t
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens, avg(lp) AS mean_logprob
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(p.n_tokens, 0) AS n_tokens,
  round(p.mean_logprob, 6) AS mean_logprob,
  round(exp(-p.mean_logprob), 6) AS ppl
FROM docs d LEFT JOIN per_doc p USING (doc_id)
""",
    "Per-document mean log-probability and perplexity under the corpus's "
    "add-k unigram model (CCNet-style LM quality signal)",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import unigram_logprob

    docs = read_table(spark, sf_dir, "documents")
    out = unigram_logprob(docs, smoothing_k=_LM_K)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("mean_logprob", 6).alias("mean_logprob"),
        F.round("ppl", 6).alias("ppl"),
    )


# --------------------------------------------------------------------------
# C-ext. Sequential bootstrap (operators/bootstrap.py, AFML 4.5.3)
# --------------------------------------------------------------------------

_SB_DRAWS = 64
_SB_EVERY = 20  # every 20th trade becomes an event


@register(
    "sequential_bootstrap",
    f"""
WITH RECURSIVE
trades AS ({TRADES_CTE}),
ev AS (
  SELECT symbol, ts_event AS t0, ts_event + INTERVAL 1 DAY AS t1,
    row_number() OVER (PARTITION BY symbol ORDER BY ts_event, seq) - 1 AS i
  FROM trades WHERE seq % {_SB_EVERY} = 0
),
endsrel AS (
  SELECT a.symbol, a.i, count(*) - 1 AS e
  FROM ev a JOIN ev b ON a.symbol = b.symbol AND b.t0 <= a.t1
  GROUP BY a.symbol, a.i
),
per_sym AS (
  SELECT e.symbol,
    list(e.t0 ORDER BY e.i) AS t0s,
    list(r.e ORDER BY e.i) AS ends,
    CAST(count(*) AS INT) AS n
  FROM ev e JOIN endsrel r ON e.symbol = r.symbol AND e.i = r.i
  GROUP BY e.symbol
),
rec AS (
  SELECT symbol, 0 AS d, CAST(NULL AS INT) AS pick,
         list_transform(t0s, x -> 0) AS counts
  FROM per_sym
  UNION ALL
  SELECT symbol, d, pick,
    list_transform(counts, (c, j) -> CASE WHEN j - 1 BETWEEN pick AND ends[pick + 1]
                                          THEN c + 1 ELSE c END) AS counts
  FROM (
    SELECT q.symbol, q.d, q.counts, q.ends,
      CAST(list_position(q.keys, list_max(q.keys)) - 1 AS INT) AS pick
    FROM (
      SELECT r.symbol, r.d + 1 AS d, r.counts, p.ends,
        list_transform(range(p.n), i ->
          ln((CAST(('0x' || substr(md5(r.symbol || '|' || (r.d + 1) || '|' || i), 1, 15)) AS BIGINT) + 0.5)
             / 1152921504606846976.0)
          / (list_sum(list_transform(r.counts[i + 1 : p.ends[i + 1] + 1], c -> 1.0 / (1 + c)))
             / (p.ends[i + 1] - i + 1))
        ) AS keys
      FROM rec r JOIN per_sym p USING (symbol)
      WHERE r.d < {_SB_DRAWS}
    ) q
  ) z
)
SELECT r.symbol, r.d AS draw, r.pick AS event_idx, p.t0s[r.pick + 1] AS t0
FROM rec r JOIN per_sym p USING (symbol)
WHERE r.d >= 1
""",
    f"Sequential bootstrap of {_SB_DRAWS} draws per symbol over 1-day-barrier "
    "events (every 20th trade): uniqueness-proportional A-Res draws with the "
    "portable md5 hash, replayed exactly by a recursive-CTE oracle (AFML 4.5.3)",
)
def q_sequential_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.bootstrap import sequential_bootstrap

    with _trades_config():
        tr = trades_from_events(spark, sf_dir)
    ev = tr.filter(F.col(SEQ_COL) % _SB_EVERY == 0).select(
        "symbol",
        F.col("ts_event").alias("t0"),
        (F.col("ts_event") + F.expr("INTERVAL 1 DAY")).alias("t1"),
        SEQ_COL,
    )
    return sequential_bootstrap(ev, n_draws=_SB_DRAWS)


# --------------------------------------------------------------------------
# C-ext. IVF-PQ (functions/similarity.py::ivf_pq_topk)
# --------------------------------------------------------------------------

_PQ_M, _PQ_CODES, _PQ_DS, _PQ_ITERS = 4, 8, 16, 2


def _pq_iter_sql(i: int) -> str:
    prev = f"pcent{i - 1}"
    return f"""
pasg{i} AS (
  SELECT rid, m, ssv, j FROM (
    SELECT s.rid, s.m, s.ssv, ce.j,
      row_number() OVER (PARTITION BY s.rid, s.m ORDER BY
        list_sum([(s.ssv[kk+1] - ce.cv[kk+1]) * (s.ssv[kk+1] - ce.cv[kk+1])
                  for kk in range(0, {_PQ_DS})]) ASC, ce.j) AS rn
    FROM psamp s JOIN {prev} ce ON ce.m = s.m
  ) WHERE rn = 1
),
pdm{i} AS (
  SELECT m, j, dim, avg(val) AS mv
  FROM (SELECT m, j, unnest(ssv) AS val, generate_subscripts(ssv, 1) AS dim FROM pasg{i})
  GROUP BY m, j, dim
),
pcm{i} AS (SELECT m, j, list(mv ORDER BY dim) AS mvec FROM pdm{i} GROUP BY m, j),
pcent{i} AS (
  SELECT ce.m, ce.j, CASE WHEN cm.j IS NULL THEN ce.cv
                          ELSE [round(x, {_KM_RD}) for x in cm.mvec] END AS cv
  FROM {prev} ce LEFT JOIN pcm{i} cm ON cm.m = ce.m AND cm.j = ce.j
)"""


@register(
    "similarity_topk_ivf_pq",
    f"""
WITH
{_EMB_CTE},
cn AS (
  SELECT vec_id, v,
    CASE WHEN sqrt(list_sum([x * x for x in v])) = 0 THEN v
         ELSE [x / sqrt(list_sum([y * y for y in v])) for x in v] END AS vn
  FROM c
),
psamp AS (
  SELECT rid, mm.m, vn[mm.m * {_PQ_DS} + 1 : mm.m * {_PQ_DS} + {_PQ_DS}] AS ssv
  FROM (SELECT vn, row_number() OVER (ORDER BY vec_id) AS rid
        FROM (SELECT * FROM cn ORDER BY vec_id LIMIT {_KM_SAMPLE})) s
  CROSS JOIN generate_series(0, {_PQ_M - 1}) AS mm(m)
),
pcent0 AS (
  SELECT m, CAST(rid - 1 AS INTEGER) AS j, [round(x, {_KM_RD}) for x in ssv] AS cv
  FROM psamp WHERE rid <= {_PQ_CODES}
),
{','.join(_pq_iter_sql(i) for i in range(1, _PQ_ITERS + 1))},
pbook AS (SELECT m, j, cv FROM pcent{_PQ_ITERS}),
cent AS (
  SELECT v AS cvv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS jc
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_CELLS})
),
cell_sims AS (
  SELECT c.vec_id, c.v AS v, cn.vn, cent.jc,
    list_sum([cvv[i+1] * c.v[i+1] for i in range(0, len(c.v))])
      / (sqrt(list_sum([x * x for x in cvv])) * sqrt(list_sum([x * x for x in c.v]))) AS csim
  FROM c JOIN cn ON c.vec_id = cn.vec_id CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, vn, jc AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, jc) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
code_d2 AS (
  SELECT a.vec_id, a.cell, b.m, b.j,
    list_sum([(a.vn[b.m * {_PQ_DS} + kk + 1] - b.cv[kk + 1])
              * (a.vn[b.m * {_PQ_DS} + kk + 1] - b.cv[kk + 1])
              for kk in range(0, {_PQ_DS})]) AS d2
  FROM assigned a CROSS JOIN pbook b
),
codes AS (
  SELECT vec_id, cell, m, j AS code
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, j) AS rn
        FROM code_d2)
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, vn AS qn, jc AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, jc) AS rn
        FROM cell_sims WHERE vec_id < {_N_QUERIES})
  WHERE rn <= {_NPROBE}
),
contrib AS (
  SELECT p.query_id, co.vec_id, co.m,
    list_sum([p.qn[co.m * {_PQ_DS} + kk + 1] * b.cv[kk + 1]
              for kk in range(0, {_PQ_DS})]) AS part
  FROM probes p
  JOIN codes co ON co.cell = p.cell
  JOIN pbook b ON b.m = co.m AND b.j = co.code
  WHERE co.vec_id <> p.query_id
),
scores AS (
  SELECT query_id, vec_id, round(sum(part), 6) AS pq_score
  FROM contrib GROUP BY query_id, vec_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY pq_score DESC, vec_id) AS INTEGER) AS rank
  FROM scores
)
SELECT query_id, rank, vec_id, pq_score FROM ranked WHERE rank <= {_TOPK}
""",
    f"IVF-PQ approximate top-{_TOPK}: lowest-id coarse cells + "
    f"{_PQ_M}x{_PQ_CODES}-code product quantization (per-iteration-rounded "
    "L2 Lloyd per subspace, LUT scoring) — the byte-payload ANN scale path",
)
def q_similarity_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.similarity import ivf_pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    return ivf_pq_topk(
        emb,
        queries,
        k=_TOPK,
        n_cells=_N_CELLS,
        nprobe=_NPROBE,
        m_sub=_PQ_M,
        n_codes=_PQ_CODES,
    )


# --------------------------------------------------------------------------
# C-ext. Training-mixture sampling (functions/corpus.py::mix_corpus)
# --------------------------------------------------------------------------

_MIX_TARGET = 12_000
_MIX_WEIGHTS = {"src0": 0.70, "src1": 0.10, "src2": 0.10, "src3": 0.10}


def _mix_oracle() -> str:
    total_w = sum(_MIX_WEIGHTS.values())
    wcase = " ".join(
        f"WHEN '{s}' THEN CAST({w / total_w!r} AS DOUBLE)"
        for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"""
WITH
{_DOCS_TOK_CTE},
avail AS (
  SELECT source, CAST(sum(len(toks)) AS DOUBLE) AS av,
    CASE source {wcase} END AS w
  FROM tok GROUP BY source
),
rates AS (
  SELECT source, least(4.0, w * {_MIX_TARGET} / av) AS mix_rate
  FROM avail WHERE w IS NOT NULL
),
drawn AS (
  SELECT d.doc_id, d.source, r.mix_rate,
    CAST(floor(r.mix_rate) AS INTEGER)
      + CASE WHEN CAST(('0x' || substr(md5('pts-mix' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 1073741824 / 1073741824.0
                < r.mix_rate - floor(r.mix_rate) THEN 1 ELSE 0 END AS n
  FROM docs d JOIN rates r USING (source)
)
SELECT doc_id, source, round(mix_rate, 6) AS mix_rate, g.e AS epoch
FROM drawn
JOIN generate_series(0, 7) AS g(e) ON g.e < n
WHERE n > 0
""",


@register(
    "mix_corpus",
    _mix_oracle()[0],
    "Static domain mixing: per-source sample/oversample rates hitting a "
    "40k-token budget at pinned weights, deterministic salted-hash draws "
    "with epoch expansion",
)
def q_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import mix_corpus

    docs = read_table(spark, sf_dir, "documents")
    out = mix_corpus(docs, weights=_MIX_WEIGHTS, target_tokens=_MIX_TARGET)
    return out.select(
        "doc_id",
        "source",
        F.round("mix_rate", 6).alias("mix_rate"),
        "epoch",
    )


# --------------------------------------------------------------------------
# C-ext. Sequence packing (functions/corpus.py::pack_sequences)
# --------------------------------------------------------------------------

_PACK_BUDGET, _PACK_SHARDS = 512, 4


@register(
    "pack_sequences",
    f"""
WITH RECURSIVE
pdocs AS (
  SELECT doc_id,
    len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x != '')) AS n_tok,
    CAST(('0x' || substr(md5('pts-pack' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM documents
),
sharded AS (
  SELECT doc_id, n_tok, h, CAST(h % {_PACK_SHARDS} AS INTEGER) AS shard,
    row_number() OVER (PARTITION BY h % {_PACK_SHARDS} ORDER BY h, doc_id) - 1 AS idx
  FROM pdocs
),
pre AS (
  SELECT *,
    sum(n_tok) OVER (PARTITION BY shard ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_end,
    sum(n_tok) OVER (PARTITION BY shard ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS c_start
  FROM sharded
),
nmax AS (SELECT shard, count(*) AS n FROM pre GROUP BY shard),
rec AS (
  SELECT shard, 0 AS s, 0 AS b FROM nmax
  UNION ALL
  SELECT r.shard,
    CAST(greatest(r.s + 1,
      coalesce((SELECT min(p.idx) FROM pre p
                WHERE p.shard = r.shard AND p.idx >= r.s
                  AND p.c_end - coalesce((SELECT p2.c_end FROM pre p2
                                          WHERE p2.shard = r.shard AND p2.idx = r.s - 1), 0)
                      > {_PACK_BUDGET}),
               (SELECT n FROM nmax WHERE nmax.shard = r.shard))) AS INTEGER) AS s,
    r.b + 1 AS b
  FROM rec r
  WHERE r.s < (SELECT n FROM nmax WHERE nmax.shard = r.shard)
),
assign AS (
  SELECT p.shard, p.doc_id, p.idx, p.n_tok, p.c_start,
    (SELECT max(r.b) FROM rec r WHERE r.shard = p.shard AND r.s <= p.idx) AS seq_id,
    (SELECT max(r.s) FROM rec r WHERE r.shard = p.shard AND r.s <= p.idx) AS bstart
  FROM pre p
)
SELECT a.doc_id, a.shard,
  CAST(a.seq_id AS INTEGER) AS seq_id,
  -- CAST: DuckDB window sums of integers are HUGEINT; an uncast HUGEINT
  -- output column survives fetchall() (python int) but turns float64
  -- under a pandas-based fetch, which stringifies 100 as "100.0" and
  -- broke the driver's string-keyed value hash (round-5 red row).
  -- This was the ONLY oracle in the registry emitting HUGEINT.
  CAST(a.c_start - p2.c_start AS BIGINT) AS seq_offset,
  CAST(a.n_tok AS INTEGER) AS n_tokens
FROM assign a
JOIN pre p2 ON p2.shard = a.shard AND p2.idx = a.bstart
""",
    f"Greedy {_PACK_BUDGET}-token sequence packing after a deterministic "
    f"salted-hash shuffle, {_PACK_SHARDS} parallel shards (T5-style "
    "pre-tokenization packing), replayed by a recursive-CTE oracle",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import pack_sequences

    docs = read_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget_tokens=_PACK_BUDGET, n_shards=_PACK_SHARDS)


# --------------------------------------------------------------------------
# C-ext. Rolling pairwise correlation (operators/cross_section.py)
# --------------------------------------------------------------------------


@register(
    "pair_correlation",
    f"""
WITH
{_FEATURE_BARS_CTE},
r2 AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS r
  FROM bars
),
r3 AS (SELECT symbol, ts, r FROM r2 WHERE r IS NOT NULL),
pairs AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.ts, a.r AS ra, b.r AS rb
  FROM r3 a JOIN r3 b ON a.ts = b.ts AND a.symbol < b.symbol
),
rolled AS (
  SELECT sym_a, sym_b, ts,
    count(ra) OVER w AS n,
    sum(ra) OVER w AS sa, sum(rb) OVER w AS sb,
    sum(ra * rb) OVER w AS sab,
    sum(ra * ra) OVER w AS saa, sum(rb * rb) OVER w AS sbb
  FROM pairs
  WINDOW w AS (PARTITION BY sym_a, sym_b ORDER BY ts
               ROWS BETWEEN {_VOL_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT sym_a, sym_b, ts AS ts_event,
  round(CASE WHEN n = {_VOL_WINDOW} AND n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
        THEN (n * sab - sa * sb) / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)) END, 6)
    AS corr
FROM rolled
""",
    f"Rolling {_VOL_WINDOW}-bar return correlation for every unordered "
    "symbol pair (covariance-matrix input for portfolio construction)",
)
def q_pair_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import rolling_pair_correlation

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = rolling_pair_correlation(bars, window=_VOL_WINDOW, ts_col="ts_event")
    return out.select("sym_a", "sym_b", "ts_event", F.round("corr", 6).alias("corr"))


@register(
    "drawdown_path",
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
path2 AS (
  SELECT symbol, ts, ret, cum,
    cum - max(greatest(cum, 0.0)) OVER w AS dd
  FROM path
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
path3 AS (
  SELECT symbol, ts, cum, dd,
    sum(CASE WHEN dd >= 0 THEN 1 ELSE 0 END) OVER w AS hwm
  FROM path2
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts AS ts_event,
  round(cum, 6) AS cum_return,
  round(1 - exp(dd), 6) AS drawdown,
  CAST(CASE WHEN dd >= 0 THEN 0
       ELSE row_number() OVER (PARTITION BY symbol, hwm ORDER BY ts)
            - CASE WHEN hwm > 0 THEN 1 ELSE 0 END END AS BIGINT) AS underwater
FROM path3
""",
    "Per-row drawdown diagnostics: cumulative log return, fractional "
    "drawdown from the running peak, consecutive underwater periods",
)
def q_drawdown_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.backtest import drawdown_path

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = drawdown_path(bars, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        F.round("cum_return", 6).alias("cum_return"),
        F.round("drawdown", 6).alias("drawdown"),
        "underwater",
    )


# --------------------------------------------------------------------------
# C-ext. Range bars (operators/bars.py::range_bars) — price-clock bars;
# the reset-on-breach recursion replayed as a recursive CTE.
# --------------------------------------------------------------------------

_RANGE_D = 25.0


@register(
    "range_bars",
    f"""
WITH RECURSIVE trades AS ({TRADES_CTE}),
t AS (
  SELECT symbol, CAST(ts_event AS DATE) AS d, ts_event, seq, price, size,
    row_number() OVER (PARTITION BY symbol, CAST(ts_event AS DATE)
                       ORDER BY ts_event, seq) AS rn
  FROM trades
),
rec(symbol, d, rn, bar_id, open_out, gid_next) AS (
  SELECT symbol, d, rn, CAST(0 AS BIGINT), price, CAST(0 AS BIGINT)
  FROM t WHERE rn = 1
  UNION ALL
  SELECT x.symbol, x.d, x.rn, x.gid,
    CASE WHEN abs(x.price - x.o) >= {_RANGE_D!r} THEN CAST(NULL AS DOUBLE) ELSE x.o END,
    CASE WHEN abs(x.price - x.o) >= {_RANGE_D!r} THEN x.gid + 1 ELSE x.gid END
  FROM (
    SELECT tt.symbol, tt.d, tt.rn, tt.price, r.gid_next AS gid,
      coalesce(r.open_out, tt.price) AS o
    FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.d = r.d AND tt.rn = r.rn + 1
  ) x
),
assigned AS (
  SELECT r.symbol, r.d, r.bar_id, tt.ts_event, tt.seq, tt.price, tt.size
  FROM rec r JOIN t tt ON tt.symbol = r.symbol AND tt.d = r.d AND tt.rn = r.rn
)
SELECT symbol,
    {_OHLCV_ORACLE}
FROM assigned
GROUP BY symbol, d, bar_id
""",
    f"Range bars (price clock, {_RANGE_D} move from bar open closes the "
    "bar): chunked numpy scan vs sequential recursive-CTE oracle",
)
def q_range_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.bars import range_bars

    with _trades_config():
        out = range_bars(trades_from_events(spark, sf_dir), _RANGE_D)
    return _round_vwap(out)


# --------------------------------------------------------------------------
# C-ext. TF-IDF cosine pairs (functions/tfidf.py::tfidf_cosine_pairs)
# --------------------------------------------------------------------------

_TC_THRESH, _TC_MAXDF = 0.5, 0.5


@register(
    "tfidf_cosine_pairs",
    f"""
WITH
{_DOCS_TOK_CTE},
tf AS (
  SELECT doc_id, t.tok AS token, count(*) AS tf
  FROM tok, unnest(toks) AS t(tok)
  GROUP BY doc_id, t.tok
),
dfreq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY token),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM docs),
w AS (
  SELECT tf.doc_id, tf.token,
    tf.tf * (ln((nn.N + 1) / (dfreq.doc_freq + 1)) + 1.0) AS w
  FROM tf JOIN dfreq USING (token) CROSS JOIN nn
  WHERE dfreq.doc_freq <= nn.N * {_TC_MAXDF!r}
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, cosine_sim FROM (
  SELECT d.doc_a, d.doc_b,
    round(d.dot / (na.nrm * nb.nrm), 6) AS cosine_sim
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b
) WHERE cosine_sim >= {_TC_THRESH!r}
""",
    f"TF-IDF cosine document pairs >= {_TC_THRESH} over shared-term sparse "
    f"postings (max-df {_TC_MAXDF} cut; smoothed IDF)",
)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import tfidf_cosine_pairs

    docs = read_table(spark, sf_dir, "documents")
    out = tfidf_cosine_pairs(docs, threshold=_TC_THRESH, max_doc_freq_frac=_TC_MAXDF)
    return out.select("doc_a", "doc_b", F.round("cosine_sim", 6).alias("cosine_sim"))


# --------------------------------------------------------------------------
# C-ext. Roll-gap adjustment (operators/roll.py::roll_adjust) — AFML 2.4
# futures-roll / ETF-trick splice; weekly first-tick boundaries derived
# from the data itself so the query is self-contained.
# --------------------------------------------------------------------------


@register(
    "roll_adjust",
    f"""
WITH trades AS ({TRADES_CTE}),
b AS (
  SELECT symbol, min(ts_event) AS ts_event
  FROM trades GROUP BY symbol, date_trunc('week', ts_event)
),
u AS (
  SELECT symbol, ts_event, CAST(NULL AS DOUBLE) AS price,
         CAST(-1 AS BIGINT) AS seq, 0 AS kind FROM b
  UNION ALL
  SELECT symbol, ts_event, price, seq, 1 AS kind FROM trades
),
f AS (
  SELECT *,
    last_value(price IGNORE NULLS) OVER (
      PARTITION BY symbol ORDER BY ts_event, kind, seq
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_p,
    first_value(price IGNORE NULLS) OVER (
      PARTITION BY symbol ORDER BY ts_event, kind, seq
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
  FROM u
),
g AS (
  SELECT *, CASE WHEN kind = 0 AND prev_p IS NOT NULL AND next_p IS NOT NULL
                 THEN next_p - prev_p ELSE 0.0 END AS gap
  FROM f
),
c AS (
  SELECT *,
    sum(gap) OVER (PARTITION BY symbol ORDER BY ts_event, kind, seq
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cg
  FROM g
),
c2 AS (
  SELECT *, last_value(cg) OVER (PARTITION BY symbol ORDER BY ts_event, kind, seq
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tg
  FROM c
)
SELECT symbol, ts_event, price, round(price + (tg - cg), 6) + 0 AS adj_price
FROM c2 WHERE kind = 1
""",
    "Roll-gap backward adjustment (AFML 2.4): weekly first-tick "
    "boundaries, gap = flanking-price jump, latest segment unadjusted",
)
def q_roll_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.roll import roll_adjust

    with _trades_config():
        t = trades_from_events(spark, sf_dir)
        pts = t.groupBy(
            "symbol", F.date_trunc("week", "ts_event").alias("__wk")
        ).agg(F.min("ts_event").alias("roll_ts")).drop("__wk")
        out = roll_adjust(t, pts, method="backward")
    # ``+ 0`` folds IEEE -0.0 (an adjustment that exactly cancels the
    # price) to +0.0 on both engines — string-keyed row sorts distinguish
    # the two and misalign the driver compare otherwise.
    return out.select(
        "symbol",
        "ts_event",
        "price",
        (F.round("adj_price", 6) + F.lit(0.0)).alias("adj_price"),
    )


# --------------------------------------------------------------------------
# C-ext. O-U / AR(1) mean-reversion fit (operators/mean_reversion.py)
# --------------------------------------------------------------------------


@register(
    "ou_fit",
    f"""
WITH trades AS ({TRADES_CTE}),
p AS (
  SELECT symbol, ln(price) AS y,
    lag(ln(price)) OVER (PARTITION BY symbol ORDER BY ts_event, seq) AS x
  FROM trades
),
s AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n_obs,
    sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy,
    sum(x*y) AS sxy
  FROM p WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY symbol
),
fit AS (
  SELECT symbol, n_obs,
    CASE WHEN n_obs >= 3 AND n_obs*sxx - sx*sx > 0
         THEN (n_obs*sxy - sx*sy) / (n_obs*sxx - sx*sx) END AS phi,
    sx, sy, sxx, syy, sxy
  FROM s
),
ab AS (
  SELECT *, CASE WHEN phi IS NOT NULL THEN (sy - phi*sx) / n_obs END AS a
  FROM fit
),
sig AS (
  SELECT *,
    CASE WHEN phi IS NOT NULL AND n_obs >= 3 THEN
      sqrt(greatest(syy + n_obs*a*a + phi*phi*sxx - 2*a*sy - 2*phi*sxy
                    + 2*a*phi*sx, 0.0) / (n_obs - 2)) END AS sigma
  FROM ab
)
SELECT symbol, n_obs,
  round(phi, 6) AS phi,
  round(CASE WHEN phi IS NOT NULL AND phi <> 1.0 THEN a / (1 - phi) END, 6) AS mu,
  round(CASE WHEN phi > 0 AND phi < 1 THEN -ln(2.0) / ln(phi) END, 6) AS half_life,
  round(sigma, 6) AS sigma,
  round(CASE WHEN phi > 0 AND phi < 1 THEN sigma / sqrt(1 - phi*phi) END, 6)
    AS sigma_eq
FROM sig
""",
    "Per-symbol AR(1)/O-U fit on log tick prices: phi, equilibrium mu, "
    "half-life, residual and stationary sigma — one lag window + one "
    "hash aggregate",
)
def q_ou_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.mean_reversion import ou_fit

    t = trades_from_events(spark, sf_dir)
    out = ou_fit(t, ts_col="ts_event", close_col="price")
    return out.select(
        "symbol",
        "n_obs",
        F.round("phi", 6).alias("phi"),
        F.round("mu", 6).alias("mu"),
        F.round("half_life", 6).alias("half_life"),
        F.round("sigma", 6).alias("sigma"),
        F.round("sigma_eq", 6).alias("sigma_eq"),
    )


# --------------------------------------------------------------------------
# C-ext. Cross-doc duplicated spans (functions/dedup.py::
# duplicated_span_stats) — the exact-substring-dedup approximation.
# --------------------------------------------------------------------------

_DSP_N = 8


def _sql_positional_shingles(n: int) -> str:
    """DuckDB twin of ``dedup.positional_shingle_hashes``: (doc_id, pos,
    h) rows, pos 0-based, duplicates kept.  Expects the ``tok`` CTE."""
    combined = "hs[i+1]"
    for j in range(2, n + 1):
        combined = f"(({combined}) * 31 + hs[i+{j}]) % {MERSENNE31}"
    return f"""hs AS (
  SELECT doc_id, [{_sql_hash60("t")} % {MERSENNE31} for t in toks] AS hs FROM tok
),
ps AS (
  SELECT doc_id, u.pos AS pos, u.h AS h
  FROM (SELECT doc_id,
          unnest([{{'pos': i, 'h': {combined}}}
                  for i in range(0, len(hs) - {n - 1})]) AS u
        FROM hs)
)"""


@register(
    "dup_spans",
    f"""
WITH
{_DOCS_TOK_CTE},
{_sql_positional_shingles(_DSP_N)},
dup AS (SELECT h FROM ps GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
lagged AS (
  SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM (SELECT ps.doc_id, ps.pos FROM ps JOIN dup USING (h))
),
cov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_shingles,
    CAST(sum(CASE WHEN prev IS NULL THEN {_DSP_N}
             ELSE least({_DSP_N}, pos - prev) END) AS BIGINT) AS dup_token_cov
  FROM lagged GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok)
SELECT t.doc_id, t.n_tokens,
  CAST(greatest(t.n_tokens - {_DSP_N - 1}, 0) AS BIGINT) AS n_shingles,
  coalesce(c.dup_shingles, CAST(0 AS BIGINT)) AS dup_shingles,
  coalesce(c.dup_token_cov, CAST(0 AS BIGINT)) AS dup_token_cov,
  round(CASE WHEN t.n_tokens > 0
        THEN coalesce(c.dup_token_cov, 0) / CAST(t.n_tokens AS DOUBLE)
        ELSE 0.0 END, 6) AS dup_frac,
  (CASE WHEN t.n_tokens > 0
   THEN coalesce(c.dup_token_cov, 0) / CAST(t.n_tokens AS DOUBLE)
   ELSE 0.0 END) <= 0.5 AS keep
FROM tot t LEFT JOIN cov c USING (doc_id)
""",
    f"Cross-doc duplicated {_DSP_N}-gram spans (exact-substring-dedup "
    "approximation): per-doc duplicated shingle count and exact "
    "union-of-spans token coverage",
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.dedup import duplicated_span_stats

    docs = read_table(spark, sf_dir, "documents")
    out = duplicated_span_stats(docs, ngram=_DSP_N, min_docs=2, max_dup_frac=0.5)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_shingles",
        "dup_shingles",
        "dup_token_cov",
        F.round("dup_frac", 6).alias("dup_frac"),
        "keep",
    )


# --------------------------------------------------------------------------
# C-ext. SemDeDup (functions/similarity.py::semdedup) — cluster-scoped
# embedding dedup; lowest-id centroids so the oracle replays assignment
# exactly (the kmeans training path is already gated by
# similarity_topk_ivf_kmeans).
# --------------------------------------------------------------------------

_SD_EPS = 0.95


@register(
    "semdedup",
    f"""
WITH
{_EMB_CTE},
cent AS (
  SELECT v AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_CELLS})
),
cell_sims AS (
  SELECT c.vec_id, c.v, cent.j,
         list_sum([cv[i+1] * v[i+1] for i in range(0, len(v))])
           / (sqrt(list_sum([x * x for x in cv])) * {_NORM_V}) AS csim
  FROM c CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS vid, b.vec_id AS bid,
         round(list_sum([a.v[i+1] * b.v[i+1] for i in range(0, len(a.v))])
               / (sqrt(list_sum([x * x for x in a.v]))
                  * sqrt(list_sum([y * y for y in b.v]))), 6) AS sim
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND b.vec_id < a.vec_id
),
best AS (
  SELECT vid, bid, sim
  FROM (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY sim DESC, bid) AS rn
        FROM pairs WHERE sim >= {_SD_EPS!r})
  WHERE rn = 1
)
SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell, b.bid AS dup_of,
       b.sim AS dup_sim, b.bid IS NULL AS keep
FROM assigned a LEFT JOIN best b ON b.vid = a.vec_id
""",
    f"SemDeDup: coarse-quantizer cells (8 lowest-id centroids), within-"
    f"cell cosine >= {_SD_EPS} to a lower id marks a duplicate",
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    out = sim_ops.semdedup(
        emb, n_cells=_N_CELLS, threshold=_SD_EPS, centroid_method="lowest_id"
    )
    return out


# --------------------------------------------------------------------------
# C-ext. BPE pair statistics (functions/text.py::bpe_pair_counts) — the
# tokenizer-training merge-round count.
# --------------------------------------------------------------------------

_BPE_K = 50


@register(
    "bpe_pairs",
    f"""
WITH
{_DOCS_TOK_CTE},
words AS (SELECT unnest(toks) AS w FROM tok),
pairs AS (
  SELECT unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair
  FROM words WHERE len(w) >= 2
),
counts AS (SELECT pair, CAST(count(*) AS BIGINT) AS count FROM pairs GROUP BY pair)
SELECT pair, count,
       CAST(row_number() OVER (ORDER BY count DESC, pair) AS INTEGER) AS rank
FROM counts ORDER BY count DESC, pair LIMIT {_BPE_K}
""",
    f"Top-{_BPE_K} adjacent in-word character pairs (the BPE tokenizer "
    "merge-round statistic) with deterministic tie order",
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import bpe_pair_counts

    docs = read_table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, top_k=_BPE_K)


# --------------------------------------------------------------------------
# C-ext. Intraday seasonality profile (operators/seasonality.py)
# --------------------------------------------------------------------------


@register(
    "intraday_profile",
    f"""
WITH trades AS ({TRADES_CTE}),
t AS (
  SELECT symbol,
    CAST(floor((EXTRACT(hour FROM ts_event) * 60 + EXTRACT(minute FROM ts_event)) / 60.0)
         AS INTEGER) AS bucket,
    CAST(size AS DOUBLE) AS sz, price,
    abs(ln(price / lag(price) OVER (
      PARTITION BY symbol, CAST(ts_event AS DATE) ORDER BY ts_event, seq))) AS ar
  FROM trades
),
g AS (
  SELECT symbol, bucket, CAST(count(*) AS BIGINT) AS n_trades,
    sum(sz) AS volume, sum(sz * price) AS dv, avg(ar) AS mar
  FROM t GROUP BY symbol, bucket
)
SELECT symbol, bucket, n_trades, volume,
  round(dv / 1e6, 4) AS dollar_volume_mm,
  round(volume / sum(volume) OVER (PARTITION BY symbol), 6) AS volume_share,
  round(n_trades / sum(n_trades) OVER (PARTITION BY symbol), 6) AS trade_share,
  round(mar, 6) AS mean_abs_ret
FROM g
""",
    "Per-symbol hourly time-of-day profile: trade/volume shares and mean "
    "absolute tick return (returns computed within (symbol, date) "
    "islands)",
)
def q_intraday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.seasonality import intraday_profile

    with _trades_config():
        out = intraday_profile(trades_from_events(spark, sf_dir), bucket_minutes=60)
    return out.select(
        "symbol",
        "bucket",
        "n_trades",
        "volume",
        F.round(F.col("dollar_volume") / F.lit(1e6), 4).alias("dollar_volume_mm"),
        F.round("volume_share", 6).alias("volume_share"),
        F.round("trade_share", 6).alias("trade_share"),
        F.round("mean_abs_ret", 6).alias("mean_abs_ret"),
    )


# --------------------------------------------------------------------------
# C-ext. Engle-Granger cointegration screen (operators/mean_reversion.py::
# cointegration_fit) over the shared 15m bar frame.
# --------------------------------------------------------------------------


@register(
    "cointegration",
    f"""
WITH
{_FEATURE_BARS_CTE},
r AS (SELECT symbol, ts, ln(close) AS x FROM bars),
p AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.ts, a.x AS xa, b.x AS xb
  FROM r a JOIN r b ON a.ts = b.ts AND a.symbol < b.symbol
),
s1 AS (
  SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n_obs,
    sum(xa) AS sa, sum(xb) AS sb, sum(xb*xb) AS sbb, sum(xa*xb) AS sab
  FROM p GROUP BY sym_a, sym_b
),
cf AS (
  SELECT sym_a, sym_b, n_obs, sa, sb,
    CASE WHEN n_obs >= 3 AND n_obs*sbb - sb*sb > 0
         THEN (n_obs*sab - sa*sb) / (n_obs*sbb - sb*sb) END AS beta
  FROM s1
),
cf2 AS (
  SELECT sym_a, sym_b, n_obs, beta,
    CASE WHEN beta IS NOT NULL THEN (sa - beta*sb) / n_obs END AS alpha
  FROM cf
),
l AS (
  SELECT e.*, lag(e) OVER (PARTITION BY sym_a, sym_b ORDER BY ts) AS el
  FROM (
    SELECT p.sym_a, p.sym_b, c.n_obs, c.beta, c.alpha, p.ts,
           p.xa - c.alpha - c.beta * p.xb AS e
    FROM p JOIN cf2 c USING (sym_a, sym_b)
  ) e
),
s2 AS (
  SELECT sym_a, sym_b, n_obs, beta, alpha,
    sum(e) AS se_all, sum(e*e) AS se2_all, count(e) AS n_all,
    sum(CASE WHEN el IS NOT NULL THEN el END) AS sl,
    sum(CASE WHEN el IS NOT NULL THEN e END) AS sc,
    sum(CASE WHEN el IS NOT NULL THEN el*el END) AS sll,
    sum(CASE WHEN el IS NOT NULL THEN e*el END) AS scl,
    count(el) AS np
  FROM l GROUP BY sym_a, sym_b, n_obs, beta, alpha
)
SELECT sym_a, sym_b, n_obs, round(alpha, 6) AS alpha, round(beta, 6) AS beta,
  round(CASE WHEN n_all >= 2 THEN
    sqrt(greatest((se2_all - se_all*se_all/n_all) / (n_all - 1), 0.0)) END, 6)
    AS resid_std,
  round(CASE WHEN np >= 3 AND np*sll - sl*sl > 0
        THEN (np*scl - sc*sl) / (np*sll - sl*sl) END, 6) AS phi,
  round(CASE WHEN np >= 3 AND np*sll - sl*sl > 0
             AND (np*scl - sc*sl) / (np*sll - sl*sl) > 0
             AND (np*scl - sc*sl) / (np*sll - sl*sl) < 1
        THEN -ln(2.0) / ln((np*scl - sc*sl) / (np*sll - sl*sl)) END, 6)
    AS half_life
FROM s2
""",
    "Engle-Granger step-1 per symbol pair on 15m bars: hedge ratio, "
    "spread std, AR(1) phi of the spread and its half-life",
)
def q_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.mean_reversion import cointegration_fit

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = cointegration_fit(bars, ts_col="ts_event", close_col="close")
    return out.select(
        "sym_a",
        "sym_b",
        "n_obs",
        F.round("alpha", 6).alias("alpha"),
        F.round("beta", 6).alias("beta"),
        F.round("resid_std", 6).alias("resid_std"),
        F.round("phi", 6).alias("phi"),
        F.round("half_life", 6).alias("half_life"),
    )


# --------------------------------------------------------------------------
# C-ext. Pairs-trading spread z-score signal (operators/mean_reversion.py::
# spread_zscore_signal) — nests the cointegration fit; coefficients
# quantized to 1e-6 so the per-row spread surface is engine-identical.
# --------------------------------------------------------------------------

_SZ_W, _SZ_ENTRY = 50, 2.0


@register(
    "spread_signal",
    f"""
WITH
{_FEATURE_BARS_CTE},
r AS (SELECT symbol, ts, ln(close) AS x FROM bars),
p AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.ts, a.x AS xa, b.x AS xb
  FROM r a JOIN r b ON a.ts = b.ts AND a.symbol < b.symbol
),
s1 AS (
  SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n_obs,
    sum(xa) AS sa, sum(xb) AS sb, sum(xb*xb) AS sbb, sum(xa*xb) AS sab
  FROM p GROUP BY sym_a, sym_b
),
cf AS (
  SELECT sym_a, sym_b, n_obs, sa, sb,
    CASE WHEN n_obs >= 3 AND n_obs*sbb - sb*sb > 0
         THEN (n_obs*sab - sa*sb) / (n_obs*sbb - sb*sb) END AS beta
  FROM s1
),
cf2 AS (
  SELECT sym_a, sym_b,
    round(CASE WHEN beta IS NOT NULL THEN (sa - beta*sb) / n_obs END, 6) AS alpha,
    round(beta, 6) AS beta
  FROM cf
),
sp AS (
  SELECT p.sym_a, p.sym_b, p.ts, p.xa - c.alpha - c.beta * p.xb AS spread
  FROM p JOIN cf2 c USING (sym_a, sym_b)
),
zx AS (
  SELECT *,
    count(spread) OVER w AS n,
    sum(spread) OVER w AS s,
    sum(spread*spread) OVER w AS s2
  FROM sp
  WINDOW w AS (PARTITION BY sym_a, sym_b ORDER BY ts
               ROWS BETWEEN {_SZ_W - 1} PRECEDING AND CURRENT ROW)
),
zz AS (
  SELECT sym_a, sym_b, ts, spread,
    CASE WHEN n >= {_SZ_W} AND sqrt(greatest((s2 - s*s/n) / (n - 1), 0.0)) > 0
         THEN (spread - s/n) / sqrt(greatest((s2 - s*s/n) / (n - 1), 0.0)) END AS z
  FROM zx
),
ps AS (
  SELECT *,
    CASE WHEN z >= {_SZ_ENTRY!r} THEN -1.0
         WHEN z <= -{_SZ_ENTRY!r} THEN 1.0
         WHEN z IS NOT NULL THEN 0.0 END AS pos
  FROM zz
),
fin AS (
  SELECT sym_a, sym_b, ts, spread, z, pos,
    lag(pos) OVER (PARTITION BY sym_a, sym_b ORDER BY ts)
      * (spread - lag(spread) OVER (PARTITION BY sym_a, sym_b ORDER BY ts)) AS pnl
  FROM ps
)
SELECT sym_a, sym_b, ts, round(spread, 6) + 0 AS spread, round(z, 6) + 0 AS z,
       pos + 0 AS pos, round(pnl, 6) + 0 AS pnl
FROM fin
""",
    f"Pairs-trading spread z-score signal (rolling {_SZ_W}-bar z, entry "
    f"|z| >= {_SZ_ENTRY}) with one-bar-lagged P&L over every symbol pair",
)
def q_spread_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.mean_reversion import spread_zscore_signal

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = spread_zscore_signal(
        bars, entry_z=_SZ_ENTRY, window=_SZ_W, ts_col="ts_event", close_col="close"
    )
    # + 0.0 folds IEEE -0.0 to +0.0 (see roll_adjust): pos * dspread and
    # near-cancelling rounds produce signed zeros that string-keyed row
    # sorts would misalign.
    z0 = F.lit(0.0)
    return out.select(
        "sym_a",
        "sym_b",
        F.col("ts_event").alias("ts"),
        (F.round("spread", 6) + z0).alias("spread"),
        (F.round("z", 6) + z0).alias("z"),
        (F.col("pos") + z0).alias("pos"),
        (F.round("pnl", 6) + z0).alias("pnl"),
    )


# --------------------------------------------------------------------------
# C-ext. Ledoit-Wolf shrunk covariance (operators/covariance.py) — the
# sklearn-form identity-target shrinkage, computed pairwise.
# --------------------------------------------------------------------------


@register(
    "ledoit_wolf",
    f"""
WITH
{_FEATURE_BARS_CTE},
r0 AS (
  SELECT symbol AS s, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS r
  FROM bars
),
r1 AS (SELECT * FROM r0 WHERE r IS NOT NULL),
ns AS (SELECT count(DISTINCT s) AS nsym FROM r1),
r2 AS (
  SELECT r1.s, r1.ts, r1.r
  FROM r1
  JOIN (SELECT ts, count(DISTINCT s) AS c FROM r1 GROUP BY ts) t ON r1.ts = t.ts
  CROSS JOIN ns WHERE t.c = ns.nsym
),
x AS (SELECT s, ts, r - avg(r) OVER (PARTITION BY s) AS x FROM r2),
p AS (
  SELECT a.s AS sym_a, b.s AS sym_b, a.x * b.x AS prod
  FROM x a JOIN x b ON a.ts = b.ts AND a.s <= b.s
),
pp AS (
  SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n,
         sum(prod) AS sp, sum(prod * prod) AS q
  FROM p GROUP BY sym_a, sym_b
),
pp2 AS (SELECT *, sp / n AS sij FROM pp),
g AS (
  SELECT max(n) AS nn,
    sum(CASE WHEN sym_a = sym_b THEN sij END) AS tr,
    CAST(count(CASE WHEN sym_a = sym_b THEN 1 END) AS DOUBLE) AS pdim,
    sum((CASE WHEN sym_a = sym_b THEN 1.0 ELSE 2.0 END) * sij * sij) AS ss2,
    sum((CASE WHEN sym_a = sym_b THEN 1.0 ELSE 2.0 END) * q) AS sq
  FROM pp2
),
sc AS (
  SELECT nn, tr / pdim AS mu,
    (ss2 - 2 * (tr / pdim) * tr + pdim * (tr / pdim) * (tr / pdim)) / pdim AS d2,
    (sq / (CAST(nn AS DOUBLE) * nn) - ss2 / nn) / pdim AS b2raw
  FROM g
),
sc2 AS (
  SELECT mu,
    CASE WHEN nn >= 2 AND d2 > 0
         THEN least(greatest(b2raw, 0.0), d2) / d2 END AS shrinkage
  FROM sc
)
SELECT sym_a, sym_b, n AS n_obs,
  round(sij * 1e6, 6) AS cov_sample_ppm,
  round((CASE WHEN shrinkage IS NOT NULL
         THEN shrinkage * (CASE WHEN sym_a = sym_b THEN mu ELSE 0.0 END)
              + (1 - shrinkage) * sij
         ELSE sij END) * 1e6, 6) AS cov_shrunk_ppm,
  round(shrinkage, 6) AS shrinkage,
  round(mu * 1e6, 6) AS mu_ppm
FROM pp2 CROSS JOIN sc2
""",
    "Ledoit-Wolf identity-target shrunk covariance of 15m bar returns, "
    "pairwise (complete-case aligned, demeaned; sklearn formulas)",
)
def q_ledoit_wolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.covariance import ledoit_wolf_cov

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = ledoit_wolf_cov(bars, ts_col="ts_event", close_col="close")
    return out.select(
        "sym_a",
        "sym_b",
        "n_obs",
        F.round(F.col("cov_sample") * 1e6, 6).alias("cov_sample_ppm"),
        F.round(F.col("cov_shrunk") * 1e6, 6).alias("cov_shrunk_ppm"),
        F.round("shrinkage", 6).alias("shrinkage"),
        F.round(F.col("mu") * 1e6, 6).alias("mu_ppm"),
    )


# --------------------------------------------------------------------------
# C-ext. Execution layer (operators/execution.py): Almgren-Chriss optimal
# schedule and VWAP slippage report.
# --------------------------------------------------------------------------

_AC_N, _AC_LAMBDA, _AC_ETA, _AC_X = 13, 1e-6, 2.5e-6, 10_000.0


@register(
    "ac_schedule",
    f"""
WITH
{_FEATURE_BARS_CTE},
d AS (
  SELECT symbol,
    close - lag(close) OVER (PARTITION BY symbol ORDER BY ts) AS dc
  FROM bars
),
s AS (
  SELECT symbol, CAST(count(dc) AS BIGINT) AS n, sum(dc) AS sd, sum(dc*dc) AS sdd
  FROM d WHERE dc IS NOT NULL GROUP BY symbol
),
v AS (
  SELECT symbol,
    sqrt(greatest((n * sdd - sd * sd) / (CAST(n AS DOUBLE) * (n - 1)), 0.0)) AS sigma
  FROM s WHERE n >= 2
),
k AS (
  SELECT symbol, sigma,
    {_AC_LAMBDA!r} * sigma * sigma / {_AC_ETA!r} AS kt2
  FROM v
),
kk AS (
  SELECT symbol, sigma,
    CASE WHEN kt2 > 0 THEN ln(1 + kt2/2 + sqrt((1 + kt2/2)*(1 + kt2/2) - 1))
         ELSE 0.0 END AS kappa
  FROM k
),
sched AS (
  SELECT symbol, sigma, kappa, j.bucket
  FROM kk, (SELECT unnest(range(0, {_AC_N})) AS bucket) j
),
fr AS (
  SELECT *,
    CASE WHEN kappa > 0
      THEN ((exp(kappa*({_AC_N} - bucket)) - exp(-kappa*({_AC_N} - bucket)))/2)
           / ((exp(kappa*{_AC_N}.0) - exp(-kappa*{_AC_N}.0))/2)
      ELSE ({_AC_N} - bucket) / {_AC_N}.0 END AS frac,
    CASE WHEN kappa > 0
      THEN ((exp(kappa*({_AC_N} - bucket - 1)) - exp(-kappa*({_AC_N} - bucket - 1)))/2)
           / ((exp(kappa*{_AC_N}.0) - exp(-kappa*{_AC_N}.0))/2)
      ELSE ({_AC_N} - bucket - 1) / {_AC_N}.0 END AS frac_next
  FROM sched
)
SELECT symbol, CAST(bucket AS INTEGER) AS bucket,
  round(sigma, 6) AS sigma, round(kappa, 6) AS kappa,
  round({_AC_X!r} * frac, 6) AS x_remaining,
  round({_AC_X!r} * (frac - frac_next), 6) AS shares
FROM fr
""",
    f"Almgren-Chriss optimal liquidation schedule ({_AC_N} buckets) from "
    "per-symbol bar price-change volatility — closed-form sinh ratios",
)
def q_ac_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from polars_trading_spark.operators.execution import almgren_chriss_schedule

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    order = Window.partitionBy("symbol").orderBy("ts_event")
    d = bars.withColumn("__dc", F.col("close") - F.lag("close").over(order))
    vols = (
        d.where(F.col("__dc").isNotNull())
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__dc").alias("__sd"),
            F.sum(F.col("__dc") * F.col("__dc")).alias("__sdd"),
        )
        .where(F.col("__n") >= 2)
        .select(
            "symbol",
            F.sqrt(
                F.greatest(
                    (F.col("__n") * F.col("__sdd") - F.col("__sd") * F.col("__sd"))
                    / (F.col("__n").cast("double") * (F.col("__n") - 1)),
                    F.lit(0.0),
                )
            ).alias("sigma"),
        )
    )
    out = almgren_chriss_schedule(
        vols,
        n_buckets=_AC_N,
        total_shares=_AC_X,
        risk_aversion=_AC_LAMBDA,
        eta=_AC_ETA,
    )
    return out.select(
        "symbol",
        F.col("bucket").cast("int").alias("bucket"),
        F.round("sigma", 6).alias("sigma"),
        F.round("kappa", 6).alias("kappa"),
        F.round("x_remaining", 6).alias("x_remaining"),
        F.round("shares", 6).alias("shares"),
    )


@register(
    "vwap_slippage",
    f"""
WITH trades AS ({TRADES_CTE}),
b AS (
  SELECT symbol, price, CAST(size AS DOUBLE) AS sz, ts_event, seq,
    make_timestamp((epoch_us(ts_event) // {15 * 60 * 1_000_000}) * {15 * 60 * 1_000_000}) AS bucket
  FROM trades
),
-- Order-deterministic folds throughout: running (ts, seq)-ordered sums
-- read at the last row, so the fold order is identical on both engines
-- regardless of partition layout (unordered O(1e6)-magnitude float sums
-- flipped a round-to-6 knife edge in round 5).
r AS (
  SELECT *,
    sum(sz * price) OVER wrun AS rpv,
    sum(sz)         OVER wrun AS rv
  FROM b
  WINDOW wrun AS (PARTITION BY symbol, bucket ORDER BY ts_event, seq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
w AS (
  SELECT *, last_value(rpv) OVER wfull / last_value(rv) OVER wfull AS bench
  FROM r
  WINDOW wfull AS (PARTITION BY symbol, bucket ORDER BY ts_event, seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
sl AS (SELECT symbol, ts_event, seq, sz,
              (price - bench) / bench * 1e4 AS slip FROM w),
f AS (
  SELECT symbol,
    row_number() OVER word AS rn,
    count(*) OVER wall AS n,
    sum(slip * sz) OVER wrun AS rss,
    sum(sz)        OVER wrun AS rsv,
    max(slip) OVER wall AS worst,
    min(slip) OVER wall AS best
  FROM sl
  WINDOW word AS (PARTITION BY symbol ORDER BY ts_event, seq),
         wrun AS (PARTITION BY symbol ORDER BY ts_event, seq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY symbol)
)
SELECT symbol, CAST(n AS BIGINT) AS n_trades,
  CAST(rsv AS BIGINT) AS volume,
  round(rss / rsv, 6) + 0 AS vw_slippage_bps,
  round(worst, 6) + 0 AS worst_bps,
  round(best, 6) + 0 AS best_bps
FROM f WHERE rn = n
""",
    "Per-symbol VWAP slippage report: volume-weighted bps vs the "
    "15-minute bucket VWAP benchmark, with extremes",
)
def q_vwap_slippage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.execution import vwap_slippage

    with _trades_config():
        out = vwap_slippage(trades_from_events(spark, sf_dir), bucket="15 minutes")
    return out.select(
        "symbol",
        "n_trades",
        "volume",
        (F.round("vw_slippage_bps", 6) + F.lit(0.0)).alias("vw_slippage_bps"),
        (F.round("worst_bps", 6) + F.lit(0.0)).alias("worst_bps"),
        (F.round("best_bps", 6) + F.lit(0.0)).alias("best_bps"),
    )


# --------------------------------------------------------------------------
# C-ext. Regime diagnostics (operators/regime.py): Lo-MacKinlay variance
# ratio and aggregated-variance Hurst exponent over the 15m bar frame.
# --------------------------------------------------------------------------

_VR_Q = 4
_HURST_SCALES = (1, 2, 4, 8, 16)


@register(
    "variance_ratio",
    f"""
WITH
{_FEATURE_BARS_CTE},
r AS (
  SELECT symbol,
    ln(close) - lag(ln(close), 1) OVER w AS r1,
    ln(close) - lag(ln(close), {_VR_Q}) OVER w AS rq
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
g AS (
  SELECT symbol,
    CAST(count(r1) AS BIGINT) AS n1, sum(r1) AS s1, sum(r1*r1) AS ss1,
    CAST(count(rq) AS BIGINT) AS nq, sum(rq) AS sq, sum(rq*rq) AS ssq
  FROM r GROUP BY symbol
),
v AS (
  SELECT symbol, n1,
    (ss1 - s1*s1/n1) / n1 AS v1,
    (ssq - sq*sq/nq) / nq AS vq,
    nq
  FROM g
)
SELECT symbol, n1 AS n_obs,
  round(CASE WHEN nq >= 2 AND v1 > 0 THEN vq / ({_VR_Q} * v1) END, 6) AS vr,
  round(CASE WHEN nq >= 2 AND v1 > 0 THEN
    (vq / ({_VR_Q} * v1) - 1)
      / sqrt({2.0 * (2 * _VR_Q - 1) * (_VR_Q - 1) / (3.0 * _VR_Q)!r} / n1)
  END, 6) AS z
FROM v
""",
    f"Lo-MacKinlay variance ratio at q={_VR_Q} on 15m bars with the iid "
    "z-statistic — trending (>1) vs mean-reverting (<1) diagnostic",
)
def q_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.regime import variance_ratio

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = variance_ratio(bars, q=_VR_Q, ts_col="ts_event", close_col="close")
    return out.select(
        "symbol", "n_obs", F.round("vr", 6).alias("vr"), F.round("z", 6).alias("z")
    )


def _hurst_sql() -> str:
    import math

    qs = _HURST_SCALES
    lag_cols = ",\n    ".join(
        f"ln(close) - lag(ln(close), {q}) OVER w AS r{q}" for q in qs
    )
    agg_cols = ",\n    ".join(
        f"CAST(count(r{q}) AS BIGINT) AS n{q}, sum(r{q}) AS s{q}, sum(r{q}*r{q}) AS ss{q}"
        for q in qs
    )
    var_cols = ",\n    ".join(
        f"(ss{q} - s{q}*s{q}/n{q}) / n{q} AS v{q}" for q in qs
    )
    n_cols = ", ".join(f"n{q}" for q in qs)
    ok = " AND ".join(f"n{q} >= 2 AND v{q} > 0" for q in qs)
    k = float(len(qs))
    lx = [math.log(float(q)) for q in qs]
    sx = sum(lx)
    sxx = sum(v * v for v in lx)
    sy = " + ".join(f"ln(v{q})" for q in qs)
    sxy = " + ".join(f"{lx[i]!r} * ln(v{qs[i]})" for i in range(len(qs)))
    syy = " + ".join(f"ln(v{q}) * ln(v{q})" for q in qs)
    den = k * sxx - sx * sx
    return f"""
WITH
{{bars_cte}},
r AS (
  SELECT symbol,
    {lag_cols}
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
g AS (
  SELECT symbol,
    {agg_cols}
  FROM r GROUP BY symbol
),
v AS (
  SELECT symbol, {n_cols},
    {var_cols}
  FROM g
),
fit AS (
  SELECT symbol, n{qs[0]} AS n_obs,
    CASE WHEN {ok} THEN ({k!r} * ({sxy}) - {sx!r} * ({sy})) / {den!r} END AS slope,
    CASE WHEN {ok} THEN ({syy}) - ({sy}) * ({sy}) / {k!r} END AS ss_tot,
    CASE WHEN {ok} THEN ({sxy}) - {sx!r} * ({sy}) / {k!r} END AS sxy_c
  FROM v
)
SELECT symbol, n_obs,
  round(slope / 2, 6) AS hurst,
  round(CASE WHEN ss_tot > 0 THEN 1 - (ss_tot - slope * sxy_c) / ss_tot END, 6) AS r2
FROM fit
"""


@register(
    "hurst",
    _hurst_sql().format(bars_cte=_FEATURE_BARS_CTE),
    f"Aggregated-variance Hurst exponent over scales {_HURST_SCALES} on "
    "15m bars (log-log variance regression; H=0.5 random walk)",
)
def q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.regime import hurst_exponent

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = hurst_exponent(
        bars, scales=_HURST_SCALES, ts_col="ts_event", close_col="close"
    )
    return out.select(
        "symbol",
        "n_obs",
        F.round("hurst", 6).alias("hurst"),
        F.round("r2", 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# C-ext. Interpolated bigram LM scoring (functions/text.py::bigram_logprob)
# --------------------------------------------------------------------------

_BG_K, _BG_LAM = 0.5, 0.7


@register(
    "bigram_logprob",
    f"""
WITH
{_DOCS_TOK_CTE},
ex AS (
  SELECT doc_id, u.prev AS prev, u.cur AS cur
  FROM (
    SELECT doc_id,
      unnest([{{'prev': CASE WHEN i = 1 THEN NULL ELSE toks[i-1] END,
               'cur': toks[i]}} for i in range(1, len(toks)+1)]) AS u
    FROM tok WHERE len(toks) > 0
  )
),
uni AS (SELECT cur, CAST(count(*) AS BIGINT) AS c_uni FROM ex GROUP BY cur),
bi AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_bi
  FROM ex WHERE prev IS NOT NULL GROUP BY prev, cur
),
tot AS (SELECT CAST(sum(c_uni) AS DOUBLE) AS N, CAST(count(*) AS DOUBLE) AS V FROM uni),
sc AS (
  SELECT e.doc_id,
    CASE WHEN e.prev IS NOT NULL THEN
      ln({_BG_LAM!r} * ((coalesce(b.c_bi, 0) + {_BG_K!r}) / (cx.c_uni + {_BG_K!r} * t.V))
         + {1.0 - _BG_LAM!r} * ((u.c_uni + {_BG_K!r}) / (t.N + {_BG_K!r} * t.V)))
    ELSE
      ln((u.c_uni + {_BG_K!r}) / (t.N + {_BG_K!r} * t.V))
    END AS lp
  FROM ex e
  JOIN uni u ON u.cur = e.cur
  LEFT JOIN bi b ON b.prev = e.prev AND b.cur = e.cur
  LEFT JOIN uni cx ON cx.cur = e.prev
  CROSS JOIN tot t
),
pd AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens, avg(lp) AS mlp
  FROM sc GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(pd.n_tokens, 0) AS n_tokens,
  round(pd.mlp, 6) AS mean_logprob,
  round(exp(-pd.mlp), 6) AS ppl
FROM docs d LEFT JOIN pd ON pd.doc_id = d.doc_id
""",
    "Interpolated add-k bigram LM perplexity per document (corpus-"
    "trained; lambda=0.7) — the word-order-aware CCNet-style quality "
    "signal",
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import bigram_logprob

    docs = read_table(spark, sf_dir, "documents")
    out = bigram_logprob(docs, smoothing_k=_BG_K, interpolation=_BG_LAM)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("mean_logprob", 6).alias("mean_logprob"),
        F.round("ppl", 6).alias("ppl"),
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
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
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
# C-ext. Cross-sectional z-score (operators/cross_section.py::
# cross_sectional_zscore) over bar log returns.
# --------------------------------------------------------------------------


@register(
    "cs_zscore",
    f"""
WITH
{_FEATURE_BARS_CTE},
r AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS ret
  FROM bars
),
z AS (
  SELECT symbol, ts, ret,
    count(ret) OVER w AS n, sum(ret) OVER w AS s, sum(ret*ret) OVER w AS s2
  FROM r
  WINDOW w AS (PARTITION BY ts)
),
f AS (
  SELECT symbol, ts, ret,
    CASE WHEN ret IS NOT NULL AND n >= 2
              AND sqrt(greatest((s2 - s*s/n) / (n - 1), 0.0)) > 0
         THEN (ret - s/n) / sqrt(greatest((s2 - s*s/n) / (n - 1), 0.0)) END AS z
  FROM z
)
SELECT symbol, ts, round(ret, 6) + 0 AS ret,
  round(z, 6) + 0 AS z,
  round(CASE WHEN z IS NOT NULL THEN least(greatest(z, -3.0), 3.0) END, 6) + 0 AS z_clipped
FROM f
""",
    "Cross-sectional z-score of bar log returns per timestamp bucket, "
    "winsorized at 3 sigma — the factor-pipeline normalization step",
)
def q_cs_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from polars_trading_spark.operators.cross_section import cross_sectional_zscore

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    order = Window.partitionBy("symbol").orderBy("ts_event")
    r = bars.select(
        "symbol",
        "ts_event",
        F.log(F.col("close") / F.lag("close").over(order)).alias("ret"),
    )
    out = cross_sectional_zscore(r, "ret", clip_sigmas=3.0, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        F.col("ts_event").alias("ts"),
        (F.round("ret", 6) + z0).alias("ret"),
        (F.round("z", 6) + z0).alias("z"),
        (F.round("z_clipped", 6) + z0).alias("z_clipped"),
    )


# --------------------------------------------------------------------------
# C-ext. Corpus cleanse funnel (functions/corpus.py::corpus_funnel) — the
# per-stage yield report; oracle wraps the corpus_filter oracle verbatim.
# --------------------------------------------------------------------------

_FUNNEL_SQL = f"""
WITH agg AS (
  SELECT
    CAST(count(*) AS BIGINT) AS d0, CAST(sum(n_tokens) AS BIGINT) AS t0,
    CAST(count(CASE WHEN pass_lang AND pass_tokens AND pass_quality THEN 1 END) AS BIGINT) AS d1,
    CAST(coalesce(sum(CASE WHEN pass_lang AND pass_tokens AND pass_quality THEN n_tokens END), 0) AS BIGINT) AS t1,
    CAST(count(CASE WHEN pass_lang AND pass_tokens AND pass_quality AND NOT is_exact_dup THEN 1 END) AS BIGINT) AS d2,
    CAST(coalesce(sum(CASE WHEN pass_lang AND pass_tokens AND pass_quality AND NOT is_exact_dup THEN n_tokens END), 0) AS BIGINT) AS t2,
    CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS d3,
    CAST(coalesce(sum(CASE WHEN keep THEN n_tokens END), 0) AS BIGINT) AS t3
  FROM ({{base}}) b
)
SELECT 0 AS stage_idx, 'raw' AS stage, d0 AS n_docs, t0 AS n_tokens FROM agg
UNION ALL SELECT 1, 'quality', d1, t1 FROM agg
UNION ALL SELECT 2, 'exact_dedup', d2, t2 FROM agg
UNION ALL SELECT 3, 'near_dedup', d3, t3 FROM agg
"""


@register(
    "corpus_funnel",
    None,  # filled in immediately below from the corpus_filter oracle
    "Cleanse funnel: docs/tokens surviving raw -> quality gates -> "
    "exact dedup -> near dedup",
)
def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return corpus_ops.corpus_funnel(
        docs,
        langs=_CF_LANGS,
        min_tokens=_CF_MIN_TOKENS,
        max_tokens=_CF_MAX_TOKENS,
        min_quality=_CF_MIN_QUALITY,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    ).withColumn("stage_idx", F.col("stage_idx").cast("int"))


QUERIES["corpus_funnel"] = Query(
    name="corpus_funnel",
    spark=QUERIES["corpus_funnel"].spark,
    oracle=_FUNNEL_SQL.format(base=QUERIES["corpus_filter"].oracle),
    description=QUERIES["corpus_funnel"].description,
)


# --------------------------------------------------------------------------
# C-ext. PCM waveform features (functions/multimodal.py::pcm_features) —
# real byte-level decode (np.frombuffer) with an exact arithmetic oracle.
# --------------------------------------------------------------------------

_PCM_SR = 16_000


@register(
    "pcm_features",
    f"""
WITH m AS (SELECT doc_id AS media_id FROM documents),
s AS (
  SELECT media_id, i,
    ((media_id * 7919 + i * 104729) % 65536) - 32768 AS v
  FROM m, unnest(range(0, 400 + CAST(media_id % 800 AS INTEGER))) AS t(i)
),
lagged AS (
  SELECT media_id, v,
    lead(v) OVER (PARTITION BY media_id ORDER BY i) AS nxt
  FROM s
),
g AS (
  SELECT media_id,
    CAST(count(*) AS BIGINT) AS n_samples,
    sum(v * v) AS ss,
    max(abs(v)) AS peak,
    CAST(count(CASE WHEN v * nxt < 0 THEN 1 END) AS BIGINT) AS zero_crossings
  FROM lagged GROUP BY media_id
)
SELECT media_id, n_samples,
  round(n_samples * 1000.0 / {_PCM_SR}, 6) AS duration_ms,
  round(sqrt(ss / n_samples), 6) AS rms,
  CAST(peak AS INTEGER) AS peak,
  zero_crossings
FROM g
""",
    "Waveform features (RMS, peak, zero crossings) decoded from raw "
    "s16le PCM bytes via Arrow mapInPandas — the oracle regenerates the "
    "samples arithmetically",
)
def q_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import pcm_features, synthesize_pcm

    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_pcm(docs, sample_rate=_PCM_SR)
    out = pcm_features(media)
    return out.select(
        "media_id",
        "n_samples",
        F.round("duration_ms", 6).alias("duration_ms"),
        F.round("rms", 6).alias("rms"),
        "peak",
        "zero_crossings",
    )


# --------------------------------------------------------------------------
# C-ext. Cluster topic keywords (functions/topics.py::cluster_keywords) —
# embeddings x documents cross-table composition.
# --------------------------------------------------------------------------

_CK_K = 5


@register(
    "cluster_keywords",
    f"""
WITH
{_EMB_CTE},
{_DOCS_TOK_CTE},
cent AS (
  SELECT v AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_CELLS})
),
cell_sims AS (
  SELECT c.vec_id, cent.j,
         list_sum([cv[i+1] * v[i+1] for i in range(0, len(v))])
           / (sqrt(list_sum([x * x for x in cv])) * {_NORM_V}) AS csim
  FROM c CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
tk AS (SELECT doc_id, unnest(toks) AS token FROM tok),
joined AS (
  SELECT a.cell, t.token FROM tk t JOIN assigned a ON a.vec_id = t.doc_id
),
cc AS (SELECT cell, token, CAST(count(*) AS BIGINT) AS cell_count
       FROM joined GROUP BY cell, token),
dfq AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM tk GROUP BY token),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM docs),
scored AS (
  SELECT cc.cell, cc.token, cc.cell_count, dfq.doc_freq,
    cc.cell_count * (ln((nn.N + 1) / (dfq.doc_freq + 1)) + 1) AS score
  FROM cc JOIN dfq USING (token) CROSS JOIN nn
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY cell
            ORDER BY score DESC, token) AS INTEGER) AS rank
  FROM scored
)
SELECT cell, rank, token, cell_count, doc_freq, round(score, 6) AS score
FROM ranked WHERE rank <= {_CK_K}
""",
    f"Top-{_CK_K} TF-IDF keywords per embedding cluster (lowest-id "
    "coarse quantizer; cross-table embeddings x documents composition)",
)
def q_cluster_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.topics import cluster_keywords

    emb = read_table(spark, sf_dir, "embeddings")
    docs = read_table(spark, sf_dir, "documents")
    out = cluster_keywords(emb, docs, n_cells=_N_CELLS, k=_CK_K)
    return out.withColumn("score", F.round("score", 6))


# --------------------------------------------------------------------------
# C-ext. PSI feature drift (operators/drift.py::psi_drift)
# --------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-08 00:00:00"
_PSI_BINS, _PSI_EPS = 10, 1e-4


@register(
    "psi_drift",
    f"""
WITH trades AS ({TRADES_CTE}),
t AS (
  SELECT symbol, price AS x, ts_event < TIMESTAMP '{_PSI_SPLIT}' AS is_ref
  FROM trades WHERE price IS NOT NULL
),
rng AS (
  SELECT symbol, min(x) AS mn, max(x) AS mx FROM t WHERE is_ref GROUP BY symbol
),
b AS (
  SELECT t.symbol, t.is_ref,
    CASE WHEN r.mx > r.mn
         THEN least(greatest(CAST(floor((t.x - r.mn) / (r.mx - r.mn) * {_PSI_BINS}) AS BIGINT), 0), {_PSI_BINS - 1})
         ELSE 0 END AS bin
  FROM t JOIN rng r USING (symbol)
),
g AS (
  SELECT symbol, bin,
    count(CASE WHEN is_ref THEN 1 END) AS cr,
    count(CASE WHEN NOT is_ref THEN 1 END) AS cc
  FROM b GROUP BY symbol, bin
),
tot AS (SELECT symbol, CAST(sum(cr) AS BIGINT) AS n_ref, CAST(sum(cc) AS BIGINT) AS n_cur
        FROM g GROUP BY symbol),
s AS (
  SELECT g.symbol, tot.n_ref, tot.n_cur,
    sum((cc / CAST(n_cur AS DOUBLE) + {_PSI_EPS!r} - (cr / CAST(n_ref AS DOUBLE) + {_PSI_EPS!r}))
        * ln((cc / CAST(n_cur AS DOUBLE) + {_PSI_EPS!r}) / (cr / CAST(n_ref AS DOUBLE) + {_PSI_EPS!r}))) AS psi
  FROM g JOIN tot USING (symbol)
  GROUP BY g.symbol, tot.n_ref, tot.n_cur
)
SELECT symbol, n_ref, n_cur,
  round(CASE WHEN n_ref > 0 AND n_cur > 0 THEN psi END, 6) AS psi,
  CASE WHEN n_ref > 0 AND n_cur > 0 THEN psi > 0.2 END AS drifted
FROM s
""",
    f"Population Stability Index of tick prices per symbol ({_PSI_BINS} "
    f"reference-range bins, split at {_PSI_SPLIT}) — the deployed-model "
    "drift monitor",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.drift import psi_drift

    t = trades_from_events(spark, sf_dir)
    out = psi_drift(
        t, "price", split_ts=_PSI_SPLIT, bins=_PSI_BINS, epsilon=_PSI_EPS
    )
    return out.select(
        "symbol", "n_ref", "n_cur", F.round("psi", 6).alias("psi"), "drifted"
    )


# --------------------------------------------------------------------------
# C-ext. Tape validation (operators/data_quality.py): per-day tick quality
# and the per-symbol universe/liquidity screen.
# --------------------------------------------------------------------------

_TQ_RET, _TQ_GAP_S = 0.2, 3600.0


@register(
    "tick_quality",
    f"""
WITH trades AS ({TRADES_CTE}),
t AS (
  SELECT symbol, CAST(ts_event AS DATE) AS day, price, size,
    lag(ts_event) OVER w AS prev_ts,
    lag(price) OVER w AS prev_p,
    ts_event
  FROM trades
  WINDOW w AS (PARTITION BY symbol, CAST(ts_event AS DATE) ORDER BY ts_event, seq)
),
s AS (
  SELECT symbol, day,
    CASE WHEN ts_event = prev_ts THEN 1 END AS dup,
    CASE WHEN price > 0 AND prev_p > 0 THEN abs(ln(price / prev_p)) END AS ret,
    epoch_us(ts_event) / 1e6 - epoch_us(prev_ts) / 1e6 AS gap,
    price, size
  FROM t
)
SELECT symbol, day,
  CAST(count(*) AS BIGINT) AS n_trades,
  CAST(count(dup) AS BIGINT) AS n_dup_ts,
  CAST(count(CASE WHEN price IS NULL OR price <= 0 THEN 1 END) AS BIGINT) AS n_bad_price,
  CAST(count(CASE WHEN size IS NULL OR size <= 0 THEN 1 END) AS BIGINT) AS n_bad_size,
  CAST(count(CASE WHEN ret > {_TQ_RET!r} THEN 1 END) AS BIGINT) AS n_jumps,
  max(gap) + 0 AS max_gap_s,
  (count(dup) = 0 AND count(CASE WHEN price IS NULL OR price <= 0 THEN 1 END) = 0
   AND count(CASE WHEN size IS NULL OR size <= 0 THEN 1 END) = 0
   AND count(CASE WHEN ret > {_TQ_RET!r} THEN 1 END) = 0
   AND coalesce(max(gap), 0.0) <= {_TQ_GAP_S!r}) AS clean
FROM s GROUP BY symbol, day
""",
    "Per-(symbol, day) tape validation: duplicate timestamps, bad "
    "prices/sizes, extreme jumps, largest quiet gap, clean verdict",
)
def q_tick_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.data_quality import tick_quality

    with _trades_config():
        out = tick_quality(trades_from_events(spark, sf_dir), max_abs_ret=_TQ_RET, max_gap="1h")
    return out.withColumn("max_gap_s", F.col("max_gap_s") + F.lit(0.0))


@register(
    "universe_summary",
    f"""
WITH trades AS ({TRADES_CTE}),
-- Order-deterministic running folds over (ts, seq), read at the last
-- row: the dollar-volume / mean-price sums add O(1e9)-magnitude float
-- terms whose unordered fold order flips round-to-6 knife edges
-- between engines (the round-5 vwap_slippage failure mode).
f AS (
  SELECT symbol,
    row_number() OVER word AS rn,
    count(*) OVER wall AS n,
    min(ts_event) OVER wall AS first_ts,
    max(ts_event) OVER wall AS last_ts,
    sum(CAST(size AS DOUBLE)) OVER wrun AS rvol,
    sum(CAST(size AS DOUBLE) * price) OVER wrun AS rdvol,
    sum(price) OVER wrun AS rp
  FROM trades
  WINDOW word AS (PARTITION BY symbol ORDER BY ts_event, seq),
         wrun AS (PARTITION BY symbol ORDER BY ts_event, seq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY symbol)
),
d AS (
  SELECT symbol, CAST(count(DISTINCT CAST(ts_event AS DATE)) AS BIGINT) AS active_days
  FROM trades GROUP BY symbol
)
SELECT f.symbol, f.first_ts, f.last_ts, d.active_days,
  CAST(f.n AS BIGINT) AS n_trades,
  round(f.rvol / d.active_days, 6) + 0 AS avg_daily_volume,
  round(f.rdvol / d.active_days / 1e6, 4) + 0 AS avg_daily_dollar_volume_mm,
  round(f.rp / f.n, 6) + 0 AS mean_price
FROM f JOIN d USING (symbol) WHERE f.rn = f.n
""",
    "Per-symbol listing span, active days, ADV and dollar-ADV — the "
    "liquidity screen",
)
def q_universe_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.data_quality import universe_summary

    with _trades_config():
        out = universe_summary(trades_from_events(spark, sf_dir))
    return out.select(
        "symbol",
        "first_ts",
        "last_ts",
        "active_days",
        "n_trades",
        (F.round("avg_daily_volume", 6) + F.lit(0.0)).alias("avg_daily_volume"),
        (F.round(F.col("avg_daily_dollar_volume") / 1e6, 4) + F.lit(0.0)).alias(
            "avg_daily_dollar_volume_mm"
        ),
        (F.round("mean_price", 6) + F.lit(0.0)).alias("mean_price"),
    )


# --------------------------------------------------------------------------
# C-ext. Event-stream analytics (functions/events.py): sessionization,
# ordered funnel, retention cohorts — the user-action side of the events
# table ((user_id, ts) pairs are unique at every SF, so ts ordering is
# deterministic).
# --------------------------------------------------------------------------

_SESS_GAP_S = 1800
_FUNNEL_STEPS = ["view", "click", "signup", "purchase"]


@register(
    "sessionize",
    f"""
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
t AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM ev),
f AS (
  SELECT user_id, ts,
    CASE WHEN prev IS NULL OR epoch_us(ts)/1e6 - epoch_us(prev)/1e6 > {_SESS_GAP_S}
         THEN 1 ELSE 0 END AS ns
  FROM t
),
s AS (
  SELECT user_id, ts,
    sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM f
)
SELECT user_id, CAST(sid AS INTEGER) AS session_id,
  min(ts) AS session_start, max(ts) AS session_end,
  CAST(count(*) AS BIGINT) AS n_events,
  epoch_us(max(ts))/1e6 - epoch_us(min(ts))/1e6 AS duration_s
FROM s GROUP BY user_id, sid
""",
    "Gap-based sessionization of the user event stream (30m inactivity "
    "break): flag + running sum, one user shuffle",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.events import sessionize

    ev = read_table(spark, sf_dir, "events")
    out = sessionize(ev, gap="30m")
    return out.withColumn("duration_s", F.col("duration_s") + F.lit(0.0))


@register(
    "event_funnel",
    f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events WHERE event_type IN ({", ".join(f"'{s}'" for s in _FUNNEL_STEPS)})
),
arr AS (
  SELECT user_id,
    {", ".join(f"list_sort(list(ts) FILTER (WHERE event_type = '{s}')) AS a_{s}" for s in _FUNNEL_STEPS)}
  FROM ev GROUP BY user_id
),
s1 AS (SELECT *, a_view[1] AS ts_view FROM arr),
s2 AS (SELECT *, CASE WHEN ts_view IS NOT NULL
        THEN list_filter(a_click, x -> x > ts_view)[1] END AS ts_click FROM s1),
s3 AS (SELECT *, CASE WHEN ts_click IS NOT NULL
        THEN list_filter(a_signup, x -> x > ts_click)[1] END AS ts_signup FROM s2),
s4 AS (SELECT *, CASE WHEN ts_signup IS NOT NULL
        THEN list_filter(a_purchase, x -> x > ts_signup)[1] END AS ts_purchase FROM s3)
SELECT user_id, ts_view, ts_click, ts_signup, ts_purchase,
  CAST((CASE WHEN ts_view IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN ts_click IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN ts_signup IS NOT NULL THEN 1 ELSE 0 END)
     + (CASE WHEN ts_purchase IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS depth
FROM s4
""",
    "Ordered conversion funnel view->click->signup->purchase per user "
    "(each step strictly after the previous step's time)",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.events import event_funnel

    ev = read_table(spark, sf_dir, "events")
    out = event_funnel(ev, _FUNNEL_STEPS)
    return out.select(
        "user_id", *[F.col(f"ts_{s}") for s in _FUNNEL_STEPS], "depth"
    )


@register(
    "retention",
    f"""
WITH per AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS p FROM events
),
first AS (SELECT user_id, min(p) AS cohort FROM per GROUP BY user_id),
j AS (SELECT per.user_id, per.p, first.cohort FROM per JOIN first USING (user_id)),
g AS (
  SELECT cohort,
    CAST((epoch_us(p) - epoch_us(cohort)) / (7.0 * 86400 * 1e6) AS INTEGER) AS period_n,
    CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM j GROUP BY 1, 2
),
sz AS (SELECT cohort, n_active AS cohort_size FROM g WHERE period_n = 0)
SELECT g.cohort, g.period_n, g.n_active, sz.cohort_size,
  round(g.n_active / CAST(sz.cohort_size AS DOUBLE), 6) AS retention
FROM g JOIN sz USING (cohort)
""",
    "Weekly retention triangle: cohort = first-seen week (Monday "
    "anchor), retention share per offset week",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.events import retention_cohorts

    ev = read_table(spark, sf_dir, "events")
    out = retention_cohorts(ev, period="1w")
    return out.withColumn("retention", F.round("retention", 6)).withColumn(
        "period_n", F.col("period_n").cast("int")
    )


# --------------------------------------------------------------------------
# C-ext. BNS jump test (operators/volatility.py::jump_test)
# --------------------------------------------------------------------------

_JT_W = 78


@register(
    "jump_test",
    f"""
WITH
{_FEATURE_BARS_CTE},
r AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER w) AS ret,
    abs(ln(close / lag(close) OVER w)) AS a
  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
l AS (
  SELECT symbol, ts,
    ret * ret AS r2,
    a * lag(a, 1) OVER w AS bp,
    pow(a, 4.0/3) * pow(lag(a, 1) OVER w, 4.0/3) * pow(lag(a, 2) OVER w, 4.0/3) AS tq
  FROM r WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
s AS (
  SELECT symbol, ts,
    count(r2) OVER w AS n,
    sum(r2) OVER w AS rv,
    sum(bp) OVER w * (pi() / 2) AS bv,
    sum(tq) OVER w * pow(pow(2, 2.0/3) * gamma(7.0/6) / gamma(0.5), -3) AS tqs
  FROM l
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN {_JT_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts,
  round(CASE WHEN n >= {_JT_W} AND rv > 0 AND bv > 0 THEN rv END, 9) + 0 AS rv,
  round(CASE WHEN n >= {_JT_W} AND rv > 0 AND bv > 0 THEN bv END, 9) + 0 AS bv,
  round(CASE WHEN n >= {_JT_W} AND rv > 0 AND bv > 0 THEN (rv - bv) / rv END, 6) + 0 AS rj,
  round(CASE WHEN n >= {_JT_W} AND rv > 0 AND bv > 0 THEN
    ((rv - bv) / rv) / sqrt((pow(pi()/2, 2) + pi() - 5)
      * greatest(1.0, tqs / (bv * bv)) / n) END, 6) + 0 AS z
FROM s
""",
    f"Barndorff-Nielsen-Shephard jump statistic over a rolling {_JT_W}-"
    "bar window: realized vs bipower variation with studentized ratio",
)
def q_jump_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.volatility import jump_test

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = jump_test(bars, window=_JT_W, ts_col="ts_event", close_col="close")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        F.col("ts_event").alias("ts"),
        (F.round("rv", 9) + z0).alias("rv"),
        (F.round("bv", 9) + z0).alias("bv"),
        (F.round("rj", 6) + z0).alias("rj"),
        (F.round("z", 6) + z0).alias("z"),
    )


# --------------------------------------------------------------------------
# C-ext. Order-flow sign autocorrelation (operators/microstructure.py::
# sign_autocorr) — native tick-rule sign + rolling Pearson.
# --------------------------------------------------------------------------

_SA_W, _SA_LAG = 200, 1


@register(
    "sign_autocorr",
    f"""
WITH trades AS ({TRADES_CTE}),
d AS (
  SELECT symbol, ts_event, seq,
    price - lag(price) OVER w AS dp
  FROM trades WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
),
b AS (
  SELECT symbol, ts_event, seq,
    coalesce(last_value(CASE WHEN dp <> 0 THEN sign(dp) END IGNORE NULLS)
      OVER (PARTITION BY symbol ORDER BY ts_event, seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS s
  FROM d
),
l AS (
  SELECT symbol, ts_event, s,
    lag(s, {_SA_LAG}) OVER (PARTITION BY symbol ORDER BY ts_event, seq) AS sl,
    seq
  FROM b
),
m AS (
  SELECT symbol, ts_event, s,
    CASE WHEN s <> 0 AND sl <> 0 AND sl IS NOT NULL THEN sl END AS x,
    CASE WHEN s <> 0 AND sl <> 0 AND sl IS NOT NULL THEN s END AS y,
    seq
  FROM l
),
r0 AS (
  SELECT symbol, ts_event, s, seq,
    count(x) OVER c AS cn, sum(x) OVER c AS cx, sum(y) OVER c AS cy,
    sum(x*x) OVER c AS cxx, sum(y*y) OVER c AS cyy, sum(x*y) OVER c AS cxy
  FROM m
  WINDOW c AS (PARTITION BY symbol ORDER BY ts_event, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
r AS (
  SELECT symbol, ts_event, s,
    cn - coalesce(lag(cn, {_SA_W}) OVER o, 0) AS n,
    cx - coalesce(lag(cx, {_SA_W}) OVER o, 0.0) AS sx,
    cy - coalesce(lag(cy, {_SA_W}) OVER o, 0.0) AS sy,
    cxx - coalesce(lag(cxx, {_SA_W}) OVER o, 0.0) AS sxx,
    cyy - coalesce(lag(cyy, {_SA_W}) OVER o, 0.0) AS syy,
    cxy - coalesce(lag(cxy, {_SA_W}) OVER o, 0.0) AS sxy
  FROM r0
  WINDOW o AS (PARTITION BY symbol ORDER BY ts_event, seq)
)
SELECT symbol, ts_event, s + 0 AS sign,
  round(CASE WHEN n >= {_SA_W} AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) END, 6) + 0
    AS autocorr
FROM r
""",
    f"Rolling lag-{_SA_LAG} autocorrelation of tick-rule signs over "
    f"{_SA_W} trades — order-flow persistence (native carry-forward "
    "sign, no Python)",
)
def q_sign_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.microstructure import sign_autocorr

    with _trades_config():
        out = sign_autocorr(trades_from_events(spark, sf_dir), window=_SA_W, lag=_SA_LAG)
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "ts_event",
        (F.col("sign") + z0).alias("sign"),
        (F.round("autocorr", 6) + z0).alias("autocorr"),
    )


# --------------------------------------------------------------------------
# C-ext. Empirical VaR / CVaR (operators/backtest.py::var_cvar)
# --------------------------------------------------------------------------

_VAR_A = 0.05


@register(
    "var_cvar",
    f"""
WITH
{_FEATURE_BARS_CTE},
r AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS ret
  FROM bars
),
rr AS (SELECT * FROM r WHERE ret IS NOT NULL),
rk AS (
  SELECT symbol, ts, ret,
    row_number() OVER (PARTITION BY symbol ORDER BY ret, ts) AS rk,
    count(*) OVER (PARTITION BY symbol) AS n
  FROM rr
),
w AS (SELECT * FROM rk WHERE rk <= greatest(CAST(floor({_VAR_A!r} * n) AS BIGINT), 1))
SELECT symbol, CAST(max(n) AS BIGINT) AS n_obs, CAST(count(*) AS BIGINT) AS k,
  round(max(ret), 6) + 0 AS var_5,
  round(avg(ret), 6) + 0 AS cvar_5
FROM w GROUP BY symbol
""",
    f"Empirical VaR/CVaR at alpha={_VAR_A} of 15m bar log returns — "
    "count-based k-worst definition, engine-exact",
)
def q_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.backtest import var_cvar

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = var_cvar(bars, alpha=_VAR_A, ts_col="ts_event", close_col="close")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_obs",
        "k",
        (F.round("var_5", 6) + z0).alias("var_5"),
        (F.round("cvar_5", 6) + z0).alias("cvar_5"),
    )


# --------------------------------------------------------------------------
# C-ext. Cross-sectional momentum portfolio (operators/cross_section.py::
# rank_portfolio_backtest)
# --------------------------------------------------------------------------

_RP_LB, _RP_TOP = 5, 1


@register(
    "rank_portfolio",
    f"""
WITH
{_FEATURE_BARS_CTE},
r AS (
  SELECT symbol, ts,
    ln(close / lag(close, {_RP_LB}) OVER w) AS mom,
    ln(lead(close) OVER w / close) AS fwd
  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
rr AS (SELECT * FROM r WHERE mom IS NOT NULL),
m AS (
  SELECT symbol, ts, fwd,
    row_number() OVER (PARTITION BY ts ORDER BY mom DESC, symbol) AS ru,
    row_number() OVER (PARTITION BY ts ORDER BY mom ASC, symbol) AS rd,
    count(*) OVER (PARTITION BY ts) AS nb
  FROM rr
),
mem AS (
  SELECT symbol, ts,
    CASE WHEN ru <= {_RP_TOP} THEN 1.0 WHEN rd <= {_RP_TOP} THEN -1.0 END AS side,
    fwd
  FROM m WHERE nb >= {2 * _RP_TOP} AND (ru <= {_RP_TOP} OR rd <= {_RP_TOP})
),
pnl AS (
  SELECT ts,
    CAST(count(CASE WHEN side > 0 THEN 1 END) AS INTEGER) AS n_long,
    CAST(count(CASE WHEN side < 0 THEN 1 END) AS INTEGER) AS n_short,
    avg(CASE WHEN side > 0 THEN fwd END) - avg(CASE WHEN side < 0 THEN fwd END) AS pnl
  FROM mem GROUP BY ts
),
pm AS (
  SELECT ts, lag(ts) OVER (ORDER BY ts) AS prev_ts
  FROM (SELECT DISTINCT ts FROM mem)
),
kept AS (
  SELECT a.ts, count(*) AS nm, count(b.symbol) AS nkept, max(a.prev_ts) AS pts
  FROM (SELECT mem.*, pm.prev_ts FROM mem JOIN pm USING (ts)) a
  LEFT JOIN mem b
    ON b.ts = a.prev_ts AND b.symbol = a.symbol AND b.side = a.side
  GROUP BY a.ts
)
SELECT p.ts, p.n_long, p.n_short, round(p.pnl, 6) + 0 AS pnl,
  round(CASE WHEN k.pts IS NOT NULL THEN 1.0 - k.nkept / CAST(k.nm AS DOUBLE) END, 6) + 0
    AS turnover
FROM pnl p JOIN kept k USING (ts)
""",
    f"Cross-sectional momentum portfolio (top/bottom {_RP_TOP} by "
    f"{_RP_LB}-bar momentum, next-bar P&L, membership turnover)",
)
def q_rank_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import rank_portfolio_backtest

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = rank_portfolio_backtest(
        bars, lookback=_RP_LB, top_n=_RP_TOP, ts_col="ts_event", close_col="close"
    )
    z0 = F.lit(0.0)
    return out.select(
        F.col("ts_event").alias("ts"),
        "n_long",
        "n_short",
        (F.round("pnl", 6) + z0).alias("pnl"),
        (F.round("turnover", 6) + z0).alias("turnover"),
    )


# --------------------------------------------------------------------------
# C-ext. Return ACF + Ljung-Box (operators/regime.py::return_acf)
# --------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 5, 10)


def _acf_sql() -> str:
    ks = _ACF_LAGS
    lag_cols = ",\n    ".join(f"lag(ret, {k}) OVER o AS l{k}" for k in ks)
    agg_cols = ",\n    ".join(
        f"sum(CASE WHEN l{k} IS NOT NULL THEN ret * l{k} END) AS p{k},\n"
        f"    sum(CASE WHEN l{k} IS NOT NULL THEN ret END) AS a{k},\n"
        f"    sum(CASE WHEN l{k} IS NOT NULL THEN l{k} END) AS b{k},\n"
        f"    count(l{k}) AS n{k}"
        for k in ks
    )
    rho_cols = ",\n  ".join(
        f"CASE WHEN n >= {max(ks)} + 2 AND ss - n * (s/n) * (s/n) > 0 THEN\n"
        f"    (p{k} - (s/n) * a{k} - (s/n) * b{k} + n{k} * (s/n) * (s/n))\n"
        f"      / (ss - n * (s/n) * (s/n)) END AS rho{k}"
        for k in ks
    )
    q_terms = " + ".join(f"rho{k} * rho{k} / (n - {k})" for k in ks)
    acf_out = ",\n  ".join(f"round(rho{k}, 6) + 0 AS acf_{k}" for k in ks)
    return f"""
WITH
{{bars_cte}},
r0 AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS ret
  FROM bars
),
r1 AS (
  SELECT symbol, ret,
    {lag_cols}
  FROM (SELECT symbol, ts, ret FROM r0) t
  WINDOW o AS (PARTITION BY symbol ORDER BY ts)
),
r2 AS (SELECT * FROM r1 WHERE ret IS NOT NULL),
g AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
    sum(ret) AS s, sum(ret*ret) AS ss,
    {agg_cols}
  FROM r2 GROUP BY symbol
),
rho AS (
  SELECT symbol, n, s, ss,
  {rho_cols}
  FROM g
)
SELECT symbol, n AS n_obs,
  {acf_out},
  round(CASE WHEN rho{ks[0]} IS NOT NULL THEN n * (n + 2) * ({q_terms}) END, 6) + 0
    AS ljung_box_q
FROM rho
"""


@register(
    "return_acf",
    _acf_sql().format(bars_cte=_FEATURE_BARS_CTE),
    f"Return autocorrelation at lags {_ACF_LAGS} with the Ljung-Box "
    "portmanteau statistic — one lag chain, one aggregate per symbol",
)
def q_return_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.regime import return_acf

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = return_acf(bars, lags=_ACF_LAGS, ts_col="ts_event", close_col="close")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_obs",
        *[(F.round(f"acf_{k}", 6) + z0).alias(f"acf_{k}") for k in _ACF_LAGS],
        (F.round("ljung_box_q", 6) + z0).alias("ljung_box_q"),
    )


# --------------------------------------------------------------------------
# C-ext. Lead-lag cross-correlation (operators/cross_section.py::
# lead_lag_corr)
# --------------------------------------------------------------------------

_LL_LAG = 1


@register(
    "lead_lag",
    f"""
WITH
{_FEATURE_BARS_CTE},
r AS (
  SELECT symbol,
    ln(close / lag(close) OVER w) AS ret,
    row_number() OVER w AS i
  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
rr AS (SELECT * FROM r WHERE ret IS NOT NULL),
j AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.ret AS ra, b.ret AS rb
  FROM rr a JOIN rr b ON a.i = b.i - {_LL_LAG} AND a.symbol <> b.symbol
),
g AS (
  SELECT sym_a, sym_b, CAST(count(*) AS BIGINT) AS n,
    sum(ra) AS sx, sum(rb) AS sy, sum(ra*ra) AS sxx, sum(rb*rb) AS syy,
    sum(ra*rb) AS sxy
  FROM j GROUP BY sym_a, sym_b
),
d AS (
  SELECT sym_a, sym_b, n,
    CASE WHEN n >= 3 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
         THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) END AS c
  FROM g
)
SELECT f.sym_a, f.sym_b, f.n AS n_obs,
  rv.n AS n_obs_b_leads,
  round(f.c, 6) + 0 AS corr_a_leads,
  round(rv.c, 6) + 0 AS corr_b_leads,
  round(f.c - rv.c, 6) + 0 AS llr
FROM (SELECT * FROM d WHERE sym_a < sym_b) f
LEFT JOIN (SELECT sym_b AS sym_a, sym_a AS sym_b, n, c FROM d WHERE sym_a > sym_b) rv
  USING (sym_a, sym_b)
""",
    f"Lead-lag cross-correlation at lag {_LL_LAG} bar for every symbol "
    "pair (price-discovery screen; llr signs who leads)",
)
def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import lead_lag_corr

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = lead_lag_corr(bars, lag=_LL_LAG, ts_col="ts_event", close_col="close")
    z0 = F.lit(0.0)
    return out.select(
        "sym_a",
        "sym_b",
        "n_obs",
        "n_obs_b_leads",
        (F.round("corr_a_leads", 6) + z0).alias("corr_a_leads"),
        (F.round("corr_b_leads", 6) + z0).alias("corr_b_leads"),
        (F.round("llr", 6) + z0).alias("llr"),
    )


# --------------------------------------------------------------------------
# C-ext. n-gram containment pairs (functions/dedup.py::
# ngram_containment_pairs) — the asymmetric dedup modality.
# --------------------------------------------------------------------------

_CT_N, _CT_T, _CT_MAXDF = 3, 0.6, 0.2


@register(
    "dedup_containment",
    f"""
WITH
{_DOCS_TOK_CTE},
{_sql_shingle_sh_cte(_CT_N)},
post AS (SELECT doc_id, unnest(sh) AS h FROM sh),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs),
dfq AS (SELECT h, count(*) AS df FROM post GROUP BY h),
pruned AS (
  SELECT p.doc_id, p.h FROM post p JOIN dfq USING (h) CROSS JOIN nd
  WHERE dfq.df <= nd.n * {_CT_MAXDF!r}
),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
  FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id
),
v AS (
  SELECT c.ida, c.idb,
    len(list_intersect(sa.sh, sb.sh)) AS shared,
    len(sa.sh) AS na, len(sb.sh) AS nb
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.ida
  JOIN sh sb ON sb.doc_id = c.idb
)
SELECT ida AS id_a, idb AS id_b, CAST(shared AS BIGINT) AS n_shared,
  round(shared / CAST(na AS DOUBLE), 6) + 0 AS containment_a,
  round(shared / CAST(nb AS DOUBLE), 6) + 0 AS containment_b
FROM v
WHERE na > 0 AND nb > 0
  AND (shared / CAST(na AS DOUBLE) >= {_CT_T!r}
       OR shared / CAST(nb AS DOUBLE) >= {_CT_T!r})
""",
    f"Asymmetric n-gram containment pairs (either direction >= {_CT_T}; "
    f"df-pruned candidates at max-df {_CT_MAXDF}, exact verify) — "
    "catches quote-inclusion near-dups Jaccard misses",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.dedup import ngram_containment_pairs

    docs = read_table(spark, sf_dir, "documents")
    out = ngram_containment_pairs(
        docs, ngram=_CT_N, threshold=_CT_T, max_df_frac=_CT_MAXDF
    )
    z0 = F.lit(0.0)
    return out.select(
        "id_a",
        "id_b",
        "n_shared",
        (F.round("containment_a", 6) + z0).alias("containment_a"),
        (F.round("containment_b", 6) + z0).alias("containment_b"),
    )


# --------------------------------------------------------------------------
# C-ext. Real BMP header metadata (functions/multimodal.py::
# parse_image_header) — spec-valid 24-bit BMP files synthesized per doc,
# dimensions parsed from the REAL binary header (no codec library), byte
# count replayed closed-form by the oracle.
# --------------------------------------------------------------------------


@register(
    "multimodal_bmp_metadata",
    """
SELECT
  doc_id AS media_id,
  CAST(4 + doc_id % 29 AS INTEGER) AS width,
  CAST(3 + doc_id % 17 AS INTEGER) AS height,
  CAST(54 + ((3 * (4 + doc_id % 29) + 3) // 4) * 4 * (3 + doc_id % 17)
       AS BIGINT) AS n_bytes
FROM documents
""",
    "Real binary-format metadata: synthesized spec-valid BMPs, width/"
    "height parsed from the actual BITMAPINFOHEADER bytes (pure-Python "
    "parser, no codec lib), file size replayed arithmetically",
)
def q_multimodal_bmp_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        extract_media_metadata,
        synthesize_bmp,
    )

    media = synthesize_bmp(read_table(spark, sf_dir, "documents")).withColumn(
        "media_type", F.lit("image")
    )
    out = extract_media_metadata(media)
    return out.select("media_id", "width", "height", "n_bytes")


# --------------------------------------------------------------------------
# C-ext. Document chunking (functions/corpus.py::chunk_documents) — the
# cleaning -> chunking -> packing middle step; integer-exact sliding
# windows replayed verbatim by the oracle.
# --------------------------------------------------------------------------

_CH_C, _CH_S = 48, 40  # chunk_tokens, stride (overlap 8)


@register(
    "chunk_documents",
    f"""
WITH
{_DOCS_TOK_CTE},
t AS (
  SELECT doc_id, toks, len(toks) AS n,
    CASE WHEN len(toks) <= {_CH_C} THEN 1
         ELSE CAST((len(toks) - {_CH_C} + {_CH_S} - 1) // {_CH_S} AS INTEGER) + 1
    END AS n_chunks
  FROM tok WHERE len(toks) >= 1
),
ex AS (
  SELECT doc_id, toks, n_chunks, CAST(unnest(generate_series(0, n_chunks - 1)) AS INTEGER) AS chunk_idx
  FROM t
)
SELECT doc_id, chunk_idx, CAST(n_chunks AS INTEGER) AS n_chunks,
  CAST(chunk_idx * {_CH_S} AS INTEGER) AS start_token,
  CAST(len(list_slice(toks, chunk_idx * {_CH_S} + 1, chunk_idx * {_CH_S} + {_CH_C}))
       AS INTEGER) AS chunk_n_tokens,
  array_to_string(list_slice(toks, chunk_idx * {_CH_S} + 1, chunk_idx * {_CH_S} + {_CH_C}), ' ')
    AS chunk_text
FROM ex
""",
    f"Sliding-window document chunking ({_CH_C} tokens, overlap "
    f"{_CH_C - _CH_S}) — cleaning -> chunking -> packing middle step; "
    "zero shuffles, bounded explode fan-out",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import chunk_documents

    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=_CH_C, overlap=_CH_C - _CH_S)


# --------------------------------------------------------------------------
# C-ext. Fama-MacBeth factor regression (operators/cross_section.py::
# fama_macbeth) — per-timestamp cross-sectional OLS of next-bar return on
# trailing momentum; explicit-sum coefficients replayed by the oracle.
# --------------------------------------------------------------------------

_FM_LB, _FM_MIN = 4, 3


@register(
    "fama_macbeth",
    f"""
WITH
{_FEATURE_BARS_CTE},
r0 AS (
  SELECT ts,
    lead(close) OVER w / close - 1 AS fwd,
    close / lag(close, {_FM_LB}) OVER w - 1 AS fac
  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
r1 AS (SELECT * FROM r0 WHERE fwd IS NOT NULL AND fac IS NOT NULL),
g AS (
  SELECT ts, CAST(count(*) AS BIGINT) AS n_obs,
    sum(fac) AS sx, sum(fwd) AS sy, sum(fac*fac) AS sxx, sum(fac*fwd) AS sxy
  FROM r1 GROUP BY ts
),
fit AS (
  SELECT ts, n_obs,
    CASE WHEN n_obs*sxx - sx*sx > 0
         THEN (n_obs*sxy - sx*sy) / (n_obs*sxx - sx*sx) END AS gamma1,
    sx, sy
  FROM g WHERE n_obs >= {_FM_MIN}
)
SELECT ts AS ts_event, n_obs,
  round(CASE WHEN gamma1 IS NOT NULL THEN (sy - gamma1*sx) / n_obs END, 6) + 0
    AS gamma0,
  round(gamma1, 6) + 0 AS gamma1
FROM fit
""",
    f"Fama-MacBeth first pass: per-timestamp cross-sectional OLS of "
    f"next-bar return on trailing {_FM_LB}-bar momentum (two shared "
    "window passes + one hash aggregate, no joins)",
)
def q_fama_macbeth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import fama_macbeth

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = fama_macbeth(
        bars, lookback=_FM_LB, min_obs=_FM_MIN, ts_col="ts_event", close_col="close"
    )
    z0 = F.lit(0.0)
    return out.select(
        "ts_event",
        "n_obs",
        (F.round("gamma0", 6) + z0).alias("gamma0"),
        (F.round("gamma1", 6) + z0).alias("gamma1"),
    )


# --------------------------------------------------------------------------
# C-ext. Kolmogorov-Smirnov drift (operators/drift.py::ks_drift) — the
# binning-free sibling of psi_drift; integer cumulative CDFs replayed.
# --------------------------------------------------------------------------

_KS_COEFF = 1.358


@register(
    "ks_drift",
    f"""
WITH trades AS ({TRADES_CTE}),
t AS (
  SELECT symbol, price AS x, ts_event < TIMESTAMP '{_PSI_SPLIT}' AS is_ref
  FROM trades WHERE price IS NOT NULL
),
g AS (
  SELECT symbol, x,
    count(CASE WHEN is_ref THEN 1 END) AS r,
    count(CASE WHEN NOT is_ref THEN 1 END) AS c
  FROM t GROUP BY symbol, x
),
cum AS (
  SELECT symbol,
    sum(r) OVER (PARTITION BY symbol) AS nr,
    sum(c) OVER (PARTITION BY symbol) AS nc,
    sum(r) OVER (PARTITION BY symbol ORDER BY x
                 ROWS UNBOUNDED PRECEDING) AS cr,
    sum(c) OVER (PARTITION BY symbol ORDER BY x
                 ROWS UNBOUNDED PRECEDING) AS cc
  FROM g
),
per AS (
  SELECT symbol, CAST(max(nr) AS BIGINT) AS n_ref, CAST(max(nc) AS BIGINT) AS n_cur,
    max(CASE WHEN nr > 0 AND nc > 0
             THEN abs(cr / CAST(nr AS DOUBLE) - cc / CAST(nc AS DOUBLE)) END) AS ks
  FROM cum GROUP BY symbol
)
SELECT symbol, n_ref, n_cur,
  round(CASE WHEN n_ref > 0 AND n_cur > 0 THEN ks END, 6) AS ks,
  round(CASE WHEN n_ref > 0 AND n_cur > 0
             THEN {_KS_COEFF} * sqrt((n_ref + n_cur) / (CAST(n_ref AS DOUBLE) * n_cur)) END, 6)
    AS ks_critical,
  CASE WHEN n_ref > 0 AND n_cur > 0
       THEN ks > {_KS_COEFF} * sqrt((n_ref + n_cur) / (CAST(n_ref AS DOUBLE) * n_cur)) END
    AS drifted
FROM per
""",
    f"Exact two-sample KS drift of tick prices per symbol (split at "
    f"{_PSI_SPLIT}, alpha 0.05 critical value) — binning-free sibling "
    "of psi_drift",
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.drift import ks_drift

    t = trades_from_events(spark, sf_dir)
    out = ks_drift(t, "price", split_ts=_PSI_SPLIT, alpha_coeff=_KS_COEFF)
    return out.select(
        "symbol",
        "n_ref",
        "n_cur",
        F.round("ks", 6).alias("ks"),
        F.round("ks_critical", 6).alias("ks_critical"),
        "drifted",
    )


# --------------------------------------------------------------------------
# C-ext. Character-entropy quality signal (functions/text.py::
# char_entropy) — sorted-alphabet sequential fold, bit-identical replay.
# --------------------------------------------------------------------------


@register(
    "char_entropy",
    """
WITH docs AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
),
ch AS (
  SELECT doc_id, list_filter(string_split(norm, ''), c -> c != '') AS chars
  FROM docs
),
terms AS (
  SELECT doc_id, len(chars) AS n,
    list_transform(
      list_sort(list_distinct(chars)),
      a -> (len(list_filter(chars, x -> x = a)) / CAST(len(chars) AS DOUBLE))
           * ln(len(list_filter(chars, x -> x = a)) / CAST(len(chars) AS DOUBLE))
    ) AS t
  FROM ch
)
SELECT doc_id, CAST(n AS INTEGER) AS n_chars_norm,
  round(CASE WHEN n > 0
             THEN -list_reduce(list_prepend(CAST(0.0 AS DOUBLE), t), (a, b) -> a + b)
        END, 6) + 0 AS char_entropy
FROM terms
""",
    "Shannon character entropy of normalized text per document (nats) — "
    "cheap gibberish/repetition quality signal; pure HOF Columns, zero "
    "shuffles, sorted-alphabet fold replayed bit-identically",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import char_entropy, normalize_text

    docs = read_table(spark, sf_dir, "documents")
    staged = docs.withColumn(
        "__chars",
        F.filter(F.split(normalize_text(F.col("text")), ""), lambda c: c != ""),
    )
    z0 = F.lit(0.0)
    return staged.select(
        "doc_id",
        F.size("__chars").cast("int").alias("n_chars_norm"),
        (F.round(char_entropy(F.col("__chars")), 6) + z0).alias("char_entropy"),
    )


# --------------------------------------------------------------------------
# C-ext. PMI co-occurrence (functions/text.py::pmi_cooccurrence) —
# collocation mining; windowed pair counts replayed by lateral unnest.
# --------------------------------------------------------------------------

_PMI_W, _PMI_MIN, _PMI_K = 3, 5, 50


@register(
    "pmi_cooccurrence",
    f"""
WITH
{_DOCS_TOK_CTE},
p AS (
  SELECT least(toks[i], toks[i+d]) AS tok_a, greatest(toks[i], toks[i+d]) AS tok_b
  FROM tok,
       unnest(generate_series(1, len(toks))) AS gi(i),
       unnest(generate_series(1, {_PMI_W})) AS gd(d)
  WHERE len(toks) >= 2 AND i + d <= len(toks)
),
pairs AS (
  SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS c_ab FROM p GROUP BY tok_a, tok_b
),
m AS (
  SELECT tok, CAST(sum(c_ab) AS BIGINT) AS c_tok FROM (
    SELECT tok_a AS tok, c_ab FROM pairs
    UNION ALL
    SELECT tok_b AS tok, c_ab FROM pairs
  ) GROUP BY tok
),
tot AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS N FROM pairs),
scored AS (
  SELECT pairs.tok_a, pairs.tok_b, pairs.c_ab, ma.c_tok AS c_a, mb.c_tok AS c_b,
    ln(CAST(pairs.c_ab AS DOUBLE) * tot.N
       / (CAST(ma.c_tok AS DOUBLE) * CAST(mb.c_tok AS DOUBLE))) AS pmi
  FROM pairs
  JOIN m ma ON ma.tok = pairs.tok_a
  JOIN m mb ON mb.tok = pairs.tok_b
  CROSS JOIN tot
  WHERE pairs.c_ab >= {_PMI_MIN}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, tok_a, tok_b) AS INTEGER) AS rank
  FROM scored
)
SELECT tok_a, tok_b, c_ab, c_a, c_b, round(pmi, 6) + 0 AS pmi, rank
FROM ranked WHERE rank <= {_PMI_K}
""",
    f"Windowed (±{_PMI_W}) token-pair PMI top-{_PMI_K} (collocation / "
    "phrase mining; bounded explode fan-out, two hash aggregates, "
    "distributed top-k)",
)
def q_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import pmi_cooccurrence

    docs = read_table(spark, sf_dir, "documents")
    out = pmi_cooccurrence(
        docs, window=_PMI_W, min_pair_count=_PMI_MIN, top_k=_PMI_K
    )
    z0 = F.lit(0.0)
    return out.select(
        "tok_a", "tok_b", "c_ab", "c_a", "c_b",
        (F.round("pmi", 6) + z0).alias("pmi"),
        "rank",
    )


# --------------------------------------------------------------------------
# C-ext. Hawkes self-exciting intensity (operators/hawkes.py) — order-flow
# clustering; segment-renormalized exponential kernel replayed exactly.
# --------------------------------------------------------------------------

_HK_BETA = 0.01
_HK_W = 32.0 / _HK_BETA


@register(
    "hawkes_intensity",
    f"""
WITH trades AS ({{TRADES_CTE}}),
s AS (
  SELECT symbol, ts_event, seq, epoch_us(ts_event) / 1000000.0 AS tsec
  FROM trades
),
g AS (
  SELECT symbol, ts_event, seq, tsec,
    CAST(floor(tsec / {_HK_W!r}) AS BIGINT) AS seg,
    tsec - CAST(floor(tsec / {_HK_W!r}) AS BIGINT) * {_HK_W!r} AS tau
  FROM s
),
e AS (SELECT *, exp({_HK_BETA!r} * tau) AS ew FROM g),
r AS (
  SELECT symbol, ts_event, seq, tau, seg,
    coalesce(sum(ew) OVER (PARTITION BY symbol, seg ORDER BY ts_event, seq
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
      AS s_loc,
    sum(ew) OVER (PARTITION BY symbol, seg) AS t_seg
  FROM e
),
c AS (
  SELECT symbol, ts_event, seq, tau, s_loc,
    0.0
    + coalesce(max(t_seg) OVER (PARTITION BY symbol ORDER BY seg
                                RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING), 0.0)
      * exp(-{_HK_BETA!r} * {_HK_W!r} * 1)
    + coalesce(max(t_seg) OVER (PARTITION BY symbol ORDER BY seg
                                RANGE BETWEEN 2 PRECEDING AND 2 PRECEDING), 0.0)
      * exp(-{_HK_BETA!r} * {_HK_W!r} * 2) AS carry
  FROM r
),
f AS (
  SELECT symbol, ts_event, seq,
    exp(-{_HK_BETA!r} * tau) * (s_loc + carry) AS intensity
  FROM c
)
SELECT symbol, ts_event, seq,
  round(intensity, 6) + 0 AS intensity,
  round(intensity / (intensity + 1), 6) + 0 AS excitation
FROM f
""".format(TRADES_CTE=TRADES_CTE),
    f"Hawkes self-exciting trade intensity (exp kernel, beta={_HK_BETA}/s) "
    "— order-flow burst detector; segment-renormalized, overflow-free for "
    "unbounded tapes, one symbol exchange, zero Python",
)
def q_hawkes_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.hawkes import hawkes_intensity

    t = trades_from_events(spark, sf_dir)
    out = hawkes_intensity(t, beta=_HK_BETA, seq_col=SEQ_COL)
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "ts_event",
        F.col(SEQ_COL).alias("seq"),
        (F.round("intensity", 6) + z0).alias("intensity"),
        (F.round("excitation", 6) + z0).alias("excitation"),
    )


# --------------------------------------------------------------------------
# C-ext. Winnowing document fingerprints (functions/winnow.py) — MOSS
# fingerprint selection + df-pruned overlap pair screen, replayed by the
# identical packed-key window algebra in SQL.
# --------------------------------------------------------------------------

_WN_K, _WN_W, _WN_MIN_SHARED, _WN_MAX_DF = 4, 4, 2, 50
_WN_POS_CAP = 1 << 22

_WINNOW_SEL_CTE = f"""
{_DOCS_TOK_CTE},
wg AS (SELECT doc_id, toks, len(toks) AS nt FROM tok WHERE len(toks) >= {_WN_K}),
wgr AS (
  SELECT doc_id, i - 1 AS pos, nt - {_WN_K} + 1 AS ng,
         array_to_string(list_slice(toks, i, i + {_WN_K} - 1), ' ') AS gram
  FROM wg, unnest(generate_series(1, nt - {_WN_K} + 1)) AS gs(i)
),
wkk AS (
  SELECT doc_id, pos, ng,
    CAST(('0x' || substr(md5(gram), 1, 10)) AS BIGINT) * {_WN_POS_CAP}
      + ({_WN_POS_CAP - 1} - pos) AS key
  FROM wgr
),
wm AS (
  SELECT doc_id, pos, ng,
    min(key) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {_WN_W - 1} FOLLOWING) AS wmin
  FROM wkk
),
wsel AS (
  SELECT DISTINCT doc_id, wmin // {_WN_POS_CAP} AS fp,
         CAST({_WN_POS_CAP - 1} - (wmin % {_WN_POS_CAP}) AS INTEGER) AS pos
  FROM wm WHERE pos <= ng - {_WN_W}
)"""


@register(
    "winnow_fingerprints",
    f"""
WITH
{_WINNOW_SEL_CTE}
SELECT doc_id, fp, pos FROM wsel
""",
    f"Winnowing (MOSS) document fingerprints — k={_WN_K} grams, "
    f"window w={_WN_W}, rightmost-min tie via one packed-integer window "
    "min; guaranteed hit for any shared run of w+k-1 tokens; one doc "
    "exchange, bounded frame, zero Python",
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.winnow import winnow_fingerprints

    docs = read_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=_WN_K, w=_WN_W)


@register(
    "winnow_dup_pairs",
    f"""
WITH
{_WINNOW_SEL_CTE},
wdfp AS (SELECT DISTINCT doc_id AS doc, fp FROM wsel),
wnf AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_fp FROM wdfp GROUP BY doc),
wfreq AS (SELECT fp FROM wdfp GROUP BY fp HAVING count(*) <= {_WN_MAX_DF}),
wpr AS (SELECT wdfp.doc, wdfp.fp FROM wdfp JOIN wfreq USING (fp)),
wpairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(count(*) AS BIGINT) AS shared
  FROM wpr a JOIN wpr b ON a.fp = b.fp AND a.doc < b.doc
  GROUP BY 1, 2 HAVING count(*) >= {_WN_MIN_SHARED}
)
SELECT doc_a, doc_b, shared,
  round(CAST(shared AS DOUBLE) / least(na.n_fp, nb.n_fp), 6) + 0 AS overlap
FROM wpairs
JOIN wnf na ON na.doc = doc_a
JOIN wnf nb ON nb.doc = doc_b
""",
    "Fingerprint-overlap duplicate pairs (df-pruned posting-list "
    "equi-join — boilerplate fingerprints dropped before the join, so "
    "no hot bucket; containment-style overlap score)",
)
def q_winnow_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.winnow import winnow_duplicate_pairs

    docs = read_table(spark, sf_dir, "documents")
    out = winnow_duplicate_pairs(
        docs,
        k=_WN_K,
        w=_WN_W,
        min_shared=_WN_MIN_SHARED,
        max_df=_WN_MAX_DF,
    )
    return out.select(
        "doc_a",
        "doc_b",
        "shared",
        (F.round("overlap", 6) + F.lit(0.0)).alias("overlap"),
    )


# --------------------------------------------------------------------------
# C-ext. Zipf-law corpus fit (functions/tfidf.py::zipf_fit) — corpus-level
# quality gate; rank-ordered running-sum OLS replayed exactly.
# --------------------------------------------------------------------------

_ZF_K = 400


@register(
    "zipf_fit",
    f"""
WITH
{_DOCS_TOK_CTE},
ztk AS (SELECT unnest(toks) AS token FROM tok),
zcnt AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM ztk GROUP BY token),
ztot AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab,
                CAST(sum(cnt) AS BIGINT) AS total_tokens FROM zcnt),
ztop AS (SELECT token, cnt FROM zcnt ORDER BY cnt DESC, token ASC LIMIT {_ZF_K}),
zrk AS (SELECT *, CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS INTEGER)
               AS rank FROM ztop),
zst AS (SELECT rank, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
        FROM zrk),
zrun AS (
  SELECT rank,
    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
    sum(x * x) OVER w AS sxx, sum(x * y) OVER w AS sxy, sum(y * y) OVER w AS syy,
    count(*) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS nn
  FROM zst
  WINDOW w AS (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
zlast AS (SELECT * FROM zrun WHERE rank = nn),
zf AS (
  SELECT CAST(nn AS BIGINT) AS n_ranks,
    -((nn * sxy - sx * sy) / (nn * sxx - sx * sx)) AS alpha,
    (sy - ((nn * sxy - sx * sy) / (nn * sxx - sx * sx)) * sx) / nn AS intercept,
    CASE WHEN (nn * syy - sy * sy) > 0
         THEN (nn * sxy - sx * sy) * (nn * sxy - sx * sy)
              / ((nn * sxx - sx * sx) * (nn * syy - sy * sy)) END AS r2
  FROM zlast
)
SELECT n_ranks, n_vocab, total_tokens,
  round(alpha, 6) + 0 AS alpha,
  round(intercept, 6) + 0 AS intercept,
  round(r2, 6) + 0 AS r2
FROM zf CROSS JOIN ztot
""",
    f"Zipf-law OLS fit over the top-{_ZF_K} token frequencies "
    "(corpus-level spam/boilerplate gate; TakeOrdered top-k, "
    "rank-ordered running-sum OLS so the double fold order is "
    "engine-independent, integer full-vocab stats)",
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import zipf_fit

    docs = read_table(spark, sf_dir, "documents")
    out = zipf_fit(docs, top_k=_ZF_K)
    z0 = F.lit(0.0)
    return out.select(
        "n_ranks",
        "n_vocab",
        "total_tokens",
        (F.round("alpha", 6) + z0).alias("alpha"),
        (F.round("intercept", 6) + z0).alias("intercept"),
        (F.round("r2", 6) + z0).alias("r2"),
    )


# --------------------------------------------------------------------------
# C-ext. Real JPEG header metadata (functions/multimodal.py::
# _parse_jpeg_sof) — deterministic JFIF marker streams synthesized per
# doc; dimensions read by walking APP0/DQT to the SOF0 segment (a real
# variable-length parser, not a fixed-offset peek).  110-byte streams.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_metadata",
    """
SELECT
  doc_id AS media_id,
  CAST(16 + doc_id % 613 AS INTEGER) AS width,
  CAST(16 + doc_id % 377 AS INTEGER) AS height,
  CAST(110 AS BIGINT) AS n_bytes
FROM documents
""",
    "Real JPEG metadata: synthesized JFIF marker streams (SOI/APP0/DQT/"
    "SOF0/EOI, correct segment lengths), dimensions parsed by walking "
    "the variable-length marker stream to SOF0 — pure Python, no codec "
    "lib; byte count replayed arithmetically",
)
def q_multimodal_jpeg_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        extract_media_metadata,
        synthesize_jpeg,
    )

    media = synthesize_jpeg(read_table(spark, sf_dir, "documents")).withColumn(
        "media_type", F.lit("image")
    )
    out = extract_media_metadata(media)
    return out.select("media_id", "width", "height", "n_bytes")


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
# C-ext. HAR-RV volatility forecasting regression (operators/har.py) —
# per-symbol Corsi cascade OLS; prefix-difference lag means and
# bucket-ordered running normal-equation sums replayed verbatim.
# --------------------------------------------------------------------------

_HAR_W_US = 6 * 3600 * 1_000_000  # 6h buckets
_HAR_PM, _HAR_PL, _HAR_MIN = 4, 28, 12


@register(
    "har_rv",
    f"""
WITH trades AS ({{TRADES_CTE}}),
hs AS (
  SELECT symbol, ts_event, seq, price,
    ln(price / lag(price) OVER (PARTITION BY symbol ORDER BY ts_event, seq)) AS r
  FROM trades
),
hrv AS (
  SELECT symbol, CAST(floor(epoch_us(ts_event) / {_HAR_W_US}) AS BIGINT) AS b,
         sum(r * r) AS rv
  FROM hs WHERE r IS NOT NULL GROUP BY symbol, b
),
hcnt AS (SELECT symbol, CAST(count(*) AS BIGINT) AS n_buckets FROM hrv GROUP BY symbol),
hf0 AS (
  SELECT symbol, b, rv,
    row_number() OVER (PARTITION BY symbol ORDER BY b) AS rn,
    sum(rv) OVER (PARTITION BY symbol ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM hrv
),
hf1 AS (
  SELECT symbol, b, rv, rn,
    lag(rv, 1) OVER wb AS xs,
    (lag(p, 1) OVER wb - coalesce(lag(p, {_HAR_PM + 1}) OVER wb, 0.0)) / {_HAR_PM} AS xm,
    (lag(p, 1) OVER wb - coalesce(lag(p, {_HAR_PL + 1}) OVER wb, 0.0)) / {_HAR_PL} AS xl
  FROM hf0 WINDOW wb AS (PARTITION BY symbol ORDER BY b)
),
hf2 AS (SELECT * FROM hf1 WHERE rn >= {_HAR_PL + 1}),
hsm AS (
  SELECT symbol, b, rv AS y, xs, xm, xl,
    count(*) OVER wr AS n_, count(*) OVER (PARTITION BY symbol) AS nn_,
    sum(xs) OVER wr AS ss, sum(xm) OVER wr AS sm, sum(xl) OVER wr AS sl,
    sum(rv) OVER wr AS sy,
    sum(xs * xs) OVER wr AS sss, sum(xm * xm) OVER wr AS smm,
    sum(xl * xl) OVER wr AS sll,
    sum(xs * xm) OVER wr AS ssm, sum(xs * xl) OVER wr AS ssl,
    sum(xm * xl) OVER wr AS sml,
    sum(xs * rv) OVER wr AS ssy, sum(xm * rv) OVER wr AS smy,
    sum(xl * rv) OVER wr AS sly, sum(rv * rv) OVER wr AS syy
  FROM hf2
  WINDOW wr AS (PARTITION BY symbol ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
hlast AS (SELECT * FROM hsm WHERE n_ = nn_),
hols AS (
  SELECT symbol, CAST(n_ AS BIGINT) AS n_obs,
    CAST(n_ AS DOUBLE) AS n,
    sss - ss * ss / CAST(n_ AS DOUBLE) AS css,
    smm - sm * sm / CAST(n_ AS DOUBLE) AS cmm,
    sll - sl * sl / CAST(n_ AS DOUBLE) AS cll,
    ssm - ss * sm / CAST(n_ AS DOUBLE) AS csm,
    ssl - ss * sl / CAST(n_ AS DOUBLE) AS csl,
    sml - sm * sl / CAST(n_ AS DOUBLE) AS cml,
    ssy - ss * sy / CAST(n_ AS DOUBLE) AS csy,
    smy - sm * sy / CAST(n_ AS DOUBLE) AS cmy,
    sly - sl * sy / CAST(n_ AS DOUBLE) AS cly,
    syy - sy * sy / CAST(n_ AS DOUBLE) AS cyy,
    ss, sm, sl, sy
  FROM hlast
),
hcoef AS (
  SELECT symbol, n_obs, n, ss, sm, sl, sy, csy, cmy, cly, cyy,
    css * (cmm * cll - cml * cml)
      - csm * (csm * cll - cml * csl)
      + csl * (csm * cml - cmm * csl) AS det,
    (csy * (cmm * cll - cml * cml)
      - csm * (cmy * cll - cml * cly)
      + csl * (cmy * cml - cmm * cly)) AS num_s,
    (css * (cmy * cll - cly * cml)
      - csy * (csm * cll - cml * csl)
      + csl * (csm * cly - cmy * csl)) AS num_m,
    (css * (cmm * cly - cml * cmy)
      - csm * (csm * cly - cmy * csl)
      + csy * (csm * cml - cmm * csl)) AS num_l
  FROM hols
),
hfit AS (
  SELECT symbol, n_obs,
    n_obs >= {_HAR_MIN} AND abs(det) > 1e-30 AS ok,
    num_s / det AS b_s, num_m / det AS b_m, num_l / det AS b_l,
    (sy - (num_s / det) * ss - (num_m / det) * sm - (num_l / det) * sl) / n AS c,
    CASE WHEN cyy > 0
         THEN 1.0 - (cyy - ((num_s / det) * csy + (num_m / det) * cmy
                            + (num_l / det) * cly)) / cyy END AS r2
  FROM hcoef
)
SELECT hcnt.symbol, hcnt.n_buckets,
  coalesce(hfit.n_obs, 0) AS n_obs,
  round(CASE WHEN ok THEN c END, 6) + 0 AS c,
  round(CASE WHEN ok THEN b_s END, 6) + 0 AS b_s,
  round(CASE WHEN ok THEN b_m END, 6) + 0 AS b_m,
  round(CASE WHEN ok THEN b_l END, 6) + 0 AS b_l,
  round(CASE WHEN ok THEN r2 END, 6) + 0 AS r2
FROM hcnt LEFT JOIN hfit ON hfit.symbol = hcnt.symbol
""".format(TRADES_CTE=TRADES_CTE),
    f"HAR-RV (Corsi) per-symbol vol-forecast OLS — 6h realized-variance "
    f"buckets, lag means over {_HAR_PM}/{_HAR_PL} observed buckets via "
    "prefix differences (never sliding re-aggregation), bucket-ordered "
    "running normal-equation sums, closed-form 3x3 Cramer solve; one "
    "symbol exchange, zero Python",
)
def q_har_rv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.har import har_rv

    t = trades_from_events(spark, sf_dir)
    out = har_rv(
        t, bucket="6h", p_mid=_HAR_PM, p_long=_HAR_PL, min_obs=_HAR_MIN,
        seq_col=SEQ_COL,
    )
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_buckets",
        "n_obs",
        (F.round("c", 6) + z0).alias("c"),
        (F.round("b_s", 6) + z0).alias("b_s"),
        (F.round("b_m", 6) + z0).alias("b_m"),
        (F.round("b_l", 6) + z0).alias("b_l"),
        (F.round("r2", 6) + z0).alias("r2"),
    )


# --------------------------------------------------------------------------
# C-ext. Permutation entropy (operators/entropy.py::permutation_entropy)
# — ordinal-pattern complexity; integer pattern codes + code-ordered
# entropy fold replayed exactly.
# --------------------------------------------------------------------------


@register(
    "permutation_entropy",
    """
WITH trades AS ({TRADES_CTE}),
pe0 AS (
  SELECT symbol, price,
    lead(price, 1) OVER w AS b2, lead(price, 2) OVER w AS c2
  FROM trades WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
),
pe1 AS (
  SELECT symbol,
    (CASE WHEN b2 < price THEN 4 ELSE 0 END
     + CASE WHEN c2 < price THEN 2 ELSE 0 END
     + CASE WHEN c2 < b2 THEN 1 ELSE 0 END) AS code
  FROM pe0 WHERE c2 IS NOT NULL
),
pec AS (SELECT symbol, code, CAST(count(*) AS BIGINT) AS n
        FROM pe1 GROUP BY symbol, code),
pet AS (
  SELECT symbol, code, n,
    row_number() OVER (PARTITION BY symbol ORDER BY code) AS rn,
    count(*) OVER (PARTITION BY symbol) AS k,
    sum(n) OVER (PARTITION BY symbol) AS tot,
    max(n) OVER (PARTITION BY symbol) AS mx
  FROM pec
),
per AS (
  SELECT *,
    sum(-((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
          * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))))
      OVER (PARTITION BY symbol ORDER BY code
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
  FROM pet
)
SELECT symbol, CAST(tot AS BIGINT) AS n_windows,
  round(h / ln(6.0), 6) + 0 AS perm_entropy,
  round(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0 AS top_pattern_share
FROM per WHERE rn = k
""".format(TRADES_CTE=TRADES_CTE),
    "Permutation entropy (Bandt-Pompe m=3) per symbol — ordinal-pattern "
    "complexity, monotone-transform invariant; 3 codegen comparisons + "
    "one (symbol,pattern) hash aggregate + code-ordered entropy fold, "
    "zero Python",
)
def q_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.entropy import permutation_entropy

    t = trades_from_events(spark, sf_dir)
    out = permutation_entropy(t, seq_col=SEQ_COL)
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_windows",
        (F.round("perm_entropy", 6) + z0).alias("perm_entropy"),
        (F.round("top_pattern_share", 6) + z0).alias("top_pattern_share"),
    )


# --------------------------------------------------------------------------
# C-ext. Markov event transitions (functions/events.py::event_transitions)
# — clickstream transition matrix; exact integer ratios.
# --------------------------------------------------------------------------


@register(
    "event_transitions",
    """
WITH t0 AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
t1 AS (
  SELECT event_type AS from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM t0 WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
  round(CAST(n AS DOUBLE)
        / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) + 0 AS p
FROM t1
""",
    "First-order Markov transition matrix over per-user event streams "
    "(user-journey analytics / pipeline drift baseline) — one lead "
    "window + one vocabulary-sized hash aggregate; probabilities are "
    "exact integer ratios, zero Python",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.events import event_transitions

    ev = read_table(spark, sf_dir, "events")
    out = event_transitions(ev)
    return out.select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        (F.round("p", 6) + F.lit(0.0)).alias("p"),
    )


# --------------------------------------------------------------------------
# C-ext. Flesch reading ease (functions/text.py::reading_ease) — integer
# word/sentence/syllable counts, engine-exact score.
# --------------------------------------------------------------------------


@register(
    "reading_ease",
    f"""
WITH
{_DOCS_TOK_CTE},
fe AS (
  SELECT doc_id, toks,
    greatest(1, len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                s -> trim(s) != ''))) AS n_sents
  FROM tok
),
fs AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
    CAST(n_sents AS BIGINT) AS n_sentences,
    CAST(coalesce(list_sum(list_transform(toks, t -> greatest(1,
        len(regexp_extract_all(t, '[aeiouy]+'))
        - CASE WHEN t LIKE '%e' AND length(t) > 2
               AND len(regexp_extract_all(t, '[aeiouy]+')) > 1
          THEN 1 ELSE 0 END))), 0) AS BIGINT) AS n_syllables
  FROM fe
)
SELECT doc_id, n_words, n_sentences, n_syllables,
  round(CASE WHEN n_words > 0
        THEN 206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        END, 6) + 0 AS flesch
FROM fs
""",
    "Flesch reading ease per document (vowel-group syllables with "
    "silent-e rule, sentence floor 1) — staged-array HOFs, integer "
    "counts, zero shuffles, zero Python",
)
def q_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import reading_ease

    docs = read_table(spark, sf_dir, "documents")
    out = reading_ease(docs)
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.round("flesch", 6) + F.lit(0.0)).alias("flesch"),
    )


# --------------------------------------------------------------------------
# C-ext. DSIR importance log-weights (functions/corpus.py::
# dsir_log_weights) — hashed-bigram target/raw LM ratio; integer bucket
# LMs + doc-ordered running reduce replayed exactly.
# --------------------------------------------------------------------------

_DSIR_B = 4096


@register(
    "dsir_weights",
    f"""
WITH
{_DOCS_TOK_CTE},
db0 AS (
  SELECT doc_id, lang = 'en' AS tgt, toks, len(toks) AS ntok FROM tok
),
dg AS (
  SELECT doc_id, tgt, toks[i] || ' ' || toks[i + 1] AS gram
  FROM db0, unnest(generate_series(1, ntok - 1)) AS gs(i)
  WHERE ntok >= 2
),
dfeat AS (
  SELECT doc_id, tgt, {_sql_hash60('gram')} % {_DSIR_B} AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM dg GROUP BY 1, 2, 3
),
dlm AS (
  SELECT b, CAST(sum(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(c) AS BIGINT) AS cr
  FROM dfeat GROUP BY b
),
dtot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt_, CAST(sum(cr) AS BIGINT) AS nr_ FROM dlm),
drat AS (
  SELECT b,
    ln(CAST(ct + 1 AS DOUBLE) / CAST(nt_ + {_DSIR_B} AS DOUBLE))
    - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr_ + {_DSIR_B} AS DOUBLE)) AS lr
  FROM dlm CROSS JOIN dtot
),
dsc AS (SELECT f.doc_id, f.b, f.c, r.lr FROM dfeat f JOIN drat r USING (b)),
drun AS (
  SELECT doc_id, b,
    row_number() OVER (PARTITION BY doc_id ORDER BY b) AS rn,
    count(*) OVER (PARTITION BY doc_id) AS k,
    sum(c) OVER (PARTITION BY doc_id) AS nf,
    sum(CAST(c AS DOUBLE) * lr) OVER (PARTITION BY doc_id ORDER BY b
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w
  FROM dsc
),
dlast AS (SELECT doc_id, CAST(nf AS BIGINT) AS n_feats, w AS log_w
          FROM drun WHERE rn = k)
SELECT d.doc_id, coalesce(l.n_feats, 0) AS n_feats,
  round(l.log_w, 6) + 0 AS log_w
FROM documents d LEFT JOIN dlast l USING (doc_id)
""",
    f"DSIR importance log-weights (hashed bigrams, {_DSIR_B} buckets, "
    "add-1 smoothing; target = lang='en') — domain-tilted data "
    "selection; integer bucket LMs, broadcast ratio join, "
    "bucket-ordered per-doc reduce, zero Python",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import dsir_log_weights

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "__is_en", F.col("lang") == "en"
    )
    out = dsir_log_weights(docs, is_target_col="__is_en", n_buckets=_DSIR_B)
    return out.select(
        "doc_id",
        "n_feats",
        (F.round("log_w", 6) + F.lit(0.0)).alias("log_w"),
    )


# --------------------------------------------------------------------------
# C-ext. Fama-MacBeth second pass with Newey-West t-stat
# (operators/cross_section.py::fama_macbeth_summary) — gamma series
# recomputed by the same CTEs, summary folds replayed in ts order.
# --------------------------------------------------------------------------

_FM_NW = 4
_FM_NW_TERMS = " + ".join(
    f"{2.0 * (1.0 - l / (_FM_NW + 1.0))!r} * coalesce(c{l}, 0.0)"
    for l in range(1, _FM_NW + 1)
)
_FM_NW_LAGS_SQL = ",\n    ".join(
    f"lag(dd, {l}) OVER (ORDER BY ts) AS d{l}" for l in range(1, _FM_NW + 1)
)
_FM_NW_SUMS_SQL = ",\n    ".join(
    f"sum(dd * d{l}) OVER wr AS c{l}" for l in range(1, _FM_NW + 1)
)


@register(
    "fama_macbeth_nw",
    f"""
WITH
{_FEATURE_BARS_CTE},
r0 AS (
  SELECT ts,
    lead(close) OVER w / close - 1 AS fwd,
    close / lag(close, {_FM_LB}) OVER w - 1 AS fac
  FROM bars WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
r1 AS (SELECT * FROM r0 WHERE fwd IS NOT NULL AND fac IS NOT NULL),
g AS (
  SELECT ts, CAST(count(*) AS BIGINT) AS n_obs,
    sum(fac) AS sx, sum(fwd) AS sy, sum(fac*fac) AS sxx, sum(fac*fwd) AS sxy
  FROM r1 GROUP BY ts
),
fit AS (
  SELECT ts, n_obs,
    CASE WHEN n_obs*sxx - sx*sx > 0
         THEN (n_obs*sxy - sx*sy) / (n_obs*sxx - sx*sx) END AS gamma1,
    sx, sy
  FROM g WHERE n_obs >= {_FM_MIN}
),
fmg AS (
  SELECT ts, gamma1, (sy - gamma1*sx) / n_obs AS gamma0
  FROM fit WHERE gamma1 IS NOT NULL
),
fms AS (
  SELECT ts, gamma1, gamma0,
    count(*) OVER wf AS T,
    sum(gamma1) OVER wf / count(*) OVER wf AS mu1,
    sum(gamma0) OVER wf / count(*) OVER wf AS mu0
  FROM fmg
  WINDOW wf AS (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING
                AND UNBOUNDED FOLLOWING)
),
fmd AS (SELECT ts, T, mu1, mu0, gamma1 - mu1 AS dd FROM fms),
fml AS (
  SELECT *, row_number() OVER (ORDER BY ts) AS rn,
    {_FM_NW_LAGS_SQL}
  FROM fmd
),
fmc AS (
  SELECT *, sum(dd * dd) OVER wr AS c0,
    {_FM_NW_SUMS_SQL}
  FROM fml
  WINDOW wr AS (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
fmlast AS (SELECT * FROM fmc WHERE rn = T),
fmout AS (
  SELECT CAST(T AS BIGINT) AS n_periods, mu1, mu0,
    (c0 + {_FM_NW_TERMS}) / (CAST(T AS DOUBLE) * CAST(T AS DOUBLE)) AS var_mean,
    T > {_FM_NW + 1} AS enough
  FROM fmlast
)
SELECT n_periods,
  round(mu1, 6) + 0 AS gamma1_mean,
  round(CASE WHEN enough AND var_mean > 0 THEN mu1 / sqrt(var_mean) END, 6) + 0
    AS gamma1_t_nw,
  round(mu0, 6) + 0 AS gamma0_mean,
  CAST({_FM_NW} AS INTEGER) AS nw_lags
FROM fmout
""",
    f"Fama-MacBeth second pass: time-series mean of the per-period "
    f"factor return with a Newey-West (Bartlett, L={_FM_NW}) HAC "
    "t-stat — summary folds over the aggregate-bounded gamma series, "
    "ts-ordered running sums, zero Python",
)
def q_fama_macbeth_nw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import fama_macbeth_summary

    with _trades_config():
        bars = bars_ops.time_bars(
            trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE
        )
    out = fama_macbeth_summary(
        bars, lookback=_FM_LB, min_obs=_FM_MIN, nw_lags=_FM_NW,
        ts_col="ts_event", close_col="close",
    )
    z0 = F.lit(0.0)
    return out.select(
        "n_periods",
        (F.round("gamma1_mean", 6) + z0).alias("gamma1_mean"),
        (F.round("gamma1_t_nw", 6) + z0).alias("gamma1_t_nw"),
        (F.round("gamma0_mean", 6) + z0).alias("gamma0_mean"),
        "nw_lags",
    )


# --------------------------------------------------------------------------
# C-ext. Deflated Sharpe ratio (operators/backtest.py::deflated_sharpe) —
# PSR/DSR probabilities via the SAME A&S erf polynomial in both engines;
# trial-max quantiles are Python-computed constants injected verbatim.
# --------------------------------------------------------------------------

_DS_TRIALS = 10


def _sql_norm_cdf(z: str) -> str:
    """DuckDB twin of operators/backtest.py::_norm_cdf — identical
    constants and association, so probabilities match bit-for-bit."""
    import math as _m

    from polars_trading_spark.operators.backtest import _AS_A, _AS_P

    a1, a2, a3, a4, a5 = _AS_A
    x = f"(({z}) / {_m.sqrt(2.0)!r})"
    sign = f"(CASE WHEN {x} < 0 THEN -1.0 ELSE 1.0 END)"
    ax = f"abs({x})"
    t = f"(1.0 / (1.0 + {_AS_P!r} * {ax}))"
    poly = (
        f"((((({a5!r} * {t} + {a4!r}) * {t} + {a3!r}) * {t} + {a2!r}) * {t}"
        f" + {a1!r}) * {t})"
    )
    return f"(0.5 * (1.0 + {sign} * (1.0 - {poly} * exp(-{ax} * {ax}))))"


def _ds_consts():
    import math as _m
    from statistics import NormalDist

    nd = NormalDist()
    gamma = 0.5772156649015329
    z1 = nd.inv_cdf(1.0 - 1.0 / _DS_TRIALS)
    z2 = nd.inv_cdf(1.0 - 1.0 / (_DS_TRIALS * _m.e))
    return (1.0 - gamma) * z1 + gamma * z2


@register(
    "deflated_sharpe",
    f"""
WITH
{_FEATURE_BARS_CTE},
rets AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS ret
  FROM bars
),
r2 AS (SELECT symbol, ret FROM rets WHERE ret IS NOT NULL),
agg AS (
  SELECT symbol, count(ret) AS n, sum(ret) AS s1, sum(ret*ret) AS s2,
    sum(ret*ret*ret) AS s3, sum(ret*ret*ret*ret) AS s4
  FROM r2 GROUP BY symbol
),
calc AS (
  SELECT symbol, n, s1 / n AS mu,
    s2 / n - (s1 / n) * (s1 / n) AS m2,
    s3 / n - 3 * (s1 / n) * s2 / n
      + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
    s4 / n - 4 * (s1 / n) * s3 / n
      + 6 * (s1 / n) * (s1 / n) * s2 / n
      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4,
    CASE WHEN n > 1 THEN (s2 - n * (s1 / n) * (s1 / n)) / (n - 1) END AS var_s
  FROM agg
),
calc2 AS (
  SELECT *, CASE WHEN var_s > 0 THEN sqrt(var_s) END AS sd,
    CASE WHEN m2 > 0 THEN m3 / power(m2, 1.5) END AS g3,
    CASE WHEN m2 > 0 THEN m4 / (m2 * m2) END AS g4
  FROM calc
),
calc3 AS (
  SELECT *, mu / sd AS sr,
    1 - (CASE WHEN m2 > 0 THEN m3 / power(m2, 1.5) END) * (mu / sd)
      + ((CASE WHEN m2 > 0 THEN m4 / (m2 * m2) END) - 1) / 4
        * (mu / sd) * (mu / sd) AS psr_var
  FROM calc2
),
dsv AS (
  SELECT symbol, n, sr, g3, g4, psr_var,
    CASE WHEN n > 1 AND psr_var > 0
         THEN sr * sqrt(n - 1) / sqrt(psr_var) END AS psr_z,
    (sr * {_BT_SQRT_PPY!r}) AS sharpe_ann,
    ((sr * {_BT_SQRT_PPY!r}) / {_BT_SQRT_PPY!r}) AS srp
  FROM calc3 WHERE sr IS NOT NULL
),
dsr0 AS (
  SELECT srp, row_number() OVER (ORDER BY symbol) AS rn,
    count(*) OVER () AS k_,
    sum(srp) OVER (ORDER BY symbol ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS s1_,
    sum(srp * srp) OVER (ORDER BY symbol ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS s2_
  FROM dsv
),
dsvv AS (
  SELECT CASE WHEN k_ > 1
         THEN (s2_ - k_ * (s1_ / k_) * (s1_ / k_)) / (k_ - 1) END AS v
  FROM dsr0 WHERE rn = k_
),
dsfin AS (
  SELECT d.symbol, d.n, d.sharpe_ann, d.psr_z,
    sqrt(CASE WHEN v.v > 0 THEN v.v END) * {_ds_consts()!r} AS sr0,
    d.srp, d.g3, d.g4
  FROM dsv d CROSS JOIN dsvv v
),
dsz AS (
  SELECT symbol, n, sharpe_ann, psr_z, sr0,
    CASE WHEN n > 1
          AND (1.0 - g3 * srp + (g4 - 1) / 4 * srp * srp) > 0
         THEN (srp - sr0) * sqrt(n - 1)
              / sqrt(1.0 - g3 * srp + (g4 - 1) / 4 * srp * srp) END AS dsr_z
  FROM dsfin
)
SELECT symbol, CAST(n AS BIGINT) AS n_periods,
  round(sharpe_ann, 6) + 0 AS sharpe,
  round(psr_z, 6) + 0 AS psr_z,
  round({_sql_norm_cdf('psr_z')}, 6) + 0 AS psr_prob,
  round(sr0, 6) + 0 AS sr0,
  round(dsr_z, 6) + 0 AS dsr_z,
  round({_sql_norm_cdf('dsr_z')}, 6) + 0 AS dsr_prob,
  CAST({_DS_TRIALS} AS INTEGER) AS n_trials
FROM dsz
""",
    f"Probabilistic + Deflated Sharpe (Bailey-Lopez de Prado, "
    f"N={_DS_TRIALS} trials) — multiple-testing-aware evaluation; "
    "trial-max quantiles as injected constants, normal CDF via the "
    "shared A&S erf polynomial, symbol-ordered cross-trial variance "
    "fold over the aggregate-bounded stats frame, zero Python",
)
def q_deflated_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.backtest import deflated_sharpe

    with _trades_config():
        bars = bars_ops.time_bars(
            trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE
        )
    out = deflated_sharpe(
        bars, periods_per_year=_BT_PPY, n_trials=_DS_TRIALS,
        ts_col="ts_event", close_col="close",
    )
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_periods",
        (F.round("sharpe", 6) + z0).alias("sharpe"),
        (F.round("psr_z", 6) + z0).alias("psr_z"),
        (F.round("psr_prob", 6) + z0).alias("psr_prob"),
        (F.round("sr0", 6) + z0).alias("sr0"),
        (F.round("dsr_z", 6) + z0).alias("dsr_z"),
        (F.round("dsr_prob", 6) + z0).alias("dsr_prob"),
        "n_trials",
    )


# --------------------------------------------------------------------------
# C-ext. Nearest as-of join (operators/asof.py strategy="nearest") —
# closest-in-either-direction match, ties backward; oracle via
# correlated min/max subqueries against the unique-keyed bar frame.
# --------------------------------------------------------------------------


@register(
    "asof_join_nearest",
    f"""
WITH
{_FEATURE_BARS_CTE},
nk AS (
  SELECT t.symbol, t.ts_event, t.seq, t.price,
    (SELECT max(b.ts) FROM bars b
     WHERE b.symbol = t.symbol AND b.ts <= t.ts_event) AS kb,
    (SELECT min(b.ts) FROM bars b
     WHERE b.symbol = t.symbol AND b.ts >= t.ts_event) AS kf
  FROM trades t
),
nc AS (
  SELECT symbol, ts_event, seq, price,
    CASE WHEN kf IS NULL THEN kb
         WHEN kb IS NULL THEN kf
         WHEN (ts_event - kb) <= (kf - ts_event) THEN kb
         ELSE kf END AS mk
  FROM nk
)
SELECT nc.symbol, nc.ts_event, nc.seq, nc.mk AS bar_ts,
  b.close AS bar_close, CAST(b.volume AS BIGINT) AS bar_volume
FROM nc LEFT JOIN bars b ON b.symbol = nc.symbol AND b.ts = nc.mk
""",
    "Nearest as-of join (closest 15m bar in either direction, ties "
    "backward) — both directional scans over one union-marker exchange, "
    "running frames only, zero Python",
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.asof import asof_join

    t = trades_from_events(spark, sf_dir)
    with _trades_config():
        bars = bars_ops.time_bars(t, bar_size=TIME_BAR_SIZE)
    right = bars.select(
        "symbol",
        F.col("ts_event").alias("bar_ts"),  # bucket boundary (time_bars
        # keeps the configured timestamp name for the bucket column)
        F.col("close").alias("bar_close"),
        F.col("volume").alias("bar_volume"),
    )
    out = asof_join(
        t.select("symbol", "ts_event", F.col(SEQ_COL).alias("seq"), "price"),
        right,
        left_on="ts_event",
        right_on="bar_ts",
        by="symbol",
        strategy="nearest",
    )
    return out.select(
        "symbol", "ts_event", "seq", "bar_ts", "bar_close", "bar_volume"
    )


# --------------------------------------------------------------------------
# C-ext. Interval (range) join (operators/interval.py) — bucketed
# equi-join, never nested-loop; event-window trade aggregation replayed
# by a direct theta join.
# --------------------------------------------------------------------------


@register(
    "interval_join_events",
    """
WITH trades AS ({TRADES_CTE}),
ev AS (
  SELECT symbol, ts_event AS w_start,
         ts_event + INTERVAL 45 MINUTES AS w_end, seq AS event_seq
  FROM trades WHERE seq % 50 = 0
)
SELECT e.symbol, e.event_seq, e.w_start,
  CAST(count(*) AS BIGINT) AS n_trades,
  CAST(sum(t.size) AS BIGINT) AS sum_size
FROM ev e JOIN trades t
  ON t.symbol = e.symbol AND t.ts_event >= e.w_start AND t.ts_event <= e.w_end
GROUP BY 1, 2, 3
""".format(TRADES_CTE=TRADES_CTE),
    "Interval join: trades aggregated into 45m event windows via the "
    "bucketed-grid equi-join (fan-out bounded, AQE-skew-splittable; "
    "Spark's raw BETWEEN join would nested-loop) — integer outputs",
)
def q_interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.interval import interval_join

    t = trades_from_events(spark, sf_dir).select(
        "symbol", "ts_event", F.col(SEQ_COL).alias("seq"), "size"
    )
    ev = t.where(F.col("seq") % 50 == 0).select(
        "symbol",
        F.col("ts_event").alias("w_start"),
        (F.col("ts_event") + F.expr("INTERVAL 45 MINUTES")).alias("w_end"),
        F.col("seq").alias("event_seq"),
    )
    j = interval_join(
        t,
        ev,
        point_on="ts_event",
        start_on="w_start",
        end_on="w_end",
        by="symbol",
        bucket="45m",
    )
    return j.groupBy("symbol", "event_seq", "w_start").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("size").cast("long").alias("sum_size"),
    )


# --------------------------------------------------------------------------
# C-ext. Funnel latency profile (functions/events.py::funnel_latency) —
# step-pair conversion + exact count-based median/p90 latencies.
# --------------------------------------------------------------------------


@register(
    "funnel_latency",
    f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events WHERE event_type IN ({", ".join(f"'{s}'" for s in _FUNNEL_STEPS)})
),
arr AS (
  SELECT user_id,
    {", ".join(f"list_sort(list(ts) FILTER (WHERE event_type = '{s}')) AS a_{s}" for s in _FUNNEL_STEPS)}
  FROM ev GROUP BY user_id
),
s1 AS (SELECT *, a_view[1] AS ts_view FROM arr),
s2 AS (SELECT *, CASE WHEN ts_view IS NOT NULL
        THEN list_filter(a_click, x -> x > ts_view)[1] END AS ts_click FROM s1),
s3 AS (SELECT *, CASE WHEN ts_click IS NOT NULL
        THEN list_filter(a_signup, x -> x > ts_click)[1] END AS ts_signup FROM s2),
s4 AS (SELECT *, CASE WHEN ts_signup IS NOT NULL
        THEN list_filter(a_purchase, x -> x > ts_signup)[1] END AS ts_purchase FROM s3),
fp AS (
  SELECT 1 AS step_idx, 'view' AS step_from, 'click' AS step_to,
         user_id AS u, ts_view AS ta, ts_click AS tb FROM s4
  UNION ALL
  SELECT 2, 'click', 'signup', user_id, ts_click, ts_signup FROM s4
  UNION ALL
  SELECT 3, 'signup', 'purchase', user_id, ts_signup, ts_purchase FROM s4
),
fb AS (SELECT *, epoch_us(tb) - epoch_us(ta) AS lat FROM fp),
fconv AS (
  SELECT step_idx, step_from, step_to,
    CAST(sum(CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_from,
    CAST(sum(CASE WHEN tb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_to
  FROM fb GROUP BY 1, 2, 3
),
frk AS (
  SELECT step_idx, lat,
    row_number() OVER (PARTITION BY step_idx ORDER BY lat, u) AS rk,
    count(*) OVER (PARTITION BY step_idx) AS n
  FROM fb WHERE lat IS NOT NULL
),
fsel AS (
  SELECT step_idx,
    max(CASE WHEN rk = floor((n + 1) / 2) THEN lat END) AS med_us,
    max(CASE WHEN rk = floor((9 * n + 9) / 10) THEN lat END) AS p90_us
  FROM frk GROUP BY step_idx
)
SELECT c.step_idx, c.step_from, c.step_to, c.n_from, c.n_to,
  round(CASE WHEN n_from > 0
        THEN CAST(n_to AS DOUBLE) / CAST(n_from AS DOUBLE) END, 6) + 0
    AS conv_rate,
  round(med_us / 1000000.0, 6) + 0 AS med_latency_s,
  round(p90_us / 1000000.0, 6) + 0 AS p90_latency_s
FROM fconv c LEFT JOIN fsel s ON s.step_idx = c.step_idx
""",
    "Funnel step-pair conversion + EXACT count-based median/p90 "
    "latency ((n+1)//2 and integer-ceil 0.9n order statistics, "
    "user-id tie-break) — one funnel pass, per-pair rank windows, "
    "zero Python",
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.events import funnel_latency

    ev = read_table(spark, sf_dir, "events")
    out = funnel_latency(ev, _FUNNEL_STEPS)
    z0 = F.lit(0.0)
    return out.select(
        "step_idx",
        "step_from",
        "step_to",
        "n_from",
        "n_to",
        (F.round("conv_rate", 6) + z0).alias("conv_rate"),
        (F.round("med_latency_s", 6) + z0).alias("med_latency_s"),
        (F.round("p90_latency_s", 6) + z0).alias("p90_latency_s"),
    )


# --------------------------------------------------------------------------
# C-ext. N-gram novelty (functions/text.py::ngram_novelty) — fraction of
# a doc's distinct n-grams unique to it; integer-exact ratio.
# --------------------------------------------------------------------------

_NV_N = 3


@register(
    "ngram_novelty",
    f"""
WITH
{_DOCS_TOK_CTE},
nv0 AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= {_NV_N}
         THEN list_distinct([array_to_string(list_slice(toks, i, i + {_NV_N} - 1), ' ')
                            for i in generate_series(1, len(toks) - {_NV_N} + 1)])
         ELSE [] END AS grams
  FROM tok
),
nvd AS (SELECT doc_id, unnest(grams) AS g FROM nv0),
nvf AS (SELECT g, CAST(count(*) AS BIGINT) AS df_ FROM nvd GROUP BY g),
nvp AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
    CAST(sum(CASE WHEN f.df_ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM nvd d JOIN nvf f USING (g) GROUP BY d.doc_id
)
SELECT docs.doc_id,
  coalesce(nvp.n_grams, 0) AS n_grams,
  coalesce(nvp.n_novel, 0) AS n_novel,
  round(CASE WHEN nvp.n_grams > 0
        THEN CAST(nvp.n_novel AS DOUBLE) / CAST(nvp.n_grams AS DOUBLE) END, 6) + 0
    AS novelty
FROM docs LEFT JOIN nvp USING (doc_id)
""",
    f"Per-doc {_NV_N}-gram novelty (fraction of distinct n-grams with "
    "corpus document-frequency 1) — boilerplate/template screen and "
    "quality-sampling keep signal; posting-list aggregate + one "
    "equi-join, integer-exact ratio, zero Python",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import ngram_novelty

    docs = read_table(spark, sf_dir, "documents")
    out = ngram_novelty(docs, n=_NV_N)
    return out.select(
        "doc_id",
        "n_grams",
        "n_novel",
        (F.round("novelty", 6) + F.lit(0.0)).alias("novelty"),
    )


# --------------------------------------------------------------------------
# C-ext. Upsample + forward fill (operators/resample.py) — Polars
# upsample/fill_forward re-expressed as grid explode + as-of join;
# oracle via generate_series + native ASOF JOIN.
# --------------------------------------------------------------------------

_UP_W_US = 2 * 3600 * 1_000_000  # 2h grid


@register(
    "upsample_ffill",
    f"""
WITH trades AS ({{TRADES_CTE}}),
uu AS (
  SELECT symbol, ts_event, max_by(price, seq) AS price
  FROM trades GROUP BY symbol, ts_event
),
ub AS (
  SELECT symbol, min(epoch_us(ts_event)) AS lo, max(epoch_us(ts_event)) AS hi
  FROM uu GROUP BY symbol
),
ug AS (
  SELECT symbol, make_timestamp(gg * {_UP_W_US}) AS ts_event
  FROM ub, unnest(generate_series(
         CAST(floor((lo + {_UP_W_US} - 1) / {_UP_W_US}) AS BIGINT),
         CAST(floor(hi / {_UP_W_US}) AS BIGINT))) AS s(gg)
)
SELECT ug.symbol, ug.ts_event, r.price, r.ts_event AS ts_src
FROM ug ASOF LEFT JOIN uu r
  ON ug.symbol = r.symbol AND ug.ts_event >= r.ts_event
""".format(TRADES_CTE=TRADES_CTE),
    "Upsample to a 2h epoch-aligned grid with forward fill (Polars "
    "upsample + fill_forward) — grid = explode(sequence) over integer "
    "bucket indices, fill = the union-marker as-of join; one group "
    "exchange, zero Python; ts_src exposes fill staleness",
)
def q_upsample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.resample import upsample_ffill

    t = trades_from_events(spark, sf_dir)
    u = t.groupBy("symbol", "ts_event").agg(
        F.max_by("price", F.col(SEQ_COL)).alias("price")
    )
    out = upsample_ffill(u, every="2h", by="symbol", ts_col="ts_event")
    return out.select("symbol", "ts_event", "price", "ts_src")


# --------------------------------------------------------------------------
# C-ext (round 6). Two-scale realized variance (operators/volatility.py
# ::two_scale_rv): the Zhang-Mykland-Aït-Sahalia noise-corrected
# integrated-variance estimate from raw ticks.
# --------------------------------------------------------------------------

_TSRV_K = 5


@register(
    "two_scale_rv",
    f"""
WITH trades AS ({TRADES_CTE}),
b AS (
  SELECT symbol, CAST(ts_event AS DATE) AS day, ts_event, seq, ln(price) AS lp
  FROM trades
),
l AS (
  SELECT *, lp - lag(lp, 1) OVER w AS r1, lp - lag(lp, {_TSRV_K}) OVER w AS rk
  FROM b
  WINDOW w AS (PARTITION BY symbol, day ORDER BY ts_event, seq)
),
-- (ts, seq)-ordered running folds read at the last row (SCALING rule 24/27)
f AS (
  SELECT symbol, day,
    row_number() OVER word AS rn,
    count(*) OVER wall AS m,
    sum(r1 * r1) OVER wrun AS rv,
    sum(rk * rk) OVER wrun AS rvk
  FROM l
  WINDOW word AS (PARTITION BY symbol, day ORDER BY ts_event, seq),
         wrun AS (PARTITION BY symbol, day ORDER BY ts_event, seq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY symbol, day)
)
SELECT symbol, day, CAST(m AS BIGINT) AS n_ticks,
  CAST(m - 1 AS BIGINT) AS n_returns,
  CASE WHEN m - 1 > {_TSRV_K} THEN round(rv, 6) + 0 END AS rv_all,
  CASE WHEN m - 1 > {_TSRV_K} THEN round(rvk / {_TSRV_K}, 6) + 0 END AS rv_sub_avg,
  CASE WHEN m - 1 > {_TSRV_K}
       THEN round(rvk / {_TSRV_K}
                  - ((m - 1) - {_TSRV_K} + 1.0) / {_TSRV_K} / (m - 1) * rv, 6) + 0
  END AS tsrv
FROM f WHERE rn = m
""",
    f"Two-scale realized variance per (symbol, day): K={_TSRV_K} subgrid "
    "average minus the noise-bias-scaled tick-scale RV (Zhang-Mykland-"
    "Aït-Sahalia 2005), ordered running folds throughout",
)
def q_two_scale_rv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.volatility import two_scale_rv

    with _trades_config():
        out = two_scale_rv(trades_from_events(spark, sf_dir), k=_TSRV_K)
    return out.select(
        "symbol",
        "day",
        "n_ticks",
        "n_returns",
        (F.round("rv_all", 6) + F.lit(0.0)).alias("rv_all"),
        (F.round("rv_sub_avg", 6) + F.lit(0.0)).alias("rv_sub_avg"),
        (F.round("tsrv", 6) + F.lit(0.0)).alias("tsrv"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Pairs-selection distance screen
# (operators/cross_section.py::pairs_distance).
# --------------------------------------------------------------------------


@register(
    "pairs_distance",
    f"""
WITH
{_FEATURE_BARS_CTE},
norm AS (
  SELECT symbol, ts,
    close / first_value(close) OVER (PARTITION BY symbol ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS p
  FROM bars
),
j AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.ts, a.p AS pa, b.p AS pb
  FROM norm a JOIN norm b ON a.ts = b.ts AND a.symbol < b.symbol
),
-- ts-ordered running fold read at the last row (SCALING rule 24/27)
f AS (
  SELECT sym_a, sym_b,
    row_number() OVER word AS rn,
    count(*) OVER wall AS n,
    sum((pa - pb) * (pa - pb)) OVER wrun AS ssd
  FROM j
  WINDOW word AS (PARTITION BY sym_a, sym_b ORDER BY ts),
         wrun AS (PARTITION BY sym_a, sym_b ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY sym_a, sym_b)
)
SELECT sym_a, sym_b, CAST(n AS BIGINT) AS n_obs,
  round(ssd, 6) + 0 AS ssd,
  round(sqrt(ssd / n), 6) + 0 AS rmsd
FROM f WHERE rn = n AND n >= 2
""",
    "Gatev-Goetzmann-Rouwenhorst pairs screen: SSD of first-price-"
    "normalized paths for every unordered symbol pair over shared 15m "
    "bars, ordered running folds",
)
def q_pairs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import pairs_distance

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = pairs_distance(bars, ts_col="ts_event", close_col="close")
    return out.select(
        "sym_a",
        "sym_b",
        "n_obs",
        (F.round("ssd", 6) + F.lit(0.0)).alias("ssd"),
        (F.round("rmsd", 6) + F.lit(0.0)).alias("rmsd"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Market-model event study (operators/event_study.py):
# rolling-OLS alpha/beta before each event, AR/CAR over the event window.
# Events = each symbol's top-3 |log-return| bars (deterministic probe set).
# --------------------------------------------------------------------------

_ES_EST, _ES_CAR, _ES_TOPK = 12, 6, 3


@register(
    "event_study_car",
    f"""
WITH
{_FEATURE_BARS_CTE},
rets AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS r
  FROM bars
),
r2 AS (
  SELECT symbol, ts, r,
    row_number() OVER (PARTITION BY symbol ORDER BY ts) AS rn
  FROM rets WHERE r IS NOT NULL
),
mkt AS (SELECT ts, avg(r) AS rm FROM r2 GROUP BY ts),
b AS (
  SELECT r2.symbol, r2.ts, r2.r, m.rm, r2.rn
  FROM r2 JOIN mkt m USING (ts)
),
ols AS (
  SELECT *,
    CAST(count(r) OVER west AS DOUBLE) AS n,
    sum(rm) OVER west AS sx,
    sum(r) OVER west AS sy,
    sum(rm * rm) OVER west AS sxx,
    sum(rm * r) OVER west AS sxy
  FROM b
  WINDOW west AS (PARTITION BY symbol ORDER BY ts
                  ROWS BETWEEN {_ES_EST} PRECEDING AND 1 PRECEDING)
),
ols2 AS (
  SELECT symbol, ts, rn, CAST(n AS BIGINT) AS n_est,
    CASE WHEN n >= {_ES_EST} AND n * sxx - sx * sx > 0
         THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS beta,
    sy, sx, n
  FROM ols
),
evsel AS (
  SELECT symbol, ts,
    row_number() OVER (PARTITION BY symbol ORDER BY abs(r) DESC, ts) AS k
  FROM r2
),
ev AS (
  SELECT o.symbol, o.ts AS event_ts, o.rn, o.n_est, o.beta,
    (o.sy - o.beta * o.sx) / o.n AS alpha
  FROM ols2 o JOIN evsel s ON s.symbol = o.symbol AND s.ts = o.ts
  WHERE s.k <= {_ES_TOPK} AND o.beta IS NOT NULL
),
tgt AS (
  SELECT e.symbol, e.event_ts, e.n_est, e.alpha, e.beta,
    g.off AS "offset", e.rn + g.off AS rn
  FROM ev e, generate_series(0, {_ES_CAR - 1}) AS g(off)
),
j AS (
  SELECT t.symbol, t.event_ts, t."offset", t.alpha, t.beta, t.n_est,
    p.ts, p.r, p.rm,
    p.r - (t.alpha + t.beta * p.rm) AS ar
  FROM tgt t JOIN b p ON p.symbol = t.symbol AND p.rn = t.rn
),
-- offset-ordered running CAR fold (SCALING rule 24/27)
f AS (
  SELECT *, sum(ar) OVER (PARTITION BY symbol, event_ts ORDER BY "offset"
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS car
  FROM j
)
SELECT symbol, event_ts, CAST("offset" AS INTEGER) AS "offset", ts AS ts_event,
  round(alpha, 6) + 0 AS alpha,
  round(beta, 6) + 0 AS beta,
  n_est,
  round(r, 6) + 0 AS ret,
  round(rm, 6) + 0 AS mkt_ret,
  round(ar, 6) + 0 AS ar,
  round(car, 6) + 0 AS car
FROM f
""",
    f"MacKinlay market-model event study: {_ES_EST}-bar rolling OLS "
    f"alpha/beta before each of the top-{_ES_TOPK} |return| bars per "
    f"symbol, AR + running CAR over the {_ES_CAR}-bar event window",
)
def q_event_study_car(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from polars_trading_spark.operators.event_study import event_study_car

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    order = Window.partitionBy("symbol").orderBy("ts_event")
    r = bars.select(
        "symbol",
        "ts_event",
        F.log(F.col("close") / F.lag("close").over(order)).alias("__r"),
    ).where(F.col("__r").isNotNull())
    sel = Window.partitionBy("symbol").orderBy(
        F.abs(F.col("__r")).desc(), F.col("ts_event").asc()
    )
    events = (
        r.withColumn("__k", F.row_number().over(sel))
        .where(F.col("__k") <= _ES_TOPK)
        .select("symbol", F.col("ts_event").alias("event_ts"))
    )
    out = event_study_car(
        bars,
        events,
        est_window=_ES_EST,
        car_window=_ES_CAR,
        ts_col="ts_event",
        close_col="close",
    )
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "event_ts",
        "offset",
        "ts_event",
        (F.round("alpha", 6) + z0).alias("alpha"),
        (F.round("beta", 6) + z0).alias("beta"),
        "n_est",
        (F.round("ret", 6) + z0).alias("ret"),
        (F.round("mkt_ret", 6) + z0).alias("mkt_ret"),
        (F.round("ar", 6) + z0).alias("ar"),
        (F.round("car", 6) + z0).alias("car"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Gumbel-top-k weighted sampling without replacement
# (functions/corpus.py::gumbel_topk_sample).
# --------------------------------------------------------------------------

_GUM_K = 50


@register(
    "gumbel_topk",
    f"""
WITH g AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
    ln(CAST(n_chars AS DOUBLE))
      - ln(-ln(((CAST(('0x' || substr(md5('pts-gumbel' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 1073741824) + 0.5) / 1073741824.0)) AS sample_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight, round(sample_key, 6) + 0 AS sample_key,
  CAST(rnk AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY sample_key DESC, doc_id) AS rnk FROM g)
WHERE rnk <= {_GUM_K}
""",
    f"Deterministic weighted sampling without replacement: top-{_GUM_K} "
    "Gumbel-perturbed keys (ln w + Gumbel noise from the salted 60-bit "
    "hash) over document char counts — RNG-free importance resampling",
)
def q_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import gumbel_topk_sample

    docs = read_table(spark, sf_dir, "documents")
    out = gumbel_topk_sample(docs, k=_GUM_K, weight_col="n_chars")
    return out.select(
        "doc_id",
        "weight",
        (F.round("sample_key", 6) + F.lit(0.0)).alias("sample_key"),
        "rank",
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Hard-negative mining band
# (functions/similarity.py::hard_negatives).
# --------------------------------------------------------------------------

_HN_LO, _HN_HI, _HN_K = 0.1, 0.9, 5


@register(
    "hard_negatives",
    f"""
WITH
{_EMB_CTE},
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_N_QUERIES}),
sims AS (
  SELECT q.query_id, c.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
banded AS (
  SELECT * FROM sims WHERE cosine_sim >= {_HN_LO!r} AND cosine_sim < {_HN_HI!r}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM banded
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_HN_K}
""",
    f"Contrastive hard-negative mining: per query the top-{_HN_K} corpus "
    f"vectors with rounded cosine in [{_HN_LO}, {_HN_HI}) — informative "
    "negatives below the near-duplicate ceiling",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    out = sim_ops.hard_negatives(emb, queries, k=_HN_K, lo=_HN_LO, hi=_HN_HI)
    return out.withColumn("rank", F.col("rank").cast("int"))


# --------------------------------------------------------------------------
# C-ext (round 6). Realized higher moments
# (operators/volatility.py::realized_moments).
# --------------------------------------------------------------------------


@register(
    "realized_moments",
    f"""
WITH trades AS ({TRADES_CTE}),
b AS (
  SELECT symbol, CAST(ts_event AS DATE) AS day, ts_event, seq, ln(price) AS lp
  FROM trades
),
l AS (
  SELECT symbol, day, ts_event, seq, lp - lag(lp) OVER w AS r
  FROM b
  WINDOW w AS (PARTITION BY symbol, day ORDER BY ts_event, seq)
),
-- (ts, seq)-ordered running power-sum folds read at the last row
f AS (
  SELECT symbol, day,
    row_number() OVER word AS rn,
    count(*) OVER wall AS m,
    sum(r * r) OVER wrun AS s2,
    sum(r * r * r) OVER wrun AS s3,
    sum((r * r) * (r * r)) OVER wrun AS s4
  FROM l
  WINDOW word AS (PARTITION BY symbol, day ORDER BY ts_event, seq),
         wrun AS (PARTITION BY symbol, day ORDER BY ts_event, seq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY symbol, day)
)
SELECT symbol, day, CAST(m - 1 AS BIGINT) AS n_returns,
  CASE WHEN m - 1 >= 2 AND s2 > 0 THEN round(s2, 6) + 0 END AS rv,
  CASE WHEN m - 1 >= 2 AND s2 > 0
       THEN round(sqrt(CAST(m - 1 AS DOUBLE)) * s3 / pow(s2, 1.5), 6) + 0 END AS rskew,
  CASE WHEN m - 1 >= 2 AND s2 > 0
       THEN round(CAST(m - 1 AS DOUBLE) * s4 / (s2 * s2), 6) + 0 END AS rkurt
FROM f WHERE rn = m
""",
    "Realized variance / skewness / kurtosis per (symbol, day) from "
    "intraday tick returns (Amaya et al. 2015) — ordered running "
    "power-sum folds, one window partition",
)
def q_realized_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.volatility import realized_moments

    with _trades_config():
        out = realized_moments(trades_from_events(spark, sf_dir))
    return out.select(
        "symbol",
        "day",
        "n_returns",
        (F.round("rv", 6) + F.lit(0.0)).alias("rv"),
        (F.round("rskew", 6) + F.lit(0.0)).alias("rskew"),
        (F.round("rkurt", 6) + F.lit(0.0)).alias("rkurt"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Quality-aware near-dup cluster keeper
# (functions/dedup.py::cluster_representatives) — reuses corpus_filter's
# pairs/components/quality CTEs.
# --------------------------------------------------------------------------


@register(
    "cluster_representatives",
    f"""
WITH RECURSIVE
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES},
{_MH_PAIR_TAIL},
{_CC_TAIL},
scored AS (
  SELECT doc_id, round({_QUALITY_SQL}, 6) AS q FROM feat
),
m AS (
  SELECT l.doc_id, l.cluster_id, s.q
  FROM labeled l JOIN scored s USING (doc_id)
),
sel AS (
  SELECT *,
    count(*) OVER (PARTITION BY cluster_id) AS csize,
    row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rk
  FROM m
)
SELECT doc_id, cluster_id, CAST(csize AS INTEGER) AS cluster_size,
  q + 0 AS quality_score, rk = 1 AS is_representative
FROM sel
""",
    "Quality-aware near-dup keeper: each MinHash cluster's highest-"
    "quality document survives (round-6-then-rank, ties to lowest id) "
    "instead of the arbitrary min-id copy",
)
def q_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.dedup import cluster_representatives

    docs = read_table(spark, sf_dir, "documents")
    out = cluster_representatives(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    return out.withColumn(
        "quality_score", F.col("quality_score") + F.lit(0.0)
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Kalman-filter hedge ratio (operators/kalman.py):
# scalar random-walk-beta recursion per pair, replayed bit-exactly by a
# recursive CTE.
# --------------------------------------------------------------------------

_KF_Q, _KF_R, _KF_B0, _KF_P0 = 1e-5, 1e-3, 0.0, 1.0


@register(
    "kalman_hedge",
    f"""
WITH RECURSIVE
{_FEATURE_BARS_CTE},
pr AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.ts,
    a.close AS y, b.close AS x,
    row_number() OVER (PARTITION BY a.symbol, b.symbol ORDER BY a.ts) AS rn
  FROM bars a JOIN bars b ON a.ts = b.ts AND a.symbol < b.symbol
),
n AS (SELECT sym_a, sym_b FROM pr GROUP BY sym_a, sym_b),
-- the identical scalar recursion as the Arrow kernel, one step per
-- iteration; gain recomputed verbatim in both legs (same expression,
-- same double)
kf(sym_a, sym_b, rn, beta, p, spread) AS (
  SELECT sym_a, sym_b, CAST(0 AS BIGINT),
         CAST({_KF_B0!r} AS DOUBLE), CAST({_KF_P0!r} AS DOUBLE),
         CAST(NULL AS DOUBLE)
  FROM n
  UNION ALL
  SELECT k.sym_a, k.sym_b, k.rn + 1,
    k.beta + ((k.p + {_KF_Q!r}) * pr.x / (pr.x * pr.x * (k.p + {_KF_Q!r}) + {_KF_R!r}))
             * (pr.y - k.beta * pr.x),
    (1 - ((k.p + {_KF_Q!r}) * pr.x / (pr.x * pr.x * (k.p + {_KF_Q!r}) + {_KF_R!r})) * pr.x)
      * (k.p + {_KF_Q!r}),
    pr.y - k.beta * pr.x
  FROM kf k
  JOIN pr ON pr.sym_a = k.sym_a AND pr.sym_b = k.sym_b AND pr.rn = k.rn + 1
)
SELECT k.sym_a, k.sym_b, pr.ts AS ts_event,
  round(k.beta, 6) + 0 AS beta,
  round(k.spread, 6) + 0 AS spread
FROM kf k
JOIN pr ON pr.sym_a = k.sym_a AND pr.sym_b = k.sym_b AND pr.rn = k.rn
WHERE k.rn >= 1
""",
    "Kalman-filter pairs hedge ratio: scalar random-walk-beta recursion "
    "per unordered symbol pair over shared 15m bars (Q=1e-5, R=1e-3), "
    "innovation spread emitted per bar; recursive-CTE bit-exact replay",
)
def q_kalman_hedge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.kalman import kalman_hedge

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = kalman_hedge(
        bars, q=_KF_Q, r=_KF_R, beta0=_KF_B0, p0=_KF_P0, ts_col="ts_event"
    )
    return out.select(
        "sym_a",
        "sym_b",
        "ts_event",
        (F.round("beta", 6) + F.lit(0.0)).alias("beta"),
        (F.round("spread", 6) + F.lit(0.0)).alias("spread"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Downside-aware performance ratios
# (operators/backtest.py::risk_ratios).
# --------------------------------------------------------------------------


@register(
    "risk_ratios",
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
path2 AS (
  SELECT symbol, ts, ret, cum,
    cum - max(greatest(cum, 0.0)) OVER w AS dd
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
    sum(least(ret - 0.0, 0.0) * least(ret - 0.0, 0.0)) OVER wrun AS sdn2,
    sum(greatest(ret - 0.0, 0.0)) OVER wrun AS sup,
    sum(greatest(0.0 - ret, 0.0)) OVER wrun AS sdown,
    min(dd) OVER wall AS mindd
  FROM path2
  WINDOW word AS (PARTITION BY symbol ORDER BY ts),
         wrun AS (PARTITION BY symbol ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY symbol)
)
SELECT symbol, CAST(n AS BIGINT) AS n_periods,
  CASE WHEN n >= 2 THEN round(s1 / n * {_BT_PPY!r}, 6) + 0 END AS ann_return,
  CASE WHEN n >= 2
       THEN round(sqrt(sdn2 / n) * {_BT_SQRT_PPY!r}, 6) + 0 END AS downside_dev_ann,
  CASE WHEN n >= 2 AND sqrt(sdn2 / n) * {_BT_SQRT_PPY!r} > 0
       THEN round((s1 / n - 0.0) * {_BT_PPY!r}
                  / (sqrt(sdn2 / n) * {_BT_SQRT_PPY!r}), 6) + 0 END AS sortino,
  CASE WHEN n >= 2 THEN round(1 - exp(mindd), 6) + 0 END AS max_drawdown,
  CASE WHEN n >= 2 AND 1 - exp(mindd) > 0
       THEN round(s1 / n * {_BT_PPY!r} / (1 - exp(mindd)), 6) + 0 END AS calmar,
  CASE WHEN n >= 2 AND sdown > 0 THEN round(sup / sdown, 6) + 0 END AS omega
FROM f WHERE rn = n
""",
    "Sortino / Calmar / Omega per symbol from 15m-bar log returns "
    "(downside deviation, max-drawdown and gain/loss-mass denominators), "
    "ordered running folds",
)
def q_risk_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.backtest import risk_ratios

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = risk_ratios(bars, periods_per_year=_BT_PPY, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_periods",
        (F.round("ann_return", 6) + z0).alias("ann_return"),
        (F.round("downside_dev_ann", 6) + z0).alias("downside_dev_ann"),
        (F.round("sortino", 6) + z0).alias("sortino"),
        (F.round("max_drawdown", 6) + z0).alias("max_drawdown"),
        (F.round("calmar", 6) + z0).alias("calmar"),
        (F.round("omega", 6) + z0).alias("omega"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Cross-source vocabulary JS divergence
# (functions/tfidf.py::vocab_divergence).
# --------------------------------------------------------------------------


@register(
    "vocab_divergence",
    f"""
WITH
{_DOCS_TOK_CTE},
tc AS (
  SELECT source AS g, t AS tokn, count(*) AS c
  FROM tok, unnest(toks) AS u(t)
  GROUP BY source, t
),
tot AS (SELECT g, sum(c) AS n FROM tc GROUP BY g),
pairs AS (
  SELECT a.g AS ga, b.g AS gb, a.n AS na, b.n AS nb
  FROM tot a JOIN tot b ON a.g < b.g
),
sa AS (
  SELECT p.ga, p.gb, p.na, p.nb, t.tokn, t.c AS ca
  FROM tc t JOIN pairs p ON t.g = p.ga
),
sb AS (
  SELECT p.ga, p.gb, p.na, p.nb, t.tokn, t.c AS cb
  FROM tc t JOIN pairs p ON t.g = p.gb
),
ab AS (
  SELECT coalesce(sa.ga, sb.ga) AS ga, coalesce(sa.gb, sb.gb) AS gb,
    coalesce(sa.na, sb.na) AS na, coalesce(sa.nb, sb.nb) AS nb,
    coalesce(sa.tokn, sb.tokn) AS tokn, sa.ca, sb.cb
  FROM sa FULL OUTER JOIN sb
    ON sa.ga = sb.ga AND sa.gb = sb.gb AND sa.tokn = sb.tokn
),
terms AS (
  SELECT ga, gb, tokn, ca, cb,
    (CASE WHEN coalesce(ca, 0) > 0
          THEN (CAST(coalesce(ca, 0) AS DOUBLE) / na)
               * ln((CAST(coalesce(ca, 0) AS DOUBLE) / na)
                    / ((CAST(coalesce(ca, 0) AS DOUBLE) / na
                        + CAST(coalesce(cb, 0) AS DOUBLE) / nb) / 2))
          ELSE 0.0 END) * 0.5
    + (CASE WHEN coalesce(cb, 0) > 0
            THEN (CAST(coalesce(cb, 0) AS DOUBLE) / nb)
                 * ln((CAST(coalesce(cb, 0) AS DOUBLE) / nb)
                      / ((CAST(coalesce(ca, 0) AS DOUBLE) / na
                          + CAST(coalesce(cb, 0) AS DOUBLE) / nb) / 2))
            ELSE 0.0 END) * 0.5 AS term
  FROM ab
),
-- token-ordered running fold read at the last row (SCALING rule 24/27)
f AS (
  SELECT ga, gb,
    row_number() OVER word AS rn,
    count(*) OVER wall AS k,
    sum(term) OVER wrun AS js,
    count(ca) OVER wall AS n_vocab_a,
    count(cb) OVER wall AS n_vocab_b,
    count(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL THEN 1 END) OVER wall AS n_shared
  FROM terms
  WINDOW word AS (PARTITION BY ga, gb ORDER BY tokn),
         wrun AS (PARTITION BY ga, gb ORDER BY tokn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY ga, gb)
)
SELECT ga AS group_a, gb AS group_b,
  CAST(n_vocab_a AS BIGINT) AS n_vocab_a,
  CAST(n_vocab_b AS BIGINT) AS n_vocab_b,
  CAST(n_shared AS BIGINT) AS n_shared,
  round(js, 6) + 0 AS js_nats,
  round(js / 0.6931471805599453, 6) + 0 AS js_bits
FROM f WHERE rn = k
""",
    "Jensen-Shannon divergence between every pair of document sources' "
    "unigram distributions — corpus-drift / domain-shift scalar with "
    "shared-vocabulary diagnostics, token-ordered folds",
)
def q_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import vocab_divergence

    docs = read_table(spark, sf_dir, "documents")
    out = vocab_divergence(docs, group_col="source")
    return out.select(
        "group_a",
        "group_b",
        "n_vocab_a",
        "n_vocab_b",
        "n_shared",
        (F.round("js_nats", 6) + F.lit(0.0)).alias("js_nats"),
        (F.round("js_bits", 6) + F.lit(0.0)).alias("js_bits"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Distribution diagnostics (operators/stats.py):
# exact group quantiles and join-key skew profiling.
# --------------------------------------------------------------------------

_QP_PCTS = (25, 50, 75, 90, 99)
_SKEW_TOPK = 10


@register(
    "size_quantiles",
    f"""
WITH trades AS ({TRADES_CTE}),
r AS (
  SELECT symbol, size AS v,
    row_number() OVER (PARTITION BY symbol ORDER BY size) AS rn,
    count(*) OVER (PARTITION BY symbol) AS n
  FROM trades
)
SELECT symbol, CAST(max(n) AS BIGINT) AS n,
  {", ".join(f"max(CASE WHEN rn = ({p} * n + 99) // 100 THEN v END) AS p{p}" for p in _QP_PCTS)}
FROM r GROUP BY symbol
""",
    "Exact per-symbol trade-size percentiles via integer-ceil count-based "
    "selection (the reproducible sibling of approx_percentile)",
)
def q_size_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.stats import quantile_profile

    t = trades_from_events(spark, sf_dir)
    return quantile_profile(t, "size", by="symbol", percents=_QP_PCTS)


@register(
    "key_skew",
    f"""
WITH c AS (
  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_rows
  FROM events GROUP BY 1
),
t AS (SELECT count(*) AS nk, sum(n_rows) AS tot, max(n_rows) AS mx FROM c),
top AS (
  SELECT * FROM c ORDER BY n_rows DESC, key ASC NULLS LAST LIMIT {_SKEW_TOPK}
)
SELECT
  CAST(row_number() OVER (ORDER BY n_rows DESC, key ASC NULLS LAST) AS INTEGER) AS rank,
  key,
  CAST(n_rows AS BIGINT) AS n_rows,
  round(n_rows / CAST(tot AS DOUBLE), 6) + 0 AS share,
  CAST(nk AS BIGINT) AS n_keys,
  CAST(tot AS BIGINT) AS total_rows,
  round(mx / (tot / CAST(nk AS DOUBLE)), 6) + 0 AS skew_ratio
FROM top, t
""",
    f"Join-key heavy-hitter report: top-{_SKEW_TOPK} event user_ids by "
    "row count with share and max/mean skew ratio — the salting/AQE "
    "decision input",
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.stats import key_skew_profile

    ev = read_table(spark, sf_dir, "events")
    out = key_skew_profile(ev, "user_id", top_k=_SKEW_TOPK)
    return out.select(
        "rank",
        "key",
        "n_rows",
        (F.round("share", 6) + F.lit(0.0)).alias("share"),
        "n_keys",
        "total_rows",
        (F.round("skew_ratio", 6) + F.lit(0.0)).alias("skew_ratio"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). Embedding cluster diagnostics
# (functions/similarity.py::embedding_cohesion / centroid_similarity).
# --------------------------------------------------------------------------

_COHESION_CTES = """
ce AS (
  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
),
d AS (
  SELECT label, vec_id, i, v[i] AS val
  FROM ce, unnest(range(1, len(v) + 1)) AS g(i)
),
-- vec_id-ordered per-dimension folds read at the last row
f AS (
  SELECT label, i,
    row_number() OVER (PARTITION BY label, i ORDER BY vec_id) AS rn,
    count(*) OVER (PARTITION BY label, i) AS n,
    sum(val) OVER (PARTITION BY label, i ORDER BY vec_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM d
),
cent AS (
  SELECT label, list(s / n ORDER BY i) AS cv, CAST(max(n) AS BIGINT) AS nvec
  FROM f WHERE rn = n GROUP BY label
)"""


@register(
    "embedding_cohesion",
    f"""
WITH
{_COHESION_CTES},
cosd AS (
  SELECT ce.label, ce.vec_id,
    sqrt(list_sum([x * x for x in ct.cv])) AS cn,
    CASE WHEN sqrt(list_sum([x * x for x in ct.cv])) > 0 THEN
      list_sum([ce.v[i+1] * ct.cv[i+1] for i in range(0, len(ce.v))])
      / (sqrt(list_sum([x * x for x in ce.v])) * sqrt(list_sum([x * x for x in ct.cv])))
    END AS cs
  FROM ce JOIN cent ct USING (label)
),
m AS (
  SELECT label,
    row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn,
    count(*) OVER (PARTITION BY label) AS n,
    sum(cs) OVER (PARTITION BY label ORDER BY vec_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
    max(cn) OVER (PARTITION BY label) AS cn
  FROM cosd
)
SELECT m.label, ct.nvec AS n_vectors,
  round(m.cn, 6) + 0 AS centroid_norm,
  CASE WHEN m.cn > 0 THEN round(m.s / m.n, 6) + 0 END AS mean_cos_to_centroid
FROM m JOIN cent ct USING (label) WHERE rn = n
""",
    "Per-label embedding cluster tightness: centroid norm + mean member "
    "cosine to centroid (vec_id-ordered per-dimension folds)",
)
def q_embedding_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    out = sim_ops.embedding_cohesion(emb)
    return out.select(
        "label",
        "n_vectors",
        (F.round("centroid_norm", 6) + F.lit(0.0)).alias("centroid_norm"),
        (F.round("mean_cos_to_centroid", 6) + F.lit(0.0)).alias(
            "mean_cos_to_centroid"
        ),
    )


@register(
    "centroid_similarity",
    f"""
WITH
{_COHESION_CTES}
SELECT a.label AS label_a, b.label AS label_b, a.nvec AS n_a, b.nvec AS n_b,
  CASE WHEN sqrt(list_sum([x * x for x in a.cv])) > 0
        AND sqrt(list_sum([x * x for x in b.cv])) > 0 THEN
    round(list_sum([a.cv[i+1] * b.cv[i+1] for i in range(0, len(a.cv))])
          / (sqrt(list_sum([x * x for x in a.cv]))
             * sqrt(list_sum([x * x for x in b.cv]))), 6) + 0
  END AS centroid_cosine
FROM cent a JOIN cent b ON a.label < b.label
""",
    "Pairwise cosine between label centroids — cluster-confusion "
    "report on the tiny centroid aggregate, never on member vectors",
)
def q_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    out = sim_ops.centroid_similarity(emb)
    return out.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        (F.round("centroid_cosine", 6) + F.lit(0.0)).alias("centroid_cosine"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). ANN recall evaluation: SRP-LSH top-k vs the exact
# brute-force top-k, per query — the harness every approximate index
# ships with.
# --------------------------------------------------------------------------


@register(
    "ann_recall",
    f"""
WITH
{_EMB_CTE},
-- exact branch (the similarity_topk replay)
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_N_QUERIES}),
esims AS (
  SELECT q.query_id, c.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
eranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM esims
),
etop AS (SELECT query_id, vec_id FROM eranked WHERE rank <= {_TOPK}),
-- LSH branch (the similarity_topk_lsh replay)
planes AS (
  SELECT v AS pv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_PLANES})
),
bucketed AS (
  SELECT c.vec_id, c.v,
         CAST(sum(CASE WHEN list_sum([pv[i+1] * v[i+1] for i in range(0, len(v))]) >= 0
                       THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
  FROM c CROSS JOIN planes
  GROUP BY c.vec_id, c.v
),
lq AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed WHERE vec_id < {_N_QUERIES}),
lsims AS (
  SELECT lq.query_id, b.vec_id,
         round(list_sum([qv[i+1] * cv[i+1] for i in range(0, len(cv))])
               / ({_NORM_Q} * sqrt(list_sum([x * x for x in cv]))), 6) AS cosine_sim
  FROM (SELECT vec_id, v AS cv, bucket FROM bucketed) b
  JOIN lq ON b.bucket = lq.bucket
  WHERE b.vec_id <> lq.query_id
),
lranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM lsims
),
ltop AS (SELECT query_id, vec_id FROM lranked WHERE rank <= {_TOPK}),
-- compare
hits AS (
  SELECT e.query_id, count(*) AS n_hit
  FROM etop e JOIN ltop l ON e.query_id = l.query_id AND e.vec_id = l.vec_id
  GROUP BY e.query_id
),
base AS (
  SELECT e.query_id, count(*) AS n_exact FROM etop e GROUP BY e.query_id
),
appr AS (
  SELECT l.query_id, count(*) AS n_approx FROM ltop l GROUP BY l.query_id
)
SELECT b.query_id,
  CAST(b.n_exact AS BIGINT) AS n_exact,
  CAST(coalesce(a.n_approx, 0) AS BIGINT) AS n_approx,
  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
  round(coalesce(h.n_hit, 0) / CAST(b.n_exact AS DOUBLE), 6) + 0 AS recall
FROM base b
LEFT JOIN appr a ON a.query_id = b.query_id
LEFT JOIN hits h ON h.query_id = b.query_id
""",
    f"ANN recall harness: per-query overlap of SRP-LSH top-{_TOPK} with "
    f"the exact brute-force top-{_TOPK} — the recall evaluation every "
    "approximate index ships with",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    exact = sim_ops.cosine_topk(emb, queries, k=_TOPK).select("query_id", "vec_id")
    lsh = sim_ops.srp_lsh_topk(emb, queries, k=_TOPK, num_planes=_N_PLANES).select(
        "query_id", "vec_id"
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    appr = lsh.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_approx"))
    hits = exact.join(lsh, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    out = (
        base.join(appr, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.coalesce("n_approx", F.lit(0)).cast("long").alias("n_approx"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (
                F.round(
                    F.coalesce("n_hit", F.lit(0)) / F.col("n_exact").cast("double"), 6
                )
                + F.lit(0.0)
            ).alias("recall"),
        )
    )
    return out


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
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = ulcer_index(bars, periods_per_year=_BT_PPY, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_periods",
        (F.round("ann_return", 6) + z0).alias("ann_return"),
        (F.round("ulcer", 6) + z0).alias("ulcer"),
        (F.round("martin", 6) + z0).alias("martin"),
    )


@register(
    "runs_test",
    f"""
WITH
{_FEATURE_BARS_CTE},
rets AS (
  SELECT symbol, ts,
    ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY ts)) AS ret
  FROM bars
),
r2 AS (
  SELECT symbol, ts, CASE WHEN ret > 0 THEN 1 ELSE -1 END AS sgn
  FROM rets WHERE ret IS NOT NULL AND ret <> 0
),
marked AS (
  SELECT symbol, sgn,
    CASE WHEN lag(sgn) OVER w IS NULL OR lag(sgn) OVER w <> sgn
         THEN 1 ELSE 0 END AS nr
  FROM r2
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
g AS (
  SELECT symbol,
    CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
    CAST(sum(nr) AS BIGINT) AS n_runs
  FROM marked GROUP BY symbol
)
SELECT symbol, n_up, n_down, n_runs,
  CASE WHEN n_up + n_down > 0 THEN
    round(1 + 2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
              / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)), 6) + 0
  END AS expected_runs,
  CASE WHEN n_up > 0 AND n_down > 0 AND n_up + n_down > 1
        AND 2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
            * (2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
               - (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)))
            / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
               * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
               * ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) - 1)) > 0
  THEN
    round((n_runs - (1 + 2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                         / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))))
          / sqrt(2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                 * (2 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                    - (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)))
                 / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                    * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                    * ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) - 1))), 6) + 0
  END AS z
FROM g
""",
    "Wald-Wolfowitz runs test on 15m-bar return signs per symbol — "
    "distribution-free trending/mean-reversion gate from exact integer "
    "run counts",
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.regime import runs_test

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = runs_test(bars, ts_col="ts_event")
    return out.select(
        "symbol",
        "n_up",
        "n_down",
        "n_runs",
        (F.round("expected_runs", 6) + F.lit(0.0)).alias("expected_runs"),
        (F.round("z", 6) + F.lit(0.0)).alias("z"),
    )


# --------------------------------------------------------------------------
# C-ext (round 6). MinHash banding recall harness: LSH-surviving pairs
# vs ALL pairs at the same exact-Jaccard threshold (the dedup sibling
# of ann_recall — measures what the banding probability actually costs).
# --------------------------------------------------------------------------


@register(
    "dedup_recall",
    f"""
WITH
{_DOCS_TOK_CTE},
{_MH_PAIR_TAIL},
exact AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
             THEN len(list_intersect(a.sh, b.sh))::DOUBLE
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
             ELSE 0.0 END >= {_MH_THRESHOLD}
),
lshp AS (SELECT DISTINCT id_a, id_b FROM verified WHERE jaccard >= {_MH_THRESHOLD}),
h AS (
  SELECT count(*) AS c
  FROM exact e JOIN lshp l ON e.id_a = l.id_a AND e.id_b = l.id_b
)
SELECT
  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
  CAST((SELECT count(*) FROM lshp) AS BIGINT) AS n_lsh,
  CAST((SELECT c FROM h) AS BIGINT) AS n_hit,
  CASE WHEN (SELECT count(*) FROM exact) > 0
       THEN round((SELECT c FROM h)
                  / CAST((SELECT count(*) FROM exact) AS DOUBLE), 6) + 0
  END AS recall
""",
    f"MinHash banding recall: pairs surviving {_MH_BANDS}-band LSH vs "
    f"every pair with exact shingle Jaccard >= {_MH_THRESHOLD} — the "
    "measured candidate-generation loss of the dedup scale path",
)
def q_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    exact = dedup_ops.ngram_jaccard_pairs(
        docs, ngram=_MH_NGRAM, threshold=_MH_THRESHOLD, block_cols=()
    ).select("id_a", "id_b")
    lsh = dedup_ops.minhash_lsh_pairs(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    ).select("id_a", "id_b")
    e = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    l = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    h = exact.join(lsh, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        e.crossJoin(l)
        .crossJoin(h)
        .select(
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_lsh").cast("long").alias("n_lsh"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.when(
                F.col("n_exact") > 0,
                F.round(F.col("n_hit") / F.col("n_exact").cast("double"), 6)
                + F.lit(0.0),
            ).alias("recall"),
        )
    )


# --------------------------------------------------------------------------
# C-ext. Lexical diversity (functions/text.py::lexical_diversity) — TTR /
# hapax ratio / Yule's K per document; pure integer hash aggregates, floats
# are final single divisions.
# --------------------------------------------------------------------------


@register(
    "lexical_diversity",
    f"""
WITH
{_DOCS_TOK_CTE},
ltk AS (SELECT doc_id, unnest(toks) AS token FROM tok),
lpt AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
        FROM ltk GROUP BY doc_id, token),
ldv AS (
  SELECT doc_id,
    CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS n_types,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
    CAST(sum(c * c) AS BIGINT) AS s2
  FROM lpt GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(a.n_tokens, 0) AS n_tokens,
  COALESCE(a.n_types, 0) AS n_types,
  COALESCE(a.n_hapax, 0) AS n_hapax,
  CASE WHEN a.n_tokens > 0
       THEN round(CAST(a.n_types AS DOUBLE) / CAST(a.n_tokens AS DOUBLE), 6) + 0
  END AS ttr,
  CASE WHEN a.n_types > 0
       THEN round(CAST(a.n_hapax AS DOUBLE) / CAST(a.n_types AS DOUBLE), 6) + 0
  END AS hapax_ratio,
  CASE WHEN a.n_tokens > 0
       THEN round(1e4 * CAST(a.s2 - a.n_tokens AS DOUBLE)
                  / (CAST(a.n_tokens AS DOUBLE) * CAST(a.n_tokens AS DOUBLE)), 6) + 0
  END AS yule_k
FROM docs d LEFT JOIN ldv a ON d.doc_id = a.doc_id
""",
    "Per-document vocabulary richness: type-token ratio, hapax ratio, "
    "Yule's K (template-spam / keyboard-mash gate); integer hash "
    "aggregates only, floats are final single divisions",
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import lexical_diversity

    docs = read_table(spark, sf_dir, "documents")
    out = lexical_diversity(docs)
    z0 = F.lit(0.0)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        (F.round("ttr", 6) + z0).alias("ttr"),
        (F.round("hapax_ratio", 6) + z0).alias("hapax_ratio"),
        (F.round("yule_k", 6) + z0).alias("yule_k"),
    )


# --------------------------------------------------------------------------
# C-ext. Encoding quality (functions/text.py::encoding_quality) — U+FFFD /
# control-char / mojibake / printable-ASCII profile.  Zero shuffles; the
# regexes stay in the subset Java regex and RE2 evaluate identically, and
# the SAME pattern strings are interpolated into both engines.
# --------------------------------------------------------------------------

_EQ_CTRL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
_EQ_ASCII = r"[^ -~\t\n\r]"
_EQ_MOJI = "[ÃÂâï]"


@register(
    "encoding_quality",
    f"""
WITH eq AS (
  SELECT doc_id,
    CAST(COALESCE(length(text), 0) AS BIGINT) AS n_chars,
    CAST(COALESCE(length(text) - length(regexp_replace(text, '�', '', 'g')), 0)
         AS BIGINT) AS n_replacement,
    CAST(COALESCE(length(text) - length(regexp_replace(text, '{_EQ_CTRL}', '', 'g')), 0)
         AS BIGINT) AS n_control,
    CAST(COALESCE(length(text) - length(regexp_replace(text, '{_EQ_MOJI}', '', 'g')), 0)
         AS BIGINT) AS mojibake_leads,
    CAST(COALESCE(length(regexp_replace(text, '{_EQ_ASCII}', '', 'g')), 0)
         AS BIGINT) AS ascii_n
  FROM documents
)
SELECT doc_id, n_chars, n_replacement, n_control, mojibake_leads,
  CASE WHEN n_chars > 0
       THEN round(CAST(ascii_n AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) + 0
  END AS ascii_ratio,
  CAST(CASE WHEN n_replacement > 0 OR n_control > 0
              OR (n_chars > 0
                  AND CAST(mojibake_leads AS DOUBLE)
                      > 0.005 * CAST(n_chars AS DOUBLE))
       THEN 1 ELSE 0 END AS INTEGER) AS flagged
FROM eq
""",
    "Byte-sanity gate: U+FFFD replacement chars, C0 control chars, "
    "UTF-8-as-Latin-1 mojibake lead density, printable-ASCII ratio — "
    "zero-shuffle codegen pass with engine-portable regexes",
)
def q_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import encoding_quality

    docs = read_table(spark, sf_dir, "documents")
    out = encoding_quality(docs, control_pattern=_EQ_CTRL)
    z0 = F.lit(0.0)
    return out.select(
        "doc_id",
        "n_chars",
        "n_replacement",
        "n_control",
        "mojibake_leads",
        (F.round("ascii_ratio", 6) + z0).alias("ascii_ratio"),
        F.col("flagged").cast("int").alias("flagged"),
    )


# --------------------------------------------------------------------------
# C-ext. Heaps'-law vocabulary-growth fit (functions/tfidf.py::heaps_law) —
# corpus-level OCR-noise / template-recycling gate.  Cumulative N and V are
# INTEGER running sums; the OLS power sums fold in checkpoint order and are
# read off the last row (SCALING rule 24), so the double fold order is
# engine-independent.
# --------------------------------------------------------------------------

_HL_C = 200


@register(
    "heaps_law",
    f"""
WITH
{_DOCS_TOK_CTE},
htk AS (SELECT doc_id, unnest(toks) AS token FROM tok),
hbd AS (SELECT CAST(min(doc_id) AS BIGINT) AS lo,
               CAST(max(doc_id) AS BIGINT) AS hi FROM docs),
hbk AS (
  SELECT token,
    CAST(floor((doc_id - lo) * {_HL_C} / (hi - lo + 1)) AS INTEGER) AS b
  FROM htk CROSS JOIN hbd
),
hfb AS (SELECT token, min(b) AS fb FROM hbk GROUP BY token),
hnv AS (SELECT fb AS b, CAST(count(*) AS BIGINT) AS nv FROM hfb GROUP BY fb),
hnt AS (SELECT b, CAST(count(*) AS BIGINT) AS nt FROM hbk GROUP BY b),
hpb AS (SELECT hnt.b, nt, COALESCE(nv, 0) AS nv
        FROM hnt LEFT JOIN hnv ON hnt.b = hnv.b),
hcm AS (
  SELECT b,
    CAST(sum(nt) OVER w AS BIGINT) AS cn,
    CAST(sum(nv) OVER w AS BIGINT) AS cv
  FROM hpb
  WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
hst AS (SELECT b, cn, cv, ln(CAST(cn AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y
        FROM hcm WHERE cn > 0 AND cv > 0),
hrn AS (
  SELECT b, cn, cv,
    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
    sum(x * x) OVER w AS sxx, sum(x * y) OVER w AS sxy, sum(y * y) OVER w AS syy,
    count(*) OVER wf AS nn,
    CAST(min(cv) OVER wf AS BIGINT) AS vlo,
    CAST(max(cv) OVER wf AS BIGINT) AS vhi,
    CAST(row_number() OVER (ORDER BY b) AS BIGINT) AS rn
  FROM hst
  WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
hlt AS (SELECT * FROM hrn WHERE rn = nn)
SELECT
  CAST(nn AS BIGINT) AS n_points,
  cv AS n_vocab,
  cn AS total_tokens,
  CASE WHEN (nn * sxx - sx * sx) > 0
       THEN round(exp((sy - ((nn * sxy - sx * sy) / (nn * sxx - sx * sx)) * sx) / nn),
                  6) + 0
  END AS k_coef,
  CASE WHEN (nn * sxx - sx * sx) > 0
       THEN round((nn * sxy - sx * sy) / (nn * sxx - sx * sx), 6) + 0
  END AS beta,
  CASE WHEN (nn * sxx - sx * sx) > 0 AND vhi > vlo
       THEN round((nn * sxy - sx * sy) * (nn * sxy - sx * sy)
                  / ((nn * sxx - sx * sx) * (nn * syy - sy * sy)), 6) + 0
  END AS r2
FROM hlt
""",
    f"Heaps'-law OLS fit of vocabulary growth over {_HL_C} id-range "
    "checkpoints (beta~1 flags OCR noise, beta~0 template recycling); "
    "integer cumulative sums + checkpoint-ordered running-sum OLS so "
    "the double fold order is engine-independent",
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import heaps_law

    docs = read_table(spark, sf_dir, "documents")
    out = heaps_law(docs, n_checkpoints=_HL_C)
    z0 = F.lit(0.0)
    return out.select(
        "n_points",
        "n_vocab",
        "total_tokens",
        (F.round("k_coef", 6) + z0).alias("k_coef"),
        (F.round("beta", 6) + z0).alias("beta"),
        (F.round("r2", 6) + z0).alias("r2"),
    )


# --------------------------------------------------------------------------
# C-ext. Term burstiness (functions/tfidf.py::term_burstiness) — Fano
# factor of per-document counts (Church & Gale 1995).  S1/S2/D are integer
# sums; fano is two exact divisions, bit-identical, so the top-k cut
# (fano desc, token asc) selects the same set on both engines.
# --------------------------------------------------------------------------

_TB_MIN_DF = 5
_TB_K = 100


@register(
    "term_burstiness",
    f"""
WITH
{_DOCS_TOK_CTE},
btk AS (SELECT doc_id, unnest(toks) AS token FROM tok),
bpd AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
        FROM btk GROUP BY doc_id, token),
bst AS (
  SELECT token,
    CAST(count(*) AS BIGINT) AS df,
    CAST(sum(c) AS BIGINT) AS total_count,
    CAST(sum(c * c) AS BIGINT) AS s2
  FROM bpd GROUP BY token
),
btt AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM docs),
bsc AS (
  SELECT token, df, total_count,
    CAST(s2 AS DOUBLE) / CAST(total_count AS DOUBLE)
      - CAST(total_count AS DOUBLE) / CAST(nd AS DOUBLE) AS fano_raw
  FROM bst CROSS JOIN btt
  WHERE df >= {_TB_MIN_DF}
)
SELECT token, df, total_count, round(fano_raw, 6) + 0 AS fano
FROM bsc
ORDER BY fano_raw DESC, token ASC
LIMIT {_TB_K}
""",
    f"Top-{_TB_K} burstiest terms (Fano factor of per-doc counts, "
    f"df >= {_TB_MIN_DF}): boilerplate/stopword detector; integer "
    "aggregates + exact divisions, TakeOrdered top-k never a global sort",
)
def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import term_burstiness

    docs = read_table(spark, sf_dir, "documents")
    out = term_burstiness(docs, min_df=_TB_MIN_DF, top_k=_TB_K)
    z0 = F.lit(0.0)
    return out.select(
        "token",
        "df",
        "total_count",
        (F.round("fano", 6) + z0).alias("fano"),
    )


# --------------------------------------------------------------------------
# C-ext. Rank information coefficient (operators/cross_section.py::rank_ic)
# — per-period Spearman corr of momentum-signal ranks vs next-bar-return
# ranks.  row_number over (value, symbol) makes ranks tie-free integers, so
# the Spearman closed form is an exact rational and the only float is one
# final division.
# --------------------------------------------------------------------------

_IC_LAG = 5


@register(
    "rank_ic",
    f"""
WITH
{{bars_cte}},
icb AS (
  SELECT symbol, ts,
    ln(close / lag(close, {_IC_LAG}) OVER o) AS sig,
    ln(lead(close) OVER o / close) AS fwd
  FROM bars
  WINDOW o AS (PARTITION BY symbol ORDER BY ts)
),
icq AS (SELECT * FROM icb WHERE sig IS NOT NULL AND fwd IS NOT NULL),
icr AS (
  SELECT ts,
    CAST(row_number() OVER (PARTITION BY ts ORDER BY sig, symbol) AS BIGINT) AS rs,
    CAST(row_number() OVER (PARTITION BY ts ORDER BY fwd, symbol) AS BIGINT) AS rf
  FROM icq
),
icg AS (
  SELECT ts, CAST(count(*) AS BIGINT) AS n_sym,
    CAST(sum((rs - rf) * (rs - rf)) AS BIGINT) AS ssd
  FROM icr GROUP BY ts
)
SELECT ts, n_sym,
  CASE WHEN n_sym >= 3
       THEN round(1.0 - 6.0 * CAST(ssd AS DOUBLE)
                  / (CAST(n_sym AS DOUBLE)
                     * (CAST(n_sym AS DOUBLE) * CAST(n_sym AS DOUBLE) - 1)), 6) + 0
  END AS ic
FROM icg
""".format(bars_cte=_FEATURE_BARS_CTE),
    f"Per-period rank IC: Spearman corr of {_IC_LAG}-bar momentum ranks "
    "vs next-bar return ranks (Grinold-Kahn alpha diagnostic); tie-free "
    "integer ranks make the closed form exact",
)
def q_rank_ic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import rank_ic

    with _trades_config():
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
    out = rank_ic(bars, momentum_lag=_IC_LAG, ts_col="ts_event", close_col="close")
    z0 = F.lit(0.0)
    return out.select(
        "ts",
        "n_sym",
        (F.round("ic", 6) + z0).alias("ic"),
    )


# --------------------------------------------------------------------------
# C-ext. URL/domain profile (functions/corpus.py::url_profile) — the
# testdata corpus carries no URLs, so the query synthesizes deterministic
# URL-bearing text per doc IDENTICALLY in both engines (precedent: the
# synthesized JPEG/BMP marker streams) and the regex extraction + domain
# rollup is exercised for real.
# --------------------------------------------------------------------------

_UD_K = 40


@register(
    "url_domains",
    f"""
WITH uds AS (
  SELECT doc_id,
    text || ' see http://www.site' || CAST(doc_id % 17 AS VARCHAR)
         || '.example.com/p/' || CAST(doc_id AS VARCHAR)
         || ' and https://cdn' || CAST(doc_id % 5 AS VARCHAR) || '.host.net/x'
      AS text
  FROM documents
),
udx AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), 'https?://([a-z0-9.-]+)', 1)) AS domain
  FROM uds
),
udp AS (SELECT doc_id, domain, CAST(count(*) AS BIGINT) AS c
        FROM udx GROUP BY doc_id, domain),
udg AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(c) AS BIGINT) AS n_urls
        FROM udp GROUP BY domain)
SELECT domain, n_docs, n_urls FROM udg
ORDER BY n_urls DESC, n_docs DESC, domain ASC
LIMIT {_UD_K}
""",
    f"Top-{_UD_K} cited domains (doc reach + occurrence counts) from "
    "regex URL extraction over deterministic synthesized URL text — "
    "provenance/spam audit; integer-only ordering keys",
)
def q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import url_profile

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" see http://www.site"),
            (F.col("doc_id") % 17).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and https://cdn"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".host.net/x"),
        ),
    )
    return url_profile(docs, top_k=_UD_K).select("domain", "n_docs", "n_urls")


# --------------------------------------------------------------------------
# C-ext. Code detection (functions/text.py::code_detection) — structural
# code-likeness gate; the SAME pattern strings feed both engines and stay
# in the Java-regex/RE2-identical subset (\\r folded into the EOL class for
# CRLF parity).
# --------------------------------------------------------------------------

from polars_trading_spark.functions.text import (  # noqa: E402
    CODE_INDENT_PATTERN,
    CODE_SEMI_EOL_PATTERN,
    CODE_SYMBOL_PATTERN,
)

# The testdata corpus is pure prose (zero code punctuation), so the query
# splices a deterministic code snippet into 2/3 of the docs IDENTICALLY in
# both engines — the structural counters then separate three real classes
# (heavy code, light code, prose) instead of emitting all-zero rows.
_CD_SNIP = "\ndef f(x):\n    return x + 1;\n    y = (x + 2);"
_CD_SNIP_SQL = "e'" + _CD_SNIP.replace("\n", "\\n") + "'"


@register(
    "code_detection",
    """
WITH cds AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 3 = 0 THEN repeat({snip}, 4)
                 WHEN doc_id % 3 = 2 THEN {snip}
                 ELSE '' END AS text
  FROM documents
),
cdq AS (
  SELECT doc_id,
    CAST(COALESCE(length(text), 0) AS BIGINT) AS n_chars,
    CAST(CASE WHEN COALESCE(length(text), 0) > 0
         THEN length(text) - length(regexp_replace(text, '\\n', '', 'g')) + 1
         ELSE 0 END AS BIGINT) AS n_lines,
    CAST(COALESCE(length(text)
         - length(regexp_replace(text, '{sym}', '', 'g')), 0) AS BIGINT)
      AS symbol_chars,
    CAST(COALESCE(len(regexp_extract_all(text, '{ind}')), 0) AS BIGINT)
      AS indent_lines,
    CAST(COALESCE(len(regexp_extract_all(text, '{semi}')), 0) AS BIGINT)
      AS semi_lines
  FROM cds
)
SELECT doc_id, n_chars, n_lines, symbol_chars, indent_lines, semi_lines,
  CASE WHEN n_chars > 0
       THEN round(CAST(symbol_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) + 0
  END AS symbol_ratio,
  CASE WHEN n_lines > 0
       THEN round(CAST(indent_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) + 0
  END AS indent_ratio,
  CASE WHEN n_lines > 0
       THEN round(CAST(semi_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) + 0
  END AS semi_ratio,
  CAST(CASE WHEN n_chars > 0
         AND CAST(symbol_chars AS DOUBLE) / CAST(n_chars AS DOUBLE) > 0.03
         AND (CASE WHEN n_lines > 0
                THEN CAST(indent_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
                ELSE 0 END > 0.15
           OR CASE WHEN n_lines > 0
                THEN CAST(semi_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
                ELSE 0 END > 0.10)
       THEN 1 ELSE 0 END AS INTEGER) AS is_code
FROM cdq
""".format(
        sym=CODE_SYMBOL_PATTERN,
        ind=CODE_INDENT_PATTERN,
        semi=CODE_SEMI_EOL_PATTERN,
        snip=_CD_SNIP_SQL,
    ),
    "Structural code-likeness gate: code-punctuation density, indented-"
    "line and semicolon-EOL fractions (routes source code away from the "
    "prose filters) over deterministically code-spliced docs; "
    "zero-shuffle codegen pass, portable regexes",
)
def q_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import code_detection

    snip = F.lit(_CD_SNIP)
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.repeat(snip, 4))
            .when(F.col("doc_id") % 3 == 2, snip)
            .otherwise(F.lit("")),
        ),
    )
    out = code_detection(docs)
    z0 = F.lit(0.0)
    return out.select(
        "doc_id",
        "n_chars",
        "n_lines",
        "symbol_chars",
        "indent_lines",
        "semi_lines",
        (F.round("symbol_ratio", 6) + z0).alias("symbol_ratio"),
        (F.round("indent_ratio", 6) + z0).alias("indent_ratio"),
        (F.round("semi_ratio", 6) + z0).alias("semi_ratio"),
        F.col("is_code").cast("int").alias("is_code"),
    )


# --------------------------------------------------------------------------
# C-ext. Language-mix profile (functions/corpus.py::lang_mix) — per-source
# cross-lingual contamination gate.  The entropy fold runs in lang order
# via a running window read at the last row (SCALING rule 24); the majority
# pick is a total ordering (count desc, lang asc).
# --------------------------------------------------------------------------


@register(
    "lang_mix",
    """
WITH lmc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
             FROM documents GROUP BY source, lang),
lmw AS (
  SELECT source, lang, c,
    CAST(sum(c) OVER f AS BIGINT) AS tot,
    CAST(count(*) OVER f AS BIGINT) AS k,
    row_number() OVER (PARTITION BY source ORDER BY lang) AS rn,
    row_number() OVER (PARTITION BY source ORDER BY c DESC, lang ASC) AS toprn
  FROM lmc
  WINDOW f AS (PARTITION BY source)
),
lm2 AS (
  SELECT source, lang, c, tot, k, rn,
    -((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
      * ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))) AS term,
    CASE WHEN toprn = 1 THEN lang END AS tl,
    CASE WHEN toprn = 1 THEN c END AS tc
  FROM lmw
),
lm3 AS (
  SELECT source, tot, k, rn,
    sum(term) OVER (PARTITION BY source ORDER BY lang
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ent,
    max(tl) OVER (PARTITION BY source) AS top_lang,
    max(tc) OVER (PARTITION BY source) AS topc
  FROM lm2
)
SELECT source, tot AS n_docs, k AS n_langs, top_lang,
  round(CAST(topc AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0 AS top_share,
  round(ent, 6) + 0 AS lang_entropy
FROM lm3 WHERE rn = k
""",
    "Per-source language mix: doc counts, majority language + share, "
    "Shannon entropy of the language distribution (mislabeled / "
    "machine-mixed source gate); lang-ordered entropy fold",
)
def q_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import lang_mix

    docs = read_table(spark, sf_dir, "documents")
    out = lang_mix(docs)
    z0 = F.lit(0.0)
    return out.select(
        "source",
        "n_docs",
        "n_langs",
        "top_lang",
        (F.round("top_share", 6) + z0).alias("top_share"),
        (F.round("lang_entropy", 6) + z0).alias("lang_entropy"),
    )


# --------------------------------------------------------------------------
# C-ext. Classic technical indicators over 15m bars
# (operators/indicators.py: ATR / Bollinger / MACD).  The EWM oracles replay
# the operator's segment-renormalized closed form verbatim (same constants
# via !r) — the proven rsi/ewm_std idiom.
# --------------------------------------------------------------------------

from polars_trading_spark.operators.indicators import _chunk_len as _ind_chunk_len


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
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
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
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
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
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
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
# C-ext. BM25 document ranking (functions/tfidf.py::bm25_topk) — Robertson
# idf, in-array query-term filter so the only explode is |Q|-bounded,
# round-before-rank TakeOrdered selection.
# --------------------------------------------------------------------------

_BM25_TERMS = ("hash", "join", "merge", "stream")
_BM25_K1, _BM25_B, _BM25_K = 1.2, 0.75, 25
_BM25_IN = ", ".join(f"'{t}'" for t in sorted(_BM25_TERMS))


@register(
    "bm25",
    f"""
WITH
{_DOCS_TOK_CTE},
qbase AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         list_filter(toks, x -> x IN ({_BM25_IN})) AS qt
  FROM tok
),
qtot AS (
  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(dl) AS BIGINT) AS sumdl
  FROM qbase
),
qtf AS (
  SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, unnest(qt) AS token FROM qbase)
  GROUP BY doc_id, dl, token
),
qdf AS (SELECT token, CAST(count(*) AS BIGINT) AS df_ FROM qtf GROUP BY token),
qsc AS (
  SELECT doc_id,
    CAST(count(*) AS INTEGER) AS n_terms_hit,
    CAST(max(dl) AS BIGINT) AS dl,
    sum(
      (ln((CAST(nd AS DOUBLE) - CAST(df_ AS DOUBLE) + 0.5)
          / (CAST(df_ AS DOUBLE) + 0.5) + 1.0)
       * (CAST(tf AS DOUBLE) * {_BM25_K1 + 1.0!r}))
      / (CAST(tf AS DOUBLE) + {_BM25_K1!r}
         * ({1.0 - _BM25_B!r} + {_BM25_B!r} * CAST(dl AS DOUBLE)
            / (CAST(sumdl AS DOUBLE) / CAST(nd AS DOUBLE))))
    ) AS score_raw
  FROM qtf JOIN qdf USING (token) CROSS JOIN qtot
  GROUP BY doc_id
)
SELECT doc_id, n_terms_hit, dl, round(score_raw, 6) + 0 AS score
FROM qsc
ORDER BY round(score_raw, 6) + 0 DESC, doc_id ASC
LIMIT {_BM25_K}
""",
    f"BM25 top-{_BM25_K} documents for a {len(_BM25_TERMS)}-term query "
    f"(k1={_BM25_K1}, b={_BM25_B}, Lucene non-negative idf) — doc length "
    "via F.size (no corpus explode), |Q|-bounded token explode, "
    "round-before-rank TakeOrdered selection",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import bm25_topk

    docs = read_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, query_terms=_BM25_TERMS, k1=_BM25_K1, b=_BM25_B, top_k=_BM25_K
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
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
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
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
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
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE)
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


# --------------------------------------------------------------------------
# C-ext. Hampel outlier filter (operators/data_quality.py::hampel_filter)
# — rolling median + CANONICAL MAD (deviations from the CENTER window's
# median, read as the middle element of the sorted deviation list);
# comparison rounded to 9 on both sides.
# --------------------------------------------------------------------------

_HAMP_W, _HAMP_K = 21, 3.0
_HAMP_H = _HAMP_W // 2
_HAMP_SCALE = 1.4826 * _HAMP_K


@register(
    "hampel_filter",
    f"""
WITH trades AS ({TRADES_CTE}),
hp0 AS (
  SELECT symbol, ts_event, seq, price,
    count(*) OVER w AS n_,
    quantile_cont(price, 0.5) OVER w AS med,
    list(price) OVER w AS vals
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq
               ROWS BETWEEN {_HAMP_H} PRECEDING AND {_HAMP_H} FOLLOWING)
),
hp2 AS (
  SELECT symbol, ts_event, seq, price, n_, med,
    abs(price - med) AS dev,
    -- canonical MAD: middle element of the sorted |x_j - med_t| list
    list_sort(list_transform(vals, v -> abs(v - med)))[{_HAMP_H + 1}] AS mad
  FROM hp0
),
hp3 AS (
  SELECT *,
    CASE WHEN n_ = {_HAMP_W}
          AND round(dev, 9) > round({_HAMP_SCALE!r} * mad, 9)
         THEN 1 ELSE 0 END AS flag
  FROM hp2
)
SELECT symbol, ts_event, seq,
  round(CASE WHEN n_ = {_HAMP_W} THEN med END, 6) + 0 AS rolling_median,
  round(CASE WHEN n_ = {_HAMP_W} THEN mad END, 6) + 0 AS rolling_mad,
  CAST(flag AS INTEGER) AS is_outlier,
  round(CASE WHEN flag = 1 THEN med ELSE price END, 6) + 0 AS price_clean
FROM hp3
""",
    f"Hampel outlier filter (centered {_HAMP_W}-tick rolling median + "
    f"canonical MAD of deviations from the center's median, k={_HAMP_K}, "
    "Gaussian scale) — the robust tick scrubber; bounded centered frames "
    "over one symbol exchange, exact MAD via sorted deviation array, "
    "comparison rounded to 9 on both engines, zero Python",
)
def q_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.data_quality import hampel_filter

    with _trades_config():
        out = hampel_filter(
            trades_from_events(spark, sf_dir), window=_HAMP_W, k=_HAMP_K, seq_col=SEQ_COL
        )
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "ts_event",
        F.col(SEQ_COL).alias("seq"),
        (F.round("rolling_median", 6) + z0).alias("rolling_median"),
        (F.round("rolling_mad", 6) + z0).alias("rolling_mad"),
        F.col("is_outlier").cast("int").alias("is_outlier"),
        (F.round("price_clean", 6) + z0).alias("price_clean"),
    )


# --------------------------------------------------------------------------
# C-ext. Exact trimmed/winsorized moments (operators/stats.py::
# robust_moments) over per-symbol log returns — trimmed sum = difference
# of two rank-ordered prefix-sum readings, so every float is a
# deterministic single-order fold.
# --------------------------------------------------------------------------

_RM_ALPHA = 0.1


@register(
    "robust_moments",
    f"""
WITH trades AS ({TRADES_CTE}),
rm0 AS (
  SELECT symbol, ts_event, seq,
    ln(price / lag(price) OVER (PARTITION BY symbol ORDER BY ts_event, seq)) AS r
  FROM trades
),
rm1 AS (SELECT * FROM rm0 WHERE r IS NOT NULL),
rm2 AS (
  SELECT symbol, r,
    row_number() OVER wo AS rn,
    sum(r) OVER wr AS s1,
    sum(r * r) OVER wr AS s2,
    count(*) OVER (PARTITION BY symbol) AS n_,
    CAST(floor({_RM_ALPHA!r} * count(*) OVER (PARTITION BY symbol)) AS BIGINT) AS kc
  FROM rm1
  WINDOW wo AS (PARTITION BY symbol ORDER BY r, ts_event, seq),
         wr AS (PARTITION BY symbol ORDER BY r, ts_event, seq
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
rm3 AS (
  SELECT symbol,
    CAST(max(n_) AS BIGINT) AS n,
    max(kc) AS k,
    max(CASE WHEN rn = kc THEN s1 END) AS s1_k,
    max(CASE WHEN rn = n_ - kc THEN s1 END) AS s1_top,
    max(CASE WHEN rn = kc THEN s2 END) AS s2_k,
    max(CASE WHEN rn = n_ - kc THEN s2 END) AS s2_top,
    max(CASE WHEN rn = kc + 1 THEN r END) AS lo_,
    max(CASE WHEN rn = n_ - kc THEN r END) AS hi_
  FROM rm2 GROUP BY symbol
),
rm4 AS (
  SELECT symbol, n, k,
    CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
    CAST(n AS DOUBLE) - 2.0 * CAST(k AS DOUBLE) AS kept,
    s1_top - coalesce(s1_k, 0.0) AS t1,
    s2_top - coalesce(s2_k, 0.0) AS t2,
    lo_, hi_
  FROM rm3
),
rm5 AS (
  SELECT symbol, n, k, kept, nd, t1,
    t1 + kd * lo_ + kd * hi_ AS w1,
    t2 + kd * (lo_ * lo_) + kd * (hi_ * hi_) AS w2
  FROM rm4
)
SELECT symbol, n, k AS n_cut,
  round(CASE WHEN kept >= 1.0 THEN t1 / kept END, 6) + 0 AS trimmed_mean,
  round(CASE WHEN kept >= 1.0 THEN w1 / nd END, 6) + 0 AS winsor_mean,
  round(CASE WHEN kept >= 1.0 AND nd >= 2.0
        THEN sqrt(greatest((w2 - (w1 * w1) / nd) / (nd - 1.0), 0.0)) END, 6) + 0
    AS winsor_std
FROM rm5
""",
    f"Exact {_RM_ALPHA:.0%}-trimmed and winsorized return moments per "
    "symbol — robust outlier-resistant stats; trimmed sum = difference "
    "of two rank-ordered prefix-sum readings (single deterministic fold "
    "order, no unordered reduces), one group exchange, zero Python",
)
def q_robust_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.stats import robust_moments

    with _trades_config():
        t = trades_from_events(spark, sf_dir)
    from pyspark.sql import Window as W

    wo = W.partitionBy("symbol").orderBy("ts_event", SEQ_COL)
    r = F.log(F.col("price") / F.lag("price").over(wo))
    staged = t.withColumn("__r", r).where(F.col("__r").isNotNull())
    out = robust_moments(
        staged,
        alpha=_RM_ALPHA,
        group_col="symbol",
        value_col="__r",
        order_cols=("ts_event", SEQ_COL),
    )
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n",
        "n_cut",
        (F.round("trimmed_mean", 6) + z0).alias("trimmed_mean"),
        (F.round("winsor_mean", 6) + z0).alias("winsor_mean"),
        (F.round("winsor_std", 6) + z0).alias("winsor_std"),
    )


# ==========================================================================
# Driver-gate rotation (round 7).
#
# The driver's correctness harness verifies the FIRST 50 entries of
# ``queries()`` insertion order (rows + schema + value-hash vs the DuckDB
# oracle at sf0.01).  Rounds 1-4 gated the original first 50 registry
# entries; round 5 gated 50 of the later registrations (48 green, 2 red —
# both determinism bugs, fixed and re-gated green in round 6); round 6's
# window (50/50 green) covered the 26 then-never-checked names, the two
# red re-checks, and 22 backfill — so every query registered through
# round 5 has a driver-green row.  Round 7's window holds the 18 round-6
# registrations (which sat behind the round-6 window and have never been
# driver-checked), the 28 queries whose most recent driver row is round 4
# or older, and 4 regression-heavy round-5-gated re-checks (closed-form
# OLS / eigen-ish folds most exposed to cross-engine float drift).
#
# KEEP THIS BLOCK AT THE VERY END OF THE FILE — any @register above it is
# subject to the rotation; new queries registered after it append behind
# the front window and enter the gate on a later rotation.
# ==========================================================================

_ROUND7_FRONT = [
    # -- the 18 round-6 registrations, never driver-checked --
    "two_scale_rv", "pairs_distance", "event_study_car", "gumbel_topk",
    "hard_negatives", "realized_moments", "cluster_representatives",
    "kalman_hedge", "risk_ratios", "vocab_divergence", "size_quantiles",
    "key_skew", "embedding_cohesion", "centroid_similarity", "ann_recall",
    "ulcer_index", "runs_test", "dedup_recall",
    # -- 28 backfill: most recent driver row is round 4 or older --
    "bar_volatility", "corpus_filter", "corpus_split", "corpus_stats",
    "corwin_schultz", "cpcv_assign", "csw_explosiveness", "dedup_clusters",
    "dedup_embedding_cosine", "dedup_ngram_jaccard", "dedup_simhash",
    "imbalance_bars", "microstructure", "multimodal_frame_sample",
    "multimodal_metadata", "purged_kfold", "repetition_profile",
    "return_entropy", "run_bars", "sadf_adf1", "similarity_topk_ivf",
    "similarity_topk_lsh", "stratified_sample", "text_analysis",
    "tfidf_topk", "trend_scan", "vocab_topk", "vpin",
    # -- 4 regression-heavy round-5-gated re-checks --
    "ou_fit", "cointegration", "variance_ratio", "hurst",
]


def _rotate_front(front: list) -> None:
    missing = [n for n in front if n not in QUERIES]
    if missing:  # fail loudly at import if the list drifts from the registry
        raise KeyError(f"rotation names not registered: {missing}")
    ordered = front + [n for n in QUERIES if n not in set(front)]
    items = [(n, QUERIES[n]) for n in ordered]
    QUERIES.clear()
    QUERIES.update(items)


# Round-8 rotation, PRE-COMPUTED from CORRECTNESS_r01–r07 latest-round
# history.  Front = the 18 round-7 registrations (never driver-checked)
# + the 32 alphabetically-first names whose latest driver row is
# round 5 (the stalest cohort after the r6/r7 windows).  A 50/50 green
# CORRECTNESS_r08 completes driver coverage: all 162 queries registered
# through round 7 will then have at least one green driver row.
# (The remaining r5-latest names, starting with return_acf, rotate in
# round 9, together with any round-8 registrations.)

_ROUND8_FRONT = [
    # -- the 18 round-7 registrations, never driver-checked --
    "lexical_diversity", "encoding_quality", "heaps_law",
    "term_burstiness", "rank_ic", "url_domains", "code_detection",
    "lang_mix", "atr", "bollinger", "macd", "bm25", "stochastic", "obv",
    "session_vwap", "donchian", "hampel_filter", "robust_moments",
    # -- 32 backfill: latest driver row is round 5 (stalest cohort) --
    "ac_schedule", "backtest_stats", "bde_cusum", "bet_sizing",
    "bigram_logprob", "boilerplate", "bpe_pairs", "cluster_keywords",
    "corpus_funnel", "cs_zscore", "dedup_containment", "dedup_paragraph",
    "drawdown_path", "dup_spans", "event_funnel", "feature_matrix",
    "imbalance_bars_adaptive", "intraday_profile", "jump_test",
    "lead_lag", "ledoit_wolf", "lz_entropy", "ma_crossover",
    "mix_corpus", "momentum_rank", "pair_correlation", "pcm_features",
    "pii_scrub", "psi_drift", "range_bars", "rank_portfolio",
    "retention",
]

_rotate_front(_ROUND8_FRONT)
