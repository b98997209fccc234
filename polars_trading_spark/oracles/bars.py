"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark._utils import SEQ_COL
from polars_trading_spark.operators import bars as bars_ops
from polars_trading_spark.operators.bars import BAR_AMOUNT
from polars_trading_spark.operators.bars import BAR_ID
from polars_trading_spark.operators.bars import bar_groups
from polars_trading_spark.sources.tables import TRADES_CTE
from polars_trading_spark.sources.tables import trades_from_events
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from polars_trading_spark.oracles._shared import (  # noqa: F401
    feature_bars,
    TIME_BAR_SIZE,
    _OHLCV_ORACLE,
    _TIME_BUCKET_US,
    _round_vwap,
    _trades_config,
    register,
)



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
        out = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        out = feature_bars(spark, sf_dir, bar_size="1h30m")
    return _round_vwap(out.withColumnRenamed("ts_event", "ts_event_bucket"))



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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = bar_volatility(bars, window=_VOL_WINDOW, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        *[F.round(c, 6).alias(c) for c in ("vol_cc", "vol_parkinson", "vol_gk", "vol_rs", "vol_yz")],
    )



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
