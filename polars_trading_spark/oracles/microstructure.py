"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark._utils import SEQ_COL
from polars_trading_spark.operators import bars as bars_ops
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
    _VOL_WINDOW,
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = corwin_schultz(bars, window=_CS_WINDOW, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        F.round("cs_spread", 6).alias("cs_spread"),
        F.round("bp_sigma", 6).alias("bp_sigma"),
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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


# --------------------------------------------------------------------------
# C-ext (round 10). Implementation shortfall vs the arrival price
# (operators/execution.py::implementation_shortfall /
# execution_tearsheet, Perold 1988) — parent orders carved
# deterministically from the tape (50-fill runs, side by parent
# parity); every fanning float reduce is a (ts, seq)- or
# parent_id-ordered running fold on both engines.
# --------------------------------------------------------------------------

_IS_TPP = 50

_IS_PARENT_CTES = f"""trades AS ({TRADES_CTE}),
isb AS (
  SELECT symbol, ts_event, seq, price, CAST(size AS DOUBLE) AS sz,
    row_number() OVER (PARTITION BY symbol ORDER BY ts_event, seq) - 1 AS rn
  FROM trades WHERE price IS NOT NULL
),
ispar AS (
  SELECT *, CAST(rn // {_IS_TPP} AS BIGINT) AS parent_id,
    CASE WHEN (rn // {_IS_TPP}) % 2 = 0 THEN 1 ELSE -1 END AS side
  FROM isb
),
isfold AS (
  SELECT symbol, parent_id, side,
    row_number() OVER wp AS prn,
    count(*) OVER (PARTITION BY symbol, parent_id) AS pn,
    first(price) OVER wpr AS arrival_price,
    price AS last_px,
    sum(sz * price) OVER wpr AS rpv,
    sum(sz) OVER wpr AS rv
  FROM ispar
  WINDOW wp AS (PARTITION BY symbol, parent_id ORDER BY ts_event, seq),
         wpr AS (PARTITION BY symbol, parent_id ORDER BY ts_event, seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
ispstat AS (
  SELECT symbol, parent_id, side,
    CAST(pn AS INTEGER) AS n_fills,
    rv, arrival_price, last_px, rpv,
    side * 1e4 * (rpv / rv - arrival_price) / arrival_price AS sb,
    side * 1e4 * (last_px - arrival_price) / arrival_price AS mm
  FROM isfold WHERE prn = pn
)"""


@register(
    "implementation_shortfall",
    f"""
WITH {_IS_PARENT_CTES}
SELECT symbol, parent_id, side, n_fills,
  CAST(rv AS BIGINT) AS qty,
  arrival_price,
  round(rpv / rv, 6) + 0 AS fill_vwap,
  round(sb, 6) + 0 AS shortfall_bps,
  round(mm, 6) + 0 AS market_move_bps
FROM ispstat
""",
    f"Per-parent-order implementation shortfall vs arrival price "
    f"(Perold): {_IS_TPP}-fill parents carved deterministically from "
    "the tape, side by parity; fill VWAP and shortfall/market-move bps "
    "as ordered folds — two shuffles, zero joins, zero Python",
)
def q_implementation_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.execution import implementation_shortfall

    with _trades_config():
        out = implementation_shortfall(
            trades_from_events(spark, sf_dir), trades_per_parent=_IS_TPP
        )
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "parent_id",
        "side",
        "n_fills",
        "qty",
        "arrival_price",
        (F.round("fill_vwap", 6) + z0).alias("fill_vwap"),
        (F.round("shortfall_bps", 6) + z0).alias("shortfall_bps"),
        (F.round("market_move_bps", 6) + z0).alias("market_move_bps"),
    )


@register(
    "execution_tearsheet",
    f"""
WITH {_IS_PARENT_CTES},
isf2 AS (
  SELECT symbol,
    row_number() OVER wo AS rn2,
    count(*) OVER wa AS n2,
    sum(rv) OVER wr AS rq,
    sum(sb * rv) OVER wr AS rsq,
    sum(sb) OVER wr AS rs,
    sum(mm) OVER wr AS rm,
    max(sb) OVER wa AS worst,
    min(sb) OVER wa AS best,
    sum(CASE WHEN sb <= 0 THEN 1 ELSE 0 END) OVER wa AS hits
  FROM ispstat
  WINDOW wo AS (PARTITION BY symbol ORDER BY parent_id),
         wr AS (PARTITION BY symbol ORDER BY parent_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY symbol)
)
SELECT symbol,
  CAST(n2 AS INTEGER) AS n_orders,
  CAST(rq AS BIGINT) AS total_qty,
  round(rsq / rq, 6) + 0 AS vw_shortfall_bps,
  round(rs / n2, 6) + 0 AS avg_shortfall_bps,
  round(worst, 6) + 0 AS worst_bps,
  round(best, 6) + 0 AS best_bps,
  round(hits / CAST(n2 AS DOUBLE), 6) + 0 AS hit_rate,
  round(rm / n2, 6) + 0 AS avg_market_move_bps
FROM isf2 WHERE rn2 = n2
""",
    "Per-symbol execution tearsheet over the parent-order shortfall "
    "frame: qty-weighted and mean shortfall, extremes, hit rate, mean "
    "market move — every fanning reduce a parent_id-ordered fold",
)
def q_execution_tearsheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.execution import execution_tearsheet

    with _trades_config():
        out = execution_tearsheet(
            trades_from_events(spark, sf_dir), trades_per_parent=_IS_TPP
        )
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_orders",
        "total_qty",
        (F.round("vw_shortfall_bps", 6) + z0).alias("vw_shortfall_bps"),
        (F.round("avg_shortfall_bps", 6) + z0).alias("avg_shortfall_bps"),
        (F.round("worst_bps", 6) + z0).alias("worst_bps"),
        (F.round("best_bps", 6) + z0).alias("best_bps"),
        (F.round("hit_rate", 6) + z0).alias("hit_rate"),
        (F.round("avg_market_move_bps", 6) + z0).alias("avg_market_move_bps"),
    )


# --------------------------------------------------------------------------
# C-ext (round 10). Market-impact power-law fit over the parent-order
# shortfall frame (operators/execution.py::market_impact_fit) — the
# empirical square-root-law test: ln(shortfall_bps) regressed on
# ln(participation) per symbol, every OLS moment a parent_id-ordered
# fold (the zipf_fit log-log discipline).
# --------------------------------------------------------------------------

_MIF_LN001 = -4.605170185988091  # float(math.log(0.01)), injected verbatim


@register(
    "market_impact_fit",
    f"""
WITH {_IS_PARENT_CTES},
mifx AS (
  SELECT symbol, parent_id,
    CASE WHEN sb > 0 AND qb > 0
         THEN ln(CAST(qb AS DOUBLE) / CAST(tq AS DOUBLE)) END AS x,
    CASE WHEN sb > 0 AND qb > 0 THEN ln(sb) END AS y
  FROM (
    SELECT symbol, parent_id, sb, CAST(rv AS BIGINT) AS qb,
      sum(CAST(rv AS BIGINT)) OVER (PARTITION BY symbol) AS tq
    FROM ispstat
  )
),
miff AS (
  SELECT symbol,
    row_number() OVER wo AS rn2,
    count(*) OVER wa AS n2,
    sum(CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END) OVER wa AS nu,
    sum(x) OVER wr AS sx,
    sum(y) OVER wr AS sy,
    sum(x * y) OVER wr AS sxy,
    sum(x * x) OVER wr AS sxx,
    sum(y * y) OVER wr AS syy
  FROM mifx
  WINDOW wo AS (PARTITION BY symbol ORDER BY parent_id),
         wr AS (PARTITION BY symbol ORDER BY parent_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY symbol)
),
mifo AS (
  SELECT symbol,
    CAST(n2 AS INTEGER) AS n_orders,
    CAST(nu AS INTEGER) AS n_used,
    CASE WHEN nu >= 3 AND nud * sxx - sx * sx > 0
         THEN (nud * sxy - sx * sy) / (nud * sxx - sx * sx) END AS beta,
    nud, sx, sy, sxy, sxx, syy
  FROM (SELECT *, CAST(nu AS DOUBLE) AS nud FROM miff WHERE rn2 = n2)
)
SELECT symbol, n_orders, n_used,
  round(beta, 6) + 0 AS impact_exponent,
  round((sy - beta * sx) / nud, 6) + 0 AS ln_impact_coef,
  round(exp((sy - beta * sx) / nud + beta * ({_MIF_LN001})), 6) + 0
    AS impact_at_1pct_bps,
  round(CASE WHEN beta IS NOT NULL AND nud * syy - sy * sy > 0
             THEN (nud * sxy - sx * sy) * (nud * sxy - sx * sy)
                  / ((nud * sxx - sx * sx) * (nud * syy - sy * sy)) END,
        6) + 0 AS impact_r2
FROM mifo
""",
    "Per-symbol market-impact power-law fit (square-root-law test): "
    "log-log OLS of positive parent-order shortfall on tape-share "
    "participation — every OLS moment a parent_id-ordered fold, "
    "integer participation denominator, zero joins, zero Python",
)
def q_market_impact_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.execution import market_impact_fit

    with _trades_config():
        out = market_impact_fit(
            trades_from_events(spark, sf_dir), trades_per_parent=_IS_TPP
        )
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_orders",
        "n_used",
        (F.round("impact_exponent", 6) + z0).alias("impact_exponent"),
        (F.round("ln_impact_coef", 6) + z0).alias("ln_impact_coef"),
        (F.round("impact_at_1pct_bps", 6) + z0).alias("impact_at_1pct_bps"),
        (F.round("impact_r2", 6) + z0).alias("impact_r2"),
    )


# --------------------------------------------------------------------------
# C-ext (round 10). Volatility signature curve
# (operators/volatility.py::rv_signature — Andersen/Bollerslev/Diebold/
# Labys 2000): subsampled-average RV at a tick-lag ladder, the
# microstructure-noise diagnostic; ordered running folds per (symbol,
# lag), the ladder exploded so every lag shares one exchange.
# --------------------------------------------------------------------------


@register(
    "rv_signature",
    f"""
WITH trades AS ({TRADES_CTE}),
rb AS (
  SELECT symbol, ts_event, seq, ln(price) AS lp, l.k
  FROM trades CROSS JOIN (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k) l
  WHERE price IS NOT NULL
),
rl AS (
  SELECT *,
    lp - (CASE WHEN k = 32 THEN lag(lp, 32) OVER w
               WHEN k = 16 THEN lag(lp, 16) OVER w
               WHEN k = 8 THEN lag(lp, 8) OVER w
               WHEN k = 4 THEN lag(lp, 4) OVER w
               WHEN k = 2 THEN lag(lp, 2) OVER w
               ELSE lag(lp, 1) OVER w END) AS d
  FROM rb WINDOW w AS (PARTITION BY symbol, k ORDER BY ts_event, seq)
),
rf AS (
  SELECT symbol, k,
    row_number() OVER wo AS rn,
    count(*) OVER wa AS n,
    sum(CASE WHEN d IS NOT NULL THEN 1 ELSE 0 END) OVER wa AS nd,
    sum(d * d) OVER wr AS s
  FROM rl
  WINDOW wo AS (PARTITION BY symbol, k ORDER BY ts_event, seq),
         wr AS (PARTITION BY symbol, k ORDER BY ts_event, seq
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY symbol, k)
),
ragg AS (
  SELECT symbol, CAST(k AS INTEGER) AS k, CAST(nd AS BIGINT) AS n_diffs,
    CASE WHEN nd >= 1 THEN s / k END AS rv
  FROM rf WHERE rn = n
),
rbase AS (SELECT symbol, rv AS rvb FROM ragg WHERE k = 32)
SELECT a.symbol, a.k, a.n_diffs,
  round(a.rv, 9) + 0 AS rv,
  round(CASE WHEN b.rvb > 0 THEN a.rv / b.rvb END, 9) + 0 AS noise_ratio
FROM ragg a LEFT JOIN rbase b USING (symbol)
""",
    "Volatility signature curve: subsampled-average realized variance "
    "at tick lags 1..32 per symbol with the noise ratio vs the base "
    "lag — flat curve = clean sampling, steep left edge = bid-ask "
    "noise; one exploded exchange, ordered folds, zero Python",
)
def q_rv_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.volatility import rv_signature

    with _trades_config():
        out = rv_signature(trades_from_events(spark, sf_dir))
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "k",
        "n_diffs",
        (F.round("rv", 9) + z0).alias("rv"),
        (F.round("noise_ratio", 9) + z0).alias("noise_ratio"),
    )


# --------------------------------------------------------------------------
# C-ext (round 10). Day-of-week return seasonality
# (operators/seasonality.py::weekday_effect — French 1980): daily
# close-to-close returns bucketed by INTEGER epoch-day weekday with a
# per-bucket t-statistic; day-ordered moment folds throughout.
# --------------------------------------------------------------------------


@register(
    "weekday_effect",
    f"""
WITH trades AS ({TRADES_CTE}),
wdd AS (
  SELECT symbol, CAST(ts_event AS DATE) AS day,
    last(price ORDER BY ts_event, seq) AS close
  FROM trades WHERE price IS NOT NULL
  GROUP BY symbol, CAST(ts_event AS DATE)
),
wdr AS (
  SELECT symbol, day,
    close / lag(close) OVER (PARTITION BY symbol ORDER BY day) - 1 AS ret,
    CAST((day - DATE '1970-01-01' + 3) % 7 AS INTEGER) AS weekday
  FROM wdd
),
wdf AS (
  SELECT symbol, weekday,
    row_number() OVER wo AS rn,
    count(*) OVER wa AS n,
    sum(ret) OVER wr AS s1,
    sum(ret * ret) OVER wr AS s2
  FROM wdr WHERE ret IS NOT NULL
  WINDOW wo AS (PARTITION BY symbol, weekday ORDER BY day),
         wr AS (PARTITION BY symbol, weekday ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY symbol, weekday)
)
SELECT symbol, weekday, CAST(n AS BIGINT) AS n_days,
  round(s1 / CAST(n AS DOUBLE), 9) + 0 AS mean_ret,
  round(CASE WHEN n >= 2
             AND (s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) > 0
        THEN (s1 / CAST(n AS DOUBLE))
             / sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
                    / CAST(n AS DOUBLE)) END, 9) + 0 AS t_stat
FROM wdf WHERE rn = n
""",
    "Day-of-week return seasonality per symbol (weekend-effect screen): "
    "daily ordered-last closes, integer epoch-day weekday (0=Monday), "
    "per-bucket mean return and t-stat from day-ordered folds",
)
def q_weekday_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.seasonality import weekday_effect

    with _trades_config():
        out = weekday_effect(trades_from_events(spark, sf_dir))
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "weekday",
        "n_days",
        (F.round("mean_ret", 9) + z0).alias("mean_ret"),
        (F.round("t_stat", 9) + z0).alias("t_stat"),
    )
