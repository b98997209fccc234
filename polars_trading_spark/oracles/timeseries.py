"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark._utils import SEQ_COL
from polars_trading_spark.operators import bars as bars_ops
from polars_trading_spark.operators.asof import asof_join
from polars_trading_spark.operators.ewm import ewm_std
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
    _VOL_K,
    _VOL_WINDOW,
)
from polars_trading_spark.oracles.labels import (  # noqa: F401
    DAILY_VOL_SPAN,
    EWM_STD_SQL,
)



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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = rolling_beta(bars, window=_BETA_WINDOW, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        F.round("beta", 6).alias("beta"),
        F.round("corr", 6).alias("corr"),
    )



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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = rolling_pair_correlation(bars, window=_VOL_WINDOW, ts_col="ts_event")
    return out.select("sym_a", "sym_b", "ts_event", F.round("corr", 6).alias("corr"))



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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = pairs_distance(bars, ts_col="ts_event", close_col="close")
    return out.select(
        "sym_a",
        "sym_b",
        "n_obs",
        (F.round("ssd", 6) + F.lit(0.0)).alias("ssd"),
        (F.round("rmsd", 6) + F.lit(0.0)).alias("rmsd"),
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
# C-ext (round 8). Pairs band backtest with entry/exit hysteresis
# (operators/mean_reversion.py::spread_band_backtest) — the stateful-
# looking band rule as a pure window expression: last-non-null event
# over the running frame; z rounded to 6 before every band comparison.
# --------------------------------------------------------------------------

_SB_W, _SB_ENTRY, _SB_EXIT = 50, 2.0, 0.5

# Shared CTE chain (bars -> pair spread -> rolling z -> hysteresis
# position) reused by spread_band_backtest and its cost-aware net
# variant below.
_SB_CTES = f"""
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
               ROWS BETWEEN {_SB_W - 1} PRECEDING AND CURRENT ROW)
),
zz AS (
  SELECT sym_a, sym_b, ts, spread,
    CASE WHEN n >= {_SB_W} AND sqrt(greatest((s2 - s*s/n) / (n - 1), 0.0)) > 0
         THEN (spread - s/n) / sqrt(greatest((s2 - s*s/n) / (n - 1), 0.0)) END AS z
  FROM zx
),
ev AS (
  SELECT *,
    CASE WHEN round(z, 6) >= {_SB_ENTRY!r} THEN -1.0
         WHEN round(z, 6) <= -{_SB_ENTRY!r} THEN 1.0
         WHEN abs(round(z, 6)) <= {_SB_EXIT!r} THEN 0.0 END AS evt
  FROM zz
),
pos AS (
  SELECT *,
    coalesce(last_value(evt IGNORE NULLS) OVER (
      PARTITION BY sym_a, sym_b ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS position
  FROM ev
)"""


@register(
    "spread_band_backtest",
    f"""
WITH
{_SB_CTES},
fin AS (
  SELECT sym_a, sym_b, ts, spread, z, position,
    coalesce(lag(position) OVER w2, 0.0) <> position AS traded,
    coalesce(lag(position) OVER w2, 0.0)
      * (spread - lag(spread) OVER w2) AS pnl
  FROM pos
  WINDOW w2 AS (PARTITION BY sym_a, sym_b ORDER BY ts)
)
SELECT sym_a, sym_b, ts,
  round(spread, 6) + 0 AS spread,
  round(z, 6) + 0 AS z,
  position + 0 AS position,
  CAST(traded AS INTEGER) AS traded,
  round(pnl, 6) + 0 AS pnl
FROM fin
""",
    f"Pairs band backtest with hysteresis (enter |z| >= {_SB_ENTRY}, "
    f"hold, exit |z| <= {_SB_EXIT}): last-non-null event over a running "
    "frame makes the stateful band rule a pure window expression",
)
def q_spread_band_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.mean_reversion import spread_band_backtest

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = spread_band_backtest(
        bars, entry_z=_SB_ENTRY, exit_z=_SB_EXIT, window=_SB_W,
        ts_col="ts_event", close_col="close",
    )
    z0 = F.lit(0.0)
    return out.select(
        "sym_a",
        "sym_b",
        F.col("ts_event").alias("ts"),
        (F.round("spread", 6) + z0).alias("spread"),
        (F.round("z", 6) + z0).alias("z"),
        (F.col("position") + z0).alias("position"),
        F.col("traded").cast("int").alias("traded"),
        (F.round("pnl", 6) + z0).alias("pnl"),
    )


# --------------------------------------------------------------------------
# C-ext (round 9). Cost-aware pairs band backtest (operators/
# mean_reversion.py::spread_band_backtest_net): the band P&L net of
# transaction costs priced from the rolling Corwin-Schultz spread
# estimator over the SAME bars — one unit of leg A plus |beta| units of
# the hedge leg, each crossing half its estimated relative spread.
# Constants duplicated from the microstructure oracle (importing that
# module here would reorder the pinned registration manifest).
# --------------------------------------------------------------------------

_SBN_CS_W = 20
_SBN_DEN = 3.0 - 2.0 * (2.0**0.5)
_SBN_C1 = 2.0**0.5 - 1.0

# Full cost-aware chain (band CTEs + CS estimator + per-bar net P&L
# in `fin`) shared by spread_band_backtest_net and the per-pair
# tearsheet below.
_SBN_CTES = f"""
{_SB_CTES},
cs_terms AS (
  SELECT symbol, ts,
    pow(ln(high / low), 2) + lag(pow(ln(high / low), 2)) OVER w AS tb,
    pow(ln(greatest(high, lag(high) OVER w) / least(low, lag(low) OVER w)), 2) AS gm
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts)
),
cs_rolled AS (
  SELECT symbol, ts, gm,
    count(tb) OVER rw AS n_tb,
    avg(tb) OVER rw AS cs_beta
  FROM cs_terms
  WINDOW rw AS (PARTITION BY symbol ORDER BY ts
                ROWS BETWEEN {_SBN_CS_W - 1} PRECEDING AND CURRENT ROW)
),
cs AS (
  SELECT symbol, ts,
    round((2.0 * (exp(a) - 1.0)) / (1.0 + exp(a)), 6) AS csd
  FROM (
    SELECT symbol, ts,
      CASE WHEN n_tb = {_SBN_CS_W} AND gm IS NOT NULL THEN
        greatest((({_SBN_C1!r} * sqrt(cs_beta)) / {_SBN_DEN!r})
                 - sqrt(gm / {_SBN_DEN!r}), 0.0)
      END AS a
    FROM cs_rolled
  )
),
fin AS (
  SELECT f.sym_a, f.sym_b, f.ts, c2.beta, f.spread, f.z, f.position,
    coalesce(lag(f.position) OVER w2, 0.0) <> f.position AS traded,
    coalesce(lag(f.position) OVER w2, 0.0)
      * (f.spread - lag(f.spread) OVER w2) AS pnl,
    abs(f.position - coalesce(lag(f.position) OVER w2, 0.0))
      * (coalesce(ca.csd, 0.0) + abs(c2.beta) * coalesce(cb.csd, 0.0))
      / 2.0 AS cost
  FROM pos f
  JOIN cf2 c2 USING (sym_a, sym_b)
  LEFT JOIN cs ca ON f.sym_a = ca.symbol AND f.ts = ca.ts
  LEFT JOIN cs cb ON f.sym_b = cb.symbol AND f.ts = cb.ts
  WINDOW w2 AS (PARTITION BY f.sym_a, f.sym_b ORDER BY f.ts)
)"""


@register(
    "spread_band_backtest_net",
    f"""
WITH
{_SBN_CTES}
SELECT sym_a, sym_b, ts,
  beta + 0 AS beta,
  round(spread, 6) + 0 AS spread,
  round(z, 6) + 0 AS z,
  position + 0 AS position,
  CAST(traded AS INTEGER) AS traded,
  round(pnl, 6) + 0 AS pnl,
  round(cost, 6) + 0 AS cost,
  round(coalesce(pnl, 0.0) - cost, 6) + 0 AS net_pnl
FROM fin
""",
    f"Cost-aware pairs band backtest: hysteresis band P&L net of "
    f"Corwin-Schultz spread costs ({_SBN_CS_W}-bar estimator, half-"
    "spread per leg, hedge leg weighted by |beta|) — gross-vs-net is "
    "the composition a desk actually evaluates",
)
def q_spread_band_backtest_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.mean_reversion import (
        spread_band_backtest_net,
    )

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = spread_band_backtest_net(
        bars, entry_z=_SB_ENTRY, exit_z=_SB_EXIT, window=_SB_W,
        cs_window=_SBN_CS_W, ts_col="ts_event", close_col="close",
    )
    z0 = F.lit(0.0)
    return out.select(
        "sym_a",
        "sym_b",
        F.col("ts_event").alias("ts"),
        (F.col("beta") + z0).alias("beta"),
        (F.round("spread", 6) + z0).alias("spread"),
        (F.round("z", 6) + z0).alias("z"),
        (F.col("position") + z0).alias("position"),
        F.col("traded").cast("int").alias("traded"),
        (F.round("pnl", 6) + z0).alias("pnl"),
        (F.round("cost", 6) + z0).alias("cost"),
        (F.round("net_pnl", 6) + z0).alias("net_pnl"),
    )


# --------------------------------------------------------------------------
# C-ext (round 9). Per-pair gross-vs-net tearsheet (operators/
# mean_reversion.py::spread_band_tearsheet) — the one-row strategy
# summary over the cost-aware band backtest: ordered-fold sums feeding
# Sharpes, staged running-equity/peak/excursion drawdown.
# --------------------------------------------------------------------------


@register(
    "spread_band_tearsheet",
    f"""
WITH
{_SBN_CTES},
t1 AS (
  SELECT sym_a, sym_b, ts,
    coalesce(pnl, 0.0) AS g,
    coalesce(pnl, 0.0) - cost AS nv,
    cost AS c,
    CASE WHEN traded THEN 1 ELSE 0 END AS tr
  FROM fin
),
t2 AS (
  SELECT sym_a, sym_b, ts,
    row_number() OVER w AS rn,
    count(*) OVER pw AS cnt,
    sum(tr) OVER pw AS ntr,
    sum(g) OVER rw AS sg,
    sum(g*g) OVER rw AS sg2,
    sum(nv) OVER rw AS sn,
    sum(nv*nv) OVER rw AS sn2,
    sum(c) OVER rw AS sc
  FROM t1
  WINDOW w AS (PARTITION BY sym_a, sym_b ORDER BY ts),
         rw AS (PARTITION BY sym_a, sym_b ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         pw AS (PARTITION BY sym_a, sym_b)
),
t3 AS (
  SELECT *, max(sn) OVER (PARTITION BY sym_a, sym_b ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM t2
),
t4 AS (SELECT *, sn - peak AS dd FROM t3),
t5 AS (
  SELECT *, min(dd) OVER (PARTITION BY sym_a, sym_b) AS mdd FROM t4
)
SELECT sym_a, sym_b,
  CAST(cnt AS BIGINT) AS n_bars,
  CAST(ntr AS BIGINT) AS n_trades,
  round(sg, 6) + 0 AS gross_pnl,
  round(sc, 6) + 0 AS total_cost,
  round(sn, 6) + 0 AS net_pnl,
  CASE WHEN cnt >= 2 AND sqrt(greatest((sg2 - sg*sg/cnt) / (cnt - 1), 0.0)) > 0
       THEN round((sg/cnt) / sqrt(greatest((sg2 - sg*sg/cnt) / (cnt - 1), 0.0)), 6) + 0
  END AS gross_sharpe,
  CASE WHEN cnt >= 2 AND sqrt(greatest((sn2 - sn*sn/cnt) / (cnt - 1), 0.0)) > 0
       THEN round((sn/cnt) / sqrt(greatest((sn2 - sn*sn/cnt) / (cnt - 1), 0.0)), 6) + 0
  END AS net_sharpe,
  round(mdd, 6) + 0 AS max_drawdown
FROM t5 WHERE rn = cnt
""",
    "Per-pair gross-vs-net tearsheet of the cost-aware band backtest: "
    "trade counts, P&L/cost totals, per-bar Sharpes and the net equity "
    "curve's max drawdown — did costs eat the edge, one row per pair",
)
def q_spread_band_tearsheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.mean_reversion import (
        spread_band_tearsheet,
    )

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = spread_band_tearsheet(
        bars, entry_z=_SB_ENTRY, exit_z=_SB_EXIT, window=_SB_W,
        cs_window=_SBN_CS_W, ts_col="ts_event", close_col="close",
    )
    z0 = F.lit(0.0)
    return out.select(
        "sym_a",
        "sym_b",
        "n_bars",
        "n_trades",
        (F.round("gross_pnl", 6) + z0).alias("gross_pnl"),
        (F.round("total_cost", 6) + z0).alias("total_cost"),
        (F.round("net_pnl", 6) + z0).alias("net_pnl"),
        (F.round("gross_sharpe", 6) + z0).alias("gross_sharpe"),
        (F.round("net_sharpe", 6) + z0).alias("net_sharpe"),
        (F.round("max_drawdown", 6) + z0).alias("max_drawdown"),
    )
