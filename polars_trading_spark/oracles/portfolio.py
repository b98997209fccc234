"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
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
)
from polars_trading_spark.oracles.timeseries import (  # noqa: F401
    _MOM_LOOKBACK,
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = drawdown_path(bars, ts_col="ts_event")
    return out.select(
        "symbol",
        "ts_event",
        F.round("cum_return", 6).alias("cum_return"),
        F.round("drawdown", 6).alias("drawdown"),
        "underwater",
    )



# --------------------------------------------------------------------------
# C-ext. Ledoit-Wolf shrunk covariance (operators/covariance.py) — the
# sklearn-form identity-target shrinkage, computed pairwise.
# --------------------------------------------------------------------------


# Reusable Ledoit-Wolf pair-covariance CTE tail (from a `bars` CTE to
# lw = the shrunk pair table) — shared by the ledoit_wolf /
# risk_contributions oracles (15m bars) and the hrp_weights oracle
# (6h bars, matching its Spark side's coarser alignment-friendly tape).
_LW_TAIL = """
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
),
lw AS (
  SELECT sym_a, sym_b, n, sij, shrinkage, mu,
    CASE WHEN shrinkage IS NOT NULL
         THEN shrinkage * (CASE WHEN sym_a = sym_b THEN mu ELSE 0.0 END)
              + (1 - shrinkage) * sij
         ELSE sij END AS cov
  FROM pp2 CROSS JOIN sc2
)"""

_LW_CTES = f"""
{_FEATURE_BARS_CTE},
{_LW_TAIL}"""

# 6h-bar twin for the HRP oracle (21_600_000_000 µs buckets).
_HRP_BUCKET_US = 6 * 3600 * 1_000_000

_LW_CTES_6H = f"""
trades AS ({TRADES_CTE}),
bucketed AS (
  SELECT *, make_timestamp((epoch_us(ts_event) // {_HRP_BUCKET_US}) * {_HRP_BUCKET_US}) AS bucket
  FROM trades
),
bars AS (
  SELECT bucket AS ts, symbol,
    last(price ORDER BY ts_event, seq) AS close
  FROM bucketed
  GROUP BY bucket, symbol
),
{_LW_TAIL}"""


@register(
    "ledoit_wolf",
    f"""
WITH
{_LW_CTES}
SELECT sym_a, sym_b, n AS n_obs,
  round(sij * 1e6, 6) AS cov_sample_ppm,
  round(cov * 1e6, 6) AS cov_shrunk_ppm,
  round(shrinkage, 6) AS shrinkage,
  round(mu * 1e6, 6) AS mu_ppm
FROM lw
""",
    "Ledoit-Wolf identity-target shrunk covariance of 15m bar returns, "
    "pairwise (complete-case aligned, demeaned; sklearn formulas)",
)
def q_ledoit_wolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.covariance import ledoit_wolf_cov

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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

# Shared CTE chain (bars -> momentum ranks -> book membership -> bucket
# P&L -> turnover) reused by rank_portfolio and its cost-aware net
# variant below.
_RP_CTES = f"""
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
  SELECT ts, lag(ts) OVER (ORDER BY ts) AS prev_ts,
         lead(ts) OVER (ORDER BY ts) AS next_ts
  FROM (SELECT DISTINCT ts FROM mem)
),
kept AS (
  SELECT a.ts, count(*) AS nm, count(b.symbol) AS nkept, max(a.prev_ts) AS pts
  FROM (SELECT mem.*, pm.prev_ts FROM mem JOIN pm USING (ts)) a
  LEFT JOIN mem b
    ON b.ts = a.prev_ts AND b.symbol = a.symbol AND b.side = a.side
  GROUP BY a.ts
)"""


@register(
    "rank_portfolio",
    f"""
WITH
{_RP_CTES}
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = rank_ic(bars, momentum_lag=_IC_LAG, ts_col="ts_event", close_col="close")
    z0 = F.lit(0.0)
    return out.select(
        "ts",
        "n_sym",
        (F.round("ic", 6) + z0).alias("ic"),
    )


# --------------------------------------------------------------------------
# C-ext (round 8). Portfolio capacity/turnover diagnostics
# (operators/cross_section.py::portfolio_capacity) — membership churn +
# the participation-capped book size; ADV is a prefix-sum difference so
# the float fold is order-deterministic on both engines.
# --------------------------------------------------------------------------

_PC_LB, _PC_TOP, _PC_ADVW, _PC_PART = 5, 1, 20, 0.05


@register(
    "portfolio_capacity",
    f"""
WITH
{_FEATURE_BARS_CTE},
staged AS (
  SELECT symbol, ts,
    ln(close / lag(close, {_PC_LB}) OVER w) AS mom,
    sum(close * volume) OVER wr AS cdv,
    count(*) OVER wr AS rn
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY ts),
         wr AS (PARTITION BY symbol ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
r0 AS (
  -- the lag must see the UNFILTERED per-symbol tape (SQL evaluates
  -- WHERE before window functions; the engine computes adv pre-filter)
  SELECT symbol, ts, mom,
    CASE WHEN rn >= {_PC_ADVW}
         THEN (cdv - coalesce(lag(cdv, {_PC_ADVW}) OVER (PARTITION BY symbol ORDER BY ts), 0.0))
              / {_PC_ADVW} END AS adv
  FROM staged
),
r AS (SELECT * FROM r0 WHERE mom IS NOT NULL),
m AS (
  SELECT symbol, ts, adv,
    row_number() OVER (PARTITION BY ts ORDER BY mom DESC, symbol) AS ru,
    row_number() OVER (PARTITION BY ts ORDER BY mom ASC, symbol) AS rd,
    count(*) OVER (PARTITION BY ts) AS nb
  FROM r
),
mem AS (
  SELECT symbol, ts, adv,
    CASE WHEN ru <= {_PC_TOP} THEN 1.0 WHEN rd <= {_PC_TOP} THEN -1.0 END AS side
  FROM m WHERE nb >= {2 * _PC_TOP} AND (ru <= {_PC_TOP} OR rd <= {_PC_TOP})
),
pm AS (
  SELECT ts, lag(ts) OVER (ORDER BY ts) AS prev_ts
  FROM (SELECT DISTINCT ts FROM mem)
),
g AS (
  SELECT a.ts, count(*) AS nm, count(b.symbol) AS nkept, max(a.prev_ts) AS pts,
    min(a.adv) AS minadv,
    count(CASE WHEN a.adv IS NULL THEN 1 END) AS nulladv
  FROM (SELECT mem.*, pm.prev_ts FROM mem JOIN pm USING (ts)) a
  LEFT JOIN mem b
    ON b.ts = a.prev_ts AND b.symbol = a.symbol AND b.side = a.side
  GROUP BY a.ts
)
SELECT ts,
  CAST(nm AS INTEGER) AS n_members,
  CAST(CASE WHEN pts IS NOT NULL THEN nm - nkept END AS INTEGER) AS n_changed,
  round(CASE WHEN pts IS NOT NULL THEN (nm - nkept) / CAST(nm AS DOUBLE) END, 6) + 0
    AS turnover,
  round(CASE WHEN nulladv = 0 THEN minadv END, 6) + 0 AS min_member_adv,
  round({_PC_PART!r} * (CASE WHEN nulladv = 0 THEN minadv END) * nm, 6) + 0
    AS capacity_dollars
FROM g
""",
    f"Portfolio capacity/turnover: momentum book membership churn and "
    f"the participation-capped ({_PC_PART:.0%} of trailing {_PC_ADVW}-bar "
    "ADV) book size at which the worst member saturates",
)
def q_portfolio_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import portfolio_capacity

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = portfolio_capacity(
        bars,
        lookback=_PC_LB,
        top_n=_PC_TOP,
        adv_window=_PC_ADVW,
        max_participation=_PC_PART,
        ts_col="ts_event",
        close_col="close",
        volume_col="volume",
    )
    z0 = F.lit(0.0)
    return out.select(
        F.col("ts_event").alias("ts"),
        "n_members",
        "n_changed",
        (F.round("turnover", 6) + z0).alias("turnover"),
        (F.round("min_member_adv", 6) + z0).alias("min_member_adv"),
        (F.round("capacity_dollars", 6) + z0).alias("capacity_dollars"),
    )


# --------------------------------------------------------------------------
# C-ext (round 8). Hierarchical Risk Parity (operators/hrp.py) — AFML
# ch.16 allocation over the distributed Ledoit-Wolf pair covariance.
# Round 10: the iterative single-linkage + recursive-bisection driver
# loop is replayed by TWO recursive CTEs over list state (the
# sequential_bootstrap pattern): `ser` carries the active cluster list
# (kept id-sorted: survivors keep order, the merged cluster takes the
# largest id and appends — so pair enumeration by position IS (a < b)
# id order) and merges the argmin-(dist, a, b) pair per iteration with
# single-linkage distances recomputed from the leaf-level matrix;
# `bis` splits every >=2-wide segment per iteration and multiplies the
# per-position weights by the inverse-cluster-variance split factor.
# The closed-form golden anchors in tests/test_hrp.py (2-asset ==
# inverse variance, orthogonal equal-norm == equal weight, analytic
# cluster allocation) remain the algorithmic anchor.
# --------------------------------------------------------------------------


@register(
    "hrp_weights",
    f"""
WITH RECURSIVE
{_LW_CTES_6H},
csym AS (
  SELECT sym_a AS sa, sym_b AS sb, cov FROM lw
  UNION ALL
  SELECT sym_b AS sa, sym_a AS sb, cov FROM lw WHERE sym_a <> sym_b
),
crow AS (SELECT sa, list(cov ORDER BY sb) AS row FROM csym GROUP BY sa),
cmat AS (
  SELECT list(row ORDER BY sa) AS C, list(sa ORDER BY sa) AS syms FROM crow
),
dmat AS (
  SELECT C, syms, len(syms) AS n,
    list_transform(range(len(syms)), i -> list_transform(range(len(syms)), j ->
      sqrt(greatest(0.0, (1.0 - least(greatest(
        C[i + 1][j + 1] / (sqrt(C[i + 1][i + 1]) * sqrt(C[j + 1][j + 1])),
        -1.0), 1.0)) / 2.0)))) AS D
  FROM cmat
),
ser AS (
  SELECT 0 AS it,
         list_transform(range(n), i -> {{'id': i, 'lv': [i]}}) AS cl
  FROM dmat
  UNION ALL
  SELECT it,
    list_filter(cl, c -> c.id <> pick.a AND c.id <> pick.b)
      || [{{'id': nid,
            'lv': list_filter(cl, c -> c.id = pick.a)[1].lv
                  || list_filter(cl, c -> c.id = pick.b)[1].lv}}]
  FROM (
    SELECT it, cl, nid,
      list_filter(f2, c -> c.b = list_min(list_transform(f2, x -> x.b)))[1] AS pick
    FROM (
      SELECT it, cl, nid,
        list_filter(f1, c -> c.a = list_min(list_transform(f1, x -> x.a))) AS f2
      FROM (
        SELECT it, cl, nid,
          list_filter(cands, c -> c.d = list_min(list_transform(cands, x -> x.d))) AS f1
        FROM (
          SELECT s.it + 1 AS it, s.cl, 2 * d.n - len(s.cl) AS nid,
            flatten(list_transform(range(len(s.cl)), ai ->
              list_transform(range(len(s.cl) - ai - 1), bo ->
                {{'d': list_min(flatten(list_transform(s.cl[ai + 1].lv, x ->
                        list_transform(s.cl[ai + 2 + bo].lv, y -> d.D[x + 1][y + 1])))),
                  'a': s.cl[ai + 1].id, 'b': s.cl[ai + 2 + bo].id}}))) AS cands
          FROM ser s, dmat d
          WHERE len(s.cl) > 1
        )
      )
    )
  )
),
ord0 AS (SELECT cl[1].lv AS ordv FROM ser WHERE len(cl) = 1),
bis AS (
  SELECT 0 AS it, [{{'s': CAST(1 AS BIGINT), 'e': n}}] AS segs,
         -- CAST: a bare 1.0 is DECIMAL(2,1); the recursion's UNION would
         -- unify wpos to DECIMAL and quantize every weight to 0.1 steps
         list_transform(range(n), i -> CAST(1.0 AS DOUBLE)) AS wpos
  FROM dmat
  UNION ALL
  SELECT it, newsegs, newwpos FROM (
    SELECT it,
      flatten(list_transform(facts, g ->
        [{{'s': g.s, 'e': g.s + g.h - 1}}, {{'s': g.s + g.h, 'e': g.e}}])) AS newsegs,
      list_transform(range(len(wpos)), p -> wpos[p + 1] * coalesce(
        list_transform(
          list_filter(facts, g -> g.s <= p + 1 AND p + 1 <= g.e),
          g -> CASE WHEN p + 1 < g.s + g.h THEN g.alpha ELSE 1.0 - g.alpha END)[1],
        1.0)) AS newwpos
    FROM (
      SELECT it, wpos,
        list_transform(fs2, g ->
          {{'s': g.s, 'e': g.e, 'h': g.h,
            'alpha': 1.0 - g.vl / (g.vl + g.vr)}}) AS facts
      FROM (
        SELECT it, wpos, C,
          list_transform(fs1, g ->
            {{'s': g.s, 'e': g.e, 'h': g.h,
              'vl': list_sum(list_transform(g.li, i -> list_sum(list_transform(g.li, j ->
                (1.0 / C[i + 1][i + 1] / g.sl) * C[i + 1][j + 1] * (1.0 / C[j + 1][j + 1] / g.sl))))),
              'vr': list_sum(list_transform(g.ri, i -> list_sum(list_transform(g.ri, j ->
                (1.0 / C[i + 1][i + 1] / g.sr) * C[i + 1][j + 1] * (1.0 / C[j + 1][j + 1] / g.sr)))))}}) AS fs2
        FROM (
          SELECT it, wpos, C,
            list_transform(fs0, g ->
              {{'s': g.s, 'e': g.e, 'h': g.h, 'li': g.li, 'ri': g.ri,
                'sl': list_sum(list_transform(g.li, k -> 1.0 / C[k + 1][k + 1])),
                'sr': list_sum(list_transform(g.ri, k -> 1.0 / C[k + 1][k + 1]))}}) AS fs1
          FROM (
            SELECT b.it + 1 AS it, b.wpos, d.C,
              list_transform(
                list_transform(list_filter(b.segs, g -> g.e > g.s),
                  g -> {{'s': g.s, 'e': g.e, 'h': (g.e - g.s + 1) // 2}}),
                g -> {{'s': g.s, 'e': g.e, 'h': g.h,
                       'li': o.ordv[g.s : g.s + g.h - 1],
                       'ri': o.ordv[g.s + g.h : g.e]}}) AS fs0
            FROM bis b, dmat d, ord0 o
            WHERE len(list_filter(b.segs, g -> g.e > g.s)) > 0
          )
        )
      )
    )
  )
),
finw AS (SELECT wpos FROM bis ORDER BY it DESC LIMIT 1)
SELECT
  d.syms[t.i + 1] AS symbol,
  round(f.wpos[list_position(o.ordv, t.i)] / list_sum(f.wpos), 9) + 0 AS weight,
  CAST(list_position(o.ordv, t.i) - 1 AS INTEGER) AS seriation_rank,
  round(d.C[t.i + 1][t.i + 1], 9) + 0 AS variance
FROM dmat d, ord0 o, finw f, unnest(range(d.n)) AS t(i)
""",
    "Hierarchical Risk Parity allocation (single-linkage seriation + "
    "recursive inverse-variance bisection) over the pairwise Ledoit-Wolf "
    "covariance; distributed covariance, bounded universe-sized driver "
    "clustering (IVF-training pattern)",
)
def q_hrp_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.hrp import hrp_weights

    # 6h bars: the covariance step's complete-case alignment needs every
    # symbol present in a bucket — at sf0.001 the 15m tape is too sparse
    # to align anything, and HRP's inputs are naturally coarse anyway
    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size="6h")
    out = hrp_weights(bars, ts_col="ts_event", close_col="close")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        (F.round("weight", 9) + z0).alias("weight"),
        "seriation_rank",
        (F.round("variance", 9) + z0).alias("variance"),
    )


# --------------------------------------------------------------------------
# C-ext (round 8). Inverse-variance risk decomposition
# (operators/covariance.py::risk_contributions) — the SQL-gated
# companion of the rows-only hrp_weights: weights, marginal/total risk
# contributions and portfolio variance from the shrunk pair table, with
# every fanning float reduce an ordered symbol fold on both engines.
# --------------------------------------------------------------------------


@register(
    "risk_contributions",
    f"""
WITH
{_LW_CTES},
sympairs AS (
  SELECT sym_a, sym_b, cov FROM lw
  UNION ALL
  SELECT sym_b AS sym_a, sym_a AS sym_b, cov FROM lw WHERE sym_a <> sym_b
),
diag AS (SELECT sym_a AS sym, cov AS var FROM lw WHERE sym_a = sym_b),
wts0 AS (
  SELECT sym, var,
    sum(1.0 / var) OVER (ORDER BY sym
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS irun
  FROM diag
),
wts AS (
  SELECT sym, var,
    (1.0 / var) / last_value(irun) OVER (ORDER BY sym
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS w
  FROM wts0
),
jj AS (
  SELECT p.sym_a, p.sym_b, p.cov * w.w AS term
  FROM sympairs p JOIN wts w ON p.sym_b = w.sym
),
m0 AS (
  SELECT sym_a, sym_b,
    sum(term) OVER (PARTITION BY sym_a ORDER BY sym_b
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS drun
  FROM jj
),
m1 AS (
  SELECT sym_a,
    last_value(drun) OVER (PARTITION BY sym_a ORDER BY sym_b
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS mrc,
    row_number() OVER (PARTITION BY sym_a ORDER BY sym_b) AS rn
  FROM m0
),
mrc AS (SELECT sym_a AS sym, mrc FROM m1 WHERE rn = 1),
o0 AS (SELECT w.sym, w.var, w.w, m.mrc FROM wts w JOIN mrc m USING (sym)),
o1 AS (
  SELECT *,
    sum(w * mrc) OVER (ORDER BY sym
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pvrun
  FROM o0
),
o2 AS (
  SELECT *,
    last_value(pvrun) OVER (ORDER BY sym
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS pv
  FROM o1
)
SELECT sym AS symbol,
  round(w, 6) + 0 AS weight,
  round(var * 1e6, 6) + 0 AS variance_ppm,
  round(mrc * 1e6, 6) + 0 AS mrc_ppm,
  round(w * mrc * 1e6, 6) + 0 AS rc_ppm,
  round(w * mrc / pv, 6) + 0 AS rc_share,
  round(pv * 1e6, 6) + 0 AS portfolio_variance_ppm
FROM o2
""",
    "Inverse-variance risk decomposition over the shrunk pair "
    "covariance: weights, marginal/total risk contributions, portfolio "
    "variance — ordered symbol folds, no matrix, no Python",
)
def q_risk_contributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.covariance import risk_contributions

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = risk_contributions(bars, ts_col="ts_event", close_col="close")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        (F.round("weight", 6) + z0).alias("weight"),
        (F.round(F.col("variance") * 1e6, 6) + z0).alias("variance_ppm"),
        (F.round(F.col("mrc") * 1e6, 6) + z0).alias("mrc_ppm"),
        (F.round(F.col("rc") * 1e6, 6) + z0).alias("rc_ppm"),
        (F.round("rc_share", 6) + z0).alias("rc_share"),
        (F.round(F.col("portfolio_variance") * 1e6, 6) + z0).alias(
            "portfolio_variance_ppm"
        ),
    )


# --------------------------------------------------------------------------
# C-ext (round 9). Cost-aware momentum backtest (operators/
# cross_section.py::rank_portfolio_backtest_net): the rank portfolio's
# P&L net of rebalancing costs — every membership entry/exit trades one
# 1/top_n book slot at half the symbol's rolling Corwin-Schultz spread.
# Per-trade half-spreads quantize to 1e-6 integers and sum in INTEGER
# space (unordered float sums are fold-order-sensitive across engines).
# CS constants duplicated (importing the microstructure oracle here
# would reorder the pinned registration manifest).
# --------------------------------------------------------------------------

_RPN_CS_W = 20
_RPN_DEN = 3.0 - 2.0 * (2.0**0.5)
_RPN_C1 = 2.0**0.5 - 1.0


# Full cost chain (rank CTEs + CS micro-spreads + entry/exit trade
# sets + per-bucket cost) shared by rank_portfolio_net and the book
# tearsheet below.
_RPN_CTES = f"""
{_RP_CTES},
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
                ROWS BETWEEN {_RPN_CS_W - 1} PRECEDING AND CURRENT ROW)
),
cs AS (
  SELECT symbol, ts,
    CAST(round(((2.0 * (exp(a) - 1.0)) / (1.0 + exp(a))) * 1000000.0, 0) AS BIGINT)
      AS micro
  FROM (
    SELECT symbol, ts,
      CASE WHEN n_tb = {_RPN_CS_W} AND gm IS NOT NULL THEN
        greatest((({_RPN_C1!r} * sqrt(cs_beta)) / {_RPN_DEN!r})
                 - sqrt(gm / {_RPN_DEN!r}), 0.0)
      END AS a
    FROM cs_rolled
  )
),
entries AS (
  SELECT a.ts AS trade_ts, a.symbol
  FROM (SELECT mem.*, pm.prev_ts FROM mem JOIN pm USING (ts)) a
  LEFT JOIN mem b
    ON b.ts = a.prev_ts AND b.symbol = a.symbol AND b.side = a.side
  WHERE b.symbol IS NULL
),
exits AS (
  SELECT a.next_ts AS trade_ts, a.symbol
  FROM (SELECT mem.*, pm.next_ts FROM mem JOIN pm USING (ts)) a
  LEFT JOIN mem c
    ON c.ts = a.next_ts AND c.symbol = a.symbol AND c.side = a.side
  WHERE a.next_ts IS NOT NULL AND c.symbol IS NULL
),
alltrades AS (SELECT * FROM entries UNION ALL SELECT * FROM exits),
costs AS (
  SELECT t.trade_ts AS ts,
    CAST(sum(coalesce(cs.micro, 0)) AS BIGINT) AS micro_sum
  FROM alltrades t
  LEFT JOIN cs ON cs.symbol = t.symbol AND cs.ts = t.trade_ts
  GROUP BY t.trade_ts
)"""


@register(
    "rank_portfolio_net",
    f"""
WITH
{_RPN_CTES}
SELECT p.ts, p.n_long, p.n_short, round(p.pnl, 6) + 0 AS pnl,
  round(CASE WHEN k.pts IS NOT NULL THEN 1.0 - k.nkept / CAST(k.nm AS DOUBLE) END, 6) + 0
    AS turnover,
  round(coalesce(c.micro_sum, 0) / 1000000.0 / {2.0 * _RP_TOP!r}, 7) + 0 AS cost,
  round(coalesce(p.pnl, 0.0)
        - coalesce(c.micro_sum, 0) / 1000000.0 / {2.0 * _RP_TOP!r}, 6) + 0 AS net_pnl
FROM pnl p JOIN kept k USING (ts) LEFT JOIN costs c USING (ts)
""",
    f"Cost-aware momentum portfolio: top/bottom-{_RP_TOP} book P&L net "
    f"of Corwin-Schultz rebalancing costs (half-spread per 1/{_RP_TOP} "
    "slot traded, integer micro-spread folding) — turnover priced in "
    "return units, gross-vs-net per bucket",
)
def q_rank_portfolio_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import (
        rank_portfolio_backtest_net,
    )

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = rank_portfolio_backtest_net(
        bars, lookback=_RP_LB, top_n=_RP_TOP, cs_window=_RPN_CS_W,
        ts_col="ts_event", close_col="close",
    )
    z0 = F.lit(0.0)
    return out.select(
        F.col("ts_event").alias("ts"),
        "n_long",
        "n_short",
        (F.round("pnl", 6) + z0).alias("pnl"),
        (F.round("turnover", 6) + z0).alias("turnover"),
        # 7 digits, NOT 6: cost = micro_sum / 2e6 has <= 7 exact decimal
        # digits (odd micro sums land exactly on a 6th-digit half, where
        # Spark's BigDecimal HALF_UP and DuckDB's multiply-rint disagree
        # on which side of the unrepresentable .5 the double sits);
        # rounding at 7 is an identity on the exact decimal instead.
        (F.round("cost", 7) + z0).alias("cost"),
        (F.round("net_pnl", 6) + z0).alias("net_pnl"),
    )


# --------------------------------------------------------------------------
# C-ext (round 9). One-row book tearsheet (operators/cross_section.py::
# rank_portfolio_tearsheet) — the strategy-level gross-vs-net summary
# over the cost-aware momentum backtest: ordered folds into Sharpes,
# staged running-equity/peak/excursion drawdown, bucket-count-sized
# global windows only.
# --------------------------------------------------------------------------


@register(
    "rank_portfolio_tearsheet",
    f"""
WITH
{_RPN_CTES},
perb AS (
  SELECT p.ts,
    coalesce(p.pnl, 0.0) AS g,
    coalesce(p.pnl, 0.0)
      - coalesce(c.micro_sum, 0) / 1000000.0 / {2.0 * _RP_TOP!r} AS nv,
    coalesce(c.micro_sum, 0) / 1000000.0 / {2.0 * _RP_TOP!r} AS cc,
    CASE WHEN k.pts IS NOT NULL
         THEN 1.0 - k.nkept / CAST(k.nm AS DOUBLE) END AS turn
  FROM pnl p JOIN kept k USING (ts) LEFT JOIN costs c USING (ts)
),
t2 AS (
  SELECT ts,
    row_number() OVER w AS rn,
    count(*) OVER () AS cnt,
    sum(CASE WHEN turn IS NOT NULL THEN 1 ELSE 0 END) OVER () AS nto,
    sum(g) OVER rw AS sg,
    sum(g*g) OVER rw AS sg2,
    sum(nv) OVER rw AS sn,
    sum(nv*nv) OVER rw AS sn2,
    sum(cc) OVER rw AS sc,
    sum(coalesce(turn, 0.0)) OVER rw AS sto
  FROM perb
  WINDOW w AS (ORDER BY ts),
         rw AS (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
t3 AS (
  SELECT *, max(sn) OVER (ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM t2
),
t4 AS (SELECT *, sn - peak AS dd FROM t3),
t5 AS (SELECT *, min(dd) OVER () AS mdd FROM t4)
SELECT
  CAST(cnt AS BIGINT) AS n_buckets,
  round(sg, 6) + 0 AS gross_pnl,
  round(sc, 6) + 0 AS total_cost,
  round(sn, 6) + 0 AS net_pnl,
  CASE WHEN cnt >= 2 AND sqrt(greatest((sg2 - sg*sg/cnt) / (cnt - 1), 0.0)) > 0
       THEN round((sg/cnt) / sqrt(greatest((sg2 - sg*sg/cnt) / (cnt - 1), 0.0)), 6) + 0
  END AS gross_sharpe,
  CASE WHEN cnt >= 2 AND sqrt(greatest((sn2 - sn*sn/cnt) / (cnt - 1), 0.0)) > 0
       THEN round((sn/cnt) / sqrt(greatest((sn2 - sn*sn/cnt) / (cnt - 1), 0.0)), 6) + 0
  END AS net_sharpe,
  CASE WHEN nto > 0 THEN round(sto / CAST(nto AS DOUBLE), 6) + 0 END
    AS avg_turnover,
  round(mdd, 6) + 0 AS max_drawdown
FROM t5 WHERE rn = cnt
""",
    "One-row gross-vs-net tearsheet of the cost-aware momentum book: "
    "bucket counts, P&L/cost totals, per-bucket Sharpes, average "
    "turnover, net-equity max drawdown — the strategy summary over "
    "rank_portfolio_net",
)
def q_rank_portfolio_tearsheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import (
        rank_portfolio_tearsheet,
    )

    with _trades_config():
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = rank_portfolio_tearsheet(
        bars, lookback=_RP_LB, top_n=_RP_TOP, cs_window=_RPN_CS_W,
        ts_col="ts_event", close_col="close",
    )
    z0 = F.lit(0.0)
    return out.select(
        "n_buckets",
        (F.round("gross_pnl", 6) + z0).alias("gross_pnl"),
        (F.round("total_cost", 6) + z0).alias("total_cost"),
        (F.round("net_pnl", 6) + z0).alias("net_pnl"),
        (F.round("gross_sharpe", 6) + z0).alias("gross_sharpe"),
        (F.round("net_sharpe", 6) + z0).alias("net_sharpe"),
        (F.round("avg_turnover", 6) + z0).alias("avg_turnover"),
        (F.round("max_drawdown", 6) + z0).alias("max_drawdown"),
    )


# --------------------------------------------------------------------------
# C-ext (round 10). Probability of backtest overfitting via CSCV
# (operators/pbo.py::pbo_cscv — Bailey/Borwein/Lopez de Prado/Zhu 2017):
# the (symbol x lookback) momentum sweep judged by every balanced
# in/out-of-sample block combination.  Every cross-block float sum is a
# FIXED-ORDER list fold (list_reduce over the block index), mask-level
# means fold in mask order, and the below-median test is the INTEGER
# comparison 2r < nr + 1 — no float 0.5 knife edge.
# --------------------------------------------------------------------------

_PBO_S = 8

_PBO_BIT = "CAST(floor(m / pow(2.0, bb)) AS BIGINT) % 2"


def _pbo_sharpe_sql(n: str, s1: str, s2: str) -> str:
    nd = f"CAST({n} AS DOUBLE)"
    var = f"(({s2}) - ({s1}) * ({s1}) / {nd}) / ({nd} - 1)"
    return (
        f"CASE WHEN ({n}) >= 2 AND {var} > 0 "
        f"THEN (({s1}) / {nd}) / sqrt({var}) END"
    )


@register(
    "pbo_cscv",
    f"""
WITH {_FEATURE_BARS_CTE},
pblk AS (
  SELECT ts, CAST(floor((ti * {_PBO_S}) / CAST(nt AS DOUBLE)) AS BIGINT) AS block
  FROM (SELECT ts, row_number() OVER (ORDER BY ts) - 1 AS ti,
               count(*) OVER () AS nt
        FROM (SELECT DISTINCT ts FROM bars))
),
pex AS (
  SELECT symbol AS sym, lb, ts, close AS c,
    lag(close, 1) OVER w AS p1,
    CASE WHEN lb = 8 THEN lag(close, 9) OVER w
         WHEN lb = 5 THEN lag(close, 6) OVER w
         WHEN lb = 3 THEN lag(close, 4) OVER w
         WHEN lb = 2 THEN lag(close, 3) OVER w
         ELSE lag(close, 2) OVER w END AS pl
  FROM bars CROSS JOIN (SELECT unnest([1, 2, 3, 5, 8]) AS lb) l
  WINDOW w AS (PARTITION BY symbol, lb ORDER BY ts)
),
pret AS (
  SELECT sym, lb, ts,
    (CASE WHEN p1 > pl THEN 1.0 WHEN p1 < pl THEN -1.0 ELSE 0.0 END)
      * (c / p1 - 1) AS ret
  FROM pex WHERE p1 IS NOT NULL AND pl IS NOT NULL
),
pg AS (
  SELECT sym, lb, block, n, s1, s2 FROM (
    SELECT p.sym, p.lb, b.block,
      row_number() OVER wo AS rn,
      count(*) OVER (PARTITION BY p.sym, p.lb, b.block) AS n,
      sum(p.ret) OVER wr AS s1,
      sum(p.ret * p.ret) OVER wr AS s2
    FROM pret p JOIN pblk b USING (ts)
    WINDOW wo AS (PARTITION BY p.sym, p.lb, b.block ORDER BY p.ts),
           wr AS (PARTITION BY p.sym, p.lb, b.block ORDER BY p.ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  ) WHERE rn = n
),
pstrat AS (
  SELECT s.sym || '_' || CAST(s.lb AS VARCHAR) AS sid,
    list(coalesce(g.n, 0) ORDER BY r.b) AS l_n,
    list(coalesce(g.s1, CAST(0.0 AS DOUBLE)) ORDER BY r.b) AS l_s1,
    list(coalesce(g.s2, CAST(0.0 AS DOUBLE)) ORDER BY r.b) AS l_s2
  FROM (SELECT DISTINCT sym, lb FROM pg) s
  CROSS JOIN range({_PBO_S}) r(b)
  LEFT JOIN pg g ON g.sym = s.sym AND g.lb = s.lb AND g.block = r.b
  GROUP BY s.sym, s.lb
),
pmask AS (
  SELECT m FROM range({2 ** _PBO_S}) t(m)
  WHERE list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(range({_PBO_S}), bb -> {_PBO_BIT})),
          (a, x) -> a + x) = {_PBO_S // 2}
),
pcj AS (
  SELECT m, sid,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range({_PBO_S}), bb ->
        CASE WHEN {_PBO_BIT} = 1 THEN l_n[bb + 1]
             ELSE CAST(0 AS BIGINT) END)),
      (a, x) -> a + x) AS in_n,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(range({_PBO_S}), bb ->
        CASE WHEN {_PBO_BIT} = 1 THEN l_s1[bb + 1]
             ELSE CAST(0.0 AS DOUBLE) END)),
      (a, x) -> a + x) AS in_s1,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(range({_PBO_S}), bb ->
        CASE WHEN {_PBO_BIT} = 1 THEN l_s2[bb + 1]
             ELSE CAST(0.0 AS DOUBLE) END)),
      (a, x) -> a + x) AS in_s2,
    list_reduce(list_prepend(CAST(0 AS BIGINT), l_n), (a, x) -> a + x) AS tot_n,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), l_s1), (a, x) -> a + x) AS tot_s1,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), l_s2), (a, x) -> a + x) AS tot_s2
  FROM pmask, pstrat
),
psh AS (
  SELECT m, sid,
    {_pbo_sharpe_sql("in_n", "in_s1", "in_s2")} AS sh_is,
    {_pbo_sharpe_sql("tot_n - in_n", "tot_s1 - in_s1", "tot_s2 - in_s2")} AS sh_oos
  FROM pcj
),
psel AS (
  SELECT m, sh_is AS sel_is, sh_oos AS sel_oos FROM (
    SELECT m, sh_is, sh_oos,
      row_number() OVER (PARTITION BY m ORDER BY sh_is DESC, sid DESC) AS rk
    FROM psh WHERE sh_is IS NOT NULL AND sh_oos IS NOT NULL)
  WHERE rk = 1
),
ppm AS (
  SELECT c.m, any_value(s.sel_is) AS sel_is, any_value(s.sel_oos) AS sel_oos,
    sum(CASE WHEN c.sh_oos <= s.sel_oos THEN 1 ELSE 0 END) AS r,
    sum(CASE WHEN c.sh_oos IS NOT NULL THEN 1 ELSE 0 END) AS nr
  FROM psh c JOIN psel s USING (m)
  GROUP BY c.m
),
pfin AS (
  SELECT row_number() OVER (ORDER BY m) AS rn,
    count(*) OVER () AS ncb,
    sum(CASE WHEN 2 * r < nr + 1 THEN 1 ELSE 0 END) OVER () AS nb,
    sum(ln((r / CAST(nr + 1 AS DOUBLE)) / (1 - r / CAST(nr + 1 AS DOUBLE))))
      OVER wr AS sl,
    sum(sel_is) OVER wr AS si,
    sum(sel_oos) OVER wr AS so
  FROM ppm WHERE nr >= 1
  WINDOW wr AS (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT
  CAST((SELECT count(*) FROM pstrat) AS INTEGER) AS n_strategies,
  CAST({_PBO_S} AS INTEGER) AS n_blocks,
  CAST(ncb AS INTEGER) AS n_combos,
  round(nb / CAST(ncb AS DOUBLE), 6) + 0 AS pbo,
  round(sl / ncb, 6) + 0 AS mean_logit,
  round(si / ncb, 6) + 0 AS mean_sel_is_sharpe,
  round(so / ncb, 6) + 0 AS mean_sel_oos_sharpe
FROM pfin WHERE rn = ncb
""",
    f"CSCV probability of backtest overfitting over the (symbol x "
    f"lookback) momentum sweep: {_PBO_S} time blocks, every balanced "
    "split scored, in-sample winner ranked out-of-sample — fixed-order "
    "block folds, integer below-median test, mask-ordered means",
)
def q_pbo_cscv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.pbo import pbo_cscv

    with _trades_config():
        bars = bars_ops.time_bars(
            trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE
        )
    out = pbo_cscv(bars, n_blocks=_PBO_S)
    z0 = F.lit(0.0)
    return out.select(
        "n_strategies",
        "n_blocks",
        "n_combos",
        (F.round("pbo", 6) + z0).alias("pbo"),
        (F.round("mean_logit", 6) + z0).alias("mean_logit"),
        (F.round("mean_sel_is_sharpe", 6) + z0).alias("mean_sel_is_sharpe"),
        (F.round("mean_sel_oos_sharpe", 6) + z0).alias("mean_sel_oos_sharpe"),
    )


# --------------------------------------------------------------------------
# C-ext (round 10). IC decay profile (operators/cross_section.py::
# ic_decay): the per-period rank IC swept over a forward-horizon ladder
# and summarized per horizon — exact-rational per-period ICs, ts-ordered
# moment folds over the period-bounded frame.
# --------------------------------------------------------------------------


@register(
    "ic_decay",
    f"""
WITH
{_FEATURE_BARS_CTE},
idb AS (
  SELECT symbol, ts, h.h,
    ln(close / lag(close, {_IC_LAG}) OVER o) AS sig,
    ln((CASE WHEN h.h = 8 THEN lead(close, 8) OVER o
             WHEN h.h = 4 THEN lead(close, 4) OVER o
             WHEN h.h = 2 THEN lead(close, 2) OVER o
             ELSE lead(close, 1) OVER o END) / close) AS fwd
  FROM bars CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS h) h
  WINDOW o AS (PARTITION BY symbol, h.h ORDER BY ts)
),
idq AS (SELECT * FROM idb WHERE sig IS NOT NULL AND fwd IS NOT NULL),
idr AS (
  SELECT h, ts,
    CAST(row_number() OVER (PARTITION BY h, ts ORDER BY sig, symbol) AS BIGINT) AS rs,
    CAST(row_number() OVER (PARTITION BY h, ts ORDER BY fwd, symbol) AS BIGINT) AS rf
  FROM idq
),
idg AS (
  SELECT h, ts, CAST(count(*) AS BIGINT) AS nsym,
    CAST(sum((rs - rf) * (rs - rf)) AS BIGINT) AS ssd
  FROM idr GROUP BY h, ts
),
idic AS (
  SELECT h, ts,
    1 - 6 * CAST(ssd AS DOUBLE)
        / (CAST(nsym AS DOUBLE) * (CAST(nsym AS DOUBLE) * CAST(nsym AS DOUBLE) - 1)) AS ic
  FROM idg WHERE nsym >= 3
),
idf AS (
  SELECT h,
    row_number() OVER wo AS rn,
    count(*) OVER wa AS n,
    sum(ic) OVER wr AS s1,
    sum(ic * ic) OVER wr AS s2,
    sum(CASE WHEN ic > 0 THEN 1 ELSE 0 END) OVER wa AS hits
  FROM idic
  WINDOW wo AS (PARTITION BY h ORDER BY ts),
         wr AS (PARTITION BY h ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY h)
)
SELECT CAST(h AS INTEGER) AS horizon, CAST(n AS BIGINT) AS n_periods,
  round(s1 / CAST(n AS DOUBLE), 9) + 0 AS mean_ic,
  round(CASE WHEN n >= 2
             AND (s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) > 0
        THEN (s1 / CAST(n AS DOUBLE))
             / sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
                    / CAST(n AS DOUBLE)) END, 9) + 0 AS ic_t,
  round(hits / CAST(n AS DOUBLE), 9) + 0 AS hit_rate
FROM idf WHERE rn = n
""",
    f"IC decay profile: per-period rank IC of the {_IC_LAG}-bar momentum "
    "signal at forward horizons 1/2/4/8, summarized per horizon (mean "
    "IC, t-stat, hit rate) — the optimal-holding-period diagnostic; "
    "exact-rational ICs, ts-ordered folds",
)
def q_ic_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.cross_section import ic_decay

    with _trades_config():
        bars = bars_ops.time_bars(
            trades_from_events(spark, sf_dir), bar_size=TIME_BAR_SIZE
        )
    out = ic_decay(bars, momentum_lag=_IC_LAG, ts_col="ts_event")
    z0 = F.lit(0.0)
    return out.select(
        "horizon",
        "n_periods",
        (F.round("mean_ic", 9) + z0).alias("mean_ic"),
        (F.round("ic_t", 9) + z0).alias("ic_t"),
        (F.round("hit_rate", 9) + z0).alias("hit_rate"),
    )
