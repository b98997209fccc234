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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = return_acf(bars, lags=_ACF_LAGS, ts_col="ts_event", close_col="close")
    z0 = F.lit(0.0)
    return out.select(
        "symbol",
        "n_obs",
        *[(F.round(f"acf_{k}", 6) + z0).alias(f"acf_{k}") for k in _ACF_LAGS],
        (F.round("ljung_box_q", 6) + z0).alias("ljung_box_q"),
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
    out = runs_test(bars, ts_col="ts_event")
    return out.select(
        "symbol",
        "n_up",
        "n_down",
        "n_runs",
        (F.round("expected_runs", 6) + F.lit(0.0)).alias("expected_runs"),
        (F.round("z", 6) + F.lit(0.0)).alias("z"),
    )
