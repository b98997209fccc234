"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark.operators import bars as bars_ops
from polars_trading_spark.sources.tables import read_table
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
        bars = feature_bars(spark, sf_dir, bar_size=TIME_BAR_SIZE)
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
