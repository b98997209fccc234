"""Market-model event study: abnormal returns and CAR.

The standard MacKinlay (1997, "Event studies in economics and
finance") pipeline, run entirely inside the engine:

1. per-symbol bar log returns and the equal-weight universe (market)
   return per bar timestamp;
2. per event, the market-model OLS ``r = alpha + beta * r_m`` over the
   ``est_window`` bars strictly BEFORE the event bar;
3. abnormal return ``AR_t = r_t − (alpha + beta·r_m,t)`` for each of
   the ``car_window`` bars from the event bar onward, and the running
   cumulative abnormal return ``CAR``.

Scale shape — no range join anywhere:

* the market return is one per-timestamp aggregate joined back (AQE
  decides broadcast, same as ``rolling_beta``);
* the estimation OLS is a ROLLING window frame ``[-est_window, -1]``
  of explicit sums evaluated at every bar (adding events never adds
  passes), so attaching (alpha, beta) to an event is a plain equi-join
  on the event bar;
* the event window is a bounded ``explode(sequence(0, car-1))`` fan-out
  on the (small) event frame equi-joined back to bars on the
  per-symbol row index — O(events × car_window) rows, never
  bars × events;
* CAR is an offset-ORDERED running fold per (symbol, event) — exact
  and fold-order deterministic (SCALING.md rule 24/27).

Reference scope note: the reference engine (polars_trading) has no
event-study operator; this extends the §2.C quantitative surface with
the standard post-labeling evaluation tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["event_study_car"]


def event_study_car(
    bars: DataFrame,
    events: DataFrame,
    *,
    est_window: int = 20,
    car_window: int = 5,
    min_est: int | None = None,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    event_ts_col: str = "event_ts",
) -> DataFrame:
    """Abnormal returns and CAR around each (symbol, event timestamp).

    ``events`` carries one row per event: ``symbol_col`` +
    ``event_ts_col``; the event timestamp must equal a bar timestamp of
    that symbol (non-matching events are dropped — align upstream with
    ``asof_join`` if needed).  Events whose estimation window has fewer
    than ``min_est`` (default: ``est_window``) return observations are
    dropped.

    Output: one row per (symbol, event, offset 0..car_window-1) —
    ``symbol, event_ts, offset, ts, alpha, beta, n_est, ret, mkt_ret,
    ar, car``.  Offsets past the end of the symbol's history emit no
    row.
    """
    if est_window < 2:
        raise ValueError(f"est_window must be >= 2, got {est_window}")
    if car_window < 1:
        raise ValueError(f"car_window must be >= 1, got {car_window}")
    min_est = est_window if min_est is None else min_est
    if min_est < 2:
        raise ValueError(f"min_est must be >= 2, got {min_est}")

    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    c = F.col(close_col).cast("double")
    r = bars.select(
        F.col(symbol_col),
        F.col(ts_col),
        F.log(c / F.lag(c).over(order)).alias("__r"),
    ).where(F.col("__r").isNotNull())

    mkt = r.groupBy(ts_col).agg(F.avg("__r").alias("__rm"))
    b = r.join(mkt, on=ts_col).select(
        F.col(symbol_col),
        F.col(ts_col),
        "__r",
        "__rm",
        F.row_number().over(order).alias("__rn"),
    )

    # rolling market-model OLS over the est_window bars strictly before
    # each bar (frame [-est, -1]): explicit sums, zero joins
    est = order.rowsBetween(-est_window, -1)
    n = F.count("__r").over(est).cast("double")
    sx = F.sum("__rm").over(est)
    sy = F.sum("__r").over(est)
    sxx = F.sum(F.col("__rm") * F.col("__rm")).over(est)
    sxy = F.sum(F.col("__rm") * F.col("__r")).over(est)
    den = n * sxx - sx * sx
    beta = F.when((n >= min_est) & (den > 0), (n * sxy - sx * sy) / den)
    alpha = (sy - beta * sx) / n
    withols = b.select(
        F.col(symbol_col),
        F.col(ts_col),
        "__r",
        "__rm",
        "__rn",
        n.cast("long").alias("__nest"),
        alpha.alias("__a"),
        beta.alias("__b"),
    )

    ev = events.select(
        F.col(symbol_col), F.col(event_ts_col).alias("__ets")
    ).join(
        withols.select(
            symbol_col,
            F.col(ts_col).alias("__ets"),
            "__rn",
            "__nest",
            "__a",
            "__b",
        ),
        [symbol_col, "__ets"],
    ).where(F.col("__b").isNotNull())

    # bounded fan-out: car_window target row indices per event
    targets = ev.select(
        F.col(symbol_col),
        "__ets",
        "__rn",
        "__nest",
        "__a",
        "__b",
        F.explode(F.sequence(F.lit(0), F.lit(car_window - 1))).alias("offset"),
    ).select(
        F.col(symbol_col),
        "__ets",
        "__nest",
        "__a",
        "__b",
        "offset",
        (F.col("__rn") + F.col("offset")).alias("__rn"),
    )

    joined = targets.join(
        withols.select(symbol_col, "__rn", F.col(ts_col), "__r", "__rm"),
        [symbol_col, "__rn"],
    )
    ar = F.col("__r") - (F.col("__a") + F.col("__b") * F.col("__rm"))
    w_ev = Window.partitionBy(symbol_col, "__ets").orderBy("offset")
    car = F.sum(ar).over(
        w_ev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(symbol_col),
        F.col("__ets").alias("event_ts"),
        F.col("offset").cast("int").alias("offset"),
        F.col(ts_col),
        F.col("__a").alias("alpha"),
        F.col("__b").alias("beta"),
        F.col("__nest").alias("n_est"),
        F.col("__r").alias("ret"),
        F.col("__rm").alias("mkt_ret"),
        ar.alias("ar"),
        car.alias("car"),
    )
