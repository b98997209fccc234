"""event_study_car (operators/event_study.py) vs a pure-python golden."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from polars_trading_spark.operators.event_study import event_study_car

BASE = dt.datetime(2024, 1, 1)


def _bars(spark, series):
    rows = [
        (s, BASE + dt.timedelta(days=i), p)
        for s, ps in series.items()
        for i, p in enumerate(ps)
    ]
    return spark.createDataFrame(rows, "symbol string, ts timestamp, close double")


def _golden(series, sym, event_day, est, car):
    """Brute-force market model + CAR for one event."""
    rets = {
        s: [math.log(ps[i] / ps[i - 1]) for i in range(1, len(ps))]
        for s, ps in series.items()
    }
    # return index i corresponds to bar day i+1
    n_days = len(next(iter(series.values())))
    mkt = [
        sum(rets[s][i] for s in rets) / len(rets) for i in range(n_days - 1)
    ]
    e = event_day - 1  # return-row index of the event bar
    xs, ys = zip(*[(mkt[i], rets[sym][i]) for i in range(max(0, e - est), e)])
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = n * sxx - sx * sx
    beta = (n * sxy - sx * sy) / den
    alpha = (sy - beta * sx) / n
    out, c = [], 0.0
    for j in range(car):
        i = e + j
        if i >= len(mkt):
            break
        ar = rets[sym][i] - (alpha + beta * mkt[i])
        c += ar
        out.append((j, ar, c))
    return alpha, beta, out


@pytest.fixture
def series():
    import random

    rng = random.Random(7)
    out = {}
    for s, drift in [("A", 0.001), ("B", -0.0005), ("C", 0.0)]:
        p, ps = 100.0, []
        for _ in range(30):
            p *= math.exp(drift + rng.gauss(0, 0.01))
            ps.append(p)
        out[s] = ps
    return out


class TestEventStudyCar:
    def test_matches_brute_force(self, spark, series):
        est, car, event_day = 10, 4, 20
        events = spark.createDataFrame(
            [("A", BASE + dt.timedelta(days=event_day))],
            "symbol string, event_ts timestamp",
        )
        out = sorted(
            event_study_car(
                _bars(spark, series),
                events,
                est_window=est,
                car_window=car,
                ts_col="ts",
                close_col="close",
            ).collect(),
            key=lambda r: r["offset"],
        )
        alpha, beta, golden = _golden(series, "A", event_day, est, car)
        assert len(out) == len(golden) == car
        for r, (j, ar, c) in zip(out, golden):
            assert r["offset"] == j
            assert r["alpha"] == pytest.approx(alpha, rel=1e-9)
            assert r["beta"] == pytest.approx(beta, rel=1e-9)
            assert r["ar"] == pytest.approx(ar, rel=1e-9)
            assert r["car"] == pytest.approx(c, rel=1e-9)
            assert r["n_est"] == est

    def test_history_end_truncates_car_rows(self, spark, series):
        events = spark.createDataFrame(
            [("B", BASE + dt.timedelta(days=28))],  # 29 bars of returns
            "symbol string, event_ts timestamp",
        )
        out = event_study_car(
            _bars(spark, series),
            events,
            est_window=10,
            car_window=6,
            ts_col="ts",
            close_col="close",
        ).collect()
        # bars at days 0..29 -> return rows at days 1..29; event day 28
        # leaves offsets 0 (day 28) and 1 (day 29) only
        assert sorted(r["offset"] for r in out) == [0, 1]

    def test_short_estimation_window_drops_event(self, spark, series):
        events = spark.createDataFrame(
            [("A", BASE + dt.timedelta(days=3))],
            "symbol string, event_ts timestamp",
        )
        out = event_study_car(
            _bars(spark, series),
            events,
            est_window=10,
            car_window=3,
            ts_col="ts",
            close_col="close",
        ).collect()
        assert out == []

    def test_validation_and_plan(self, spark, series):
        from polars_trading_spark.plans import count_python_stages

        events = spark.createDataFrame(
            [("A", BASE + dt.timedelta(days=20))],
            "symbol string, event_ts timestamp",
        )
        with pytest.raises(ValueError, match="est_window"):
            event_study_car(_bars(spark, series), events, est_window=1, ts_col="ts")
        with pytest.raises(ValueError, match="car_window"):
            event_study_car(
                _bars(spark, series), events, est_window=5, car_window=0, ts_col="ts"
            )
        out = event_study_car(
            _bars(spark, series), events, est_window=5, car_window=3, ts_col="ts"
        )
        assert count_python_stages(out) == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
