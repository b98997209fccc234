"""Event-stream analytics (functions/events.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from polars_trading_spark.functions.events import (
    event_funnel,
    retention_cohorts,
    sessionize,
)

SCHEMA = "user_id long, ts timestamp, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_sessionize_splits_on_gap(spark):
    rows = [
        (1, datetime(2024, 1, 1, 9, 0), "view"),
        (1, datetime(2024, 1, 1, 9, 10), "click"),
        (1, datetime(2024, 1, 1, 11, 0), "view"),   # > 30m gap: new session
        (2, datetime(2024, 1, 1, 9, 0), "view"),
    ]
    out = {(r["user_id"], r["session_id"]): r for r in sessionize(_ev(spark, rows), gap="30m").collect()}
    assert len(out) == 3
    s1 = out[(1, 1)]
    assert s1["n_events"] == 2 and s1["duration_s"] == pytest.approx(600.0)
    assert out[(1, 2)]["n_events"] == 1
    assert out[(2, 1)]["n_events"] == 1


def test_funnel_order_matters(spark):
    t = lambda m: datetime(2024, 1, 1, 9, m)
    rows = [
        # user 1: full ordered funnel
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "signup"), (1, t(3), "purchase"),
        # user 2: click BEFORE view -> depth stops after view (no later click)
        (2, t(0), "click"), (2, t(1), "view"),
        # user 3: view then purchase only -> depth 1
        (3, t(0), "view"), (3, t(5), "purchase"),
    ]
    out = {r["user_id"]: r for r in event_funnel(_ev(spark, rows), ["view", "click", "signup", "purchase"]).collect()}
    assert out[1]["depth"] == 4 and out[1]["ts_purchase"] == t(3)
    assert out[2]["depth"] == 1 and out[2]["ts_click"] is None
    assert out[3]["depth"] == 1 and out[3]["ts_purchase"] is None


def test_funnel_picks_earliest_valid(spark):
    t = lambda m: datetime(2024, 1, 1, 9, m)
    rows = [
        (1, t(0), "view"), (1, t(1), "click"), (1, t(4), "click"), (1, t(5), "signup"),
    ]
    out = event_funnel(_ev(spark, rows), ["view", "click", "signup", "purchase"]).collect()[0]
    assert out["ts_click"] == t(1)  # earliest click after the view


def test_retention_triangle(spark):
    d = lambda day: datetime(2024, 1, day, 12)
    rows = [
        # cohort week of Jan 1 (Mon): users 1, 2
        (1, d(2), "view"), (2, d(3), "view"),
        # user 1 returns in week+1; user 2 does not
        (1, d(9), "view"),
        # cohort week of Jan 8: user 3
        (3, d(10), "view"),
    ]
    out = {(str(r["cohort"].date()), r["period_n"]): r for r in retention_cohorts(_ev(spark, rows), period="1w").collect()}
    c1 = out[("2024-01-01", 0)]
    assert c1["cohort_size"] == 2 and c1["n_active"] == 2 and c1["retention"] == 1.0
    c1w1 = out[("2024-01-01", 1)]
    assert c1w1["n_active"] == 1 and c1w1["retention"] == 0.5
    assert out[("2024-01-08", 0)]["cohort_size"] == 1


def test_funnel_validation(spark):
    with pytest.raises(ValueError, match="steps"):
        event_funnel(_ev(spark, [(1, datetime(2024, 1, 1), "view")]), ["view"])


class TestEventTransitions:
    def test_counts_probabilities_and_user_isolation(self, spark):
        import datetime as dt

        from polars_trading_spark.functions.events import event_transitions

        base = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: a -> b -> a -> c
            (1, base + dt.timedelta(minutes=0), 1, "a"),
            (1, base + dt.timedelta(minutes=1), 2, "b"),
            (1, base + dt.timedelta(minutes=2), 3, "a"),
            (1, base + dt.timedelta(minutes=3), 4, "c"),
            # user 2: a -> b  (no cross-user a(c) -> a transition)
            (2, base + dt.timedelta(minutes=5), 5, "a"),
            (2, base + dt.timedelta(minutes=6), 6, "b"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
        got = {
            (r["from_type"], r["to_type"]): r
            for r in event_transitions(ev).collect()
        }
        assert got[("a", "b")]["n"] == 2 and got[("a", "b")]["n_from"] == 3
        assert got[("a", "b")]["p"] == 2 / 3
        assert got[("a", "c")]["n"] == 1 and got[("a", "c")]["p"] == 1 / 3
        assert got[("b", "a")]["n"] == 1 and got[("b", "a")]["p"] == 1.0
        assert ("c", "a") not in got  # user boundary respected
        assert len(got) == 3

    def test_simultaneous_events_break_ties_by_order_col(self, spark):
        import datetime as dt

        from polars_trading_spark.functions.events import event_transitions

        t = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [(1, t, 2, "b"), (1, t, 1, "a")],
            "user_id long, ts timestamp, event_id long, event_type string",
        )
        got = {
            (r["from_type"], r["to_type"]) for r in event_transitions(ev).collect()
        }
        assert got == {("a", "b")}

    def test_plan_zero_python(self, spark):
        import datetime as dt

        from polars_trading_spark.functions.events import event_transitions
        from polars_trading_spark.plans import count_python_stages

        ev = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 1, "a")],
            "user_id long, ts timestamp, event_id long, event_type string",
        )
        assert count_python_stages(event_transitions(ev)) == 0


class TestFunnelLatency:
    def test_exact_order_statistics_and_conversion(self, spark):
        import datetime as dt

        from polars_trading_spark.functions.events import funnel_latency

        base = dt.datetime(2024, 1, 1)
        rows = []
        # 10 users view; 9 click at distinct latencies 10..90s (user u
        # clicks u*10s after view); 3 sign up
        for u in range(10):
            rows.append((u, base, "view"))
            if u < 9:
                rows.append((u, base + dt.timedelta(seconds=(u + 1) * 10), "click"))
            if u < 3:
                rows.append((u, base + dt.timedelta(minutes=30 + u), "signup"))
        ev = spark.createDataFrame(
            [(u, t, k) for u, t, k in rows],
            "user_id long, ts timestamp, event_type string",
        )
        out = {
            r["step_idx"]: r
            for r in funnel_latency(ev, ["view", "click", "signup"]).collect()
        }
        vc = out[1]
        assert (vc["n_from"], vc["n_to"]) == (10, 9)
        assert vc["conv_rate"] == 0.9
        # latencies 10..90: median = rank (9+1)//2 = 5 -> 50s;
        # p90 = rank (81+9)//10 = 9 -> 90s
        assert vc["med_latency_s"] == 50.0
        assert vc["p90_latency_s"] == 90.0
        cs = out[2]
        assert (cs["n_from"], cs["n_to"]) == (9, 3)
        assert cs["conv_rate"] == pytest.approx(3 / 9)
        # signup latencies: 30m-10s, 31m-20s, 32m-30s per user 0,1,2
        assert cs["med_latency_s"] == 31 * 60 - 20

    def test_empty_pair_yields_null_latencies(self, spark):
        import datetime as dt

        from polars_trading_spark.functions.events import funnel_latency

        ev = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), "view")],
            "user_id long, ts timestamp, event_type string",
        )
        out = {
            r["step_idx"]: r
            for r in funnel_latency(ev, ["view", "click"]).collect()
        }
        r = out[1]
        assert (r["n_from"], r["n_to"]) == (1, 0)
        assert r["conv_rate"] == 0.0
        assert r["med_latency_s"] is None and r["p90_latency_s"] is None
