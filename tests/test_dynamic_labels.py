"""daily_vol / vertical barrier goldens (ported from the reference's
tests/labels/test_dynamic_labels.py) plus triple-barrier invariants."""

from __future__ import annotations

import datetime as dt

import pytest

from polars_trading_spark import Config
from polars_trading_spark.operators.dynamic_labels import (
    daily_vol,
    get_triple_barrier_label,
    get_vertical_barrier_by_timedelta,
)

TS10 = [
    dt.datetime(2024, 1, 1, 0),
    dt.datetime(2024, 1, 1, 3),
    dt.datetime(2024, 1, 1, 6),
    dt.datetime(2024, 1, 1, 9),
    dt.datetime(2024, 1, 1, 15),
    dt.datetime(2024, 1, 1, 20),
    dt.datetime(2024, 1, 2, 1),
    dt.datetime(2024, 1, 3, 5),
    dt.datetime(2024, 1, 3, 7),
    dt.datetime(2024, 1, 3, 9),
]


@pytest.fixture
def ten_rows(spark):
    return spark.createDataFrame(
        [(t, float(i + 1)) for i, t in enumerate(TS10)], "ts_event timestamp, price double"
    )


def test_daily_vol_weekend_returns_golden(spark, ten_rows):
    # Reference golden: tests/labels/test_dynamic_labels.py:65-107 (span=3).
    with Config(timestamp_column="ts_event"):
        out = daily_vol(ten_rows, span=3)
    got = {r["ts_event"]: r["daily_return_volatility"] for r in out.collect()}
    for t in TS10[:6]:
        assert got[t] is None
    assert got[TS10[6]] == 0.0
    assert got[TS10[7]] == pytest.approx(4.141625, abs=1e-6)
    assert got[TS10[8]] == pytest.approx(2.668519, abs=1e-6)
    assert got[TS10[9]] == pytest.approx(1.792192, abs=1e-6)


def test_daily_vol_native_matches_pandas(spark, ten_rows):
    with Config(timestamp_column="ts_event"):
        a = daily_vol(ten_rows, span=3, ewm_method="pandas").collect()
        b = daily_vol(ten_rows, span=3, ewm_method="native").collect()
    ga = {r["ts_event"]: r["daily_return_volatility"] for r in a}
    gb = {r["ts_event"]: r["daily_return_volatility"] for r in b}
    for t in TS10:
        if ga[t] is None:
            assert gb[t] is None
        else:
            assert gb[t] == pytest.approx(ga[t], rel=1e-9)


@pytest.mark.parametrize(
    "offset,expected_tail",
    [
        ("2h", [TS10[7], TS10[8], TS10[9], None]),  # :109-151 golden
        ("3h", [TS10[7], TS10[9], None, None]),     # :153-196 golden (skip rows)
    ],
)
def test_vertical_barrier_goldens(spark, ten_rows, offset, expected_tail):
    with Config(timestamp_column="ts_event"):
        out = get_vertical_barrier_by_timedelta(ten_rows, offset)
    got = {r["ts_event"]: r["vertical_barrier"] for r in out.collect()}
    # Head: each barrier is the next observation (gaps > offset).
    for i in range(6):
        assert got[TS10[i]] == TS10[i + 1]
    assert [got[t] for t in TS10[6:]] == expected_tail


def test_vertical_barrier_timedelta_object(spark, ten_rows):
    with Config(timestamp_column="ts_event"):
        a = get_vertical_barrier_by_timedelta(ten_rows, "2h").collect()
        b = get_vertical_barrier_by_timedelta(ten_rows, dt.timedelta(hours=2)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_vertical_barrier_multi_symbol(spark):
    rows = [(t, float(i + 1), s) for s in ("A", "B") for i, t in enumerate(TS10)]
    df = spark.createDataFrame(rows, "ts_event timestamp, price double, symbol string")
    with Config(timestamp_column="ts_event"):
        out = get_vertical_barrier_by_timedelta(df, "2h")
    assert out.count() == 20
    got = {(r["symbol"], r["ts_event"]): r["vertical_barrier"] for r in out.collect()}
    assert got[("A", TS10[0])] == TS10[1]
    assert got[("B", TS10[9])] is None


def test_triple_barrier_invariants(spark):
    # Synthetic two-symbol walk; checks structural invariants.
    rows = []
    base = dt.datetime(2024, 1, 1)
    price = {"A": 100.0, "B": 50.0}
    for i in range(200):
        for s in ("A", "B"):
            price[s] *= 1.0 + (0.003 if (i * 7 + ord(s)) % 5 < 2 else -0.002)
            rows.append((base + dt.timedelta(hours=i), price[s], 10, s))
    df = spark.createDataFrame(rows, "ts_event timestamp, price double, size long, symbol string")
    with Config(timestamp_column="ts_event"):
        out = get_triple_barrier_label(df, span=10, barrier_offset="6h").collect()
    assert len(out) > 0
    for r in out:
        assert r["label"] in (1, 0, -1)
        assert r["touch_timestamp"] >= r["timestamp"]
        assert r["return"] is not None
        if r["label"] == 1:
            assert r["return"] > 0
        if r["label"] == -1:
            assert r["return"] < 0


def test_native_ewm_unbounded_length_matches_pandas(spark):
    # 40k rows at span=10: the old r^t closed form overflows float64
    # around t ~ 3.5k; the segmented form must stay finite and agree
    # with pandas to float precision over the whole series.
    import math

    from polars_trading_spark.operators.ewm import ewm_std

    n, span = 40_000, 10
    rows = [("A", i, math.sin(i * 0.37) * 10 + (i % 7)) for i in range(n)]
    df = spark.createDataFrame(rows, "symbol string, t long, v double")
    nat = {
        r["t"]: r["ewm_std"]
        for r in ewm_std(df, "v", span, by=["symbol"], order_by=["t"], method="native").collect()
    }
    pan = {
        r["t"]: r["ewm_std"]
        for r in ewm_std(df, "v", span, by=["symbol"], order_by=["t"], method="pandas").collect()
    }
    assert nat[0] is None and pan[0] is None
    for t in (1, 100, 3_999, 4_000, 20_000, n - 1):  # spans chunk boundaries
        assert nat[t] == pytest.approx(pan[t], rel=1e-9), t
    assert all(v is None or math.isfinite(v) for v in nat.values())
