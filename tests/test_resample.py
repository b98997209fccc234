"""Upsample + forward fill (operators/resample.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from polars_trading_spark.operators.resample import upsample_ffill

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, price double"
    )


def test_grid_alignment_and_forward_fill(spark):
    rows = [
        ("A", BASE + dt.timedelta(minutes=3), 1.0),
        ("A", BASE + dt.timedelta(minutes=11), 2.0),
        ("A", BASE + dt.timedelta(minutes=34), 3.0),
    ]
    out = sorted(
        upsample_ffill(_df(spark, rows), every="10m").collect(),
        key=lambda r: r["ts_event"],
    )
    # span [00:03, 00:34] -> aligned grid 00:10, 00:20, 00:30
    assert [r["ts_event"].minute for r in out] == [10, 20, 30]
    assert [r["price"] for r in out] == [1.0, 2.0, 2.0]
    # staleness source: 00:30 still carries the 00:11 observation
    assert out[2]["ts_src"] == BASE + dt.timedelta(minutes=11)


def test_groups_independent_and_empty_span(spark):
    rows = [
        ("A", BASE + dt.timedelta(minutes=3), 1.0),
        ("A", BASE + dt.timedelta(minutes=17), 2.0),
        ("B", BASE + dt.timedelta(minutes=12), 9.0),
        ("B", BASE + dt.timedelta(minutes=13), 8.0),  # span has no 10m point
    ]
    out = upsample_ffill(_df(spark, rows), every="10m").collect()
    by = {}
    for r in out:
        by.setdefault(r["symbol"], []).append(r)
    assert [r["price"] for r in sorted(by["A"], key=lambda r: r["ts_event"])] == [1.0]
    assert "B" not in by  # [00:12, 00:13] contains no aligned instant


def test_exact_observation_on_grid_point(spark):
    rows = [
        ("A", BASE + dt.timedelta(minutes=10), 5.0),
        ("A", BASE + dt.timedelta(minutes=20), 6.0),
    ]
    out = sorted(
        upsample_ffill(_df(spark, rows), every="10m").collect(),
        key=lambda r: r["ts_event"],
    )
    # observations exactly on the grid fill themselves (inclusive as-of)
    assert [(r["price"], r["ts_src"] == r["ts_event"]) for r in out] == [
        (5.0, True),
        (6.0, True),
    ]


def test_validation_and_plan(spark):
    from polars_trading_spark.plans import (
        count_python_stages,
        has_unbounded_following_frame,
    )

    rows = [("A", BASE, 1.0)]
    with pytest.raises(ValueError):
        upsample_ffill(_df(spark, rows), every="1w")
    out = upsample_ffill(_df(spark, rows), every="10m")
    assert count_python_stages(out) == 0
    assert not has_unbounded_following_frame(out)
