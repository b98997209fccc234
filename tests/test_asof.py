from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from polars_trading_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("A", 1), ("A", 5), ("A", 10), ("B", 3)], "sym string, k long"
    )
    right = spark.createDataFrame(
        [("A", 0, 100.0), ("A", 5, 105.0), ("A", 7, 107.0), ("B", 4, 204.0)],
        "sym string, k long, px double",
    )
    return left, right


def test_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", by="sym", strategy="backward")
    got = {(r["sym"], r["k"]): r["px"] for r in out.collect()}
    assert got == {("A", 1): 100.0, ("A", 5): 105.0, ("A", 10): 107.0, ("B", 3): None}


def test_forward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", by="sym", strategy="forward")
    got = {(r["sym"], r["k"]): r["px"] for r in out.collect()}
    assert got == {("A", 1): 105.0, ("A", 5): 105.0, ("A", 10): None, ("B", 3): 204.0}


def test_no_by_single_series(spark):
    left = spark.createDataFrame([(2,), (9,)], "k long")
    right = spark.createDataFrame([(1, "x"), (8, "y")], "k long, tag string")
    out = asof_join(left, right, on="k", strategy="backward")
    got = {r["k"]: r["tag"] for r in out.collect()}
    assert got == {2: "x", 9: "y"}


def test_suffix_on_collision(spark):
    left = spark.createDataFrame([(1, 9.0)], "k long, px double")
    right = spark.createDataFrame([(0, 1.5)], "k long, px double")
    out = asof_join(left, right, on="k", strategy="backward")
    row = out.collect()[0]
    assert row["px"] == 9.0 and row["px_right"] == 1.5


def test_tolerance(spark):
    left = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 12),), (dt.datetime(2024, 1, 3, 12),)], "t timestamp"
    )
    right = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 11), 1.0)], "t timestamp, v double"
    )
    out = asof_join(
        left, right, on="t", strategy="backward", tolerance=F.expr("INTERVAL 1 DAY")
    )
    got = {r["t"]: r["v"] for r in out.collect()}
    assert got[dt.datetime(2024, 1, 1, 12)] == 1.0
    assert got[dt.datetime(2024, 1, 3, 12)] is None


def test_different_key_names_keeps_matched_key(spark):
    left = spark.createDataFrame([(5,)], "probe long")
    right = spark.createDataFrame([(3, "m")], "anchor long, tag string")
    out = asof_join(left, right, left_on="probe", right_on="anchor", strategy="backward")
    row = out.collect()[0]
    assert row["tag"] == "m"
    assert row["anchor"] == 3
