"""bar_groups semantics against the reference kernel's unit vectors.

Expected triples come from the Rust tests at
/root/reference/src/bars.rs:161-348 (split and overflow modes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_trading_spark.operators.bars import BAR_AMOUNT, BAR_ID, bar_groups


def _run(spark, values, bar_size, allow_splits):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "seq int, val double"
    )
    out = bar_groups(
        df, "val", bar_size, allow_splits=allow_splits, order_by=["seq"]
    )
    rows = out.select("seq", BAR_ID, BAR_AMOUNT).orderBy("seq", BAR_ID).collect()
    return [(r[0], r[1], r[2]) for r in rows]


# (values, bar_size, expected (transaction, group, amount)) — split mode
SPLIT_CASES = [
    (
        [1, 2, 3, 4, 5],
        4,
        [(0, 0, 1.0), (1, 0, 2.0), (2, 0, 1.0), (2, 1, 2.0),
         (3, 1, 2.0), (3, 2, 2.0), (4, 2, 2.0), (4, 3, 3.0)],
    ),
    (
        [3, 3, 3, 3],
        4,
        [(0, 0, 3.0), (1, 0, 1.0), (1, 1, 2.0), (2, 1, 2.0), (2, 2, 1.0), (3, 2, 3.0)],
    ),
]

OVERFLOW_CASES = [
    (
        [1, 2, 3, 4, 5],
        4,
        [(0, 0, 1.0), (1, 0, 2.0), (2, 0, 3.0), (3, 1, 4.0), (4, 2, 5.0)],
    ),
    (
        [2, 2, 5, 1, 3],
        4,
        [(0, 0, 2.0), (1, 0, 2.0), (2, 1, 5.0), (3, 2, 1.0), (4, 2, 3.0)],
    ),
    (
        [3, 3, 3, 3],
        4,
        [(0, 0, 3.0), (1, 0, 3.0), (2, 1, 3.0), (3, 1, 3.0)],
    ),
]


@pytest.mark.parametrize("values,bar_size,expected", SPLIT_CASES)
def test_split_mode(spark, values, bar_size, expected):
    assert _run(spark, values, bar_size, True) == expected


@pytest.mark.parametrize("values,bar_size,expected", OVERFLOW_CASES)
def test_overflow_mode(spark, values, bar_size, expected):
    assert _run(spark, values, bar_size, False) == expected


def test_split_mode_long_dtype(spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate([1, 2, 3, 4, 5])], "seq int, val long")
    out = bar_groups(df, "val", 4, allow_splits=True, order_by=["seq"])
    rows = out.select("seq", BAR_ID, BAR_AMOUNT).orderBy("seq", BAR_ID).collect()
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (0, 0, 1), (1, 0, 2), (2, 0, 1), (2, 1, 2),
        (3, 1, 2), (3, 2, 2), (4, 2, 2), (4, 3, 3),
    ]
    assert dict(out.dtypes)[BAR_AMOUNT] == "bigint"


def test_zero_value_rows_emit_no_pieces(spark):
    assert _run(spark, [2, 0, 2], 4, True) == [(0, 0, 2.0), (2, 0, 2.0)]


def test_partitioned_ids_restart(spark):
    df = spark.createDataFrame(
        [("a", 0, 5.0), ("a", 1, 3.0), ("b", 0, 9.0)], "sym string, seq int, val double"
    )
    out = bar_groups(df, "val", 4, allow_splits=True, partition_by=["sym"], order_by=["seq"])
    rows = {
        (r["sym"], r["seq"], r[BAR_ID]): r[BAR_AMOUNT]
        for r in out.collect()
    }
    assert rows == {
        ("a", 0, 0): 4.0,
        ("a", 0, 1): 1.0,
        ("a", 1, 1): 3.0,
        ("b", 0, 0): 4.0,
        ("b", 0, 1): 4.0,
        ("b", 0, 2): 1.0,
    }


def test_bar_groups_split_float_values(spark):
    """Float value columns take the sequential path; semantics mirror the
    reference kernel scan (src/bars.rs:36-51) — hand-traced vector."""
    from polars_trading_spark.operators.bars import bar_groups

    df = spark.createDataFrame(
        [(1, 1.5), (2, 2.5), (3, 3.0)], "seq long, amt double"
    )
    out = bar_groups(df, "amt", 2.5, allow_splits=True, order_by=["seq"])
    rows = sorted(
        (r["seq"], r["bar_group__id"], r["bar_group__amount"]) for r in out.collect()
    )
    assert rows == [
        (1, 0, 1.5),
        (2, 0, 1.0),
        (2, 1, 1.5),
        (3, 1, 1.0),
        (3, 2, 2.0),
    ]
    # every closed bar sums to exactly bar_size
    sums = {}
    for _, gid, amt in rows:
        sums[gid] = sums.get(gid, 0.0) + amt
    assert sums[0] == 2.5 and sums[1] == 2.5
