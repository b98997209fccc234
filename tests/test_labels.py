"""Fixed-time return goldens (ported from reference tests/labels/test_labels.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from polars_trading_spark.operators.labels import (
    fixed_time_return,
    fixed_time_return_classification,
)


def _single(spark):
    return spark.createDataFrame(
        [(i, float(i), "A") for i in range(1, 6)], "ts long, p double, sy string"
    )


def _collect_labels(df, col):
    return [r["label"] for r in df.withColumn("label", col).orderBy("sy", "ts").collect()]


def _approx_eq(got, expected):
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        if e is None:
            assert g is None
        else:
            assert g == pytest.approx(e)


def test_fixed_time_return_single(spark):
    labels = _collect_labels(_single(spark), fixed_time_return("p", 1, order_by=["ts"]))
    _approx_eq(labels, [0.5, 1 / 3, 0.25, None, None])


def test_fixed_time_return_multi_symbol(spark):
    df = spark.createDataFrame(
        [(i, float(i), s) for s in ("A", "B") for i in range(1, 6)],
        "ts long, p double, sy string",
    )
    labels = _collect_labels(df, fixed_time_return("p", 1, symbol="sy", order_by=["ts"]))
    _approx_eq(labels, [0.5, 1 / 3, 0.25, None, None] * 2)


def test_classification_float_threshold(spark):
    labels = _collect_labels(
        _single(spark), fixed_time_return_classification("p", 1, 0.3, order_by=["ts"])
    )
    assert labels == [1, 1, 0, None, None]


def test_classification_no_threshold(spark):
    labels = _collect_labels(
        _single(spark), fixed_time_return_classification("p", 1, order_by=["ts"])
    )
    assert labels == [1, 1, 1, None, None]


def test_classification_expr_threshold(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 0.7, "A"), (2, 2.0, 0.3, "A"), (3, 3.0, 0.1, "A"),
         (4, 4.0, 0.3, "A"), (5, 5.0, 0.3, "A")],
        "ts long, p double, t double, sy string",
    )
    labels = _collect_labels(
        df, fixed_time_return_classification("p", 1, F.col("t"), order_by=["ts"])
    )
    assert labels == [0, 1, 1, None, None]


def test_frac_diff_raises_on_null_prices(spark):
    """Reference kernel errors on null input (src/frac_diff.rs:36-39)."""
    import pytest
    from pyspark.sql import functions as F
    from polars_trading_spark.operators.features import frac_diff

    df = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 2, None), ("A", 3, 12.0)], "symbol string, t long, price double"
    )
    out = df.select(frac_diff("price", 0.5, 1e-3, "symbol", order_by=["t"]).alias("fd"))
    with pytest.raises(Exception, match="frac_diff: input prices contain nulls"):
        out.collect()
