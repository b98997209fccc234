"""Every registry query with an oracle must match DuckDB at sf0.001.

This replicates the driver's t2 differential gate locally (the driver
runs the same comparison at sf0.01).
"""

from __future__ import annotations

import pytest

from polars_trading_spark.registry import QUERIES
from tests._compare import assert_driver_sortable_schema, assert_query_matches_oracle

ORACLE_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, QUERIES[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    sdf = QUERIES[name].spark(spark, sf_dir)
    assert_driver_sortable_schema(QUERIES[name], sdf)
    assert sdf.count() > 0
