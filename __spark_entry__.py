"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 for
the driver's DuckDB differential gate.  All real logic lives in
``polars_trading_spark.registry`` — this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polars_trading_spark.registry import QUERIES  # noqa: E402


def _tune(spark: SparkSession) -> None:
    """Runtime-settable engine confs for sessions we didn't build
    (the driver's): UTC semantics and the optimizer-rule exclusion that
    keeps exploded HOF pipelines linear (see session.py)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    # Keep tiny-but-CPU-dense shuffle stages parallel (see session.py);
    # runtime-settable AQE conf, no-op at real scale.
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        os.environ.get("PTS_AQE_MIN_PARTITION_SIZE", "256k"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _tune(spark)
    flagship = "triple_barrier" if "triple_barrier" in QUERIES else "time_bars"
    return QUERIES[flagship].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def make(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune(spark)
            return QUERIES[name].spark(spark, sf_dir)

        return run

    return {name: make(name) for name in QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted where not SQL-expressible."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
