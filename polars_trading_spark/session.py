"""SparkSession factory with engine-tuned defaults.

Centralizes the settings every entry point (tests, bench, driver) needs:
UTC session time (the testdata timestamps are tz-naive), Arrow for the
pandas-UDF islands, and AQE so skewed symbol partitions re-plan at
runtime — the knob that matters most at the 100 TB target.

Engine-specific session confs (settable via ``spark.conf.set`` at any
time; read per-query, not cached):

- ``spark.polars_trading.media.partitions`` — width of the media
  codec Arrow islands (functions/multimodal.py ``_media_base``).
  Default: ``sparkContext.defaultParallelism`` (every core), the right
  floor when one media family runs alone; lower it when several media
  queries share a stage so AQE can coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(app_name: str = "polars-trading-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("PTS_SHUFFLE_PARTITIONS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Round 14 (guide §2.2/§2.5): AQE's coalescing floor defaults to
        # 1m, which folds a tiny-but-CPU-dense shuffle (a few MB feeding
        # an Arrow kernel or interpreted-HOF stage) into ONE task — at
        # bench scale that serialized whole query families on a 32-core
        # box (sadf_adf1's window+ADF stage: 6.7s in a single task).
        # 256k keeps such stages parallel without over-splitting the
        # smallest shuffles (a 64k floor A/B'd worse on the suite: the
        # 32-way tiny-partition shuffles of bigram_logprob drew a long
        # GC tail — 6.66s vs 4.14s fresh-JVM median at 256k, the rest
        # of the basket within spread).  Partitions at the 100 TB
        # target are orders of magnitude above either floor, so this
        # only changes behavior where coalescing was collapsing
        # parallelism.  Env-tunable for cluster profiles.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("PTS_AQE_MIN_PARTITION_SIZE", "256k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate turns explode(expr) into a pre-filter
        # that re-expands the exploded expression through every alias —
        # for interpreted HOF pipelines (shingles) that multiplies the
        # tokenizer cost ~10x and pins it below the parallelism barrier.
        # The empty-array pruning it buys is negligible for our shapes.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("PTS_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
