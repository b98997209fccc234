from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polars_trading_spark import Config
from polars_trading_spark.sources.sinks import write_trades
from polars_trading_spark.sources.tables import trades_from_events


def test_write_trades_partitioned_layout(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="pts_sink_")
    try:
        with Config(timestamp_column="ts_event"):
            write_trades(trades_from_events(spark, sf_dir), out)
        dirs = glob.glob(f"{out}/__pts_date=*/symbol=*")
        assert len(dirs) > 10  # (date, symbol) partition tree exists
        back = spark.read.parquet(out)
        orig = trades_from_events(spark, sf_dir)
        assert back.count() == orig.count()
        # Partition pruning: a one-day filter must scan a fraction of files.
        one_day = back.where(F.col("__pts_date") == "2024-01-05")
        assert 0 < one_day.count() < back.count()
    finally:
        shutil.rmtree(out, ignore_errors=True)
