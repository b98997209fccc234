from __future__ import annotations

import glob
import tempfile
import shutil

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


def test_read_trades_csv_and_json_roundtrip(spark):
    import datetime as dt
    from polars_trading_spark.sources.readers import read_trades

    rows = [
        ("2021-01-04T09:30:00.000Z", 1.5, 10, "A"),
        ("2021-01-04T09:31:00.000Z", 2.5, 20, "A"),
    ]
    base = tempfile.mkdtemp(prefix="pts_fmt_")
    try:
        with Config(timestamp_column="ts_event"):
            csv_dir = f"{base}/csv"
            spark.createDataFrame(rows, "ts_event string, price double, size long, symbol string") \
                .write.option("header", "true").csv(csv_dir)
            got = read_trades(spark, csv_dir, format="csv").collect()
            assert {r["price"] for r in got} == {1.5, 2.5}
            assert got[0]["ts_event"].year == 2021

            json_dir = f"{base}/json"
            spark.createDataFrame(rows, "ts_event string, price double, size long, symbol string") \
                .write.json(json_dir)
            got_j = read_trades(spark, json_dir, format="json").collect()
            assert {r["size"] for r in got_j} == {10, 20}

            with Config(price_column="px"):
                import pytest as _pytest
                with _pytest.raises(ValueError):
                    read_trades(spark, csv_dir, format="xml")
    finally:
        shutil.rmtree(base, ignore_errors=True)
