"""Streaming bar operators, driven through a file-based stream source
and checked against the batch operators on the same data."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polars_trading_spark import Config, time_bars
from polars_trading_spark.streaming import streaming_time_bars, streaming_volume_bars

ROWS = [
    ("A", 1.0, 10, dt.datetime(2021, 1, 1, 9, 30, 15)),
    ("A", 2.0, 20, dt.datetime(2021, 1, 1, 9, 30, 45)),
    ("A", 3.0, 30, dt.datetime(2021, 1, 1, 9, 31, 5)),
    ("B", 9.0, 5, dt.datetime(2021, 1, 1, 9, 30, 59)),
    ("A", 4.0, 7, dt.datetime(2021, 1, 1, 9, 40, 0)),
]
SCHEMA = "symbol string, price double, size long, ts_event timestamp"


@pytest.fixture
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="pts_stream_")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, make_query, mode="append"):
    out_dir = tempfile.mkdtemp(prefix="pts_sink_")
    try:
        q = make_query()
        mq = (
            q.writeStream.format("memory")
            .queryName("pts_test_sink")
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        mq.awaitTermination(120)
        return spark.sql("select * from pts_test_sink").collect()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        for active in spark.streams.active:
            active.stop()
        spark.catalog.dropTempView("pts_test_sink")


def test_streaming_time_bars_match_batch(spark, stream_dir):
    with Config(timestamp_column="ts_event"):
        batch = {
            (r["symbol"], r["ts_event"]): r
            for r in time_bars(spark.read.parquet(stream_dir), bar_size="1m").collect()
        }

        def make():
            stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
            return streaming_time_bars(stream, bar_size="1m", watermark="1 minute")

        # Complete mode so the still-inside-watermark final window is
        # visible too (append only emits windows the watermark passed).
        rows = _run_stream(spark, make, mode="complete")
    got = {(r["symbol"], r["ts_event"]): r for r in rows}
    assert set(got) == set(batch)
    for k, r in got.items():
        b = batch[k]
        for c in ("open", "high", "low", "close", "volume", "n_trades"):
            assert r[c] == b[c], (k, c)
        assert r["vwap"] == pytest.approx(b["vwap"])


def test_streaming_volume_bars_state_and_splits(spark, stream_dir):
    with Config(timestamp_column="ts_event"):

        def make():
            stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
            return streaming_volume_bars(stream, bar_size=25)

        rows = _run_stream(spark, make)
    a_bars = sorted([r for r in rows if r["symbol"] == "A"], key=lambda r: r["bar_id"])
    # Symbol A volumes: 10+20+30+7 = 67 → bars of 25, 25 and an open 17.
    assert [r["volume"] for r in a_bars] == [25, 25, 17]
    assert [r["is_final"] for r in a_bars] == [True, True, False]
    # First bar: 10 of trade1 + 15 of trade2 → opens at 1.0, closes at 2.0.
    assert a_bars[0]["open"] == 1.0 and a_bars[0]["close"] == 2.0
    assert a_bars[0]["vwap"] == pytest.approx((10 * 1.0 + 15 * 2.0) / 25)
    b_bars = [r for r in rows if r["symbol"] == "B"]
    assert len(b_bars) == 1 and b_bars[0]["volume"] == 5 and not b_bars[0]["is_final"]


def test_streaming_ewm_std_matches_pandas(spark):
    import pandas as pd
    import numpy as np
    from polars_trading_spark.streaming.ewm import streaming_ewm_std

    rng = np.random.default_rng(11)
    rows = []
    series = {}
    for s in ("A", "B"):
        xs = rng.normal(size=60)
        series[s] = xs
        for i, x in enumerate(xs):
            rows.append((s, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(x)))
    d = tempfile.mkdtemp(prefix="pts_ewm_")
    try:
        schema = "symbol string, ts_event timestamp, ret double"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(d)
        with Config(timestamp_column="ts_event"):

            def make():
                stream = spark.readStream.schema(schema).parquet(d)
                return streaming_ewm_std(stream, "ret", span=10)

            out = _run_stream(spark, make)
        got = {
            (r["symbol"], r["ts_event"]): r["ewm_std"] for r in out
        }
        for s, xs in series.items():
            ref = pd.Series(xs).ewm(span=10).std().tolist()
            for i, r in enumerate(ref):
                key = (s, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i))
                if i == 0:
                    assert got[key] is None
                else:
                    assert got[key] == pytest.approx(r, abs=1e-9)
    finally:
        shutil.rmtree(d, ignore_errors=True)
