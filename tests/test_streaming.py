"""Streaming bar operators, driven through a file-based stream source
and checked against the batch operators on the same data."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polars_trading_spark import Config, time_bars

# `pytest -m streaming` runs the full streaming matrix: every
# cross-batch-equality test plus the end-to-end flagship chain smoke.
pytestmark = pytest.mark.streaming
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


class _StubState:
    """Minimal GroupState stand-in for driving update fns batch-by-batch."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_streaming_volume_bars_cross_batch_bar_is_complete():
    """A bar spanning micro-batches must emit once, with OHLCV covering
    every piece from every batch (ADVICE r1, medium)."""
    import pandas as pd
    from polars_trading_spark.streaming.bars import make_volume_update

    update = make_volume_update(25, "ts_event", "price", "size", "symbol", ttl_ms=60000)
    state = _StubState()
    key = ("A", dt.date(2021, 1, 1))
    t0 = dt.datetime(2021, 1, 1, 9, 30, 0)

    def batch(rows):
        return pd.DataFrame(rows, columns=["ts_event", "price", "size"]).astype(
            {"ts_event": "datetime64[us]"}
        )

    # Batch 1: 10@1.0, 20@2.0 → bar0 closes (25), bar1 open with 5@2.0.
    out1 = pd.concat(
        list(update(key, iter([batch([(t0, 1.0, 10), (t0 + dt.timedelta(seconds=30), 2.0, 20)])]), state))
    )
    finals1 = out1[out1["is_final"]]
    assert list(finals1["volume"]) == [25]
    assert list(finals1["open"]) == [1.0] and list(finals1["close"]) == [2.0]
    partial1 = out1[~out1["is_final"]]
    assert list(partial1["volume"]) == [5] and list(partial1["bar_id"]) == [1]
    assert state.timeout_set == 60000

    # Batch 2: 30@3.0 → bar1 closes with 5@2.0 (batch 1) + 20@3.0;
    # its open/ts_start/vwap/n_trades must include the batch-1 piece.
    t1 = t0 + dt.timedelta(minutes=1)
    out2 = pd.concat(list(update(key, iter([batch([(t1, 3.0, 30)])]), state)))
    finals2 = out2[out2["is_final"]]
    assert list(finals2["bar_id"]) == [1]
    assert list(finals2["volume"]) == [25]
    assert finals2.iloc[0]["open"] == 2.0  # carried from batch 1
    assert finals2.iloc[0]["ts_event_start"] == pd.Timestamp(t0 + dt.timedelta(seconds=30))
    assert finals2.iloc[0]["vwap"] == pytest.approx((5 * 2.0 + 20 * 3.0) / 25)
    assert finals2.iloc[0]["n_trades"] == 2
    assert finals2.iloc[0]["high"] == 3.0 and finals2.iloc[0]["low"] == 2.0
    partial2 = out2[~out2["is_final"]]
    assert list(partial2["volume"]) == [10] and list(partial2["bar_id"]) == [2]

    # Timeout path: state is dropped, nothing emitted.
    state.hasTimedOut = True
    assert list(update(key, iter([]), state)) == []
    assert not state.exists


def test_streaming_volume_bars_multi_bar_single_trade_cross_batch():
    """One huge trade closing several bars, entered on a carried bar."""
    import pandas as pd
    from polars_trading_spark.streaming.bars import make_volume_update

    update = make_volume_update(10, "ts_event", "price", "size", "symbol", ttl_ms=None)
    state = _StubState()
    key = ("A", dt.date(2021, 1, 1))
    t0 = dt.datetime(2021, 1, 1, 9, 30, 0)

    def batch(rows):
        return pd.DataFrame(rows, columns=["ts_event", "price", "size"]).astype(
            {"ts_event": "datetime64[us]"}
        )

    out1 = pd.concat(list(update(key, iter([batch([(t0, 5.0, 4)])]), state)))
    assert list(out1["is_final"]) == [False] and list(out1["volume"]) == [4]
    # 26 more: bar0 takes 6, bar1 takes 10, bar2 takes 10, carry 0 → no partial.
    out2 = pd.concat(list(update(key, iter([batch([(t0 + dt.timedelta(seconds=5), 7.0, 26)])]), state)))
    assert list(out2["is_final"]) == [True, True, True]
    assert list(out2["volume"]) == [10, 10, 10]
    assert out2.iloc[0]["open"] == 5.0 and out2.iloc[0]["vwap"] == pytest.approx((4 * 5.0 + 6 * 7.0) / 10)
    assert out2.iloc[1]["open"] == 7.0 and out2.iloc[1]["n_trades"] == 1
    # State: carry 0, next open id 3, no accumulators.
    assert state.get[0] == 0 and state.get[1] == 3 and state.get[8] == 0


def test_streaming_ewm_std_interior_nulls_match_pandas(spark):
    """Interior nulls decay the weights (pandas ignore_na=False) — the
    stream must match the batch pandas path value-for-value (ADVICE r1)."""
    import numpy as np
    import pandas as pd

    xs = [1.0, None, 2.0, 4.0, None, None, 3.0, 8.0]
    rows = [
        ("A", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), x)
        for i, x in enumerate(xs)
    ]
    d = tempfile.mkdtemp(prefix="pts_ewm_null_")
    try:
        schema = "symbol string, ts_event timestamp, ret double"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(d)
        with Config(timestamp_column="ts_event"):
            from polars_trading_spark.streaming.ewm import streaming_ewm_std

            def make():
                stream = spark.readStream.schema(schema).parquet(d)
                return streaming_ewm_std(stream, "ret", span=4)

            out = _run_stream(spark, make)
        got = {r["ts_event"]: r["ewm_std"] for r in out}
        ref = pd.Series([np.nan if x is None else x for x in xs]).ewm(span=4).std().tolist()
        for i, r in enumerate(ref):
            key = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)
            if pd.isna(r) or i == 0:
                assert got[key] is None or pd.isna(got[key])
            else:
                assert got[key] == pytest.approx(r, abs=1e-9), i
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_dedup_exact_drops_reformatted_copies(spark):
    from polars_trading_spark.streaming import streaming_dedup_exact

    docs = [
        (0, "The cat sat on the mat!", dt.datetime(2021, 1, 1, 9, 0, 0)),
        (1, "the cat   sat on the mat", dt.datetime(2021, 1, 1, 9, 1, 0)),  # dup of 0
        (2, "a different document", dt.datetime(2021, 1, 1, 9, 2, 0)),
        (3, "THE CAT SAT ON THE MAT.", dt.datetime(2021, 1, 1, 9, 3, 0)),  # dup of 0
    ]
    schema = "doc_id long, text string, ingest_ts timestamp"
    d = tempfile.mkdtemp(prefix="pts_sdedup_")
    try:
        spark.createDataFrame(docs, schema).coalesce(1).write.mode("overwrite").parquet(d)

        def make():
            stream = spark.readStream.schema(schema).parquet(d)
            return streaming_dedup_exact(stream, watermark="10 minutes")

        rows = _run_stream(spark, make)
        # One survivor per normalized fingerprint: doc 2 plus exactly one
        # of {0, 1, 3} (arrival order within a batch is not contractual).
        ids = {r["doc_id"] for r in rows}
        assert 2 in ids and len(ids) == 2
        assert len({r["fingerprint"] for r in rows}) == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_cusum_matches_batch_across_batches(spark):
    """CUSUM state must carry across micro-batches: split the same data
    into two files (event-time ordered halves) and compare against the
    batch operator's events."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.sampling import cusum_filter
    from polars_trading_spark.streaming import streaming_cusum_filter

    rng = np.random.default_rng(41)
    rows = []
    for sym in ("A", "B"):
        price = 100.0
        t = dt.datetime(2022, 1, 1, 9, 30)
        for _ in range(400):
            t = t + dt.timedelta(seconds=int(rng.integers(1, 10)))
            price = max(1.0, price + float(rng.normal(0, 2.0)))
            rows.append((sym, price, 10, t))
    pdf = pd.DataFrame(rows, columns=["symbol", "price", "size", "ts_event"])
    pdf = pdf.sort_values("ts_event").reset_index(drop=True)

    d = tempfile.mkdtemp(prefix="pts_cusum_stream_")
    try:
        half = len(pdf) // 2
        spark.createDataFrame(pdf.iloc[:half], SCHEMA).coalesce(1).write.parquet(
            f"{d}/f0"
        )
        spark.createDataFrame(pdf.iloc[half:], SCHEMA).coalesce(1).write.parquet(
            f"{d}/f1"
        )
        with Config(timestamp_column="ts_event"):
            batch = sorted(
                (r["symbol"], r["ts_event"], r["side"])
                for r in cusum_filter(
                    spark.createDataFrame(pdf, SCHEMA), 25.0
                ).collect()
            )

            def make():
                stream = (
                    spark.readStream.schema(SCHEMA)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{d}/*")
                )
                return streaming_cusum_filter(stream, 25.0)

            rows_out = _run_stream(spark, make)
        got = sorted((r["symbol"], r["ts_event"], r["side"]) for r in rows_out)
        assert got == batch
        assert len(got) > 4
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_imbalance_bars_match_batch_across_batches(spark):
    """Imbalance-bar state (theta, tick sign, open-bar OHLCV) must carry
    across micro-batches; after supersede (last row per bar_id) the
    stream equals the batch operator."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.imbalance import imbalance_bars
    from polars_trading_spark.streaming import streaming_imbalance_bars

    rng = np.random.default_rng(47)
    rows = []
    for sym in ("A", "B"):
        price = 40.0
        t = dt.datetime(2022, 3, 1, 9, 30)
        for _ in range(300):
            t = t + dt.timedelta(seconds=int(rng.integers(1, 15)))
            price = max(1.0, price + float(rng.choice([-0.5, 0.0, 0.5])))
            rows.append((sym, price, int(rng.integers(10, 500)), t))
    pdf = pd.DataFrame(rows, columns=["symbol", "price", "size", "ts_event"])
    pdf = pdf.sort_values("ts_event").reset_index(drop=True)

    d = tempfile.mkdtemp(prefix="pts_imb_stream_")
    try:
        third = len(pdf) // 3
        for i, lo_hi in enumerate([(0, third), (third, 2 * third), (2 * third, len(pdf))]):
            spark.createDataFrame(pdf.iloc[lo_hi[0] : lo_hi[1]], SCHEMA).coalesce(
                1
            ).write.parquet(f"{d}/f{i}")
        with Config(timestamp_column="ts_event"):
            batch = imbalance_bars(
                spark.createDataFrame(pdf, SCHEMA), threshold=4.0, mode="tick"
            ).toPandas()

            def make():
                stream = (
                    spark.readStream.schema(SCHEMA)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{d}/*")
                )
                return streaming_imbalance_bars(stream, threshold=4.0, mode="tick")

            rows_out = _run_stream(spark, make)
        got = pd.DataFrame([r.asDict() for r in rows_out])
        # supersede: keep the last snapshot/final per (symbol, bar_date, bar_id)
        got = (
            got.sort_values(["symbol", "bar_date", "bar_id", "n_trades"])
            .groupby(["symbol", "bar_date", "bar_id"], as_index=False)
            .last()
        )
        batch = batch.sort_values(["symbol", "ts_event_start"]).reset_index(drop=True)
        got = got.sort_values(["symbol", "ts_event_start"]).reset_index(drop=True)
        assert len(got) == len(batch)
        for col in ("symbol", "open", "high", "low", "close", "volume", "n_trades"):
            assert got[col].tolist() == batch[col].tolist(), col
        assert got["ts_event_start"].tolist() == batch["ts_event_start"].tolist()
        assert got["ts_event_end"].tolist() == batch["ts_event_end"].tolist()
        assert (got["vwap"] - batch["vwap"]).abs().max() < 1e-9
        # at least one bar closed in a batch after its open snapshot
        assert got["bar_id"].nunique() > 4
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_run_scan_seeded_resume_equals_full_scan():
    """_run_scan's (p0, n0) seeding must make a split replay reproduce
    the full-series scan exactly — the contract streaming_run_bars
    relies on across micro-batches."""
    import numpy as np

    from polars_trading_spark.operators.imbalance import _run_scan

    rng = np.random.default_rng(11)
    w = rng.choice([-1.0, 0.0, 1.0], size=3000, p=[0.45, 0.1, 0.45])
    full_ids = _run_scan(w, 7.0)[0]
    p0 = n0 = 0.0
    off = 0
    got = []
    for lo, hi in ((0, 1000), (1000, 1001), (1001, 3000)):
        ids, p0, n0, closed = _run_scan(w[lo:hi], 7.0, p0, n0)
        got.append(ids + off)
        off += closed
    np.testing.assert_array_equal(np.concatenate(got), full_ids)


def test_streaming_run_bars_match_batch_across_batches(spark):
    """Run-bar state (buy/sell accumulators, tick sign, open-bar OHLCV)
    must carry across micro-batches; after supersede the stream equals
    the batch run_bars operator."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.imbalance import run_bars
    from polars_trading_spark.streaming import streaming_run_bars

    rng = np.random.default_rng(53)
    rows = []
    for sym in ("A", "B"):
        price = 40.0
        t = dt.datetime(2022, 3, 1, 9, 30)
        for _ in range(300):
            t = t + dt.timedelta(seconds=int(rng.integers(1, 15)))
            price = max(1.0, price + float(rng.choice([-0.5, 0.0, 0.5])))
            rows.append((sym, price, int(rng.integers(10, 500)), t))
    pdf = pd.DataFrame(rows, columns=["symbol", "price", "size", "ts_event"])
    pdf = pdf.sort_values("ts_event").reset_index(drop=True)

    d = tempfile.mkdtemp(prefix="pts_run_stream_")
    try:
        third = len(pdf) // 3
        for i, lo_hi in enumerate([(0, third), (third, 2 * third), (2 * third, len(pdf))]):
            spark.createDataFrame(pdf.iloc[lo_hi[0] : lo_hi[1]], SCHEMA).coalesce(
                1
            ).write.parquet(f"{d}/f{i}")
        with Config(timestamp_column="ts_event"):
            batch = run_bars(
                spark.createDataFrame(pdf, SCHEMA), threshold=6.0, mode="tick"
            ).toPandas()

            def make():
                stream = (
                    spark.readStream.schema(SCHEMA)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{d}/*")
                )
                return streaming_run_bars(stream, threshold=6.0, mode="tick")

            rows_out = _run_stream(spark, make)
        got = pd.DataFrame([r.asDict() for r in rows_out])
        got = (
            got.sort_values(["symbol", "bar_date", "bar_id", "n_trades"])
            .groupby(["symbol", "bar_date", "bar_id"], as_index=False)
            .last()
        )
        batch = batch.sort_values(["symbol", "ts_event_start"]).reset_index(drop=True)
        got = got.sort_values(["symbol", "ts_event_start"]).reset_index(drop=True)
        assert len(got) == len(batch)
        for col in ("symbol", "open", "high", "low", "close", "volume", "n_trades"):
            assert got[col].tolist() == batch[col].tolist(), col
        assert got["ts_event_start"].tolist() == batch["ts_event_start"].tolist()
        assert got["ts_event_end"].tolist() == batch["ts_event_end"].tolist()
        assert (got["vwap"] - batch["vwap"]).abs().max() < 1e-9
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_null_size_degrades_like_batch(spark):
    """A null size must not kill the stateful query: it degrades to 0
    volume like the batch operator's native sum."""
    import pandas as pd

    from polars_trading_spark.streaming import streaming_imbalance_bars

    rows = [
        ("A", 10.0, 100, dt.datetime(2022, 3, 1, 9, 30, 0)),
        ("A", 11.0, None, dt.datetime(2022, 3, 1, 9, 30, 5)),
        ("A", 12.0, 200, dt.datetime(2022, 3, 1, 9, 30, 10)),
    ]
    pdf = pd.DataFrame(rows, columns=["symbol", "price", "size", "ts_event"])
    d = tempfile.mkdtemp(prefix="pts_nullsize_stream_")
    try:
        spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.parquet(f"{d}/f0")
        with Config(timestamp_column="ts_event"):

            def make():
                stream = spark.readStream.schema(SCHEMA).parquet(f"{d}/*")
                return streaming_imbalance_bars(stream, threshold=100.0, mode="tick")

            rows_out = _run_stream(spark, make)
        got = pd.DataFrame([r.asDict() for r in rows_out])
        assert got["volume"].sum() == 300  # null size counted as 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_backtest_stats_matches_batch_across_batches(spark):
    """The running-stat state must carry across micro-batches: the last
    emitted row per symbol over a three-file replay equals the batch
    operator on the full series (floats to 1e-9, counters exactly)."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.backtest import backtest_stats
    from polars_trading_spark.streaming import streaming_backtest_stats

    rng = np.random.default_rng(23)
    rows = []
    for sym in ("A", "B"):
        price = 100.0
        t = dt.datetime(2022, 1, 1, 9, 30)
        for _ in range(300):
            t = t + dt.timedelta(seconds=int(rng.integers(1, 10)))
            price = max(1.0, price * float(np.exp(rng.normal(0.0003, 0.01))))
            rows.append((sym, price, 10, t))
    pdf = pd.DataFrame(rows, columns=["symbol", "price", "size", "ts_event"])
    pdf = pdf.sort_values("ts_event").reset_index(drop=True)

    batch = (
        backtest_stats(
            spark.createDataFrame(pdf, SCHEMA),
            periods_per_year=252.0,
            ts_col="ts_event",
            close_col="price",
        )
        .toPandas()
        .set_index("symbol")
    )

    d = tempfile.mkdtemp(prefix="pts_bt_stream_")
    try:
        third = len(pdf) // 3
        for i, lo in enumerate((0, third, 2 * third)):
            hi = len(pdf) if i == 2 else lo + third
            spark.createDataFrame(pdf.iloc[lo:hi], SCHEMA).coalesce(1).write.parquet(
                f"{d}/f{i}"
            )
        def make():
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_backtest_stats(
                stream, periods_per_year=252.0, close_col="price"
            )

        rows_out = _run_stream(spark, make, mode="update")
        got = (
            pd.DataFrame([r.asDict() for r in rows_out])
            .sort_values("n_periods")
            .groupby("symbol")
            .last()  # highest-n row per symbol = full-prefix stats
        )
        for sym in ("A", "B"):
            for col in ("ann_return", "ann_vol", "sharpe", "psr_z", "skew",
                        "kurtosis", "hit_ratio", "max_drawdown"):
                assert got.loc[sym, col] == pytest.approx(
                    batch.loc[sym, col], rel=1e-9
                ), (sym, col)
            assert int(got.loc[sym, "n_periods"]) == int(batch.loc[sym, "n_periods"])
            assert int(got.loc[sym, "max_tuw"]) == int(batch.loc[sym, "max_tuw"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_pack_sequences_carries_fill_across_batches(spark):
    """A sequence left partially filled by batch 1 must be continued by
    batch 2 (offset > 0), and every sequence respects the budget except
    single oversized documents."""
    import pandas as pd

    from polars_trading_spark.streaming import streaming_pack_sequences

    schema = "doc_id long, text string"
    # One shard (n_shards=1). Budget 10. Batch 1: docs of 4+4 tokens
    # -> seq 0 filled to 8. Batch 2 first doc (2 tokens) completes seq 0
    # at offset 8; next doc opens seq 1; a 15-token doc gets its own seq.
    b1 = pd.DataFrame({"doc_id": [0, 1], "text": ["w " * 4, "w " * 4]})
    b2 = pd.DataFrame(
        {"doc_id": [2, 3, 4], "text": ["w " * 2, "w " * 7, "w " * 15]}
    )
    d = tempfile.mkdtemp(prefix="pts_pack_stream_")
    try:
        spark.createDataFrame(b1, schema).coalesce(1).write.parquet(f"{d}/f0")
        spark.createDataFrame(b2, schema).coalesce(1).write.parquet(f"{d}/f1")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_pack_sequences(
                stream, budget_tokens=10, n_shards=1
            )

        rows = _run_stream(spark, make, mode="update")
        out = (
            pd.DataFrame([r.asDict() for r in rows])
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.doc_id.tolist() == [0, 1, 2, 3, 4]
        assert out.seq_id.tolist() == [0, 0, 0, 1, 2]
        assert out.seq_offset.tolist() == [0, 4, 8, 0, 0]
        # oversized doc alone in its own sequence
        assert out[out.doc_id == 4].n_tokens.iloc[0] == 15
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_range_scan_seeded_resume_equals_full_scan():
    """_range_scan's carried-open seeding must make a split replay
    reproduce the full-series scan exactly — the contract
    streaming_range_bars relies on across micro-batches."""
    import numpy as np

    from polars_trading_spark.operators.bars import _range_scan

    rng = np.random.default_rng(17)
    p = 50.0 + np.cumsum(rng.choice([-0.5, 0.0, 0.5], size=3000))
    full_ids = _range_scan(p, 4.0)[0]
    o0 = None
    off = 0
    got = []
    for lo, hi in ((0, 900), (900, 901), (901, 3000)):
        ids, o0, closed = _range_scan(p[lo:hi], 4.0, o0)
        got.append(ids + off)
        off += closed
    np.testing.assert_array_equal(np.concatenate(got), full_ids)


def test_streaming_range_bars_match_batch_across_batches(spark):
    """The open-bar opening price must carry across micro-batches;
    after supersede the stream equals the batch range_bars operator."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.bars import range_bars
    from polars_trading_spark.streaming import streaming_range_bars

    rng = np.random.default_rng(59)
    rows = []
    for sym in ("A", "B"):
        price = 40.0
        t = dt.datetime(2022, 3, 1, 9, 30)
        for _ in range(300):
            t = t + dt.timedelta(seconds=int(rng.integers(1, 15)))
            price = max(1.0, price + float(rng.choice([-0.5, 0.0, 0.5])))
            rows.append((sym, price, int(rng.integers(10, 500)), t))
    pdf = pd.DataFrame(rows, columns=["symbol", "price", "size", "ts_event"])
    pdf = pdf.sort_values("ts_event").reset_index(drop=True)

    d = tempfile.mkdtemp(prefix="pts_range_stream_")
    try:
        third = len(pdf) // 3
        for i, lo_hi in enumerate([(0, third), (third, 2 * third), (2 * third, len(pdf))]):
            spark.createDataFrame(pdf.iloc[lo_hi[0] : lo_hi[1]], SCHEMA).coalesce(
                1
            ).write.parquet(f"{d}/f{i}")
        with Config(timestamp_column="ts_event"):
            batch = range_bars(spark.createDataFrame(pdf, SCHEMA), 3.0).toPandas()

            def make():
                stream = (
                    spark.readStream.schema(SCHEMA)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(f"{d}/*")
                )
                return streaming_range_bars(stream, range_size=3.0)

            rows_out = _run_stream(spark, make)
        got = pd.DataFrame([r.asDict() for r in rows_out])
        got = (
            got.sort_values(["symbol", "bar_date", "bar_id", "n_trades"])
            .groupby(["symbol", "bar_date", "bar_id"], as_index=False)
            .last()
        )
        batch = batch.sort_values(["symbol", "ts_event_start"]).reset_index(drop=True)
        got = got.sort_values(["symbol", "ts_event_start"]).reset_index(drop=True)
        assert len(got) == len(batch)
        for col in ("symbol", "open", "high", "low", "close", "volume", "n_trades"):
            assert got[col].tolist() == batch[col].tolist(), col
        assert got["ts_event_start"].tolist() == batch["ts_event_start"].tolist()
        assert got["ts_event_end"].tolist() == batch["ts_event_end"].tolist()
        assert (got["vwap"] - batch["vwap"]).abs().max() < 1e-9
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_sessionize_match_batch_across_batches(spark):
    """Open-session state must carry across micro-batches; after
    supersede the stream equals the batch sessionize operator."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.functions.events import sessionize
    from polars_trading_spark.streaming import streaming_sessionize

    rng = np.random.default_rng(71)
    rows = []
    for user in (1, 2, 3):
        t = dt.datetime(2022, 3, 1, 9, 0)
        for _ in range(120):
            # mixture of short gaps and occasional session breaks
            step = int(rng.choice([30, 60, 120, 2400], p=[0.4, 0.3, 0.2, 0.1]))
            t = t + dt.timedelta(seconds=step)
            rows.append((user, t))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"]).sort_values("ts").reset_index(drop=True)
    schema = "user_id long, ts timestamp"

    d = tempfile.mkdtemp(prefix="pts_sess_stream_")
    try:
        third = len(pdf) // 3
        for i, (lo, hi) in enumerate([(0, third), (third, 2 * third), (2 * third, len(pdf))]):
            spark.createDataFrame(pdf.iloc[lo:hi], schema).coalesce(1).write.parquet(f"{d}/f{i}")
        batch = sessionize(spark.createDataFrame(pdf, schema), gap="10m").toPandas()

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_sessionize(stream, gap="10m", state_ttl=None)

        rows_out = _run_stream(spark, make)
        got = pd.DataFrame([r.asDict() for r in rows_out])
        got = (
            got.sort_values(["user_id", "session_id", "n_events"])
            .groupby(["user_id", "session_id"], as_index=False)
            .last()
        )
        batch = batch.sort_values(["user_id", "session_id"]).reset_index(drop=True)
        got = got.sort_values(["user_id", "session_id"]).reset_index(drop=True)
        assert len(got) == len(batch)
        for col in ("user_id", "session_id", "n_events"):
            assert got[col].tolist() == batch[col].tolist(), col
        assert got["session_start"].tolist() == batch["session_start"].tolist()
        assert got["session_end"].tolist() == batch["session_end"].tolist()
        assert (got["duration_s"] - batch["duration_s"]).abs().max() < 1e-9
        # at least one session closed mid-stream
        assert got["session_id"].max() > 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_event_funnel_match_batch(spark):
    """Funnel state must carry across micro-batches; with in-order
    delivery the final snapshot per user equals the batch operator."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.functions.events import event_funnel
    from polars_trading_spark.streaming import streaming_event_funnel

    steps = ["view", "click", "signup", "purchase"]
    rng = np.random.default_rng(83)
    rows = []
    t = dt.datetime(2022, 3, 1, 9, 0)
    for _ in range(400):
        t = t + dt.timedelta(seconds=int(rng.integers(5, 120)))
        rows.append((int(rng.integers(1, 9)), t, str(rng.choice(steps + ["error"]))))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"]).sort_values("ts").reset_index(drop=True)
    schema = "user_id long, ts timestamp, event_type string"

    d = tempfile.mkdtemp(prefix="pts_funnel_stream_")
    try:
        third = len(pdf) // 3
        for i, (lo, hi) in enumerate([(0, third), (third, 2 * third), (2 * third, len(pdf))]):
            spark.createDataFrame(pdf.iloc[lo:hi], schema).coalesce(1).write.parquet(f"{d}/f{i}")
        batch = event_funnel(spark.createDataFrame(pdf, schema), steps).toPandas()

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_event_funnel(stream, steps)

        rows_out = _run_stream(spark, make)
        got = pd.DataFrame([r.asDict() for r in rows_out])
        # keep the deepest (latest) snapshot per user
        got = (
            got.sort_values(["user_id", "depth"])
            .groupby("user_id", as_index=False)
            .last()
        )
        batch = batch.sort_values("user_id").reset_index(drop=True)
        got = got.sort_values("user_id").reset_index(drop=True)
        assert got["user_id"].tolist() == batch["user_id"].tolist()
        assert got["depth"].tolist() == batch["depth"].tolist()
        for s in steps:
            a = got[f"ts_{s}"].tolist()
            b = batch[f"ts_{s}"].tolist()
            for x, y in zip(a, b):
                if pd.isna(y):
                    assert pd.isna(x)
                else:
                    assert x == y, s
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_flagship_chain_end_to_end(spark):
    """End-to-end smoke of the flagship chain over a file-stream replay:
    trades land as three micro-batch files -> streaming time bars ->
    fixed-time return labels on the streamed bars.  The whole chain must
    equal the batch chain (time_bars -> fixed_time_return) on the same
    data — streamed ingest is not allowed to change a single label."""
    import polars_trading_spark.operators.labels as labels

    rng_rows = []
    base = dt.datetime(2021, 1, 4, 9, 30, 0)
    for sym, p0 in (("A", 100.0), ("B", 50.0)):
        for i in range(90):
            rng_rows.append(
                (
                    sym,
                    p0 + ((i * 7919) % 23 - 11) * 0.05,
                    10 + (i * 13) % 40,
                    base + dt.timedelta(seconds=20 * i),
                )
            )
    d = tempfile.mkdtemp(prefix="pts_e2e_stream_")
    try:
        # three replay files = three micro-batches
        df = spark.createDataFrame(rng_rows, SCHEMA)
        for part in range(3):
            df.where(F.floor(F.minute("ts_event") / 10) % 3 == part).coalesce(
                1
            ).write.mode("append").parquet(d)

        with Config(timestamp_column="ts_event"):
            bars_batch = time_bars(spark.read.parquet(d), bar_size="1m")

            def make():
                stream = (
                    spark.readStream.schema(SCHEMA)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(d)
                )
                return streaming_time_bars(
                    stream, bar_size="1m", watermark="1 minute"
                )

            streamed = _run_stream(spark, make, mode="complete")

        bars_stream = spark.createDataFrame(
            [tuple(r[f] for f in bars_batch.schema.fieldNames()) for r in streamed],
            bars_batch.schema,
        )

        def label(bars):
            return bars.withColumn(
                "fwd_ret",
                labels.fixed_time_return(
                    "close", window=3, symbol="symbol", order_by=["ts_event"]
                ),
            ).select("symbol", "ts_event", "close", "fwd_ret")

        got = {
            (r["symbol"], r["ts_event"]): r for r in label(bars_stream).collect()
        }
        want = {
            (r["symbol"], r["ts_event"]): r for r in label(bars_batch).collect()
        }
        assert set(got) == set(want) and len(want) > 10
        for k in want:
            assert got[k]["close"] == want[k]["close"], k
            if want[k]["fwd_ret"] is None:
                assert got[k]["fwd_ret"] is None, k
            else:
                assert got[k]["fwd_ret"] == pytest.approx(want[k]["fwd_ret"]), k
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_chunk_documents_stateless(spark):
    """chunk_documents is pure projection+explode — it must run
    unmodified on a streaming frame (append mode, no state, no
    watermark) and emit exactly the batch chunks."""
    from polars_trading_spark.functions.corpus import chunk_documents

    d = tempfile.mkdtemp(prefix="pts_chunk_stream_")
    try:
        rows = [(i, " ".join(f"w{i}_{j}" for j in range(30))) for i in range(8)]
        sch = "doc_id long, text string"
        spark.createDataFrame(rows, sch).coalesce(1).write.mode("overwrite").parquet(d)
        batch = sorted(
            map(tuple, chunk_documents(spark.read.parquet(d), chunk_tokens=12, overlap=3).collect())
        )

        def make():
            stream = spark.readStream.schema(sch).parquet(d)
            return chunk_documents(stream, chunk_tokens=12, overlap=3)

        streamed = sorted(map(tuple, _run_stream(spark, make, mode="append")))
        assert streamed == batch and len(batch) > 8
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_hawkes_matches_batch_across_batches(spark):
    """Hawkes segment state (open-segment running sum + two prior
    segment totals) must carry across micro-batches: a bursty tape
    split into two files must reproduce the batch intensities."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.hawkes import hawkes_intensity
    from polars_trading_spark.streaming import streaming_hawkes_intensity

    rng = np.random.default_rng(23)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 1, 1, 9, 30)
        for i in range(300):
            gap = 2.0 if 50 <= i < 60 else float(rng.exponential(60))
            t = t + dt.timedelta(seconds=gap)
            rows.append((sym, t, len(rows)))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq"])
    pdf = pdf.sort_values(["ts_event", "seq"]).reset_index(drop=True)
    schema = "symbol string, ts_event timestamp, seq long"

    # beta=0.01 -> W=3200s: the tape crosses many segment boundaries
    beta = 0.01
    batch = {
        (r["symbol"], r["seq"]): (r["intensity"], r["excitation"])
        for r in hawkes_intensity(
            spark.createDataFrame(pdf, schema), beta=beta
        ).collect()
    }

    d = tempfile.mkdtemp(prefix="pts_hawkes_stream_")
    try:
        half = len(pdf) // 2
        spark.createDataFrame(pdf.iloc[:half], schema).coalesce(1).write.parquet(
            f"{d}/f0"
        )
        spark.createDataFrame(pdf.iloc[half:], schema).coalesce(1).write.parquet(
            f"{d}/f1"
        )

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_hawkes_intensity(stream, beta=beta)

        rows_out = _run_stream(spark, make)
        assert len(rows_out) == len(pdf)
        for r in rows_out:
            bi, be = batch[(r["symbol"], r["seq"])]
            assert r["intensity"] == pytest.approx(bi, rel=1e-9, abs=1e-12)
            assert r["excitation"] == pytest.approx(be, rel=1e-9, abs=1e-12)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_rsi_matches_batch_across_batches(spark):
    """RSI chunk state (last price, diff count, open-chunk sums, two
    prior chunk totals) must carry across micro-batches."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.rsi import rsi
    from polars_trading_spark.streaming import streaming_rsi

    rng = np.random.default_rng(29)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 1, 1, 9, 30)
        price = 100.0
        for i in range(260):
            t = t + dt.timedelta(seconds=float(rng.exponential(30)) + 0.001)
            price = max(1.0, price + float(rng.normal(0, 1.5)))
            rows.append((sym, t, len(rows), price))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "price"])
    pdf = pdf.sort_values(["ts_event", "seq"]).reset_index(drop=True)
    schema = "symbol string, ts_event timestamp, seq long, price double"

    # period=2 -> chunk_len=64: each symbol's 260 diffs cross chunk
    # boundaries several times, and the two-file split lands mid-chunk
    period = 2
    batch = {
        (r["symbol"], r["seq"]): r["rsi"]
        for r in rsi(
            spark.createDataFrame(pdf, schema), period=period, seq_col="seq"
        ).collect()
    }

    d = tempfile.mkdtemp(prefix="pts_rsi_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_rsi(stream, period=period)

        rows_out = _run_stream(spark, make)
        assert len(rows_out) == len(pdf)
        for r in rows_out:
            b = batch[(r["symbol"], r["seq"])]
            if b is None:
                assert r["rsi"] is None, r["seq"]
            else:
                assert r["rsi"] == pytest.approx(b, rel=1e-9, abs=1e-9), r["seq"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_realized_moments_matches_batch_across_batches(spark):
    """Per-(symbol, day) power-sum state (last log price, n, s2..s4)
    must carry across micro-batches; the final update row per key
    equals the batch operator over the full tape."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.volatility import realized_moments
    from polars_trading_spark.streaming import streaming_realized_moments

    rng = np.random.default_rng(31)
    rows = []
    for sym in ("A", "B"):
        for day in (1, 2):
            t = dt.datetime(2022, 1, day, 9, 30)
            price = 100.0
            for _ in range(120):
                t = t + dt.timedelta(seconds=float(rng.exponential(40)) + 0.001)
                price = max(1.0, price + float(rng.normal(0, 0.8)))
                rows.append((sym, t, len(rows), price))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "price"])
    pdf = pdf.sort_values(["ts_event", "seq"]).reset_index(drop=True)
    schema = "symbol string, ts_event timestamp, seq long, price double"

    with Config(timestamp_column="ts_event"):
        batch = {
            (r["symbol"], str(r["day"])): r
            for r in realized_moments(
                spark.createDataFrame(pdf, schema), seq_col="seq"
            ).collect()
        }

    d = tempfile.mkdtemp(prefix="pts_moments_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_realized_moments(stream)

        rows_out = _run_stream(spark, make, mode="update")
        # keep each key's LAST update (largest n_returns)
        final = {}
        for r in rows_out:
            key = (r["symbol"], str(r["day"]))
            if key not in final or r["n_returns"] > final[key]["n_returns"]:
                final[key] = r
        assert set(final) == set(batch)
        for key, r in final.items():
            b = batch[key]
            assert r["n_returns"] == b["n_returns"], key
            for c in ("rv", "rskew", "rkurt"):
                if b[c] is None:
                    assert r[c] is None, (key, c)
                else:
                    assert r[c] == pytest.approx(b[c], rel=1e-9, abs=1e-12), (key, c)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_two_scale_rv_matches_batch_across_batches(spark):
    """The O(K) log-price tail must carry lag-K subgrid diffs across
    micro-batch boundaries; final update row per key equals batch."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.volatility import two_scale_rv
    from polars_trading_spark.streaming import streaming_two_scale_rv

    rng = np.random.default_rng(37)
    rows = []
    for sym in ("A", "B"):
        for day in (1, 2):
            t = dt.datetime(2022, 1, day, 9, 30)
            price = 100.0
            for _ in range(90):
                t = t + dt.timedelta(seconds=float(rng.exponential(50)) + 0.001)
                price = max(1.0, price + float(rng.normal(0, 0.6)))
                rows.append((sym, t, len(rows), price))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "price"])
    pdf = pdf.sort_values(["ts_event", "seq"]).reset_index(drop=True)
    schema = "symbol string, ts_event timestamp, seq long, price double"

    with Config(timestamp_column="ts_event"):
        batch = {
            (r["symbol"], str(r["day"])): r
            for r in two_scale_rv(
                spark.createDataFrame(pdf, schema), k=5, seq_col="seq"
            ).collect()
        }

    d = tempfile.mkdtemp(prefix="pts_tsrv_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_two_scale_rv(stream, k=5)

        rows_out = _run_stream(spark, make, mode="update")
        final = {}
        for r in rows_out:
            key = (r["symbol"], str(r["day"]))
            if key not in final or r["n_ticks"] > final[key]["n_ticks"]:
                final[key] = r
        assert set(final) == set(batch)
        for key, r in final.items():
            b = batch[key]
            assert r["n_ticks"] == b["n_ticks"] and r["n_returns"] == b["n_returns"]
            for c in ("rv_all", "rv_sub_avg", "tsrv"):
                if b[c] is None:
                    assert r[c] is None, (key, c)
                else:
                    assert r[c] == pytest.approx(b[c], rel=1e-9, abs=1e-12), (key, c)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_ulcer_matches_batch_across_batches(spark):
    """Drawdown-path state (last close, cum, peak, sdd2) must carry
    across micro-batches; final update row per symbol equals batch
    ulcer_index."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.backtest import ulcer_index
    from polars_trading_spark.streaming import streaming_ulcer

    rng = np.random.default_rng(41)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 1, 1, 9, 30)
        price = 100.0
        for _ in range(200):
            t = t + dt.timedelta(seconds=float(rng.exponential(30)) + 0.001)
            price = max(1.0, price * float(np.exp(rng.normal(0.0002, 0.01))))
            rows.append((sym, t, len(rows), price))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "price"])
    pdf = pdf.sort_values(["ts_event", "seq"]).reset_index(drop=True)
    schema = "symbol string, ts_event timestamp, seq long, price double"

    batch = {
        r["symbol"]: r
        for r in ulcer_index(
            spark.createDataFrame(pdf, schema),
            periods_per_year=252.0,
            ts_col="ts_event",
            close_col="price",
        ).collect()
    }

    d = tempfile.mkdtemp(prefix="pts_ulcer_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_ulcer(stream, periods_per_year=252.0)

        rows_out = _run_stream(spark, make, mode="update")
        final = {}
        for r in rows_out:
            if r["symbol"] not in final or r["n_periods"] > final[r["symbol"]]["n_periods"]:
                final[r["symbol"]] = r
        assert set(final) == set(batch)
        for sym, r in final.items():
            b = batch[sym]
            assert r["n_periods"] == b["n_periods"]
            for c in ("ann_return", "ulcer", "martin"):
                if b[c] is None:
                    assert r[c] is None, (sym, c)
                else:
                    assert r[c] == pytest.approx(b[c], rel=1e-9, abs=1e-12), (sym, c)
            assert 0.0 <= r["cur_drawdown"] < 1.0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_return_acf_matches_batch_across_batches(spark):
    """Per-symbol ACF state (last log close, return ring, running lag
    sums) must carry across micro-batches; the final update row per
    symbol equals the batch operator over the full tape."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.regime import return_acf
    from polars_trading_spark.streaming import streaming_return_acf

    lags = (1, 2, 3)
    rng = np.random.default_rng(47)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 9, 30)
        price = 100.0
        for _ in range(90):
            t = t + dt.timedelta(seconds=float(rng.exponential(30)) + 0.001)
            price = max(1.0, price * (1.0 + float(rng.normal(0, 0.004))))
            rows.append((sym, t, len(rows), price))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "close"])
    pdf = pdf.sort_values(["ts_event", "seq"]).reset_index(drop=True)
    schema = "symbol string, ts_event timestamp, seq long, close double"

    batch = {
        r["symbol"]: r
        for r in return_acf(
            spark.createDataFrame(pdf, schema), lags=lags, ts_col="ts_event"
        ).collect()
    }

    d = tempfile.mkdtemp(prefix="pts_acf_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_return_acf(stream, lags=lags)

        rows_out = _run_stream(spark, make, mode="update")
        final = {}
        for r in rows_out:
            if r["symbol"] not in final or r["n_obs"] > final[r["symbol"]]["n_obs"]:
                final[r["symbol"]] = r
        assert set(final) == set(batch)
        for sym, r in final.items():
            b = batch[sym]
            assert r["n_obs"] == b["n_obs"], sym
            for c in [f"acf_{k}" for k in lags] + ["ljung_box_q"]:
                if b[c] is None:
                    assert r[c] is None, (sym, c)
                else:
                    assert r[c] == pytest.approx(b[c], rel=1e-9, abs=1e-12), (sym, c)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_return_acf_short_series_nulls(spark):
    """Below max(lag) + 2 returns every metric is null, matching batch."""
    import pandas as pd

    from polars_trading_spark.streaming import streaming_return_acf

    pdf = pd.DataFrame(
        {
            "symbol": ["A"] * 3,
            "ts_event": [dt.datetime(2022, 3, 1, 9, 30, s) for s in range(3)],
            "seq": range(3),
            "close": [100.0, 101.0, 100.5],
        }
    )
    schema = "symbol string, ts_event timestamp, seq long, close double"
    d = tempfile.mkdtemp(prefix="pts_acf_short_")
    try:
        spark.createDataFrame(pdf, schema).coalesce(1).write.parquet(f"{d}/f0")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_return_acf(stream, lags=(1, 2))

        rows_out = _run_stream(spark, make, mode="update")
        assert rows_out
        last = max(rows_out, key=lambda r: r["n_obs"])
        assert last["n_obs"] == 2
        assert last["acf_1"] is None and last["ljung_box_q"] is None
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_return_acf_rejects_bad_lags(spark):
    from polars_trading_spark.streaming import streaming_return_acf

    with pytest.raises(ValueError):
        streaming_return_acf(spark.readStream.format("rate").load(), lags=())


def test_streaming_atr_matches_batch_across_batches(spark):
    """ATR state (prev close + EWM chunk totals) must carry across
    micro-batches; every emitted row equals the batch operator."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.indicators import atr
    from polars_trading_spark.streaming import streaming_atr

    rng = np.random.default_rng(53)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 9, 30)
        close = 100.0
        for i in range(120):
            t = t + dt.timedelta(minutes=15)
            close = max(5.0, close + float(rng.normal(0, 1)))
            spread = abs(float(rng.normal(0, 0.5))) + 0.01
            rows.append(
                (sym, t, len(rows), close + spread, close - spread, close)
            )
    pdf = pd.DataFrame(
        rows, columns=["symbol", "ts_event", "seq", "high", "low", "close"]
    )
    schema = (
        "symbol string, ts_event timestamp, seq long, high double, "
        "low double, close double"
    )

    batch = {
        (r["symbol"], r["seq"]): r
        for r in atr(
            spark.createDataFrame(pdf, schema).withColumn("seq", F.col("seq"))
        ).collect()
    }

    d = tempfile.mkdtemp(prefix="pts_atr_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_atr(stream)

        rows_out = _run_stream(spark, make, mode="append")
        assert len(rows_out) == len(pdf)
        for r in rows_out:
            b = batch[(r["symbol"], r["seq"])]
            for c in ("tr", "atr", "natr"):
                assert r[c] == pytest.approx(b[c], rel=1e-9, abs=1e-12), (
                    r["symbol"], r["seq"], c,
                )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_macd_matches_batch_across_batches(spark):
    """Three resumable EWM folds; small spans force chunk rollovers
    inside the replay so the carried chunk totals are exercised."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.indicators import macd
    from polars_trading_spark.streaming import streaming_macd

    rng = np.random.default_rng(59)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 9, 30)
        close = 100.0
        for _ in range(200):
            t = t + dt.timedelta(minutes=15)
            close = max(5.0, close + float(rng.normal(0, 1)))
            rows.append((sym, t, len(rows), close))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "close"])
    schema = "symbol string, ts_event timestamp, seq long, close double"

    fast, slow, signal = 3, 5, 2  # chunk lens 47/79/30 — all roll over
    batch = {
        (r["symbol"], r["seq"]): r
        for r in macd(
            spark.createDataFrame(pdf, schema), fast=fast, slow=slow, signal=signal
        ).collect()
    }

    d = tempfile.mkdtemp(prefix="pts_macd_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_macd(stream, fast=fast, slow=slow, signal=signal)

        rows_out = _run_stream(spark, make, mode="append")
        assert len(rows_out) == len(pdf)
        for r in rows_out:
            b = batch[(r["symbol"], r["seq"])]
            for c in ("macd", "macd_signal", "macd_hist"):
                assert r[c] == pytest.approx(b[c], rel=1e-9, abs=1e-10), (
                    r["symbol"], r["seq"], c,
                )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_indicators_validation(spark):
    from polars_trading_spark.streaming import streaming_atr, streaming_macd

    rate = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        streaming_atr(rate, period=1)
    with pytest.raises(ValueError):
        streaming_macd(rate, fast=26, slow=12)


def test_streaming_obv_matches_batch_exactly(spark):
    """OBV is an integer fold — streaming equals batch with NO float
    tolerance, including across micro-batch boundaries."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.indicators import obv
    from polars_trading_spark.streaming import streaming_obv

    rng = np.random.default_rng(61)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 9, 30)
        close = 100.0
        for _ in range(90):
            t = t + dt.timedelta(minutes=15)
            step = float(rng.normal(0, 1))
            close = max(5.0, close + (0.0 if abs(step) < 0.1 else step))
            rows.append((sym, t, len(rows), close, int(rng.integers(1, 5000))))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "close", "volume"])
    schema = "symbol string, ts_event timestamp, seq long, close double, volume long"

    batch = {
        (r["symbol"], r["seq"]): r["obv"]
        for r in obv(spark.createDataFrame(pdf, schema)).collect()
    }
    d = tempfile.mkdtemp(prefix="pts_obv_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_obv(stream)

        rows_out = _run_stream(spark, make, mode="append")
        assert len(rows_out) == len(pdf)
        for r in rows_out:
            assert r["obv"] == batch[(r["symbol"], r["seq"])]  # exact
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_stochastic_matches_batch_across_batches(spark):
    """%K/%D ring state must carry across boundaries, including the
    pre-window null gate and degenerate flat-range nulls."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.indicators import stochastic
    from polars_trading_spark.streaming import streaming_stochastic

    rng = np.random.default_rng(67)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 9, 30)
        close = 100.0
        for i in range(90):
            t = t + dt.timedelta(minutes=15)
            close = max(5.0, close + float(rng.normal(0, 1)))
            spread = abs(float(rng.normal(0, 0.5))) + 0.01
            rows.append((sym, t, len(rows), close + spread, close - spread, close))
    pdf = pd.DataFrame(
        rows, columns=["symbol", "ts_event", "seq", "high", "low", "close"]
    )
    schema = (
        "symbol string, ts_event timestamp, seq long, high double, "
        "low double, close double"
    )
    kw, dw = 14, 3
    batch = {
        (r["symbol"], r["seq"]): r
        for r in stochastic(
            spark.createDataFrame(pdf, schema), k_window=kw, d_window=dw
        ).collect()
    }
    d = tempfile.mkdtemp(prefix="pts_sto_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_stochastic(stream, k_window=kw, d_window=dw)

        rows_out = _run_stream(spark, make, mode="append")
        assert len(rows_out) == len(pdf)
        for r in rows_out:
            b = batch[(r["symbol"], r["seq"])]
            for c in ("pct_k", "pct_d"):
                if b[c] is None:
                    assert r[c] is None, (r["symbol"], r["seq"], c)
                else:
                    assert r[c] == pytest.approx(b[c], rel=1e-9), (
                        r["symbol"], r["seq"], c,
                    )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_bollinger_matches_batch_across_batches(spark):
    """Ring of the last window-1 closes must carry across micro-batch
    boundaries; every emitted row equals the batch operator."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.indicators import bollinger
    from polars_trading_spark.streaming import streaming_bollinger

    rng = np.random.default_rng(71)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 9, 30)
        close = 100.0
        for _ in range(90):
            t = t + dt.timedelta(minutes=15)
            close = max(5.0, close + float(rng.normal(0, 1)))
            rows.append((sym, t, len(rows), close))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "close"])
    schema = "symbol string, ts_event timestamp, seq long, close double"
    w, k = 20, 2.0
    batch = {
        (r["symbol"], r["seq"]): r
        for r in bollinger(
            spark.createDataFrame(pdf, schema), window=w, num_std=k
        ).collect()
    }
    d = tempfile.mkdtemp(prefix="pts_bb_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_bollinger(stream, window=w, num_std=k)

        rows_out = _run_stream(spark, make, mode="append")
        assert len(rows_out) == len(pdf)
        for r in rows_out:
            b = batch[(r["symbol"], r["seq"])]
            for c in ("bb_mid", "bb_upper", "bb_lower", "pct_b", "bb_bandwidth"):
                if b[c] is None:
                    assert r[c] is None, (r["symbol"], r["seq"], c)
                else:
                    assert r[c] == pytest.approx(b[c], rel=1e-9), (
                        r["symbol"], r["seq"], c,
                    )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_session_vwap_matches_batch_with_day_rolls(spark):
    """Session sums must reset on the UTC day roll whether the roll
    lands inside a micro-batch or between batches."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.execution import session_vwap
    from polars_trading_spark.streaming import streaming_session_vwap

    rng = np.random.default_rng(73)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 22, 0)  # starts 2h before midnight
        for i in range(120):
            t = t + dt.timedelta(minutes=37)  # spans ~3 UTC days
            rows.append(
                (
                    sym,
                    t,
                    len(rows),
                    100.0 + float(rng.normal(0, 2)),
                    int(rng.integers(1, 900)),
                )
            )
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "price", "size"])
    schema = (
        "symbol string, ts_event timestamp, seq long, price double, size long"
    )

    batch = {
        (r["symbol"], r["seq"]): r
        for r in session_vwap(
            spark.createDataFrame(pdf, schema),
            symbol_col="symbol",
            ts_col="ts_event",
            price_col="price",
            size_col="size",
            seq_col="seq",
        ).collect()
    }
    d = tempfile.mkdtemp(prefix="pts_svwap_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_session_vwap(stream)

        rows_out = _run_stream(spark, make, mode="append")
        assert len(rows_out) == len(pdf)
        days = set()
        for r in rows_out:
            b = batch[(r["symbol"], r["seq"])]
            assert r["session_day"] == b["session_day"]
            assert r["cum_volume"] == b["cum_volume"]  # integer exact
            assert r["session_vwap"] == pytest.approx(
                b["session_vwap"], rel=1e-9
            )
            days.add(r["session_day"])
        assert len(days) >= 3  # the tape really spans day rolls
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_donchian_matches_batch_across_batches(spark):
    """High/low rings and the previous-bar channel must carry across
    micro-batch boundaries; every emitted row equals the batch operator
    (bands exact — rolling extrema have no float-fold ambiguity)."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.indicators import donchian
    from polars_trading_spark.streaming import streaming_donchian

    rng = np.random.default_rng(79)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 9, 30)
        close = 100.0
        for _ in range(90):
            t = t + dt.timedelta(minutes=15)
            close = max(5.0, close + float(rng.normal(0, 2)))
            spread = abs(float(rng.normal(0, 1))) + 0.01
            rows.append((sym, t, len(rows), close + spread, close - spread, close))
    pdf = pd.DataFrame(
        rows, columns=["symbol", "ts_event", "seq", "high", "low", "close"]
    )
    schema = (
        "symbol string, ts_event timestamp, seq long, high double, "
        "low double, close double"
    )
    w = 20
    batch = {
        (r["symbol"], r["seq"]): r
        for r in donchian(spark.createDataFrame(pdf, schema), window=w).collect()
    }
    d = tempfile.mkdtemp(prefix="pts_dc_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_donchian(stream, window=w)

        rows_out = _run_stream(spark, make, mode="append")
        assert len(rows_out) == len(pdf)
        fired = 0
        for r in rows_out:
            b = batch[(r["symbol"], r["seq"])]
            for c in ("dc_upper", "dc_lower", "dc_mid"):
                if b[c] is None:
                    assert r[c] is None, (r["symbol"], r["seq"], c)
                else:
                    assert r[c] == b[c], (r["symbol"], r["seq"], c)  # exact
            assert r["breakout_up"] == b["breakout_up"]
            assert r["breakout_down"] == b["breakout_down"]
            fired += int(r["breakout_up"]) + int(r["breakout_down"])
        assert fired > 0  # the random walk actually breaks out somewhere
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _run_with_restart(spark, schema, src_parts, make_query):
    """Run a stateful streaming query in TWO generations against the
    same checkpoint: generation 1 consumes the first files and STOPS
    (the 'kill'); more files land; generation 2 starts fresh from the
    checkpoint and must restore the state store exactly.  Returns all
    rows the parquet sink accumulated across both generations."""
    src = tempfile.mkdtemp(prefix="pts_restart_src_")
    chk = tempfile.mkdtemp(prefix="pts_restart_chk_")
    sink = tempfile.mkdtemp(prefix="pts_restart_sink_")
    try:
        def start():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{src}/*")
            )
            return (
                make_query(stream)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", chk)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )

        mid = len(src_parts) // 2
        for i, part in enumerate(src_parts[:mid]):
            spark.createDataFrame(part, schema).coalesce(1).write.parquet(
                f"{src}/f{i}"
            )
        q = start()
        q.awaitTermination(120)  # generation 1 drains and stops
        for i, part in enumerate(src_parts[mid:]):
            spark.createDataFrame(part, schema).coalesce(1).write.parquet(
                f"{src}/g{i}"
            )
        q2 = start()  # generation 2: fresh query, restored state
        q2.awaitTermination(120)
        return spark.read.parquet(sink).collect()
    finally:
        for active in spark.streams.active:
            active.stop()
        for d in (src, chk, sink):
            shutil.rmtree(d, ignore_errors=True)


@pytest.mark.streaming
def test_streaming_restart_resumes_state_atr_macd_session_vwap(spark):
    """VERDICT r7 item 7: kill the query mid-tape and resume from the
    checkpoint — the round-7 twins' state (EWM chunk totals, prev
    close, session sums) must round-trip through the state store and
    still match the batch operator at 1e-9 on EVERY row."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.execution import session_vwap
    from polars_trading_spark.operators.indicators import atr, macd
    from polars_trading_spark.streaming import (
        streaming_atr,
        streaming_macd,
        streaming_session_vwap,
    )

    rng = np.random.default_rng(97)
    bar_rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 9, 30)
        close = 100.0
        for _ in range(96):
            t += dt.timedelta(minutes=15)
            close = max(5.0, close + float(rng.normal(0, 1)))
            spread = abs(float(rng.normal(0, 0.5))) + 0.01
            bar_rows.append(
                (sym, t, len(bar_rows), close + spread, close - spread, close)
            )
    bar_schema = (
        "symbol string, ts_event timestamp, seq long, high double, "
        "low double, close double"
    )
    bar_pdf = pd.DataFrame(
        bar_rows, columns=["symbol", "ts_event", "seq", "high", "low", "close"]
    )
    quarters = [
        bar_pdf.iloc[i * len(bar_pdf) // 4 : (i + 1) * len(bar_pdf) // 4]
        for i in range(4)
    ]
    bars_df = spark.createDataFrame(bar_pdf, bar_schema)

    # --- ATR twin through a kill/resume cycle ---
    batch = {(r["symbol"], r["seq"]): r for r in atr(bars_df).collect()}
    out = _run_with_restart(spark, bar_schema, quarters, lambda s: streaming_atr(s))
    assert len(out) == len(bar_pdf)
    for r in out:
        b = batch[(r["symbol"], r["seq"])]
        for c in ("tr", "atr", "natr"):
            assert r[c] == pytest.approx(b[c], rel=1e-9, abs=1e-12), (
                "atr", r["symbol"], r["seq"], c,
            )

    # --- MACD twin (three cascaded EWM folds in state) ---
    batch = {(r["symbol"], r["seq"]): r for r in macd(bars_df, fast=5, slow=9, signal=3).collect()}
    out = _run_with_restart(
        spark, bar_schema, quarters,
        lambda s: streaming_macd(s, fast=5, slow=9, signal=3),
    )
    assert len(out) == len(bar_pdf)
    for r in out:
        b = batch[(r["symbol"], r["seq"])]
        for c in ("macd", "macd_signal", "macd_hist"):
            if b[c] is None:
                assert r[c] is None or r[c] != r[c], ("macd", r["seq"], c)
            else:
                assert r[c] == pytest.approx(b[c], rel=1e-9, abs=1e-12), (
                    "macd", r["symbol"], r["seq"], c,
                )

    # --- session VWAP twin: the restart lands around a UTC day roll ---
    trade_rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 3, 1, 22, 0)
        for _ in range(96):
            t += dt.timedelta(minutes=37)
            trade_rows.append(
                (
                    sym,
                    t,
                    len(trade_rows),
                    100.0 + float(rng.normal(0, 2)),
                    int(rng.integers(1, 900)),
                )
            )
    tr_schema = (
        "symbol string, ts_event timestamp, seq long, price double, size long"
    )
    tr_pdf = pd.DataFrame(
        trade_rows, columns=["symbol", "ts_event", "seq", "price", "size"]
    )
    tr_quarters = [
        tr_pdf.iloc[i * len(tr_pdf) // 4 : (i + 1) * len(tr_pdf) // 4]
        for i in range(4)
    ]
    batch = {
        (r["symbol"], r["seq"]): r
        for r in session_vwap(
            spark.createDataFrame(tr_pdf, tr_schema),
            ts_col="ts_event",
            seq_col="seq",
        ).collect()
    }
    out = _run_with_restart(
        spark, tr_schema, tr_quarters, lambda s: streaming_session_vwap(s)
    )
    assert len(out) == len(tr_pdf)
    for r in out:
        b = batch[(r["symbol"], r["seq"])]
        assert r["cum_volume"] == b["cum_volume"], ("vwap", r["seq"])
        assert r["session_vwap"] == pytest.approx(
            b["session_vwap"], rel=1e-9
        ), ("vwap", r["symbol"], r["seq"])


@pytest.mark.streaming
def test_streaming_hampel_matches_batch_minus_lookahead(spark):
    """Centered-window streaming: every emitted row equals the batch
    Hampel filter bit-for-bit (same median/MAD picks); the tape's last
    h rows stay pending (the inherent lookahead of a two-sided window),
    and the spike planted mid-tape is flagged through a chunk boundary."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.data_quality import hampel_filter
    from polars_trading_spark.streaming import streaming_hampel

    rng = np.random.default_rng(41)
    rows = []
    for sym in ("A", "B"):
        t = dt.datetime(2022, 5, 2, 9, 30)
        p = 100.0
        for i in range(90):
            t += dt.timedelta(seconds=7)
            p = max(1.0, p + float(rng.normal(0, 0.2)))
            px = 150.0 if (sym == "A" and i == 44) else p  # planted spike
            rows.append((sym, t, len(rows), px))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "seq", "price"])
    schema = "symbol string, ts_event timestamp, seq long, price double"
    w, k = 21, 3.0
    h = w // 2

    with Config(timestamp_column="ts_event"):
        batch = {
            (r["symbol"], r["seq"]): r
            for r in hampel_filter(
                spark.createDataFrame(pdf, schema), window=w, k=k, seq_col="seq"
            ).collect()
        }

    d = tempfile.mkdtemp(prefix="pts_hampel_stream_")
    try:
        third = len(pdf) // 3
        for i, sl in enumerate(
            (pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :])
        ):
            spark.createDataFrame(sl, schema).coalesce(1).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_hampel(stream, window=w, k=k)

        out = _run_stream(spark, make, mode="append")
        # exactly the batch rows minus each symbol's last h (pending)
        per_sym = {"A": 0, "B": 0}
        flagged = 0
        for r in out:
            per_sym[r["symbol"]] += 1
            b = batch[(r["symbol"], r["seq"])]
            assert r["price"] == b[
                "price"
            ] if "price" in b else True
            for c in ("rolling_median", "rolling_mad"):
                if b[c] is None:
                    assert r[c] is None or r[c] != r[c], (r["seq"], c)
                else:
                    assert r[c] == b[c], (r["seq"], c)  # exact median picks
            assert r["is_outlier"] == b["is_outlier"], r["seq"]
            assert r["price_clean"] == b["price_clean"], r["seq"]
            flagged += int(r["is_outlier"])
        assert per_sym == {"A": 90 - h, "B": 90 - h}
        assert flagged >= 1  # the planted spike fired (and emitted)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        for active in spark.streams.active:
            active.stop()


def test_streaming_spread_band_matches_batch_across_batches(spark):
    """Round-9 twin: the hysteresis band rule streamed against
    pre-fitted coefficients equals the batch spread_band_backtest on
    the same bars — positions/trades exactly, floats to 1e-9 — with
    state (pending legs, spread ring, carried position) crossing a
    three-file replay."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.mean_reversion import (
        cointegration_fit,
        spread_band_backtest,
    )
    from polars_trading_spark.streaming import streaming_spread_band

    rng = np.random.default_rng(41)
    bar_schema = "symbol string, ts_event timestamp, close double"
    rows = []
    base = {"A": 100.0, "B": 80.0, "C": 55.0}
    drift = {"A": 0.0, "B": 0.0, "C": 0.0002}
    t = dt.datetime(2022, 3, 1, 9, 30)
    common = rng.normal(0.0, 0.008, size=300)
    for i in range(300):
        t = t + dt.timedelta(minutes=5)
        for sym in ("A", "B", "C"):
            base[sym] = max(
                1.0,
                base[sym]
                * float(
                    np.exp(
                        drift[sym]
                        + 0.7 * common[i]
                        + rng.normal(0.0, 0.004)
                    )
                ),
            )
            rows.append((sym, t, base[sym]))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "close"])
    bars = spark.createDataFrame(pdf, bar_schema)

    kw = dict(entry_z=1.5, exit_z=0.5, window=40)
    batch = (
        spread_band_backtest(bars, ts_col="ts_event", **kw)
        .toPandas()
        .set_index(["sym_a", "sym_b", "ts_event"])
        .sort_index()
    )
    coefs = cointegration_fit(bars, ts_col="ts_event").select(
        "sym_a", "sym_b",
        F.round("alpha", 6).alias("alpha"),
        F.round("beta", 6).alias("beta"),
    )

    d = tempfile.mkdtemp(prefix="pts_band_stream_")
    try:
        third = len(pdf) // 3
        for i, lo in enumerate((0, third, 2 * third)):
            hi = len(pdf) if i == 2 else lo + third
            spark.createDataFrame(pdf.iloc[lo:hi], bar_schema).coalesce(
                1
            ).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(bar_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_spread_band(stream, coefs, **kw)

        rows_out = _run_stream(spark, make, mode="append")
        got = (
            pd.DataFrame([r.asDict() for r in rows_out])
            .set_index(["sym_a", "sym_b", "ts_event"])
            .sort_index()
        )
        assert len(got) == len(batch)
        assert (got.index == batch.index).all()
        # hysteresis state (position/traded) exactly; floats to 1e-9
        assert (got.position == batch.position).all()
        assert (got.traded == batch.traded).all()
        np.testing.assert_allclose(got.spread, batch.spread, rtol=1e-9)
        z_both = got.z.notna() & batch.z.notna()
        assert (got.z.isna() == batch.z.isna()).all()
        np.testing.assert_allclose(
            got.z[z_both], batch.z[z_both], rtol=1e-7
        )
        p_both = got.pnl.notna() & batch.pnl.notna()
        assert (got.pnl.isna() == batch.pnl.isna()).all()
        np.testing.assert_allclose(
            got.pnl[p_both], batch.pnl[p_both], rtol=1e-9, atol=1e-15
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_spread_band_validation(spark):
    from polars_trading_spark.streaming import streaming_spread_band

    coefs = spark.createDataFrame(
        [("A", "B", 0.1, 1.0)], "sym_a string, sym_b string, alpha double, beta double"
    )
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(ValueError):
        streaming_spread_band(stream, coefs, entry_z=1.0, exit_z=1.5)
    with pytest.raises(ValueError):
        streaming_spread_band(stream, coefs, window=1)


def test_streaming_portfolio_capacity_matches_batch(spark):
    """Round-9 twin: the single-group capacity monitor over a
    three-file replay equals the batch portfolio_capacity on every
    bucket except the tape's final one (pending, one-bucket lag) —
    integers exactly, ADV/capacity bit-equal (same prefix-sum folds)."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.cross_section import portfolio_capacity
    from polars_trading_spark.streaming import streaming_portfolio_capacity

    rng = np.random.default_rng(59)
    bar_schema = (
        "symbol string, ts_event timestamp, close double, volume double"
    )
    rows = []
    px = {"A": 100.0, "B": 90.0, "C": 70.0, "D": 55.0}
    t = dt.datetime(2022, 5, 2, 9, 30)
    for _ in range(120):
        t = t + dt.timedelta(minutes=15)
        for s in sorted(px):
            px[s] = max(1.0, px[s] * float(np.exp(rng.normal(0, 0.01))))
            rows.append((s, t, px[s], float(rng.integers(100, 5000))))
    pdf = pd.DataFrame(
        rows, columns=["symbol", "ts_event", "close", "volume"]
    )
    kw = dict(lookback=5, top_n=1, adv_window=10, max_participation=0.05)
    batch = (
        portfolio_capacity(
            spark.createDataFrame(pdf, bar_schema), ts_col="ts_event", **kw
        )
        .toPandas()
        .set_index("ts_event")
        .sort_index()
    )

    d = tempfile.mkdtemp(prefix="pts_cap_stream_")
    try:
        third = len(pdf) // 3
        for i, lo in enumerate((0, third, 2 * third)):
            hi = len(pdf) if i == 2 else lo + third
            spark.createDataFrame(pdf.iloc[lo:hi], bar_schema).coalesce(
                1
            ).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(bar_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_portfolio_capacity(
                stream, ts_col="ts_event", **kw
            )

        rows_out = _run_stream(spark, make, mode="append")
        got = (
            pd.DataFrame([r.asDict() for r in rows_out])
            .set_index("ts_event")
            .sort_index()
        )
        want = batch.iloc[:-1]  # final bucket pending in the stream
        assert len(got) == len(want)
        assert (got.index == want.index).all()
        for col in ("n_members", "n_changed"):
            pd.testing.assert_series_equal(
                got[col].astype("float64"),
                want[col].astype("float64"),
                check_names=False,
            )
        for col in ("turnover", "min_member_adv", "capacity_dollars"):
            a, b = got[col], want[col]
            assert (a.isna() == b.isna()).all(), col
            m = a.notna()
            np.testing.assert_allclose(a[m], b[m], rtol=1e-12), col
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_portfolio_capacity_validation(spark):
    from polars_trading_spark.streaming import streaming_portfolio_capacity

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(ValueError):
        streaming_portfolio_capacity(stream, top_n=0)
    with pytest.raises(ValueError):
        streaming_portfolio_capacity(stream, max_participation=1.5)


@pytest.mark.streaming
def test_streaming_restart_resumes_state_spread_band(spark):
    """Round-9 twin through the kill/resume drill: the band state
    (pending legs, spread ring, carried position, last spread) must
    round-trip through the checkpointed state store — generation 2
    resumes mid-tape and the union of both generations' emissions
    equals the batch backtest (positions exactly, floats to 1e-9)."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.mean_reversion import (
        cointegration_fit,
        spread_band_backtest,
    )
    from polars_trading_spark.streaming import streaming_spread_band

    rng = np.random.default_rng(47)
    bar_schema = "symbol string, ts_event timestamp, close double"
    rows = []
    base = {"A": 100.0, "B": 80.0}
    t = dt.datetime(2022, 7, 1, 9, 30)
    common = rng.normal(0.0, 0.008, size=240)
    for i in range(240):
        t = t + dt.timedelta(minutes=5)
        for sym in ("A", "B"):
            base[sym] = max(
                1.0,
                base[sym]
                * float(np.exp(0.7 * common[i] + rng.normal(0.0, 0.004))),
            )
            rows.append((sym, t, base[sym]))
    pdf = pd.DataFrame(rows, columns=["symbol", "ts_event", "close"])
    bars = spark.createDataFrame(pdf, bar_schema)
    kw = dict(entry_z=1.5, exit_z=0.5, window=40)
    batch = (
        spread_band_backtest(bars, ts_col="ts_event", **kw)
        .toPandas()
        .set_index("ts_event")
        .sort_index()
    )
    coefs = cointegration_fit(bars, ts_col="ts_event").select(
        "sym_a", "sym_b",
        F.round("alpha", 6).alias("alpha"),
        F.round("beta", 6).alias("beta"),
    )

    quarter = len(pdf) // 4
    parts = [
        [
            (r.symbol, r.ts_event.to_pydatetime(), r.close)
            for r in pdf.iloc[
                i * quarter : (i + 1) * quarter if i < 3 else len(pdf)
            ].itertuples(index=False)
        ]
        for i in range(4)
    ]
    rows_out = _run_with_restart(
        spark,
        bar_schema,
        parts,
        lambda stream: streaming_spread_band(stream, coefs, **kw),
    )
    got = (
        pd.DataFrame([r.asDict() for r in rows_out])
        .set_index("ts_event")
        .sort_index()
    )
    assert len(got) == len(batch)
    assert (got.index == batch.index).all()
    assert (got.position == batch.position).all()
    assert (got.traded == batch.traded).all()
    np.testing.assert_allclose(got.spread, batch.spread, rtol=1e-9)
    p_both = got.pnl.notna() & batch.pnl.notna()
    assert (got.pnl.isna() == batch.pnl.isna()).all()
    np.testing.assert_allclose(
        got.pnl[p_both], batch.pnl[p_both], rtol=1e-9, atol=1e-15
    )


def test_streaming_rank_portfolio_net_matches_batch(spark):
    """Round-10 twin: the single-group cost-aware momentum-book monitor
    over a three-file replay equals the batch rank_portfolio_backtest_net
    on every formed bucket except the tape's final one (its members'
    forward returns resolve from the pending bucket's bars; the final
    bucket itself can never form while pending)."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.cross_section import (
        rank_portfolio_backtest_net,
    )
    from polars_trading_spark.streaming import streaming_rank_portfolio_net

    rng = np.random.default_rng(71)
    bar_schema = (
        "symbol string, ts_event timestamp, close double, "
        "high double, low double"
    )
    rows = []
    px = {"A": 100.0, "B": 90.0, "C": 70.0, "D": 55.0}
    t = dt.datetime(2022, 6, 1, 9, 30)
    for _ in range(90):
        t = t + dt.timedelta(minutes=15)
        for s in sorted(px):
            px[s] = max(1.0, px[s] * float(np.exp(rng.normal(0, 0.01))))
            c = px[s]
            rows.append((s, t, c, c * 1.004, c * 0.996))
    pdf = pd.DataFrame(
        rows, columns=["symbol", "ts_event", "close", "high", "low"]
    )
    kw = dict(lookback=5, top_n=1, cs_window=10)
    batch = (
        rank_portfolio_backtest_net(
            spark.createDataFrame(pdf, bar_schema), ts_col="ts_event", **kw
        )
        .toPandas()
        .set_index("ts_event")
        .sort_index()
    )

    d = tempfile.mkdtemp(prefix="pts_rank_stream_")
    try:
        third = len(pdf) // 3
        for i, lo in enumerate((0, third, 2 * third)):
            hi = len(pdf) if i == 2 else lo + third
            spark.createDataFrame(pdf.iloc[lo:hi], bar_schema).coalesce(
                1
            ).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(bar_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_rank_portfolio_net(
                stream, ts_col="ts_event", **kw
            )

        rows_out = _run_stream(spark, make, mode="append")
        got = (
            pd.DataFrame([r.asDict() for r in rows_out])
            .set_index("ts_event")
            .sort_index()
        )
        want = batch.iloc[:-1]  # final formed bucket pending
        assert len(got) == len(want)
        assert (got.index == want.index).all()
        for col in ("n_long", "n_short"):
            pd.testing.assert_series_equal(
                got[col].astype("float64"),
                want[col].astype("float64"),
                check_names=False,
            )
        for col in ("pnl", "turnover", "cost", "net_pnl"):
            a, b = got[col], want[col]
            assert (a.isna() == b.isna()).all(), col
            m = a.notna()
            np.testing.assert_allclose(a[m], b[m], rtol=0, atol=1e-9), col
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_rank_portfolio_tearsheet_matches_batch(spark):
    """The as-of tearsheet twin: its LAST emitted row equals the batch
    tearsheet recomputed over the emitted bucket prefix (the batch
    per-bucket net frame minus the pending tail)."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.cross_section import (
        rank_portfolio_backtest_net,
    )
    from polars_trading_spark.streaming import (
        streaming_rank_portfolio_tearsheet,
    )

    rng = np.random.default_rng(73)
    bar_schema = (
        "symbol string, ts_event timestamp, close double, "
        "high double, low double"
    )
    rows = []
    px = {"A": 100.0, "B": 90.0, "C": 70.0}
    t = dt.datetime(2022, 6, 2, 9, 30)
    for _ in range(80):
        t = t + dt.timedelta(minutes=15)
        for s in sorted(px):
            px[s] = max(1.0, px[s] * float(np.exp(rng.normal(0, 0.012))))
            c = px[s]
            rows.append((s, t, c, c * 1.003, c * 0.997))
    pdf = pd.DataFrame(
        rows, columns=["symbol", "ts_event", "close", "high", "low"]
    )
    kw = dict(lookback=4, top_n=1, cs_window=8)
    per = (
        rank_portfolio_backtest_net(
            spark.createDataFrame(pdf, bar_schema), ts_col="ts_event", **kw
        )
        .toPandas()
        .sort_values("ts_event")
        .reset_index(drop=True)
    ).iloc[:-1]  # the twin's emitted prefix

    d = tempfile.mkdtemp(prefix="pts_rankts_stream_")
    try:
        third = len(pdf) // 3
        for i, lo in enumerate((0, third, 2 * third)):
            hi = len(pdf) if i == 2 else lo + third
            spark.createDataFrame(pdf.iloc[lo:hi], bar_schema).coalesce(
                1
            ).write.parquet(f"{d}/f{i}")

        def make():
            stream = (
                spark.readStream.schema(bar_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_rank_portfolio_tearsheet(
                stream, ts_col="ts_event", **kw
            )

        rows_out = _run_stream(spark, make, mode="append")
        got = (
            pd.DataFrame([r.asDict() for r in rows_out])
            .sort_values("ts_event")
            .reset_index(drop=True)
        )
        assert len(got) == len(per)  # one as-of row per emitted bucket
        r = got.iloc[-1]
        g = per.pnl.fillna(0.0)
        nv = per.net_pnl
        assert r["n_buckets"] == len(per)
        assert r["gross_pnl"] == pytest.approx(g.sum(), abs=1e-9)
        assert r["total_cost"] == pytest.approx(per.cost.sum(), abs=1e-9)
        assert r["net_pnl"] == pytest.approx(nv.sum(), abs=1e-9)
        assert r["gross_sharpe"] == pytest.approx(
            g.mean() / g.std(ddof=1), rel=1e-9
        )
        assert r["net_sharpe"] == pytest.approx(
            nv.mean() / nv.std(ddof=1), rel=1e-9
        )
        assert r["avg_turnover"] == pytest.approx(
            per.turnover.dropna().mean(), rel=1e-9
        )
        cum = nv.cumsum()
        assert r["max_drawdown"] == pytest.approx(
            (cum - cum.cummax()).min(), abs=1e-9
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_rank_portfolio_net_validation(spark):
    from polars_trading_spark.streaming import streaming_rank_portfolio_net

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(ValueError):
        streaming_rank_portfolio_net(stream, top_n=0)
    with pytest.raises(ValueError):
        streaming_rank_portfolio_net(stream, cs_window=1)


def test_streaming_implementation_shortfall_matches_batch(spark):
    """Closed parents emitted by the streaming twin over a three-file
    replay equal the batch operator's complete parents (integers exact,
    floats to 1e-9); the trailing partial parent stays pending."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.execution import (
        implementation_shortfall,
    )
    from polars_trading_spark.streaming import (
        streaming_implementation_shortfall,
    )

    rng = np.random.default_rng(41)
    rows = []
    for sym in ("A", "B"):
        price = 50.0
        t = dt.datetime(2022, 1, 3, 9, 30)
        n = 47 if sym == "A" else 33  # neither divides tpp=10 evenly
        for _ in range(n):
            t = t + dt.timedelta(seconds=int(rng.integers(1, 5)))
            price = max(1.0, price + float(rng.normal(0, 0.3)))
            rows.append((sym, round(price, 2), int(rng.integers(1, 50)), t))
    pdf = pd.DataFrame(rows, columns=["symbol", "price", "size", "ts_event"])
    pdf = pdf.sort_values("ts_event").reset_index(drop=True)

    with Config(timestamp_column="ts_event"):
        batch = implementation_shortfall(
            spark.createDataFrame(pdf, SCHEMA), trades_per_parent=10
        ).toPandas()
    complete = batch[batch["n_fills"] == 10].set_index(["symbol", "parent_id"])

    d = tempfile.mkdtemp(prefix="pts_is_stream_")
    try:
        third = len(pdf) // 3
        for i, lo in enumerate((0, third, 2 * third)):
            hi = len(pdf) if i == 2 else lo + third
            spark.createDataFrame(pdf.iloc[lo:hi], SCHEMA).coalesce(1).write.parquet(
                f"{d}/f{i}"
            )

        def make():
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_implementation_shortfall(
                stream, trades_per_parent=10
            )

        rows_out = _run_stream(spark, make, mode="append")
        got = pd.DataFrame([r.asDict() for r in rows_out]).set_index(
            ["symbol", "parent_id"]
        )
        # exactly the batch's complete parents, no more, no less
        assert sorted(got.index) == sorted(complete.index)
        for idx in got.index:
            g, b = got.loc[idx], complete.loc[idx]
            assert int(g["side"]) == int(b["side"])
            assert int(g["qty"]) == int(b["qty"])
            assert g["arrival_price"] == b["arrival_price"]
            for col in ("fill_vwap", "shortfall_bps", "market_move_bps"):
                assert g[col] == pytest.approx(b[col], rel=1e-9), (idx, col)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_implementation_shortfall_validation(spark):
    from polars_trading_spark.streaming import (
        streaming_implementation_shortfall,
    )

    with pytest.raises(ValueError):
        streaming_implementation_shortfall(None, trades_per_parent=0)


def test_streaming_rv_signature_matches_batch(spark):
    """The lag-ladder ring state must carry across micro-batches: the
    highest-count row per (symbol, k) over a three-file replay equals
    the batch operator (counts exact, rv/noise_ratio at 1e-9)."""
    import numpy as np
    import pandas as pd

    from polars_trading_spark.operators.volatility import rv_signature
    from polars_trading_spark.streaming import streaming_rv_signature

    rng = np.random.default_rng(29)
    rows = []
    for sym in ("A", "B"):
        lp = np.log(40.0)
        t = dt.datetime(2022, 1, 3, 9, 30)
        for _ in range(130):
            t = t + dt.timedelta(seconds=int(rng.integers(1, 5)))
            lp += float(rng.normal(0, 0.003))
            rows.append((sym, float(np.exp(lp)), 10, t))
    pdf = pd.DataFrame(rows, columns=["symbol", "price", "size", "ts_event"])
    pdf = pdf.sort_values("ts_event").reset_index(drop=True)

    lags = (1, 3, 8)
    with Config(timestamp_column="ts_event"):
        batch = {
            (r["symbol"], r["k"]): r
            for r in rv_signature(
                spark.createDataFrame(pdf, SCHEMA), lags=lags
            ).collect()
        }

    d = tempfile.mkdtemp(prefix="pts_rvsig_stream_")
    try:
        third = len(pdf) // 3
        for i, lo in enumerate((0, third, 2 * third)):
            hi = len(pdf) if i == 2 else lo + third
            spark.createDataFrame(pdf.iloc[lo:hi], SCHEMA).coalesce(1).write.parquet(
                f"{d}/f{i}"
            )

        def make():
            stream = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/*")
            )
            return streaming_rv_signature(stream, lags=lags)

        rows_out = _run_stream(spark, make, mode="update")
        got = (
            pd.DataFrame([r.asDict() for r in rows_out])
            .sort_values("n_diffs")
            .groupby(["symbol", "k"])
            .last()  # highest-count row = full-prefix curve
        )
        for (sym, k), b in [(key, batch[key]) for key in batch]:
            g = got.loc[(sym, k)]
            assert int(g["n_diffs"]) == int(b["n_diffs"]), (sym, k)
            assert g["rv"] == pytest.approx(b["rv"], rel=1e-9), (sym, k)
            assert g["noise_ratio"] == pytest.approx(
                b["noise_ratio"], rel=1e-9
            ), (sym, k)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_rv_signature_validation(spark):
    from polars_trading_spark.streaming import streaming_rv_signature

    with pytest.raises(ValueError):
        streaming_rv_signature(None, lags=())
    with pytest.raises(ValueError):
        streaming_rv_signature(None, lags=(2, 2))


def test_streaming_incremental_dedup_matches_batch(spark):
    """Round-11 twin: micro-batched incremental near-dedup against the
    persisted signature index equals ONE batch ``incremental_dedup``
    call over the concatenated batches, bit-for-bit — the
    ``base_flag_col`` contract (appended stream sigs carry is_base=0,
    which compares only against higher ids) makes the equality hold
    regardless of how the snapshot is split into files."""
    from polars_trading_spark.functions.dedup import (
        incremental_dedup,
        minhash_index,
    )
    from polars_trading_spark.streaming import (
        seed_minhash_index,
        streaming_incremental_dedup,
    )

    doc_schema = "doc_id long, text string"
    base_text = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and the birds sing outside"
    )
    novel = "novel content about spark engines and shuffle plans today"
    base_rows = [
        (1, base_text),
        (2, "completely unrelated words about gardens and rain"),
    ]
    batches = [
        [(10, base_text), (11, novel)],
        [(12, novel), (13, ""), (14, "fresh unique text about volcanoes")],
        [(15, base_text), (16, novel), (17, "another unique one about tides")],
    ]
    all_new = [r for b in batches for r in b]

    batch_expect = {
        r["doc_id"]: r
        for r in incremental_dedup(
            spark.createDataFrame(all_new, doc_schema),
            minhash_index(spark.createDataFrame(base_rows, doc_schema)),
        ).collect()
    }

    d = tempfile.mkdtemp(prefix="pts_incdedup_")
    results = []
    try:
        index_dir = f"{d}/index"
        seed_minhash_index(
            spark.createDataFrame(base_rows, doc_schema), index_dir
        )
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, doc_schema).coalesce(1).write.parquet(
                f"{d}/stream/f{i}"
            )
        stream = (
            spark.readStream.schema(doc_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/stream/*")
        )
        q = streaming_incremental_dedup(
            stream,
            index_dir,
            f"{d}/ckpt",
            sink=lambda df, eid: results.extend(df.collect()),
        )
        q.awaitTermination(120)

        got = {r["doc_id"]: r for r in results}
        assert set(got) == set(batch_expect)
        for did, r in got.items():
            b = batch_expect[did]
            for c in ("keep", "dup_of", "dup_is_base"):
                assert r[c] == b[c], (did, c, r[c], b[c])
            if b["est_jaccard"] is None:
                assert r["est_jaccard"] is None, did
            else:
                assert r["est_jaccard"] == pytest.approx(b["est_jaccard"]), did
        # the index grew by one flag-0 row per streamed doc (appends
        # live in per-epoch subdirectories since round 12 — replay
        # idempotency — so the read is recursive, as in the operator)
        idx = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(index_dir)
        )
        assert idx.where("is_base = 1").count() == len(base_rows)
        assert idx.where("is_base = 0").count() == len(all_new)
    finally:
        for active in spark.streams.active:
            active.stop()
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_incremental_dedup_restart_resumes(spark):
    """Kill/resume drill for the foreachBatch twin: generation 2 starts
    from the checkpoint with the index reflecting exactly the committed
    batches; the union of both generations' decisions equals the batch
    operator."""
    from polars_trading_spark.functions.dedup import (
        incremental_dedup,
        minhash_index,
    )
    from polars_trading_spark.streaming import (
        seed_minhash_index,
        streaming_incremental_dedup,
    )

    doc_schema = "doc_id long, text string"
    base_rows = [(1, "alpha beta gamma delta epsilon zeta eta theta")]
    batches = [
        [(10, "alpha beta gamma delta epsilon zeta eta theta")],
        [(11, "totally different payload about rivers and stones")],
        [(12, "totally different payload about rivers and stones")],
    ]
    all_new = [r for b in batches for r in b]
    batch_expect = {
        r["doc_id"]: r
        for r in incremental_dedup(
            spark.createDataFrame(all_new, doc_schema),
            minhash_index(spark.createDataFrame(base_rows, doc_schema)),
        ).collect()
    }

    d = tempfile.mkdtemp(prefix="pts_incdedup_rs_")
    results = []
    try:
        index_dir = f"{d}/index"
        seed_minhash_index(
            spark.createDataFrame(base_rows, doc_schema), index_dir
        )
        sink = lambda df, eid: results.extend(df.collect())  # noqa: E731

        def start(n_files):
            for i in range(n_files):
                path = f"{d}/stream/f{i}"
                if not os.path.isdir(path):
                    spark.createDataFrame(
                        batches[i], doc_schema
                    ).coalesce(1).write.parquet(path)
            stream = (
                spark.readStream.schema(doc_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/stream/*")
            )
            return streaming_incremental_dedup(
                stream, index_dir, f"{d}/ckpt", sink=sink
            )

        q1 = start(1)
        q1.awaitTermination(120)
        q2 = start(3)  # generation 2: two more files, same checkpoint
        q2.awaitTermination(120)

        got = {r["doc_id"]: r for r in results}
        assert set(got) == set(batch_expect)
        for did, r in got.items():
            b = batch_expect[did]
            for c in ("keep", "dup_of", "dup_is_base"):
                assert r[c] == b[c], (did, c)
        assert (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(index_dir)
            .where("is_base = 0")
            .count()
            == len(all_new)
        )
    finally:
        for active in spark.streams.active:
            active.stop()
        shutil.rmtree(d, ignore_errors=True)


def test_incremental_dedup_foreach_batch_replay_idempotent(spark):
    """Round-12 (ADVICE): a crash after the signature write but before
    the checkpoint commit re-runs the batch — the epoch-id-named
    overwrite subdirectory makes the replayed write idempotent, so the
    flag-0 row count and the decisions are unchanged."""
    import shutil
    import tempfile

    from polars_trading_spark.streaming import (
        incremental_dedup_foreach_batch,
        seed_minhash_index,
    )

    d = tempfile.mkdtemp()
    try:
        index_dir = f"{d}/index"
        doc_schema = "doc_id long, text string"
        seed_minhash_index(
            spark.createDataFrame(
                [(1, "alpha beta gamma delta epsilon zeta eta theta")],
                doc_schema,
            ),
            index_dir,
        )
        batch = spark.createDataFrame(
            [
                (10, "alpha beta gamma delta epsilon zeta eta theta"),
                (11, "totally different words about ships and tides"),
            ],
            doc_schema,
        )
        results = []
        fn = incremental_dedup_foreach_batch(
            index_dir, sink=lambda df, eid: results.append(df.collect())
        )
        fn(batch, 0)
        fn(batch, 0)  # crash-replay of the SAME epoch
        idx = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(index_dir)
        )
        assert idx.where("is_base = 1").count() == 1
        assert idx.where("is_base = 0").count() == 2  # not 4: idempotent
        assert len(results) == 2
        assert sorted(map(tuple, results[0])) == sorted(map(tuple, results[1]))
        # the duplicate of the seeded base doc is flagged both times
        dec = {r["doc_id"]: r for r in results[1]}
        assert dec[10]["keep"] == 0 and dec[10]["dup_of"] == 1
        assert dec[11]["keep"] == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)
