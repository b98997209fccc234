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


def test_write_bucketed_join_is_shuffle_free(spark, sf_dir):
    from polars_trading_spark.sources.sinks import write_bucketed

    base = tempfile.mkdtemp(prefix="pts_bkt_")
    try:
        with Config(timestamp_column="ts_event"):
            trades = trades_from_events(spark, sf_dir)
        agg = trades.groupBy("symbol").agg(F.avg("price").alias("avg_price"))
        write_bucketed(
            trades, "t_bkt", bucket_cols=("symbol",), num_buckets=8,
            sort_cols=("symbol",), path=f"{base}/t",
        )
        write_bucketed(
            agg, "a_bkt", bucket_cols=("symbol",), num_buckets=8,
            sort_cols=("symbol",), path=f"{base}/a",
        )
        # hint("merge") pins a sort-merge join: at test scale Spark would
        # broadcast the small side (which bypasses bucketing entirely);
        # at real scale both sides exceed the broadcast threshold and SMJ
        # is what the planner picks on its own.
        joined = spark.table("t_bkt").hint("merge").join(spark.table("a_bkt"), "symbol")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Both sides co-bucketed on the join key: zero Exchange anywhere.
        assert "Exchange" not in plan, plan
        assert joined.count() == spark.table("t_bkt").count()
        # Same data, unbucketed: the merge join must shuffle both sides —
        # the bucket layout is what removed the exchanges, not data size.
        plain = trades.hint("merge").join(agg, "symbol")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt")
        spark.sql("DROP TABLE IF EXISTS a_bkt")
        shutil.rmtree(base, ignore_errors=True)


def test_write_training_shards_layout(spark, tmp_path):
    """Shard directories exist, every doc appears once, and within each
    shard the parquet row order is (seq_id, seq_offset) so a trainer
    can stream sequences without sorting."""
    import pandas as pd

    from polars_trading_spark.sources.sinks import write_training_shards

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 23 + 1)) for i in range(200)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, budget_tokens=64, n_shards=4)

    back = spark.read.parquet(path)
    assert back.count() == 200
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == list(range(200))
    assert set(back.select("shard").distinct().toPandas()["shard"]) <= {0, 1, 2, 3}
    # read one shard file directly: order must be (seq_id, seq_offset)
    import glob

    files = glob.glob(f"{path}/shard=*/part-*.parquet")
    assert files
    pdf = pd.read_parquet(files[0])
    key = list(zip(pdf.seq_id, pdf.seq_offset))
    assert key == sorted(key)
    # budget respected within every sequence of this shard
    fill = pdf.groupby("seq_id").n_tokens.sum()
    assert (fill <= 64).all() or (pdf.groupby("seq_id").size()[fill > 64] == 1).all()


def test_write_training_shards_order_survives_one_task_all_shards(
    spark, tmp_path
):
    """Regression (round 9): when AQE coalesces the repartition("shard")
    shuffle so ONE task holds several shard values, the parquet writer
    requires child ordering by [shard] — without the shard-led local
    sort it inserted its own (unstable) Sort(shard), scrambling the
    documented (seq_id, seq_offset) in-file order.  Pin the multi-
    shard-per-task case directly with shuffle.partitions=1."""
    import glob

    import pandas as pd

    from polars_trading_spark.sources.sinks import write_training_shards

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 23 + 1)) for i in range(200)],
        "doc_id long, text string",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        path = str(tmp_path / "shards1")
        write_training_shards(docs, path, budget_tokens=64, n_shards=4)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    files = sorted(glob.glob(f"{path}/shard=*/part-*.parquet"))
    assert len({f.split("shard=")[1].split("/")[0] for f in files}) > 1
    for f in files:
        pdf = pd.read_parquet(f)
        key = list(zip(pdf.seq_id, pdf.seq_offset))
        assert key == sorted(key), f


def test_documents_jsonl_roundtrip_and_layout(spark, sf_dir):
    from polars_trading_spark.sources.readers import read_documents
    from polars_trading_spark.sources.sinks import write_documents_jsonl

    docs = read_documents(spark, f"{sf_dir}/documents.parquet")
    out = tempfile.mkdtemp(prefix="pts_jsonl_")
    try:
        write_documents_jsonl(docs, f"{out}/plain", target_rows_per_file=100)
        files = glob.glob(f"{out}/plain/part-*.json.gz")
        assert files, "expected gzip jsonl part files"
        # maxRecordsPerFile honored: no file holds more than the cap
        back = read_documents(spark, f"{out}/plain", format="jsonl")
        assert back.count() == docs.count()
        # value fidelity through the JSON round-trip
        a = {r["doc_id"]: r for r in docs.collect()}
        for r in back.collect():
            o = a[r["doc_id"]]
            assert r["text"] == o["text"] and r["source"] == o["source"]
            assert r["lang"] == o["lang"] and r["n_chars"] == o["n_chars"]

        # partitioned layout prunes by directory
        write_documents_jsonl(
            docs, f"{out}/bysrc", partition_by=("source",), target_rows_per_file=100
        )
        dirs = glob.glob(f"{out}/bysrc/source=*")
        assert len(dirs) > 1
        import pyspark.sql.types as T

        sch = T.StructType(
            [f for f in read_documents(spark, f"{sf_dir}/documents.parquet").schema]
        )
        one = (
            spark.read.schema(sch)
            .json(f"{out}/bysrc")
            .where(F.col("source") == dirs[0].rsplit("=", 1)[1])
        )
        assert 0 < one.count() < docs.count()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_read_documents_rejects_unknown_format(spark):
    from polars_trading_spark.sources.readers import read_documents

    with pytest.raises(ValueError):
        read_documents(spark, "/nonexistent", format="avro")
