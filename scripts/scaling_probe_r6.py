"""Round-6 scaling probes: growth slopes for the new operators.

1. corpus ops (cluster_representatives, vocab_divergence) over
   synthetic Zipfian docs at 20k/80k/320k;
2. tick ops (two_scale_rv, realized_moments) over synthetic trades at
   0.2M/0.8M/3.2M rows;
3. pair ops (pairs_distance, kalman_hedge, event_study_car) over
   8-symbol bar frames at 5k/20k/80k bars per symbol — the Kalman
   python loop is the deliberate sequential island, so its slope vs
   the pure-codegen pairs_distance is the measurement of interest.

Usage: python scripts/scaling_probe_r6.py [corpus|ticks|pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_trading_spark.session import get_spark


def _bench(name: str, df) -> None:
    from polars_trading_spark import release_persisted

    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {name}: {time.time() - t0:.2f}s", flush=True)
    release_persisted()


def probe_corpus(spark) -> None:
    import shutil
    import tempfile

    from scripts.scaling_probe_r4 import gen_docs

    from polars_trading_spark.functions.dedup import cluster_representatives
    from polars_trading_spark.functions.tfidf import vocab_divergence

    for nd in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r6_docs_")
        try:
            gen_docs(spark, nd, d)
            docs = spark.read.parquet(d).withColumn(
                "source", F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string"))
            )
            print(f"== docs={nd}")
            _bench("cluster_representatives", cluster_representatives(docs))
            _bench("vocab_divergence", vocab_divergence(docs, group_col="source"))
        finally:
            shutil.rmtree(d, ignore_errors=True)


def _gen_trades(spark, n_rows: int):
    return (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("S"), (F.col("id") % 8).cast("string")).alias("symbol"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 250_000
            ).alias("ts_event"),
            (100.0 + 5.0 * F.sin(F.col("id") / 97.0) + F.randn(seed=7)).alias("price"),
            F.col("id").alias("__pts_seq"),
        )
    )


def probe_ticks(spark) -> None:
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.volatility import realized_moments, two_scale_rv

    for n in (200_000, 800_000, 3_200_000):
        t = _gen_trades(spark, n)
        print(f"== ticks={n}")
        with Config(timestamp_column="ts_event"):
            _bench("two_scale_rv", two_scale_rv(t))
            _bench("realized_moments", realized_moments(t))


def probe_pairs(spark) -> None:
    from polars_trading_spark.operators.cross_section import pairs_distance
    from polars_trading_spark.operators.event_study import event_study_car
    from polars_trading_spark.operators.kalman import kalman_hedge

    for bars_per_sym in (5_000, 20_000, 80_000):
        n = bars_per_sym * 8
        bars = (
            spark.range(n)
            .select(
                F.concat(F.lit("S"), (F.col("id") % 8).cast("string")).alias("symbol"),
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000) + (F.col("id") / 8).cast("long") * 900_000_000
                ).alias("ts"),
                (100.0 + 5.0 * F.sin(F.col("id") / 397.0) + F.randn(seed=11)).alias("close"),
            )
        )
        events = (
            bars.where((F.col("close") > 104.5) & (F.col("symbol") == "S1"))
            .select("symbol", F.col("ts").alias("event_ts"))
            .limit(50)
        )
        print(f"== bars/sym={bars_per_sym} (28 pairs)")
        _bench("pairs_distance", pairs_distance(bars, ts_col="ts"))
        _bench("kalman_hedge", kalman_hedge(bars, ts_col="ts"))
        _bench(
            "event_study_car",
            event_study_car(bars, events, est_window=20, car_window=10, ts_col="ts"),
        )


def main() -> None:
    spark = get_spark("scaling-probe-r6")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("corpus", "all"):
        probe_corpus(spark)
    if which in ("ticks", "all"):
        probe_ticks(spark)
    if which in ("pairs", "all"):
        probe_pairs(spark)


if __name__ == "__main__":
    main()
