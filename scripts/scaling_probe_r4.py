"""Scaling probe for the round-4 operators: wall time vs input size.

Same methodology as scaling_probe.py / scaling_probe_r3.py — synthetic
trades with per-symbol length pinned at ~20k rows so symbol count (and
hence parallelism) grows with size, noop sink, slopes over points.
Document operators run over a synthetic corpus scaled in doc count.

Usage: python scripts/scaling_probe_r4.py [rows ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_trading_spark import Config
from polars_trading_spark._utils import SEQ_COL
from polars_trading_spark.operators.backtest import backtest_stats
from polars_trading_spark.operators.bars import time_bars
from polars_trading_spark.operators.bootstrap import sequential_bootstrap
from polars_trading_spark.operators.entropy import lz_entropy
from polars_trading_spark.operators.structural_breaks import bde_cusum
from polars_trading_spark.session import get_spark
from scripts.scaling_probe import gen_trades  # reuse the generator


def gen_docs(spark, n_docs: int, path: str) -> None:
    """Synthetic corpus with a Zipfian vocabulary and planted repeats so
    unit_dedup has real work (~10% of docs share chunks)."""
    df = (
        spark.range(n_docs)
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        (F.pow(F.rand(seed=i), 3.0) * 500).cast("int").cast("string"),
                    )
                    for i in range(120)
                ],
            ),
        )
        .withColumn(
            "text",
            F.when(
                F.col("id") % 10 == 0,
                F.concat(F.lit("common boiler plate chunk repeated across docs "), F.col("text")),
            ).otherwise(F.col("text")),
        )
        .select(F.col("id").alias("doc_id"), "text")
    )
    df.write.mode("overwrite").parquet(path)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 1_000_000, 4_000_000]
    spark = get_spark("scaling-probe-r4")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        n_symbols = max(5, n // 20_000)
        d = tempfile.mkdtemp(prefix="pts_probe_r4_")
        try:
            gen_trades(spark, n, n_symbols, 30, d)
            trades = spark.read.parquet(d)
            ev = trades.select(
                "symbol",
                F.col("ts_event").alias("t0"),
                (F.col("ts_event") + F.expr("INTERVAL 1 DAY")).alias("t1"),
            ).filter(F.monotonically_increasing_id() % 50 == 0)
            with Config(timestamp_column="ts_event"):
                bars = time_bars(trades, bar_size="15m")
                ops = {
                    "lz_entropy": lz_entropy(trades, window=50),
                    "bde_cusum": bde_cusum(trades),
                    "backtest_stats": backtest_stats(
                        bars, periods_per_year=35040.0, ts_col="ts_event"
                    ),
                    "sequential_bootstrap": sequential_bootstrap(ev, n_draws=64),
                }
                print(f"== rows={n} symbols={n_symbols}")
                for name, df in ops.items():
                    t0 = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    print(f"  {name}: {time.time() - t0:.2f}s", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    from polars_trading_spark.functions.dedup import unit_dedup
    from polars_trading_spark.functions.pii import pii_profile
    from polars_trading_spark.functions.text import unigram_logprob

    for nd in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r4_docs_")
        try:
            gen_docs(spark, nd, d)
            docs = spark.read.parquet(d)
            print(f"== docs={nd}")
            for name, df in {
                "unit_dedup": unit_dedup(docs, unit_tokens=10),
                "unigram_logprob": unigram_logprob(docs),
                "pii_profile": pii_profile(docs),
            }.items():
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                print(f"  {name}: {time.time() - t0:.2f}s", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
