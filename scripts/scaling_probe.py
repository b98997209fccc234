"""Scaling probe: operator wall time vs input size on local[32].

Generates trades distributively (spark.range + seeded rand — no driver
materialization), persists them as properly-split parquet, and times
the headline operators at increasing row counts.  The point is the
SLOPE: a scale-safe operator should grow ~linearly once past Spark's
fixed per-query overhead.  Results land in SCALING.md.

Usage: python scripts/scaling_probe.py [rows ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_trading_spark import Config, daily_vol, time_bars, volume_bars, tick_bars
from polars_trading_spark.operators.dynamic_labels import get_triple_barrier_label
from polars_trading_spark.session import get_spark


def gen_trades(spark, n_rows: int, n_symbols: int, days: int, path: str) -> None:
    span_us = days * 86_400_000_000
    base_us = 1_704_067_200_000_000  # 2024-01-01
    df = (
        spark.range(n_rows)
        .select(
            F.timestamp_micros(
                (F.lit(base_us) + (F.rand(1) * span_us).cast("long"))
            ).alias("ts_event"),
            (F.rand(2) * 99 + 1).alias("price"),
            (F.rand(3) * 90_000 + 10_000).cast("long").alias("size"),
            F.concat(F.lit("SYM"), (F.col("id") % n_symbols).cast("string")).alias("symbol"),
            F.col("id").alias("__pts_seq"),
        )
    )
    df.repartition(32).write.mode("overwrite").option("maxRecordsPerFile", 200_000).parquet(path)


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [100_000, 1_000_000, 4_000_000]
    spark = get_spark("pts-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    print("rows,symbols,time_bars_s,tick_bars_s,volume_bars_s,daily_vol_s,triple_barrier_s")
    for n in sizes:
        n_symbols = max(5, n // 20_000)  # keep per-symbol series bounded
        d = tempfile.mkdtemp(prefix="pts_scale_")
        try:
            gen_trades(spark, n, n_symbols, days=30, path=d)
            trades = spark.read.parquet(d)
            with Config(timestamp_column="ts_event"):
                t = {}
                for name, fn in [
                    ("time_bars", lambda: time_bars(trades, bar_size="15m")),
                    ("tick_bars", lambda: tick_bars(trades, bar_size=100)),
                    ("volume_bars", lambda: volume_bars(trades, bar_size=2_000_000)),
                    ("daily_vol", lambda: daily_vol(trades, span=100)),
                    (
                        "triple_barrier",
                        lambda: get_triple_barrier_label(trades, span=100, barrier_offset="4h"),
                    ),
                ]:
                    t0 = time.perf_counter()
                    fn().count()
                    t[name] = time.perf_counter() - t0
            print(
                f"{n},{n_symbols},{t['time_bars']:.1f},{t['tick_bars']:.1f},"
                f"{t['volume_bars']:.1f},{t['daily_vol']:.1f},{t['triple_barrier']:.1f}",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
