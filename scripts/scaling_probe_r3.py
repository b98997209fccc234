"""Scaling probe for the round-3 operators: wall time vs input size.

Same methodology as scaling_probe.py (distributed synthetic trades,
symbols scale with rows so per-symbol series length stays ~20k); times
the round-3 quantitative operators end-to-end with a noop sink.

Usage: python scripts/scaling_probe_r3.py [rows ...]
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
from polars_trading_spark.operators.bars import time_bars
from polars_trading_spark.operators.entropy import return_entropy
from polars_trading_spark.operators.imbalance import imbalance_bars, run_bars
from polars_trading_spark.operators.microstructure import microstructure_features, vpin
from polars_trading_spark.operators.structural_breaks import sadf
from polars_trading_spark.operators.trend_scan import trend_scanning_labels
from polars_trading_spark.operators.volatility import bar_volatility
from polars_trading_spark.session import get_spark
from scripts.scaling_probe import gen_trades  # reuse the generator


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 1_000_000, 4_000_000]
    spark = get_spark("scaling-probe-r3")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        n_symbols = max(5, n // 20_000)
        d = tempfile.mkdtemp(prefix="pts_probe_r3_")
        try:
            gen_trades(spark, n, n_symbols, 30, d)
            trades = spark.read.parquet(d)
            with Config(timestamp_column="ts_event"):
                bars = time_bars(trades, bar_size="15m")
                ops = {
                    "imbalance_bars": imbalance_bars(trades, threshold=6, mode="tick"),
                    "run_bars": run_bars(trades, threshold=6, mode="tick"),
                    "trend_scan": trend_scanning_labels(trades, min_span=5, max_span=20),
                    "sadf": sadf(trades, min_span=10, max_span=40),
                    "vpin": vpin(trades, bucket_volume=500_000, window=10),
                    "return_entropy": return_entropy(trades, word_len=2, block=50),
                    "bar_volatility": bar_volatility(bars, window=20, ts_col="ts_event"),
                    "microstructure": microstructure_features(bars, window=20, ts_col="ts_event"),
                }
                print(f"== rows={n} symbols={n_symbols}")
                for name, df in ops.items():
                    t0 = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    print(f"  {name}: {time.time() - t0:.2f}s", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
