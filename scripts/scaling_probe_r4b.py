"""Scaling probe for the second round-4 operator batch: wall time vs
input size for roll_adjust / ou_fit / cointegration / intraday_profile
(trades), dup_spans / bpe_pairs (docs), semdedup (embeddings).

Same methodology as the sibling probes: per-symbol series length pinned
(~20k rows) so symbol count carries parallelism; noop sink; slopes over
3 points.  Usage: python scripts/scaling_probe_r4b.py [trades_rows ...]
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
from polars_trading_spark.operators.mean_reversion import cointegration_fit, ou_fit
from polars_trading_spark.operators.roll import roll_adjust
from polars_trading_spark.operators.seasonality import intraday_profile
from polars_trading_spark.session import get_spark
from scripts.scaling_probe import gen_trades
from scripts.scaling_probe_r4 import gen_docs


def _bench(name: str, df) -> None:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {name}: {time.time() - t0:.2f}s", flush=True)


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 1_000_000, 4_000_000]
    spark = get_spark("scaling-probe-r4b")
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        n_symbols = max(5, n // 20_000)
        d = tempfile.mkdtemp(prefix="pts_probe_r4b_")
        try:
            gen_trades(spark, n, n_symbols, 30, d)
            trades = spark.read.parquet(d)
            with Config(timestamp_column="ts_event"):
                pts = trades.groupBy(
                    "symbol", F.date_trunc("week", "ts_event").alias("__wk")
                ).agg(F.min("ts_event").alias("roll_ts")).drop("__wk")
                bars = time_bars(trades, bar_size="15m")
                print(f"== rows={n} symbols={n_symbols}")
                _bench("roll_adjust", roll_adjust(trades, pts))
                _bench("ou_fit", ou_fit(trades, ts_col="ts_event", close_col="price"))
                _bench("intraday_profile", intraday_profile(trades))
                # pairs grow with symbols^2: report but note width-quadratic
                if n_symbols <= 200:
                    _bench(
                        "cointegration",
                        cointegration_fit(bars, ts_col="ts_event", close_col="close"),
                    )
        finally:
            shutil.rmtree(d, ignore_errors=True)

    from polars_trading_spark.functions.dedup import duplicated_span_stats
    from polars_trading_spark.functions.text import bpe_pair_counts

    for nd in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r4b_docs_")
        try:
            gen_docs(spark, nd, d)
            docs = spark.read.parquet(d)
            print(f"== docs={nd}")
            _bench("dup_spans", duplicated_span_stats(docs, ngram=8))
            _bench("bpe_pairs", bpe_pair_counts(docs, top_k=50))
        finally:
            shutil.rmtree(d, ignore_errors=True)

    from polars_trading_spark.functions.similarity import semdedup

    for nv in (10_000, 40_000, 160_000):
        # 16-dim embeddings, 10% planted near-dups of a lower id.  Cells
        # scale with n so per-cell population (and the within-cell pair
        # fan-out) stays ~constant — the operator's documented skew dial.
        n_cells = max(8, nv // 200)
        base = (
            spark.range(nv)
            .withColumn(
                "embedding",
                F.array(*[F.randn(seed=i) for i in range(16)]).cast("array<double>"),
            )
            .select(F.col("id").alias("vec_id"), "embedding")
        )
        dup = (
            base.where((F.col("vec_id") % 10 == 0) & (F.col("vec_id") > 0))
            .withColumn("vec_id", F.col("vec_id") + nv)
            .withColumn(
                "embedding",
                F.transform("embedding", lambda x: x * 1.000001),
            )
        )
        emb = base.unionByName(dup)
        print(f"== vecs={nv + nv // 10}")
        _bench("semdedup", semdedup(emb, n_cells=n_cells, centroid_method="lowest_id"))


if __name__ == "__main__":
    main()
