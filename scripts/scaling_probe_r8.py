"""Round-8 scaling probes.

1. dedup_recall_stats (sampled harness, fraction 0.5) over synthetic
   Zipfian docs at 20k/80k/320k — the exact PPJoin arm runs on the
   salted-hash half, so the probe checks the SAMPLED harness stays
   ~linear where the full-corpus arm trended superlinear;
2. multimodal png decode (synthesize_png -> png_pixel_stats) at
   20k/80k/320k media — two mapInPandas stages, expected linear.

Usage: python scripts/scaling_probe_r8.py [recall|png]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_trading_spark.session import get_spark


def _bench(name: str, df) -> None:
    from polars_trading_spark import release_persisted

    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {name}: {time.time() - t0:.2f}s", flush=True)
    release_persisted()


def probe_recall(spark) -> None:
    import shutil
    import tempfile

    from scripts.scaling_probe_r4 import gen_docs

    from polars_trading_spark.functions.dedup import dedup_recall_stats

    for nd in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r8_docs_")
        try:
            gen_docs(spark, nd, d)
            docs = spark.read.parquet(d)
            print(f"== docs={nd}")
            _bench(
                "dedup_recall_sampled",
                dedup_recall_stats(
                    docs,
                    ngram=3,
                    num_hashes=12,
                    bands=4,
                    jaccard_threshold=0.2,
                    sample_fraction=0.5,
                ),
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_png(spark) -> None:
    from pyspark.sql import functions as F

    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_png,
    )

    for nd in (20_000, 80_000, 320_000):
        base = spark.range(nd).select(F.col("id").alias("doc_id"))
        print(f"== media={nd}")
        _bench("png_decode", png_pixel_stats(synthesize_png(base)))


def probe_budget(spark) -> None:
    import shutil
    import tempfile

    from scripts.scaling_probe_r4 import gen_docs

    from polars_trading_spark.functions.bpe import bpe_token_budget, bpe_train
    from polars_trading_spark.functions.corpus import token_budget_curves

    for nd in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r8b_docs_")
        try:
            gen_docs(spark, nd, d)
            from pyspark.sql import functions as F

            docs = spark.read.parquet(d).withColumn(
                "source",
                F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")),
            )
            print(f"== docs={nd}")
            _bench("token_budget_curves", token_budget_curves(docs))
            import time as _t

            t0 = _t.time()
            merges, words = bpe_train(docs, n_merges=20)
            merges.collect()
            print(f"  bpe_train(20): {_t.time() - t0:.2f}s", flush=True)
            _bench("bpe_token_budget", bpe_token_budget(docs, words))
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_capacity(spark) -> None:
    from pyspark.sql import functions as F

    from polars_trading_spark.operators.cross_section import portfolio_capacity

    for n in (200_000, 800_000, 3_200_000):
        bars = spark.range(n).select(
            F.concat(F.lit("S"), (F.col("id") % 8).cast("string")).alias("symbol"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.floor(F.col("id") / 8).cast("long") * 900_000_000
            ).alias("ts_event"),
            (100.0 + 5.0 * F.sin(F.col("id") / 97.0) + F.randn(seed=11)).alias("close"),
            (F.col("id") % 1000 + 100).alias("volume"),
        )
        print(f"== bars={n}")
        _bench(
            "portfolio_capacity",
            portfolio_capacity(bars, ts_col="ts_event"),
        )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("pts-probe-r8")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("recall", "all"):
        probe_recall(spark)
    if which in ("png", "all"):
        probe_png(spark)
    if which in ("budget", "all"):
        probe_budget(spark)
    if which in ("capacity", "all"):
        probe_capacity(spark)


if __name__ == "__main__":
    main()
