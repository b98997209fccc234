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


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("pts-probe-r8")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("recall", "all"):
        probe_recall(spark)
    if which in ("png", "all"):
        probe_png(spark)


if __name__ == "__main__":
    main()
