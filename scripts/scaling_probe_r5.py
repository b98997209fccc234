"""Round-5 scaling probes.

1. semdedup assignment after the two-level IMI quantizer (re-run of
   SCALING.md §17's cells-proportional-to-n regime; round 4 measured the
   flat quantizer at 2.8/12.2/79.8s for 11k/44k/176k vectors).
2. unigram_logprob / bigram_logprob / pii_profile doc tails (§14 re-run
   after staging fixes; round 4 measured 3.2/11.3/58.7s and
   0.4/1.3/15.6s at 20k/80k/320k docs).

Usage: python scripts/scaling_probe_r5.py [semdedup|docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_trading_spark.session import get_spark


def _bench(name: str, df) -> None:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {name}: {time.time() - t0:.2f}s", flush=True)


def probe_semdedup(spark) -> None:
    from polars_trading_spark.functions.similarity import semdedup

    for nv in (10_000, 40_000, 160_000):
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
            .withColumn("embedding", F.transform("embedding", lambda x: x * 1.000001))
        )
        emb = base.unionByName(dup)
        print(f"== vecs={nv + nv // 10} cells={n_cells}")
        _bench("semdedup_imi", semdedup(emb, n_cells=n_cells, centroid_method="lowest_id"))


def probe_docs(spark) -> None:
    from scripts.scaling_probe_r4 import gen_docs
    import shutil
    import tempfile

    from polars_trading_spark.functions.pii import pii_profile
    from polars_trading_spark.functions.text import bigram_logprob, unigram_logprob

    for nd in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r5_docs_")
        try:
            gen_docs(spark, nd, d)
            docs = spark.read.parquet(d)
            print(f"== docs={nd}")
            _bench("unigram_logprob", unigram_logprob(docs))
            _bench("bigram_logprob", bigram_logprob(docs))
            _bench("pii_profile", pii_profile(docs))
        finally:
            shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    spark = get_spark("scaling-probe-r5")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("semdedup", "all"):
        probe_semdedup(spark)
    if which in ("docs", "all"):
        probe_docs(spark)


if __name__ == "__main__":
    main()
