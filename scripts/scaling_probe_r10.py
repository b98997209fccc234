"""Round-10 scaling probes.

1. bpe_encode  — train once (vocab-bounded), then encode 20k/80k/320k
   docs: two corpus explodes x vocabulary hash joins + one aggregate,
   expected linear;
2. bpe_pack    — bpe_pack_sequences at the same sizes: one explode +
   vocab join + per-doc aggregate + the shard-parallel packing island,
   expected linear;
3. quality     — quality_classifier at 20k/80k/320k docs: feature pass
   + 3 IRLS corpus passes with hierarchical deterministic folds,
   expected linear (the 64-bucket fold tail must NOT dominate);
4. shortfall   — implementation_shortfall + execution_tearsheet at
   200k/800k/3.2M trades: two window families, expected linear;
5. jpeg_422    — synthesize_jpeg_color_422 -> pixel stats at
   20k/80k/320k media: two Arrow islands, embarrassingly parallel.

Usage: python scripts/scaling_probe_r10.py [bpe_encode|bpe_pack|
quality|shortfall|jpeg_422|all]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_trading_spark.session import get_spark


def _bench(name: str, df) -> None:
    from polars_trading_spark import release_persisted

    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {name}: {time.time() - t0:.2f}s", flush=True)
    release_persisted()


def _docs(spark, n, d):
    from scripts.scaling_probe_r4 import gen_docs

    gen_docs(spark, n, d)
    return spark.read.parquet(d)


def probe_bpe_encode(spark) -> None:
    from polars_trading_spark.functions.bpe import bpe_encode, bpe_train

    for n in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10_")
        try:
            docs = _docs(spark, n, d)
            merges, words = bpe_train(docs, n_merges=20)
            merges = merges.localCheckpoint()
            words = words.localCheckpoint()
            print(f"== docs={n}")
            _bench("bpe_encode", bpe_encode(docs, merges, words))
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_bpe_pack(spark) -> None:
    from polars_trading_spark.functions.bpe import bpe_train
    from polars_trading_spark.functions.corpus import bpe_pack_sequences

    for n in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10_")
        try:
            docs = _docs(spark, n, d)
            _, words = bpe_train(docs, n_merges=20)
            words = words.localCheckpoint()
            print(f"== docs={n}")
            _bench(
                "bpe_pack",
                bpe_pack_sequences(docs, words, budget_tokens=512, n_shards=64),
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_quality(spark) -> None:
    from polars_trading_spark.functions.quality_model import quality_classifier

    for n in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10_")
        try:
            docs = _docs(spark, n, d)
            print(f"== docs={n}")
            # constructing the classifier RUNS training (per-iteration
            # bounded collects), so time construction + scoring together
            t0 = time.time()
            out = quality_classifier(docs)
            out.write.format("noop").mode("overwrite").save()
            print(
                f"  quality_classifier (train+score): "
                f"{time.time() - t0:.2f}s",
                flush=True,
            )
            from polars_trading_spark import release_persisted

            release_persisted()
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_shortfall(spark) -> None:
    from pyspark.sql import functions as F

    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.execution import (
        execution_tearsheet,
        implementation_shortfall,
    )

    for n in (200_000, 800_000, 3_200_000):
        tr = spark.range(n).select(
            F.concat(F.lit("S"), (F.col("id") % 8).cast("string")).alias("symbol"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.floor(F.col("id") / 8).cast("long") * 1_000_000
            ).alias("ts_event"),
            (100.0 + 5.0 * F.sin(F.col("id") / 97.0) + F.randn(seed=7)).alias(
                "price"
            ),
            (F.col("id") % 97 + 1).cast("long").alias("size"),
        )
        print(f"== trades={n}")
        with Config(timestamp_column="ts_event"):
            _bench("implementation_shortfall", implementation_shortfall(tr))
            _bench("execution_tearsheet", execution_tearsheet(tr))


def probe_jpeg_422(spark) -> None:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_color_422,
    )

    for n in (20_000, 80_000, 320_000):
        docs = spark.range(n).selectExpr("id AS doc_id")
        print(f"== media={n}")
        _bench(
            "jpeg_422", png_pixel_stats(synthesize_jpeg_color_422(docs))
        )


PROBES = {
    "bpe_encode": probe_bpe_encode,
    "bpe_pack": probe_bpe_pack,
    "quality": probe_quality,
    "shortfall": probe_shortfall,
    "jpeg_422": probe_jpeg_422,
}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("scaling-probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    names = list(PROBES) if which == "all" else [which]
    for nm in names:
        print(f"### {nm}", flush=True)
        PROBES[nm](spark)


if __name__ == "__main__":
    main()
