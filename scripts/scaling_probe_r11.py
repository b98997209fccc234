"""Round-11 scaling probes.

1. ycck     — synthesize_jpeg_ycck + pixel stats at 5k/20k/80k media:
   two mapInPandas islands (encode, decode), zero shuffle, per-file
   Python codec work; expected linear.
2. gif_anim — synthesize_gif_animated + gif_animated_stats at the same
   sizes: multi-frame LZW encode + disposal compositing per file, same
   island shape; expected linear.
3. banded   — incremental_dedup_banded of a FIXED 10k new snapshot
   against bucketed banded indexes built from 40k/160k/640k base docs:
   the per-ingest claim is that cost scales with the NEW side — the
   index branch is a bucketed scan with no exchange — so the tail
   should grow far sub-linearly in the base (the scan itself grows).
   A same-size plain incremental_dedup run is printed for reference.
4. sigcache — the corpus signature chain (minhash pairs + survivor
   budget + recall stats over one corpus) WITH and WITHOUT
   shared_signature_cache at 40k docs: the cached sweep should
   approach the cost of one signature pass plus the per-consumer
   tails.

Usage: python scripts/scaling_probe_r11.py [ycck|gif_anim|banded|sigcache|all]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_trading_spark.session import get_spark


def _bench(name: str, df) -> float:
    from polars_trading_spark import release_persisted

    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"  {name}: {dt:.2f}s", flush=True)
    release_persisted()
    return dt


def _docs(spark, n, d):
    from scripts.scaling_probe_r4 import gen_docs

    gen_docs(spark, n, d)
    return spark.read.parquet(d)


def _ids(spark, n):
    from pyspark.sql import functions as F

    return spark.range(n).select(F.col("id").alias("doc_id"))


def probe_ycck(spark) -> None:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_ycck,
    )

    # warm the Python-worker / Arrow paths so the smallest point isn't
    # charged for JVM+fork init
    png_pixel_stats(synthesize_jpeg_ycck(_ids(spark, 200))).write.format(
        "noop"
    ).mode("overwrite").save()
    for n in (5_000, 20_000, 80_000):
        print(f"== media={n}")
        _bench("ycck_decode", png_pixel_stats(synthesize_jpeg_ycck(_ids(spark, n))))


def probe_gif_anim(spark) -> None:
    from polars_trading_spark.functions.multimodal import (
        gif_animated_stats,
        synthesize_gif_animated,
    )

    for n in (5_000, 20_000, 80_000):
        print(f"== media={n}")
        _bench(
            "gif_animated_decode",
            gif_animated_stats(synthesize_gif_animated(_ids(spark, n))),
        )


def probe_banded(spark) -> None:
    from pyspark.sql import functions as F

    from polars_trading_spark.functions.dedup import (
        incremental_dedup,
        incremental_dedup_banded,
        minhash_index,
        write_banded_minhash_index,
    )

    new_n = 10_000
    dn = tempfile.mkdtemp(prefix="pts_probe_r11_new_")
    try:
        new = _docs(spark, new_n, dn).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )
        for base_n in (40_000, 160_000, 640_000):
            d = tempfile.mkdtemp(prefix="pts_probe_r11_")
            try:
                base = _docs(spark, base_n, d)
                idx = minhash_index(base).localCheckpoint()
                t0 = time.time()
                write_banded_minhash_index(idx, "pts_probe_banded", buckets=32)
                print(
                    f"== base={base_n} (index write {time.time() - t0:.2f}s)"
                )
                _bench(
                    "banded_ingest_10k",
                    incremental_dedup_banded(
                        new, spark.table("pts_probe_banded")
                    ),
                )
                _bench("plain_ingest_10k", incremental_dedup(new, idx))
            finally:
                spark.sql("DROP TABLE IF EXISTS pts_probe_banded")
                shutil.rmtree(d, ignore_errors=True)
    finally:
        shutil.rmtree(dn, ignore_errors=True)


def probe_sigcache(spark) -> None:
    from polars_trading_spark.functions.corpus import dedup_survivor_budget
    from polars_trading_spark.functions.dedup import (
        dedup_recall_stats,
        minhash_lsh_pairs,
        shared_signature_cache,
    )

    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="pts_probe_r11_sig_")
    try:
        _docs(spark, 20_000, d)

        def chain(tag: str) -> None:
            # fresh read per call: the cache must hit on the
            # CANONICALIZED plan, not object identity
            docs = spark.read.parquet(d).withColumn(
                "source", F.concat(F.lit("s"), (F.col("doc_id") % 4))
            )
            total = 0.0
            total += _bench(f"{tag}:pairs", minhash_lsh_pairs(docs))
            total += _bench(
                f"{tag}:survivor", dedup_survivor_budget(docs)
            )
            total += _bench(f"{tag}:recall", dedup_recall_stats(docs))
            print(f"  {tag}: TOTAL {total:.2f}s", flush=True)

        chain("cold")
        with shared_signature_cache():
            chain("cached")
    finally:
        shutil.rmtree(d, ignore_errors=True)


PROBES = {
    "ycck": probe_ycck,
    "gif_anim": probe_gif_anim,
    "banded": probe_banded,
    "sigcache": probe_sigcache,
}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("pts-probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in PROBES.items():
        if which in (name, "all"):
            print(f"---- {name}", flush=True)
            fn(spark)


if __name__ == "__main__":
    main()
