"""Round-12 scaling probes.

1. esd   — exact_substring_dedup at 20k/80k/320k docs (~120 tokens
   each, ~10% planted repeated chunks): positional shingle explode +
   hash aggregates + one lag window; expected LINEAR in corpus tokens
   (the Lee-et-al. claim this engine's formulation rests on — no
   suffix sort, no all-pairs stage).
2. webp  — synthesize_webp_lossless + webp_pixel_stats at 5k/20k/80k
   media: two mapInPandas islands over the _media_base repartition;
   expected linear, file-parallel.
3. pmcu  — synthesize_jpeg_partialmcu + pixel stats at the same sizes:
   the ceil-padded decode path; expected linear.

Usage: python scripts/scaling_probe_r12.py [esd|webp|pmcu|all]
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

    path = os.path.join(d, f"docs_{n}")
    gen_docs(spark, n, path)
    return spark.read.parquet(path)


def probe_esd(spark, d):
    from polars_trading_spark.functions.dedup import exact_substring_dedup

    print("exact_substring_dedup (k=8), linear-in-tokens claim:")
    for n in (20_000, 80_000, 320_000):
        docs = _docs(spark, n, d)
        _bench(f"esd n={n}", exact_substring_dedup(docs, k=8))


def probe_webp(spark, d):
    from polars_trading_spark.functions.webp import (
        synthesize_webp_lossless,
        webp_pixel_stats,
    )

    print("VP8L lossless encode+decode islands:")
    for n in (5_000, 20_000, 80_000):
        docs = spark.range(n).selectExpr("id AS doc_id", "'x' AS text")
        _bench(f"webp n={n}", webp_pixel_stats(synthesize_webp_lossless(docs)))


def probe_pmcu(spark, d):
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_partialmcu,
    )

    print("partial-MCU JPEG encode+decode islands:")
    for n in (5_000, 20_000, 80_000):
        docs = spark.range(n).selectExpr("id AS doc_id", "'x' AS text")
        _bench(f"pmcu n={n}", png_pixel_stats(synthesize_jpeg_partialmcu(docs)))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("pts-scaling-r12")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp()
    try:
        if which in ("esd", "all"):
            probe_esd(spark, d)
        if which in ("webp", "all"):
            probe_webp(spark, d)
        if which in ("pmcu", "all"):
            probe_pmcu(spark, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
