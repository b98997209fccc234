"""Round-13 scaling probes.

1. esdc  — exact_substring_dedup_clean at 20k/80k/320k docs: the
   cleaned-text artifact adds (vs the stats twin) one running-sum
   window, one span hash-aggregate, a per-doc collect_list bounded by
   the doc's own token count, and a linear HOF reassembly — expected
   to stay LINEAR in corpus tokens with a modest constant over the
   stats form.
2. pred  — synthesize_webp_predictor + webp_pixel_stats at 5k/20k/80k
   media: the predictor transform decode is per-pixel Python over
   small images inside the file-parallel islands; expected linear in
   media count.
3. avi   — synthesize_avi_mjpeg + avi_frame_stats(stride=2) at the
   same sizes: container walk + stride-sampled JPEG decode; expected
   linear, and stride=4 should cost measurably less decode than
   stride=1 (the sampling knob is real).

Usage: python scripts/scaling_probe_r13.py [esdc|pred|avi|all]
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


def probe_esdc(spark, d):
    from polars_trading_spark.functions.dedup import (
        exact_substring_dedup,
        exact_substring_dedup_clean,
    )

    print("exact_substring_dedup_clean (k=8) vs stats twin, linearity:")
    for n in (20_000, 80_000, 320_000):
        docs = _docs(spark, n, d)
        _bench(f"esd-stats n={n}", exact_substring_dedup(docs, k=8))
        _bench(f"esd-clean n={n}", exact_substring_dedup_clean(docs, k=8))


def probe_pred(spark, d):
    from polars_trading_spark.functions.webp import (
        synthesize_webp_predictor,
        webp_pixel_stats,
    )

    print("VP8L predictor decode, linear-in-media claim:")
    for n in (5_000, 20_000, 80_000):
        docs = _docs(spark, n, d)
        _bench(
            f"webp-pred n={n}",
            webp_pixel_stats(synthesize_webp_predictor(docs)),
        )


def probe_avi(spark, d):
    from polars_trading_spark.functions.video import (
        avi_frame_stats,
        synthesize_avi_mjpeg,
    )

    print("AVI stride-sampled frame decode, linearity + stride knob:")
    for n in (5_000, 20_000, 80_000):
        docs = _docs(spark, n, d)
        _bench(
            f"avi stride=2 n={n}",
            avi_frame_stats(synthesize_avi_mjpeg(docs), stride=2),
        )
    docs = _docs(spark, 20_000, d)
    for stride in (1, 2, 4):
        _bench(
            f"avi stride={stride} n=20000",
            avi_frame_stats(synthesize_avi_mjpeg(docs), stride=stride),
        )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("pts-scaling-r13")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="pts_probe_r13_")
    try:
        if which in ("esdc", "all"):
            probe_esdc(spark, d)
        if which in ("pred", "all"):
            probe_pred(spark, d)
        if which in ("avi", "all"):
            probe_avi(spark, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
