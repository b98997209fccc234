"""Round-9 scaling probes.

1. recall_auto — dedup_recall_stats with the NEW auto fraction
   (target_docs constant) over 20k/80k/320k docs: the sampled pair cost
   must stay ~FLAT as the corpus grows (the round-8 static 0.5 fraction
   only cut the quadratic by 4x);
2. bpe_batched — bpe_train wall at n_merges=24 with merges_per_round
   1 vs 8 on the same corpus: rounds ~ vocab/k, so the batched trainer
   should land well under the classic wall (both scan the same
   vocab-sized word table per round);
3. walk_forward at 200k/800k/3.2M events — ntile + broadcast hulls,
   expected linear;
4. band_net — spread_band_backtest_net at 8 symbols x 25k/100k/400k
   bars: the CS-cost joins must not bend the band backtest's slope;
5. contamination — contamination_report over 20k/80k/320k docs with a
   2k-doc benchmark: broadcast probe, expected linear;
6. jpeg_color — synthesize_jpeg_color -> pixel stats at 20k/80k/320k
   media: two Arrow islands, embarrassingly parallel, expected linear.

Usage: python scripts/scaling_probe_r9.py [recall_auto|bpe_batched|
walk_forward|band_net|contamination|jpeg_color|all]
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


def probe_recall_auto(spark) -> None:
    import shutil
    import tempfile

    from scripts.scaling_probe_r4 import gen_docs

    from polars_trading_spark.functions.dedup import dedup_recall_stats

    for nd in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r9_docs_")
        try:
            gen_docs(spark, nd, d)
            docs = spark.read.parquet(d)
            print(f"== docs={nd}")
            _bench(
                "dedup_recall_auto(target=10k)",
                dedup_recall_stats(
                    docs,
                    ngram=3,
                    num_hashes=12,
                    bands=4,
                    jaccard_threshold=0.2,
                    sample_fraction="auto",
                    target_docs=10_000,
                ),
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_bpe_batched(spark) -> None:
    import shutil
    import tempfile

    from scripts.scaling_probe_r4 import gen_docs

    from polars_trading_spark.functions.bpe import bpe_train

    d = tempfile.mkdtemp(prefix="pts_probe_r9_bpe_")
    try:
        gen_docs(spark, 80_000, d)
        docs = spark.read.parquet(d)
        for k in (1, 8):
            t0 = time.time()
            merges, _ = bpe_train(docs, n_merges=24, merges_per_round=k)
            got = merges.count()
            print(
                f"  bpe_train(24 merges, k={k}): {time.time() - t0:.2f}s "
                f"({got} merges)",
                flush=True,
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_walk_forward(spark) -> None:
    from pyspark.sql import functions as F

    from polars_trading_spark.operators.cv import walk_forward

    for n in (200_000, 800_000, 3_200_000):
        ev = spark.range(n).select(
            F.concat(F.lit("S"), (F.col("id") % 8).cast("string")).alias("symbol"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.floor(F.col("id") / 8).cast("long") * 60_000_000
            ).alias("ts_event"),
        ).withColumn(
            "vertical_barrier",
            F.col("ts_event") + F.expr("INTERVAL 4 HOURS"),
        )
        print(f"== events={n}")
        _bench("walk_forward", walk_forward(ev, n_splits=4, embargo="30m"))


def _probe_bars(spark, n: int, n_syms: int = 8):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.concat(F.lit("S"), (F.col("id") % n_syms).cast("string")).alias("symbol"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + F.floor(F.col("id") / n_syms).cast("long") * 900_000_000
        ).alias("ts_event"),
        (100.0 + 5.0 * F.sin(F.col("id") / 97.0) + F.randn(seed=11)).alias("close"),
    ).select(
        "*",
        (F.col("close") * 1.004).alias("high"),
        (F.col("close") * 0.996).alias("low"),
    )


def probe_band_net(spark) -> None:
    from polars_trading_spark.operators.mean_reversion import (
        spread_band_backtest_net,
    )

    for n in (200_000, 800_000, 3_200_000):
        bars = _probe_bars(spark, n)
        print(f"== bars={n}")
        _bench(
            "spread_band_backtest_net",
            spread_band_backtest_net(bars, ts_col="ts_event"),
        )


def probe_contamination(spark) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from scripts.scaling_probe_r4 import gen_docs

    from polars_trading_spark.functions.corpus import contamination_report

    for nd in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r9_cr_")
        try:
            gen_docs(spark, nd, d)
            docs = spark.read.parquet(d).withColumn(
                "source",
                F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")),
            )
            bench = docs.where(F.col("doc_id") % (nd // 2_000) == 0).withColumn(
                "benchmark", F.lit("suite")
            )
            print(f"== docs={nd} (bench ~2k)")
            _bench(
                "contamination_report", contamination_report(docs, bench)
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_jpeg_color(spark) -> None:
    from pyspark.sql import functions as F

    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_color,
    )

    for nd in (20_000, 80_000, 320_000):
        base = spark.range(nd).select(F.col("id").alias("doc_id"))
        print(f"== media={nd}")
        _bench("jpeg_color_decode", png_pixel_stats(synthesize_jpeg_color(base)))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("pts-probe-r9")
    spark.sparkContext.setLogLevel("ERROR")
    probes = {
        "recall_auto": probe_recall_auto,
        "bpe_batched": probe_bpe_batched,
        "walk_forward": probe_walk_forward,
        "band_net": probe_band_net,
        "contamination": probe_contamination,
        "jpeg_color": probe_jpeg_color,
    }
    for name, fn in probes.items():
        if which in (name, "all"):
            print(f"-- probe {name}")
            fn(spark)


if __name__ == "__main__":
    main()
