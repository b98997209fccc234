"""Round-7 scaling probes: growth slopes for the new operators.

1. corpus ops (lexical_diversity, heaps_law, term_burstiness,
   encoding_quality, code_detection) over synthetic Zipfian docs at
   20k/80k/320k — the tokenizer-explode family, expected ~linear;
2. indicator ops (atr, bollinger, macd) over synthetic 8-symbol bar
   tapes at 0.2M/0.8M/3.2M bars — the segment-renormalized EWM folds
   must stay linear and MACD's three-fold cascade must cost ~the sum
   of its parts, not a blow-up (it reuses ONE symbol exchange).

Usage: python scripts/scaling_probe_r7.py [corpus|bars]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_trading_spark.session import get_spark


def _bench(name: str, df) -> None:
    from polars_trading_spark import release_persisted

    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {name}: {time.time() - t0:.2f}s", flush=True)
    release_persisted()


def probe_corpus(spark) -> None:
    import shutil
    import tempfile

    from scripts.scaling_probe_r4 import gen_docs

    from polars_trading_spark.functions.text import (
        code_detection,
        encoding_quality,
        lexical_diversity,
    )
    from polars_trading_spark.functions.tfidf import (
        bm25_topk,
        heaps_law,
        term_burstiness,
    )

    for nd in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r7_docs_")
        try:
            gen_docs(spark, nd, d)
            docs = spark.read.parquet(d)
            print(f"== docs={nd}")
            _bench("lexical_diversity", lexical_diversity(docs))
            _bench("heaps_law", heaps_law(docs))
            _bench("term_burstiness", term_burstiness(docs))
            _bench("encoding_quality", encoding_quality(docs))
            _bench("code_detection", code_detection(docs))
            _bench(
                "bm25",
                bm25_topk(
                    docs, query_terms=("hash", "join", "merge", "stream"), top_k=25
                ),
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


def _gen_bars(spark, n_rows: int):
    return spark.range(n_rows).select(
        F.concat(F.lit("S"), (F.col("id") % 8).cast("string")).alias("symbol"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 900_000_000
        ).alias("ts_event"),
        (100.0 + 5.0 * F.sin(F.col("id") / 97.0) + F.randn(seed=3)).alias("open"),
        (102.0 + 5.0 * F.sin(F.col("id") / 97.0) + F.rand(seed=5)).alias("high"),
        (98.0 + 5.0 * F.sin(F.col("id") / 97.0) - F.rand(seed=7)).alias("low"),
        (100.0 + 5.0 * F.sin(F.col("id") / 97.0) + F.randn(seed=11)).alias("close"),
    )


def probe_bars(spark) -> None:
    from polars_trading_spark.operators.indicators import atr, bollinger, macd

    for n in (200_000, 800_000, 3_200_000):
        bars = _gen_bars(spark, n)
        print(f"== bars={n}")
        _bench("atr", atr(bars))
        _bench("bollinger", bollinger(bars))
        _bench("macd", macd(bars))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("pts-scaling-r7")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("corpus", "all"):
        probe_corpus(spark)
    if which in ("bars", "all"):
        probe_bars(spark)


if __name__ == "__main__":
    main()
