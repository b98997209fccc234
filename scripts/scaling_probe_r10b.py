"""Round-10 second-wave scaling probes.

1. incremental — minhash_index on an 80% base + incremental_dedup of
   the 20% new snapshot at 20k/80k/320k docs: signatures for the new
   side only, one band equi-join; expected linear (in TOTAL corpus here
   because the probe rebuilds the index; a production ingest reads it).
2. fertility   — tokenizer_fertility at 20k/80k/320k docs: corpus
   explode + vocab hash join + two integer aggregates, expected linear.
3. pack_eff    — pack_sequences + packing_efficiency at the same
   sizes: the packing island dominates; the report adds two
   aggregates, expected linear.
4. quantize    — embedding_quantize_report over 50k/200k/800k
   synthetic 64-dim vectors: one posexplode + broadcast scale join +
   hierarchical folds, expected linear.
5. pbo         — pbo_cscv over 200k/800k/3.2M trades (15m bars): the
   corpus-sized work is one exploded lag pass; the CSCV combinatorics
   are data-independent, so the tail must be FLAT + bar-pass-linear.
6. impact      — market_impact_fit at 200k/800k/3.2M trades: parent
   windows, expected linear.

Usage: python scripts/scaling_probe_r10b.py [incremental|fertility|
pack_eff|quantize|pbo|impact|all]
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


def _trades(spark, n, d):
    from scripts.scaling_probe import gen_trades

    gen_trades(spark, n, n_symbols=8, days=30, path=d)
    return spark.read.parquet(d)


def probe_incremental(spark) -> None:
    from pyspark.sql import functions as F

    from polars_trading_spark.functions.dedup import (
        incremental_dedup,
        minhash_index,
    )

    for n in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10b_")
        try:
            docs = _docs(spark, n, d)
            base = docs.where(F.col("doc_id") % 5 != 0)
            new = docs.where(F.col("doc_id") % 5 == 0)
            index = minhash_index(base).localCheckpoint()
            print(f"== docs={n}")
            _bench("incremental_dedup", incremental_dedup(new, index))
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_fertility(spark) -> None:
    from pyspark.sql import functions as F

    from polars_trading_spark.functions.bpe import bpe_train, tokenizer_fertility

    for n in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10b_")
        try:
            docs = _docs(spark, n, d).withColumn(
                "lang",
                F.element_at(
                    F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                    (F.col("doc_id") % 3 + 1).cast("int"),
                ),
            )
            _, words = bpe_train(docs, n_merges=20)
            words = words.localCheckpoint()
            print(f"== docs={n}")
            _bench("tokenizer_fertility", tokenizer_fertility(docs, words))
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_pack_eff(spark) -> None:
    from polars_trading_spark.functions.corpus import (
        pack_sequences,
        packing_efficiency,
    )

    for n in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10b_")
        try:
            docs = _docs(spark, n, d)
            print(f"== docs={n}")
            packed = pack_sequences(docs, budget_tokens=512, n_shards=64)
            _bench(
                "packing_efficiency",
                packing_efficiency(packed, budget_tokens=512),
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_quantize(spark) -> None:
    from pyspark.sql import functions as F

    from polars_trading_spark.functions.similarity import (
        embedding_quantize_report,
    )

    for n in (50_000, 200_000, 800_000):
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    F.pmod(F.col("id") * 2654435761 + i * 97003, F.lit(9973))
                    - 4986
                ).cast("double")
                / 1000.0,
            ).alias("embedding"),
        )
        print(f"== vectors={n}")
        _bench("embedding_quantize", embedding_quantize_report(emb))


def probe_pbo(spark) -> None:
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators import bars as bars_ops
    from polars_trading_spark.operators.pbo import pbo_cscv

    for n in (200_000, 800_000, 3_200_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10b_")
        try:
            trades = _trades(spark, n, d)
            with Config(timestamp_column="ts_event"):
                bars = bars_ops.time_bars(trades, bar_size="15m")
            print(f"== trades={n}")
            _bench("pbo_cscv", pbo_cscv(bars))
        finally:
            shutil.rmtree(d, ignore_errors=True)


def probe_impact(spark) -> None:
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.execution import market_impact_fit

    for n in (200_000, 800_000, 3_200_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10b_")
        try:
            trades = _trades(spark, n, d)
            print(f"== trades={n}")
            with Config(timestamp_column="ts_event"):
                out = market_impact_fit(trades)
            _bench("market_impact_fit", out)
        finally:
            shutil.rmtree(d, ignore_errors=True)


_PROBES = {
    "incremental": probe_incremental,
    "fertility": probe_fertility,
    "pack_eff": probe_pack_eff,
    "quantize": probe_quantize,
    "pbo": probe_pbo,
    "impact": probe_impact,
}




def probe_codecs(spark) -> None:
    from polars_trading_spark.functions.multimodal import (
        pixel_stats,
        synthesize_jpeg_cmyk,
        synthesize_png16,
        synthesize_png_sub8,
    )

    for n in (20_000, 80_000, 320_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10b_")
        try:
            docs = _docs(spark, n, d)
            print(f"== media={n}")
            _bench("png16", pixel_stats(synthesize_png16(docs)))
            _bench("jpeg_cmyk", pixel_stats(synthesize_jpeg_cmyk(docs)))
            _bench("png_sub8", pixel_stats(synthesize_png_sub8(docs)))
        finally:
            shutil.rmtree(d, ignore_errors=True)


_PROBES["codecs"] = probe_codecs


def probe_quant3(spark) -> None:
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators import bars as bars_ops
    from polars_trading_spark.operators.cross_section import ic_decay
    from polars_trading_spark.operators.seasonality import weekday_effect
    from polars_trading_spark.operators.volatility import rv_signature

    for n in (200_000, 800_000, 3_200_000):
        d = tempfile.mkdtemp(prefix="pts_probe_r10b_")
        try:
            trades = _trades(spark, n, d)
            print(f"== trades={n}")
            with Config(timestamp_column="ts_event"):
                _bench("rv_signature", rv_signature(trades))
                _bench("weekday_effect", weekday_effect(trades))
                bars = bars_ops.time_bars(trades, bar_size="15m")
                _bench("ic_decay", ic_decay(bars, ts_col="ts_event"))
        finally:
            shutil.rmtree(d, ignore_errors=True)


_PROBES["quant3"] = probe_quant3


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark()
    names = list(_PROBES) if which == "all" else [which]
    for nm in names:
        print(f"--- {nm}")
        _PROBES[nm](spark)
