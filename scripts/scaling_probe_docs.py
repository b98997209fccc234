"""Scaling probe for the LLM-pipeline extension operators.

Generates synthetic documents and embeddings distributively
(spark.range + hash-derived tokens — no driver materialization, no RNG
so runs are reproducible), persists them as split parquet, and times
the dedup / similarity operators at increasing corpus sizes.  As with
scaling_probe.py, the point is the SLOPE: LSH/IVF candidate generation
should grow ~linearly with corpus size, never quadratically.

Planted structure so the ops have real work to do:
* every 50th doc is a near-dup of its predecessor (3 of 60 words differ)
* every 97th doc is an exact dup of the doc 3 before it

Usage: python scripts/scaling_probe_docs.py [n_docs ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from polars_trading_spark.functions import dedup, similarity
from polars_trading_spark.session import get_spark

VOCAB = 5_000
WORDS = 60
DIM = 16


def gen_docs(spark, n_docs: int, path: str) -> None:
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # Near-dup groups share a generator id; exact dups copy outright.
    gid = (
        F.when((F.col("doc_id") % 97) == 3, F.col("doc_id") - 3)
        .when((F.col("doc_id") % 50) == 1, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
    )
    near = ((F.col("doc_id") % 50) == 1) & ((F.col("doc_id") % 97) != 3)

    def word(seed: F.Column, j) -> F.Column:
        return F.concat(
            F.lit("w"), F.pmod(F.xxhash64(seed * F.lit(1_000_003) + j), F.lit(VOCAB)).cast("string")
        )

    words = F.transform(F.sequence(F.lit(0), F.lit(WORDS - 1)), lambda j: word(gid, j))
    # Near-dups: replace the last 3 words with doc-keyed ones.
    tail = F.transform(F.sequence(F.lit(WORDS), F.lit(WORDS + 2)), lambda j: word(F.col("doc_id"), j))
    text = F.concat_ws(
        " ", F.when(near, F.concat(F.slice(words, 1, WORDS - 3), tail)).otherwise(words)
    )
    base.select("doc_id", text.alias("text"), F.lit("en").alias("lang")).repartition(
        32
    ).write.mode("overwrite").parquet(path)


def gen_embeddings(spark, n_vecs: int, path: str) -> None:
    base = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (F.pmod(F.xxhash64(F.col("vec_id") * F.lit(DIM) + j), F.lit(1000)) / 500.0 - 1.0).cast(
            "float"
        ),
    )
    base.select("vec_id", comp.alias("embedding")).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)


def gen_docs_zipf(spark, n_docs: int, path: str) -> None:
    """Skewed-vocabulary corpus for the PPJoin-vs-naive crossover probe.

    The flat generator above gives near-unique shingles (uniform hashes),
    which hides the quadratic blowup of shared-shingle candidate joins.
    Real text is Zipfian: here word index = floor(VOCAB * u^4) for
    uniform u, concentrating mass on few words so frequent shingles
    exist — the regime the PPJoin prefix filter is for.
    """
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))

    def word(seed: F.Column, j) -> F.Column:
        u = F.pmod(F.xxhash64(seed * F.lit(1_000_003) + j), F.lit(1_000_000)) / 1_000_000.0
        return F.concat(F.lit("w"), F.floor(F.lit(float(VOCAB)) * F.pow(u, F.lit(4.0))).cast("string"))

    words = F.transform(F.sequence(F.lit(0), F.lit(WORDS - 1)), lambda j: word(F.col("doc_id"), j))
    base.select(
        "doc_id", F.concat_ws(" ", words).alias("text"), F.lit("en").alias("lang")
    ).repartition(32).write.mode("overwrite").parquet(path)


def ngram_naive_pairs(docs, threshold: float):
    """The round-1 baseline: all pairs sharing ANY shingle within the
    (lang) block, then exact Jaccard verify.  No prefix/length/positional
    filters — candidate count grows with sum(df^2) over shingles, i.e.
    quadratically once frequent shingles exist."""
    from polars_trading_spark.functions.dedup import _tokenized, shingle_hashes

    base = _tokenized(docs, "text", "doc_id", extra=("lang",)).select(
        "lang", "__id", shingle_hashes(F.col("__toks"), 3).alias("__ng")
    )
    post = base.select("lang", "__id", F.explode("__ng").alias("__s"))
    cand = (
        post.alias("a")
        .join(
            post.alias("b"),
            on=[
                F.col("a.lang") == F.col("b.lang"),
                F.col("a.__s") == F.col("b.__s"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(F.col("a.__id").alias("ia"), F.col("b.__id").alias("ib"))
        .distinct()
    )
    pairs = cand.join(
        base.select(F.col("__id").alias("ia"), F.col("__ng").alias("nga")), "ia"
    ).join(base.select(F.col("__id").alias("ib"), F.col("__ng").alias("ngb")), "ib")
    inter = F.size(F.array_intersect("nga", "ngb"))
    union = F.size("nga") + F.size("ngb") - inter
    return pairs.select((inter / union).alias("j")).where(F.col("j") >= threshold)


def crossover() -> None:
    """PPJoin-vs-naive candidate-generation crossover on Zipfian text.
    Usage: python scripts/scaling_probe_docs.py crossover [sizes...]"""
    from polars_trading_spark import release_persisted
    from polars_trading_spark.functions import dedup

    sizes = [int(x) for x in sys.argv[2:]] or [2_000, 8_000, 32_000]
    spark = get_spark("pts-ngram-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    print("n_docs,ppjoin_s,ppjoin_pairs,naive_s,naive_pairs", flush=True)
    for n in sizes:
        d = tempfile.mkdtemp(prefix="pts_zipf_docs_")
        try:
            gen_docs_zipf(spark, n, d)
            docs = spark.read.parquet(d)
            t0 = time.time()
            pp = dedup.ngram_jaccard_pairs(docs, threshold=0.5).count()
            t_pp = time.time() - t0
            release_persisted()
            t0 = time.time()
            nv = ngram_naive_pairs(docs, 0.5).count()
            t_nv = time.time() - t0
            print(f"{n},{t_pp:.1f},{pp},{t_nv:.1f},{nv}", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "crossover":
        crossover()
        return
    sizes = [int(x) for x in sys.argv[1:]] or [5_000, 50_000, 250_000]
    spark = get_spark("pts-scaling-docs")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        "n_docs,exact_s,minhash_s,simhash_s,ngram_s,n_vecs,topk_exact_s,topk_lsh_s,topk_ivf_s",
        flush=True,
    )
    for n in sizes:
        d = tempfile.mkdtemp(prefix="pts_scale_docs_")
        e = tempfile.mkdtemp(prefix="pts_scale_emb_")
        try:
            gen_docs(spark, n, d)
            n_vecs = max(n // 2, 1000)
            gen_embeddings(spark, n_vecs, e)
            docs = spark.read.parquet(d)
            emb = spark.read.parquet(e)
            queries = emb.where(F.col("vec_id") < 10)
            t = {}
            for name, fn in [
                ("exact", lambda: dedup.exact_dedup(docs).where("is_duplicate").count()),
                ("minhash", lambda: dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.5).count()),
                ("simhash", lambda: dedup.simhash_pairs(docs, bits=48, max_hamming=3).count()),
                ("ngram", lambda: dedup.ngram_jaccard_pairs(docs, threshold=0.5).count()),
                ("topk_exact", lambda: similarity.cosine_topk(emb, queries, k=5).count()),
                ("topk_lsh", lambda: similarity.srp_lsh_topk(emb, queries, k=5).count()),
                ("topk_ivf", lambda: similarity.ivf_topk(emb, queries, k=5).count()),
            ]:
                t0 = time.time()
                fn()
                t[name] = time.time() - t0
            print(
                f"{n},{t['exact']:.1f},{t['minhash']:.1f},{t['simhash']:.1f},"
                f"{t['ngram']:.1f},{n_vecs},{t['topk_exact']:.1f},{t['topk_lsh']:.1f},"
                f"{t['topk_ivf']:.1f}",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
            shutil.rmtree(e, ignore_errors=True)


if __name__ == "__main__":
    main()
