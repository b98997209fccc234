"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``      — exact brute-force top-k: broadcast the (small)
  query set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (no Python), rank per query.  The right baseline and
  the correctness oracle for any ANN variant.
* ``srp_lsh_topk``     — the scale path: signed-random-projection LSH
  where the hyperplanes are actual corpus vectors (deterministic and
  available to any engine — no RNG, reproducible).  Candidates =
  same-bucket rows, so the crossJoin disappears; recall trades off
  against the plane count.

Embeddings in the testdata are unit-normalized, so cosine == dot; the
generic path normalizes explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "cosine",
    "cosine_topk",
    "srp_lsh_topk",
    "kmeans_centroids",
    "ivf_topk",
    "embedding_cosine_pairs",
]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Returns (query_id, rank, vec_id, cosine_sim).  Queries are
    broadcast; ties in similarity (after rounding) break on vec_id so
    rankings are engine-independent.  Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("__cv"))
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_sim")
    )


def srp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k via signed-random-projection buckets.

    Hyperplanes are the ``num_planes`` lowest-id corpus vectors
    (deterministic, data-derived).  A vector's bucket is the bit pattern
    of its dot-product signs against the planes; each query only scans
    its own bucket.  Returns the same schema as ``cosine_topk`` —
    compare against it to measure recall.
    """
    planes = [
        row[0]
        for row in corpus.select(_as_double(F.col(vec_col)))
        .orderBy(F.col(id_col))
        .limit(num_planes)
        .collect()
    ]

    def bucket(vec: Column) -> Column:
        out = F.lit(0)
        for j, p in enumerate(planes):
            d = dot(vec, F.array(*[F.lit(float(x)) for x in p]))
            out = out + F.when(d >= 0, F.lit(1 << j)).otherwise(0)
        return out

    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("__cv")
    ).withColumn("__bucket", bucket(F.col("__cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    ).withColumn("__bucket", bucket(F.col("__qv")))

    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
    return (
        c.join(F.broadcast(q), on="__bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_sim")
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 256,
    iters: int = 3,
) -> list[list[float]]:
    """One-pass sampled k-means-lite (spherical Lloyd) coarse quantizer.

    Deterministic by construction: the sample is the ``sample_size``
    lowest-id vectors, initialization is the first ``n_cells`` of them,
    and each iteration is argmax-cosine assignment + re-normalized mean.
    Driver-side numpy over a bounded sample — the classic IVF training
    recipe (train on a sample, assign the full corpus distributed); at
    very high dim move the same matmuls into one ``mapInPandas`` pass.
    Empty cells keep their previous centroid.
    """
    import numpy as np

    rows = (
        corpus.select(_as_double(F.col(vec_col)))
        .orderBy(F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X = X / norms
    C = X[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = c / n
    return [[float(x) for x in c] for c in C]


def _with_centroid_sims(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str,
    out_col: str = "__sims",
) -> DataFrame:
    """Append an array column of cosine similarities against ``centroids``
    via one Arrow-batched ``mapInPandas`` pass.

    This is the scale path for coarse-quantizer assignment: the centroid
    matrix rides in the UDF closure (no dim×cells literal forest in the
    plan, no interpreted fold per cell per row), and each Arrow batch is
    a handful of vectorized numpy ops.  Accumulation is **sequential
    over dimensions** (one vectorized step per dim), reproducing the
    exact IEEE-754 operation order of the JVM ``aggregate`` fold and the
    DuckDB oracle's list comprehension — so assignments are bit-identical
    to the pure-Column formulation, not merely close.
    """
    import numpy as np
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)  # (cells, dim)
    cn = np.zeros(C.shape[0])
    for d in range(C.shape[1]):
        cn += C[:, d] ** 2
    cnorm = np.sqrt(cn)
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (n, dim)
            dots = np.zeros((len(pdf), C.shape[0]))
            na = np.zeros(len(pdf))
            for d in range(C.shape[1]):
                dots += X[:, d : d + 1] * C[None, :, d]
                na += X[:, d] ** 2
            sims = dots / (np.sqrt(na)[:, None] * cnorm[None, :])
            out = pdf.copy()
            out[out_col] = list(sims)
            yield out

    return df.mapInPandas(fn, schema=schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    centroid_method: str = "kmeans",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    The other canonical ANN layout next to SRP-LSH (``srp_lsh_topk``):
    partition the corpus into ``n_cells`` Voronoi cells around centroids,
    and have each query scan only its ``nprobe`` nearest cells.  Cells
    are the natural partitioning key at scale — the corpus shuffles once
    on cell id, and a probe is an equi-join on it.

    ``centroid_method``:

    * ``"kmeans"`` (default) — sampled spherical k-means
      (``kmeans_centroids``): balanced, data-shaped cells, the real IVF
      recipe.  Iterative, hence not SQL-expressible — correctness is
      gated by the recall test against the exact (oracle-verified)
      ``cosine_topk`` instead of a DuckDB twin.
    * ``"lowest_id"`` — the ``n_cells`` lowest-id corpus vectors:
      centroids any engine can reproduce exactly, used by the DuckDB
      differential oracle.

    Cell assignment is argmax cosine against the centroids, ties to the
    lowest cell index; the per-row affinity computation runs as a numpy
    matmul inside ``mapInPandas`` (``_with_centroid_sims``), bit-aligned
    with the Column-fold formulation so the DuckDB differential oracle
    still matches exactly.

    Returns the ``cosine_topk`` schema (query_id, rank, vec_id,
    cosine_sim) — compare against it to measure recall.
    """
    if centroid_method == "kmeans":
        centroids = kmeans_centroids(corpus, n_cells, id_col=id_col, vec_col=vec_col)
    elif centroid_method == "lowest_id":
        centroids = [
            row[0]
            for row in corpus.select(_as_double(F.col(vec_col)))
            .orderBy(F.col(id_col))
            .limit(n_cells)
            .collect()
        ]
    else:
        raise ValueError(f"centroid_method must be 'kmeans' or 'lowest_id', got {centroid_method!r}")

    c = (
        _with_centroid_sims(
            corpus.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("__cv")),
            centroids,
            vec_col="__cv",
        )
        .withColumn("__cell", F.array_position(F.col("__sims"), F.array_max("__sims")) - 1)
        .drop("__sims")
    )
    q = _with_centroid_sims(
        queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")),
        centroids,
        vec_col="__qv",
    )
    probes = (
        q.select("query_id", "__qv", F.posexplode("__sims").alias("__cell", "__csim"))
        .withColumn(
            "__probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("__csim").desc(), F.col("__cell"))
            ),
        )
        .where(F.col("__probe_rank") <= nprobe)
        .select("query_id", "__qv", "__cell")
    )

    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
    return (
        c.join(F.broadcast(probes), on="__cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_sim")
    )


def embedding_cosine_pairs(
    corpus: DataFrame,
    *,
    threshold: float = 0.9,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs: same-SRP-bucket candidates whose
    cosine similarity meets ``threshold`` (the 5th dedup modality —
    near-dups in embedding space rather than token space).

    Bucketing is the recall/cost dial: 2^num_planes buckets bound the
    candidate count at ~N²/2^planes; exact near-dups (cosine → 1) land
    in the same bucket with probability (1 - θ/π)^planes → 1.
    Deterministic (planes are the lowest-id corpus vectors), so results
    are engine-reproducible.
    """
    planes = [
        row[0]
        for row in corpus.select(_as_double(F.col(vec_col)))
        .orderBy(F.col(id_col))
        .limit(num_planes)
        .collect()
    ]

    def bucket(vec: Column) -> Column:
        out = F.lit(0)
        for j, p in enumerate(planes):
            d = dot(vec, F.array(*[F.lit(float(x)) for x in p]))
            out = out + F.when(d >= 0, F.lit(1 << j)).otherwise(0)
        return out

    c = (
        corpus.select(F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("__v"))
        .withColumn("__bucket", bucket(F.col("__v")))
        .withColumn("__norm", _norm(F.col("__v")))
    )
    a, b = c.alias("a"), c.alias("b")
    # Norms precomputed per row — the per-pair work is one dot product.
    sim = F.round(
        dot(F.col("a.__v"), F.col("b.__v")) / (F.col("a.__norm") * F.col("b.__norm")),
        round_digits,
    )
    return (
        a.join(
            b,
            on=[F.col("a.__bucket") == F.col("b.__bucket"), F.col("a.__id") < F.col("b.__id")],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
