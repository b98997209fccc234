"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``      — exact brute-force top-k: broadcast the (small)
  query set against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (no Python), rank per query.  The right baseline and
  the correctness oracle for any ANN variant.  Guarded against
  unbounded corpora (``max_corpus_rows``) so the O(N·Q) contract is
  enforceable, not advisory.
* ``srp_lsh_topk``     — the scale path: signed-random-projection LSH
  where the hyperplanes are actual corpus vectors (deterministic and
  available to any engine — no RNG, reproducible).  Candidates =
  same-bucket rows, so the crossJoin disappears; recall trades off
  against the plane count.
* ``ivf_topk``         — inverted-file coarse quantizer (lowest-id or
  sampled-k-means centroids); each query scans only its nprobe nearest
  cells.

Plan-construction discipline: planes and centroids are carried as a
single broadcast one-row DataFrame holding an ``array<array<double>>``
column, and bucket/cell assignment is a higher-order-function Column
expression over it.  Nothing here runs a Spark job at plan-build time
and no dim×k literal forest is embedded in the plan — the only
driver-side collect in the module is the bounded k-means training
sample (the classic IVF recipe: train on a sample, assign the full
corpus distributed).

Embeddings in the testdata are unit-normalized, so cosine == dot; the
generic path normalizes explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "embedding_drift",
    "dot",
    "cosine",
    "cosine_topk",
    "srp_lsh_topk",
    "kmeans_centroids",
    "ivf_topk",
    "ivf_pq_topk",
    "embedding_cosine_pairs",
    "embedding_cohesion",
    "centroid_similarity",
    "hard_negatives",
    "semdedup",
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


def _vector_pack(
    df: DataFrame, n: int, *, id_col: str, vec_col: str, out_col: str
) -> DataFrame:
    """One-row frame holding the ``n`` lowest-id vectors, in id order, as
    a single ``array<array<double>>`` column.

    This is how data-derived planes/centroids enter a plan without a
    driver-side collect: the pack is a tiny aggregate that Spark
    evaluates inside the same job as the query using it, broadcast to
    every task.  ``collect_list`` order is pinned by sorting the
    (id, vec) structs.
    """
    return (
        df.select(F.col(id_col).alias("__pid"), _as_double(F.col(vec_col)).alias("__pv"))
        .orderBy("__pid")
        .limit(n)
        .agg(F.array_sort(F.collect_list(F.struct("__pid", "__pv"))).alias("__s"))
        .select(F.transform("__s", lambda s: s["__pv"]).alias(out_col))
    )


def _bucket_col(vec: Column, planes: Column) -> Column:
    """SRP bucket id: bit j set iff dot(vec, planes[j]) >= 0.

    Pure higher-order-function expression — evaluated JVM-side per row,
    O(1) plan size regardless of plane count or dimension.  2.0**j is
    exact in a double for any sane plane count, so the sum equals the
    integer bit pattern.
    """
    bits = F.transform(
        planes,
        lambda p, j: F.when(dot(vec, p) >= 0, F.pow(F.lit(2.0), j)).otherwise(F.lit(0.0)),
    )
    return F.aggregate(bits, F.lit(0.0), lambda a, x: a + x).cast("int")


def _centroid_sims_col(vec: Column, cents: Column) -> Column:
    """Array of cosine similarities of ``vec`` against each centroid.

    The fold accumulates sequentially over dimensions (JVM ``aggregate``
    semantics), matching the DuckDB oracle's list-comprehension sum —
    assignments are therefore bit-aligned across engines.
    """
    return F.transform(cents, lambda c: dot(vec, c) / (_norm(vec) * _norm(c)))


# Guard probes already paid this process, keyed by the frame's semantic
# hash — bench repeats rebuild an identical logical plan, so the probe
# job (when one is needed at all) runs once, not once per call.
_GUARD_COUNT_CACHE: dict = {}

# Optimized-plan nodes that cannot change the leaf scan's row count.
_ROWCOUNT_SAFE_NODES = frozenset({"Project", "Relation", "SubqueryAlias", "Repartition"})


def _scan_only_row_count(df: DataFrame) -> int | None:
    """Exact row count from parquet footer metadata — zero Spark jobs.

    Only valid when the optimized plan is a pure scan + projections (any
    Filter/Join/Aggregate/Limit/Sample node changes cardinality, and a
    non-file relation has no footers).  Returns None when the plan can't
    be counted from metadata; callers fall back to a bounded count job.
    """
    try:
        plan_str = df._jdf.queryExecution().optimizedPlan().toString()
        for line in plan_str.splitlines():
            node = line.strip().lstrip("+-: ").split(" ", 1)[0].split("[", 1)[0]
            if node and node not in _ROWCOUNT_SAFE_NODES:
                return None
        if "parquet" not in plan_str:
            return None
        files = df.inputFiles()
        if not files:
            return None
        import pyarrow.parquet as pq

        total = 0
        for path in files:
            local = path[7:] if path.startswith("file://") else path
            total += pq.ParquetFile(local).metadata.num_rows
        return total
    except Exception:  # JVM internals / non-local files: fall back
        return None


def _guard_row_count(df: DataFrame, cap: int) -> int:
    """Row count for the brute-force guard, cheapest strategy first:
    parquet footer metadata (no job) -> per-plan cached limit+count probe
    (touches at most cap+1 rows, once per identical plan per process)."""
    meta = _scan_only_row_count(df)
    if meta is not None:
        return meta
    try:
        # inputFiles() in the key: an identical plan over a file source
        # that has since gained files must not reuse a stale probe (a
        # grown corpus slipping past the O(corpus x queries) guard).
        key = ("sem", df.semanticHash(), cap, tuple(sorted(df.inputFiles())))
    except Exception:
        key = None
    if key is not None and key in _GUARD_COUNT_CACHE:
        return _GUARD_COUNT_CACHE[key]
    probe = df.limit(cap + 1).count()
    if key is not None:
        _GUARD_COUNT_CACHE[key] = probe
    return probe


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_corpus_rows: int | None = 10_000_000,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Returns (query_id, rank, vec_id, cosine_sim).  Queries are
    broadcast; ties in similarity (after rounding) break on vec_id so
    rankings are engine-independent.  Self-matches are excluded.

    This is the O(corpus × queries) recall baseline, not the scale
    path: if the corpus exceeds ``max_corpus_rows`` the call raises and
    points at ``srp_lsh_topk`` / ``ivf_topk``.  Pass
    ``max_corpus_rows=None`` to disable the guard (e.g. when the
    corpus frame is known-small but expensive to count).
    """
    if max_corpus_rows is not None:
        probe = _guard_row_count(corpus, max_corpus_rows)
        if probe > max_corpus_rows:
            raise ValueError(
                f"cosine_topk is the exact O(corpus x queries) baseline and the "
                f"corpus exceeds max_corpus_rows={max_corpus_rows}; use "
                f"srp_lsh_topk or ivf_topk for large corpora, or pass "
                f"max_corpus_rows=None to override."
            )
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
    (deterministic, data-derived), carried as a broadcast one-row pack —
    no driver collect, no literal planes in the plan.  A vector's
    bucket is the bit pattern of its dot-product signs against the
    planes; each query only scans its own bucket.  Returns the same
    schema as ``cosine_topk`` — compare against it to measure recall.
    """
    planes = _vector_pack(corpus, num_planes, id_col=id_col, vec_col=vec_col, out_col="__planes")

    def bucketed(df: DataFrame, id_out: str, vec_out: str) -> DataFrame:
        return (
            df.select(F.col(id_col).alias(id_out), _as_double(F.col(vec_col)).alias(vec_out))
            .crossJoin(F.broadcast(planes))
            .withColumn("__bucket", _bucket_col(F.col(vec_out), F.col("__planes")))
            .drop("__planes")
        )

    c = bucketed(corpus, "vec_id", "__cv")
    q = bucketed(queries, "query_id", "__qv")

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
    round_digits: int = 6,
) -> list[list[float]]:
    """Sampled k-means-lite (spherical Lloyd) coarse quantizer.

    Deterministic AND engine-replayable by construction:

    * the sample is the ``sample_size`` lowest-id vectors, normalized;
    * initialization is the first ``n_cells`` of them;
    * each iteration assigns by argmax dot (first index wins ties) and
      re-normalizes the member mean;
    * every centroid is rounded to ``round_digits`` after each update,
      so engines whose float summation orders differ at the last ulp
      (numpy pairwise vs a SQL engine's sequential aggregate) converge
      to bit-identical centroids every iteration instead of drifting.

    Dot products accumulate sequentially over dimensions (one
    vectorized step per dim), matching the fold order of the JVM
    ``aggregate`` expression and a DuckDB list-comprehension sum — the
    differential oracle replays this training verbatim as unrolled SQL.

    Driver-side numpy over a bounded sample — the classic IVF training
    recipe (train on a sample, assign the full corpus distributed).
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
    nsq = np.zeros(len(X))
    for d in range(X.shape[1]):
        nsq += X[:, d] ** 2
    norms = np.sqrt(nsq)
    norms[norms == 0] = 1.0
    X = X / norms[:, None]
    C = np.round(X[:n_cells], round_digits).copy()
    for _ in range(iters):
        dots = np.zeros((len(X), len(C)))
        for d in range(X.shape[1]):
            dots += X[:, d : d + 1] * C[None, :, d]
        assign = np.argmax(dots, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[j] = np.round(c / n, round_digits)
    return [[float(x) for x in c] for c in C]


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
      recipe.  Training is deterministic and per-iteration rounded, so
      the DuckDB differential oracle replays it exactly as unrolled
      Lloyd SQL.
    * ``"lowest_id"`` — the ``n_cells`` lowest-id corpus vectors:
      centroids any engine can reproduce with no training at all.

    Cell assignment is argmax cosine against the centroids (ties to the
    lowest cell index), computed as a higher-order-function Column
    expression over a broadcast centroid pack — all JVM, no Python
    stage, no collect-at-build for ``lowest_id`` (k-means keeps the one
    bounded training-sample collect).

    Returns the ``cosine_topk`` schema (query_id, rank, vec_id,
    cosine_sim) — compare against it to measure recall.
    """
    if centroid_method == "kmeans":
        trained = kmeans_centroids(
            corpus, n_cells, id_col=id_col, vec_col=vec_col, round_digits=round_digits
        )
        cents = corpus.sparkSession.createDataFrame(
            [(trained,)], "__cents: array<array<double>>"
        )
    elif centroid_method == "lowest_id":
        cents = _vector_pack(corpus, n_cells, id_col=id_col, vec_col=vec_col, out_col="__cents")
    else:
        raise ValueError(f"centroid_method must be 'kmeans' or 'lowest_id', got {centroid_method!r}")

    def with_sims(df: DataFrame, id_out: str, vec_out: str) -> DataFrame:
        return (
            df.select(F.col(id_col).alias(id_out), _as_double(F.col(vec_col)).alias(vec_out))
            .crossJoin(F.broadcast(cents))
            .withColumn("__sims", _centroid_sims_col(F.col(vec_out), F.col("__cents")))
            .drop("__cents")
        )

    c = (
        with_sims(corpus, "vec_id", "__cv")
        .withColumn("__cell", F.array_position(F.col("__sims"), F.array_max("__sims")) - 1)
        .drop("__sims")
    )
    q = with_sims(queries, "query_id", "__qv")
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
    Deterministic (planes are the lowest-id corpus vectors, carried as
    a broadcast pack — no driver collect), so results are
    engine-reproducible.
    """
    planes = _vector_pack(corpus, num_planes, id_col=id_col, vec_col=vec_col, out_col="__planes")
    c = (
        corpus.select(F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("__v"))
        .crossJoin(F.broadcast(planes))
        .withColumn("__bucket", _bucket_col(F.col("__v"), F.col("__planes")))
        .drop("__planes")
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


def _pq_codebooks(
    corpus: DataFrame,
    *,
    m_sub: int,
    n_codes: int,
    id_col: str,
    vec_col: str,
    sample_size: int = 256,
    iters: int = 2,
    round_digits: int = 6,
) -> tuple[list[list[list[float]]], int]:
    """Per-subspace product-quantization codebooks via L2 Lloyd on the
    lowest-id sample of (fully) normalized vectors.

    Same engine-replayable construction as ``kmeans_centroids``: the
    sample is the ``sample_size`` lowest ids, init is the first
    ``n_codes`` subvectors, assignment is argmin squared-L2 with ties to
    the lowest code, centroids are the member mean **rounded per
    iteration** (no re-normalization — PQ codebooks live in plain
    subvector space), and every distance accumulates sequentially over
    dimensions so the DuckDB oracle's list-comprehension sums see the
    identical doubles.  Returns ``(books[m][code][dim], sub_dim)``.
    """
    import numpy as np

    rows = (
        corpus.select(_as_double(F.col(vec_col)))
        .orderBy(F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    D = X.shape[1]
    if D % m_sub:
        raise ValueError(f"embedding dim {D} not divisible by m_sub={m_sub}")
    ds = D // m_sub
    nsq = np.zeros(len(X))
    for d in range(D):
        nsq += X[:, d] ** 2
    norms = np.sqrt(nsq)
    norms[norms == 0] = 1.0
    X = X / norms[:, None]
    books: list[list[list[float]]] = []
    for m in range(m_sub):
        S = X[:, m * ds : (m + 1) * ds]
        C = np.round(S[:n_codes], round_digits).copy()
        for _ in range(iters):
            d2 = np.zeros((len(S), len(C)))
            for d in range(ds):
                diff = S[:, d : d + 1] - C[None, :, d]
                d2 += diff * diff
            assign = np.argmin(d2, axis=1)
            for j in range(len(C)):
                members = S[assign == j]
                if len(members):
                    C[j] = np.round(members.mean(axis=0), round_digits)
        books.append([[float(x) for x in c] for c in C])
    return books, ds


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    m_sub: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-PQ: inverted-file cells + product-quantized scoring (Jégou,
    Douze & Schmid 2011) — the memory-bound scale path past plain IVF.

    Each corpus vector is stored as its cell id plus ``m_sub`` small
    integer codes (here 4 codes covering 64 dims: a 64x compression of
    the scan payload); a query builds an ``m_sub × n_codes`` look-up
    table of subvector dot products once, then scores candidates in its
    ``nprobe`` cells with ``m_sub`` table lookups instead of a full
    d-dimensional dot product.  At 100 TB the probe scan reads bytes,
    not float vectors — that IO/memory cut is the entire point; recall
    is tunable via ``m_sub``/``n_codes``/``nprobe``.

    Cells use the deterministic lowest-id coarse quantizer (the k-means
    variant is demonstrated by ``ivf_topk``); codebooks come from
    ``_pq_codebooks`` (bounded sample collect — the standard
    train-on-sample recipe).  Everything after training is higher-order
    Column expressions over one broadcast codebook pack: encode is
    argmin-L2 per subspace, scoring is a ``zip_with`` gather — no
    Python stages, no job at plan build beyond the training sample.

    Returns ``query_id, rank, vec_id, pq_score`` where ``pq_score``
    approximates the cosine similarity of the normalized vectors
    (rounded to ``round_digits``; ranking uses the rounded score with a
    ``vec_id`` tiebreak so results are engine-stable).
    """
    spark = corpus.sparkSession
    books, ds = _pq_codebooks(
        corpus,
        m_sub=m_sub,
        n_codes=n_codes,
        id_col=id_col,
        vec_col=vec_col,
        round_digits=round_digits,
    )
    books_df = spark.createDataFrame([(books,)], "__books: array<array<array<double>>>")
    cents = _vector_pack(corpus, n_cells, id_col=id_col, vec_col=vec_col, out_col="__cents")

    def normalized(vec: Column) -> Column:
        n = _norm(vec)
        return F.when(n > 0, F.transform(vec, lambda x: x / n)).otherwise(vec)

    def sub(vn: Column, m: int) -> Column:
        return F.slice(vn, m * ds + 1, ds)

    def with_cell(df: DataFrame, id_out: str, vec_out: str) -> DataFrame:
        return (
            df.select(F.col(id_col).alias(id_out), _as_double(F.col(vec_col)).alias(vec_out))
            .crossJoin(F.broadcast(cents))
            .withColumn("__sims", _centroid_sims_col(F.col(vec_out), F.col("__cents")))
            .drop("__cents")
        )

    # Corpus side: cell + PQ codes, then the vector itself is dropped.
    c = (
        with_cell(corpus, "vec_id", "__cv")
        .withColumn("__cell", F.array_position(F.col("__sims"), F.array_max("__sims")) - 1)
        .drop("__sims")
        .crossJoin(F.broadcast(books_df))
        .withColumn("__vn", normalized(F.col("__cv")))
    )
    codes = []
    for m in range(m_sub):
        bm = F.element_at(F.col("__books"), m + 1)
        # Bind the subvector BEFORE the lambda: a two-parameter lambda
        # would be treated as transform's (element, index) form and
        # shadow the loop variable with the index column.
        sub_m = sub(F.col("__vn"), m)
        d2s = F.transform(
            bm,
            lambda cb: F.aggregate(
                F.zip_with(sub_m, cb, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        codes.append((F.array_position(d2s, F.array_min(d2s)) - 1).cast("int"))
    c = c.select("vec_id", "__cell", F.array(*codes).alias("__codes"))

    # Query side: probed cells + the m_sub x n_codes dot-product LUT.
    q = (
        with_cell(queries, "query_id", "__qv")
        .crossJoin(F.broadcast(books_df))
        .withColumn("__qn", normalized(F.col("__qv")))
        .withColumn(
            "__lut",
            F.array(
                *[
                    F.transform(
                        F.element_at(F.col("__books"), m + 1),
                        (lambda sub_q: lambda cb: dot(sub_q, cb))(sub(F.col("__qn"), m)),
                    )
                    for m in range(m_sub)
                ]
            ),
        )
    )
    probes = (
        q.select("query_id", "__lut", F.posexplode("__sims").alias("__cell", "__csim"))
        .withColumn(
            "__probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("__csim").desc(), F.col("__cell"))
            ),
        )
        .where(F.col("__probe_rank") <= nprobe)
        .select("query_id", "__lut", "__cell")
    )

    score = F.round(
        F.aggregate(
            F.zip_with(
                F.col("__codes"),
                F.col("__lut"),
                lambda cd, lm: F.element_at(lm, cd + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        round_digits,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("pq_score").desc(), F.col("vec_id"))
    return (
        c.join(F.broadcast(probes), on="__cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("pq_score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "pq_score")
    )


def _imi_cell_col(vec: Column, books: Column, k: int) -> Column:
    """Two-level (inverted multi-index) cell id: split the vector into
    halves, assign each half independently to the nearest of ``k``
    codebook subvectors by max inner product (ties -> lowest index),
    cell = iA * k + iB.

    This is the scale path for cell assignment: per-row cost is
    O(k * d) against k^2 effective cells, vs the flat quantizer's
    O(cells * d).  At the probe regime where cells grow with n
    (SCALING.md §17) that turns the O(n * cells) assignment into
    O(n * sqrt(cells)).  Dot products are scale-invariant in argmax, so
    a near-duplicate (v * (1+eps)) lands in the same cell as v —
    exactly the property semantic dedup needs from its partitioner.

    ``books`` is a struct column with ``a``/``b`` arrays of the k
    codebook subvectors (lowest-id corpus vectors, halved).
    """

    def best(half: Column, book: Column) -> Column:
        # Normalize by the codebook entry's norm so the partition is by
        # DIRECTION (cosine argmax; the row half's own norm is a common
        # positive factor and can't flip the argmax).  Raw dot skews
        # assignment toward high-norm codebook entries, and the hot
        # cells it creates blow up the within-cell pair join.
        sims = F.transform(book, lambda cb: dot(half, cb) / _norm(cb))
        return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")

    h = (F.size(vec) / 2).cast("int")
    ia = best(F.slice(vec, F.lit(1), h), books["a"])
    ib = best(F.slice(vec, h + 1, F.size(vec) - h), books["b"])
    return (ia * F.lit(int(k)) + ib).cast("int")


def _imi_books(
    df: DataFrame, k: int, *, id_col: str, vec_col: str
) -> DataFrame:
    """One-row frame with the IMI codebooks: the ``k`` lowest-id vectors,
    split into first/second halves.  Same broadcast-pack shape as
    ``_vector_pack`` — no driver-side collect, evaluated in-job."""
    pack = _vector_pack(df, k, id_col=id_col, vec_col=vec_col, out_col="__pack")
    h = (F.size(F.element_at("__pack", 1)) / 2).cast("int")
    return pack.select(
        F.struct(
            F.transform("__pack", lambda v: F.slice(v, F.lit(1), h)).alias("a"),
            F.transform("__pack", lambda v: F.slice(v, h + 1, F.size(v) - h)).alias("b"),
        ).alias("__books")
    )


def semdedup(
    corpus: DataFrame,
    *,
    n_cells: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    centroid_method: str = "kmeans",
    imi_flat_max: int = 64,
) -> DataFrame:
    """Semantic dedup over an embedding column (SemDeDup, Abbas et al.
    2023): cluster the corpus with a coarse quantizer, then inside each
    cluster drop rows whose cosine similarity to a LOWER-ID member
    reaches ``threshold``.

    Semantics (deterministic, non-iterative): a row is a duplicate iff
    ANY same-cell row with a smaller id is within ``threshold`` —
    whether or not that row is itself dropped.  ``dup_of`` reports the
    highest-similarity such neighbor (ties to lowest id).  This is the
    one-pass variant of the paper's keep-one-per-ε-ball rule; it never
    needs a sequential sweep, so it stays two equi-joins at any scale.

    Output: ``vec_id, cell, dup_of, dup_sim, keep``.

    100 TB shape: identical to IVF — one broadcast centroid pack, one
    shuffle on cell id, and a within-cell self-join whose fan-out is
    bounded by cell population (n_cells is the skew dial; raise it until
    cells fit).  Never an unbucketed all-pairs join.

    Assignment cost: the flat quantizer evaluates every centroid per row
    (O(n_cells * dim) per row) — fine for small codebooks, superlinear
    when cells are scaled with corpus size.  Above ``imi_flat_max``
    cells (``lowest_id`` method), assignment switches to a two-level
    inverted multi-index: two subspace codebooks of k = ceil(sqrt(
    n_cells)) lowest-id subvectors, cell = (argmax_a * k + argmax_b) —
    O(sqrt(n_cells) * dim) per row against >= n_cells effective cells.
    Cell *ids* differ from the flat layout (they are product codes), but
    the dedup contract — deterministic partition, near-identical vectors
    co-located (argmax of dot is invariant to positive scaling) — holds
    identically.  Set ``imi_flat_max=None`` to force flat assignment.
    Measured: SCALING.md §17 (flat 79.8s -> IMI ~linear at 176k vecs,
    cells ∝ n).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    use_imi = (
        centroid_method == "lowest_id"
        and imi_flat_max is not None
        and n_cells > imi_flat_max
    )
    if use_imi:
        import math as _math

        k = int(_math.ceil(_math.sqrt(n_cells)))
        books = _imi_books(corpus, k, id_col=id_col, vec_col=vec_col)
        c = (
            corpus.select(
                F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("__v")
            )
            .crossJoin(F.broadcast(books))
            .withColumn("cell", _imi_cell_col(F.col("__v"), F.col("__books"), k))
            .select("__id", "__v", "cell")
        )
        return _semdedup_pairs(c, id_col, threshold, round_digits)

    if centroid_method == "kmeans":
        trained = kmeans_centroids(
            corpus, n_cells, id_col=id_col, vec_col=vec_col, round_digits=round_digits
        )
        cents = corpus.sparkSession.createDataFrame(
            [(trained,)], "__cents: array<array<double>>"
        )
    elif centroid_method == "lowest_id":
        cents = _vector_pack(corpus, n_cells, id_col=id_col, vec_col=vec_col, out_col="__cents")
    else:
        raise ValueError(
            f"centroid_method must be 'kmeans' or 'lowest_id', got {centroid_method!r}"
        )

    c = (
        corpus.select(F.col(id_col).alias("__id"), _as_double(F.col(vec_col)).alias("__v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("__sims", _centroid_sims_col(F.col("__v"), F.col("__cents")))
        .withColumn("cell", (F.array_position(F.col("__sims"), F.array_max("__sims")) - 1).cast("int"))
        .select("__id", "__v", "cell")
    )
    return _semdedup_pairs(c, id_col, threshold, round_digits)


def _semdedup_pairs(
    c: DataFrame, id_col: str, threshold: float, round_digits: int
) -> DataFrame:
    """Within-cell lower-id duplicate scan shared by the flat and IMI
    assignment paths: equi-join on cell, keep the highest-similarity
    lower-id neighbor at or above threshold."""
    a = c.select(F.col("__id").alias("__aid"), F.col("__v").alias("__av"), "cell")
    b = c.select(F.col("__id").alias("__bid"), F.col("__v").alias("__bv"), "cell")
    pairs = (
        a.join(b, on="cell")
        .where(F.col("__bid") < F.col("__aid"))
        .withColumn("__sim", F.round(cosine(F.col("__av"), F.col("__bv")), round_digits))
        .where(F.col("__sim") >= F.lit(float(threshold)))
    )
    w = Window.partitionBy("__aid").orderBy(F.col("__sim").desc(), F.col("__bid"))
    best = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col("__aid"), F.col("__bid").alias("dup_of"), F.col("__sim").alias("dup_sim"))
    )

    out = c.join(best, c["__id"] == best["__aid"], "left")
    return out.select(
        F.col("__id").alias(id_col),
        "cell",
        "dup_of",
        "dup_sim",
        F.col("dup_of").isNull().alias("keep"),
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    lo: float = 0.3,
    hi: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_corpus_rows: int | None = 10_000_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training (DPR, SimCSE,
    retrieval-embedding fine-tuning): per query, the top-``k`` corpus
    vectors by cosine WITHIN the band ``lo <= cos < hi`` — similar
    enough to be informative negatives, but below the near-duplicate
    ceiling that would make them likely unlabeled positives.

    The band thresholds apply to the ROUNDED similarity
    (``round_digits``), the project's round-before-threshold convention
    (tfidf_cosine_pairs), so band membership replays identically on any
    engine.  Self-matches are excluded; ties break on vec_id.

    Output: ``query_id, rank, vec_id, cosine_sim`` (rank 1 = hardest
    negative).  Same guard and broadcast shape as ``cosine_topk`` —
    this is the exact baseline; swap the candidate source for the
    IVF/LSH paths when the corpus outgrows the brute-force budget.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (lo < hi):
        raise ValueError(f"need lo < hi, got lo={lo}, hi={hi}")
    if max_corpus_rows is not None:
        probe = _guard_row_count(corpus, max_corpus_rows)
        if probe > max_corpus_rows:
            raise ValueError(
                f"hard_negatives is the exact O(corpus x queries) baseline and "
                f"the corpus exceeds max_corpus_rows={max_corpus_rows}; mine "
                f"from an IVF/LSH candidate set for large corpora, or pass "
                f"max_corpus_rows=None to override."
            )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("__cv")
    )
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine_sim", sim)
        .where((F.col("cosine_sim") >= lo) & (F.col("cosine_sim") < hi))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_sim")
    )


def _centroids(
    emb: DataFrame, *, label_col: str, id_col: str, vec_col: str
) -> DataFrame:
    """Per-label centroid as a packed array<double> column plus the
    label's vector count.

    The per-dimension mean is a vec_id-ORDERED running fold read at the
    last row (an unordered sum's fold order follows partition layout
    and drifts at the last ulp — SCALING.md rule 24/27), and the array
    is packed by sorting (dim, value) structs so element order is
    engine-independent.
    """
    e = emb.select(
        F.col(label_col).alias("__lbl"),
        F.col(id_col).alias("__vid"),
        F.posexplode(_as_double(F.col(vec_col))).alias("__i", "__v"),
    )
    w_ord = Window.partitionBy("__lbl", "__i").orderBy("__vid")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("__lbl", "__i")
    folded = e.select(
        "__lbl",
        "__i",
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.sum("__v").over(w_run).alias("__s"),
    ).where(F.col("__rn") == F.col("__n"))
    return folded.groupBy("__lbl").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__i", (F.col("__s") / F.col("__n")).alias("__c")))),
            lambda s: s["__c"],
        ).alias("__cent"),
        F.max("__n").cast("long").alias("__nvec"),
    )


def embedding_cohesion(
    emb: DataFrame,
    *,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster embedding quality report: how tight is each labeled
    group around its own centroid — the first diagnostic after any
    clustering / classification pass over an embedding column (k-means
    quality, label noise screening, semdedup cell inspection).

    Output per label: ``n_vectors``, ``centroid_norm`` (mean-vector
    length — near 0 means the group's directions cancel, i.e. no
    coherent topic), ``mean_cos_to_centroid`` (average cosine of
    members to their centroid — 1.0 is perfectly tight).

    Shape: one dimension-explode aggregate builds the centroids
    (output is labels x dims — tiny), centroids broadcast back for the
    member-cosine pass, and every float reduce is an ordered running
    fold.  Nothing is pairwise: O(n·d), never O(n²).
    """
    cents = _centroids(emb, label_col=label_col, id_col=id_col, vec_col=vec_col)
    j = emb.select(
        F.col(label_col).alias("__lbl"),
        F.col(id_col).alias("__vid"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).join(F.broadcast(cents), "__lbl")
    cn = _norm(F.col("__cent"))
    # a zero centroid (directions cancel) has no cosine: null, not a
    # divide-by-zero (ANSI mode raises on the naked division)
    cs = F.when(cn > 0, cosine(F.col("__v"), F.col("__cent")))
    w_ord = Window.partitionBy("__lbl").orderBy("__vid")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("__lbl")
    folded = j.select(
        "__lbl",
        F.col("__nvec"),
        cn.alias("__cn"),
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.sum(cs).over(w_run).alias("__s"),
    ).where(F.col("__rn") == F.col("__n"))
    return folded.select(
        F.col("__lbl").alias(label_col),
        F.col("__nvec").alias("n_vectors"),
        F.col("__cn").alias("centroid_norm"),
        F.when(F.col("__cn") > 0, F.col("__s") / F.col("__n")).alias(
            "mean_cos_to_centroid"
        ),
    )


def centroid_similarity(
    emb: DataFrame,
    *,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine between label centroids — the cluster-confusion
    complement of ``embedding_cohesion``: two labels whose centroids
    sit at cosine ~1 are semantically merged (candidates for label
    consolidation or sign of annotation noise).

    Output: one row per unordered label pair — ``label_a < label_b,
    n_a, n_b, centroid_cosine``.  The pair frame is labels², computed
    on the tiny centroid aggregate, never on member vectors.
    """
    cents = _centroids(emb, label_col=label_col, id_col=id_col, vec_col=vec_col)
    a = cents.select(
        F.col("__lbl").alias("label_a"),
        F.col("__cent").alias("__ca"),
        F.col("__nvec").alias("n_a"),
    )
    b = cents.select(
        F.col("__lbl").alias("label_b"),
        F.col("__cent").alias("__cb"),
        F.col("__nvec").alias("n_b"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.when(
                (_norm(F.col("__ca")) > 0) & (_norm(F.col("__cb")) > 0),
                cosine(F.col("__ca"), F.col("__cb")),
            ).alias("centroid_cosine"),
        )
    )


def embedding_drift(
    emb: DataFrame,
    *,
    n_cells: int = 8,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-distribution drift per label/source: Jensen-Shannon
    divergence between each group's IVF-cell histogram and the global
    one — the embedding-space sibling of ``psi_drift`` (a new corpus
    snapshot whose vectors land in different Voronoi cells than the
    rest of the collection is drifting, whatever its text stats say).

    Cells come from the SAME deterministic sampled spherical k-means as
    ``ivf_topk`` (per-iteration rounded, bounded lowest-id training
    sample, argmax-cosine assignment with first-index ties) — so the
    quantizer is engine-replayable and the oracle replays training as
    unrolled Lloyd SQL.  The JS sum runs over the full label x cell
    grid (zero-count cells included — dropping them understates
    divergence), with exact integer-count ratios; divergences are O(1)
    and rounded to ``round_digits``.

    Output per label: ``label, n_vecs, js_divergence, top_cell,
    top_cell_share``.

    Scale shape: one broadcast of the trained centroid pack, one
    corpus-sized projection computing the argmax-cosine cell (HOF
    Columns, zero Python), one (label, cell) integer hash aggregate;
    everything after is (labels x cells)-sized.
    """
    if n_cells < 2:
        raise ValueError(f"n_cells must be >= 2, got {n_cells}")
    trained = kmeans_centroids(
        emb, n_cells, id_col=id_col, vec_col=vec_col, round_digits=round_digits
    )
    cents = emb.sparkSession.createDataFrame(
        [(trained,)], "__cents: array<array<double>>"
    )
    assigned = (
        emb.select(
            F.col(label_col).alias("label"),
            _as_double(F.col(vec_col)).alias("__v"),
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("__sims", _centroid_sims_col(F.col("__v"), F.col("__cents")))
        .select(
            "label",
            (F.array_position(F.col("__sims"), F.array_max("__sims")) - 1)
            .cast("int")
            .alias("cell"),
        )
    )
    hist = assigned.groupBy("label", "cell").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    labels = hist.groupBy("label").agg(F.sum("__cnt").cast("long").alias("__nl"))
    cells = emb.sparkSession.range(n_cells).select(F.col("id").cast("int").alias("cell"))
    glob = hist.groupBy("cell").agg(F.sum("__cnt").cast("long").alias("__gc"))
    total = labels.agg(F.sum("__nl").cast("long").alias("__nn"))

    grid = (
        labels.crossJoin(cells)
        .join(hist, ["label", "cell"], "left")
        .join(glob, "cell", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "label",
            "cell",
            "__nl",
            F.coalesce("__cnt", F.lit(0)).alias("__cnt"),
            F.coalesce("__gc", F.lit(0)).alias("__gc"),
            "__nn",
        )
    )
    p = F.col("__cnt") / F.col("__nl").cast("double")
    g = F.col("__gc") / F.col("__nn").cast("double")
    m = (p + g) / 2
    term = F.when(p > 0, 0.5 * p * F.log(p / m)).otherwise(F.lit(0.0)) + F.when(
        g > 0, 0.5 * g * F.log(g / m)
    ).otherwise(F.lit(0.0))
    per_label = grid.withColumn("__term", term)
    js = per_label.groupBy("label").agg(
        F.max("__nl").alias("n_vecs"),
        F.sum("__term").alias("__js"),
    )
    top = (
        hist.withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("label").orderBy(
                    F.col("__cnt").desc(), F.col("cell")
                )
            ),
        )
        .where(F.col("__rk") == 1)
        .select("label", F.col("cell").alias("top_cell"), F.col("__cnt").alias("__topc"))
    )
    return (
        js.join(top, "label")
        .select(
            "label",
            "n_vecs",
            F.round("__js", round_digits).alias("js_divergence"),
            "top_cell",
            F.round(F.col("__topc") / F.col("n_vecs").cast("double"), round_digits).alias(
                "top_cell_share"
            ),
        )
    )


def embedding_quantize_report(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_fold_buckets: int = 64,
) -> DataFrame:
    """Per-dimension INT8 quantization audit of an embedding column —
    the report run before shipping a quantized ANN index: symmetric
    per-dimension scales (``scale_d = max_i |x_{i,d}| / 127``), and the
    reconstruction error each dimension pays for the 4x memory cut.

    One row per dimension: ``dim, n, scale, mse`` (mean squared
    reconstruction error) and ``max_abs_err``.  Codes are
    ``clamp(floor(x/scale + 0.5), -127, 127)`` — explicit
    floor-half-up, the engine-portable rounding this repo's codecs use
    (never a library ``round`` whose tie rule differs cross-engine).

    Scale shape: one ``posexplode`` pass; the per-dimension |max| is an
    order-free hash aggregate broadcast back onto the exploded frame
    (dims-sized build side); the error moments fold HIERARCHICALLY —
    an id-ordered running fold inside ``n_fold_buckets`` id buckets,
    then a bucket-ordered fold over the bounded partials (the
    quality-classifier discipline) — so no dimension ever becomes a
    corpus-sized single window partition and the result is bit-exact
    under any layout.  Zero Python.
    """
    from pyspark.sql import Window

    if n_fold_buckets < 1:
        raise ValueError(f"n_fold_buckets must be >= 1, got {n_fold_buckets}")
    ex = embeddings.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col)).alias("dim", "__xr"),
    ).select("__id", "dim", F.col("__xr").cast("double").alias("x"))
    scales = ex.groupBy("dim").agg(
        (F.max(F.abs(F.col("x"))) / F.lit(127.0)).alias("scale")
    )
    t = ex.join(F.broadcast(scales), "dim")
    q = F.when(
        F.col("scale") > 0,
        F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(F.col("x") / F.col("scale") + 0.5)),
        ),
    ).otherwise(F.lit(0.0))
    err = F.col("x") - q * F.col("scale")
    t = t.withColumn("__err", err).withColumn(
        "__bkt", F.pmod(F.col("__id"), F.lit(int(n_fold_buckets)))
    )
    w1 = Window.partitionBy("dim", "__bkt").orderBy("__id")
    w1r = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    part = t.select(
        "dim",
        "__bkt",
        F.row_number().over(w1).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("dim", "__bkt")).alias("__n"),
        F.sum(F.col("__err") * F.col("__err")).over(w1r).alias("__s2"),
        F.max(F.abs(F.col("__err")))
        .over(Window.partitionBy("dim", "__bkt"))
        .alias("__me"),
    ).where(F.col("__rn") == F.col("__n"))
    w2 = Window.partitionBy("dim").orderBy("__bkt")
    w2r = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fin = part.select(
        "dim",
        F.row_number().over(w2).alias("__brn"),
        F.count(F.lit(1)).over(Window.partitionBy("dim")).alias("__bn"),
        F.sum("__n").over(w2r).alias("n"),
        F.sum("__s2").over(w2r).alias("s2"),
        F.max("__me").over(Window.partitionBy("dim")).alias("max_abs_err"),
    ).where(F.col("__brn") == F.col("__bn"))
    return fin.join(F.broadcast(scales), "dim").select(
        "dim",
        F.col("n").cast("long").alias("n"),
        "scale",
        (F.col("s2") / F.col("n").cast("double")).alias("mse"),
        "max_abs_err",
    )
