"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the point of each variant at 100 TB):

* **exact**         — one hash-aggregate on the content fingerprint; the
  canonical first pass.  Map-side partial agg makes the shuffle tiny.
* **MinHash + LSH** — signatures are per-row (no shuffle); the only
  shuffle is the band-bucket group-by, and candidate verification is an
  equi-join on (band, key) so fan-out is bounded by bucket size, never
  all-pairs.  This is the workhorse near-dup pass.
* **SimHash**       — 32-bit sketch per row; candidate generation uses
  the pigeonhole principle (hamming ≤ d pairs must agree exactly on one
  of d+1 bit-blocks), turning the quadratic scan into d+1 equi-joins.
* **n-gram Jaccard** — exact set-similarity pairs; candidate generation
  uses the AllPairs/PPJoin prefix filter (rarest-first canonical order)
  plus the length filter, so the posting-list join never degenerates to
  all-pairs within a block even on a monolingual corpus.

All hashing goes through ``portable_hash60`` (md5-derived) so results
are engine-independent and reproducible; the per-permutation MinHash
functions are ``(aᵢ·h + bᵢ) mod P`` over P = 2³¹−1 — P being prime is
what makes each map a bijection on [0, P), and the fixed coefficients
keep every product inside int64.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import ensure_parallelism, persist_tracked
from polars_trading_spark.functions.text import (
    doc_fingerprint,
    portable_hash60,
    tokens,
    word_ngrams_from,
)

__all__ = [
    "exact_dedup",
    "exact_substring_dedup",
    "exact_substring_dedup_clean",
    "shingle_hashes",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "positional_shingle_hashes",
    "duplicated_span_stats",
    "connected_components",
    "cluster_representatives",
    "unit_dedup",
    "dedup_recall_stats",
    "dedup_recall_curve",
    "lsh_power_curve",
    "shared_signature_cache",
    "minhash_index",
    "incremental_dedup",
    "incremental_dedup_banded",
    "write_banded_minhash_index",
]

MERSENNE31 = 2_147_483_647  # 2^31 - 1

# Fixed MinHash permutation coefficients: deterministic, < 2^31.
# (Bijectivity of h -> (a·h + b) mod P needs gcd(a, P) = 1, which P's
# primality guarantees for every a in [1, P) — parity is irrelevant.)
def _coeffs(k: int) -> list[tuple[int, int]]:
    return [(2 * i * i + 3 * i + 1, 7 * i + 11) for i in range(1, k + 1)]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-content exact dedup: every row keyed to its fingerprint
    group's keeper (lowest id).  One hash aggregate."""
    w = Window.partitionBy("fingerprint")
    return (
        df.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
        .withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(w).cast("int"))
        .withColumn("is_duplicate", F.col(id_col) != F.col("keep_id"))
    )


def shingle_hashes(toks: Column, n: int = 3) -> Column:
    """Distinct word-n-gram shingles (from a materialized token column)
    as portable 31-bit hashes.

    Instead of materializing string n-grams and hashing each (string
    concat + md5 per shingle), tokens are hashed once and consecutive
    token hashes combine arithmetically: ``c = (c·31 + h_i) mod P``
    per position.  All long arithmetic stays below 2³⁶ so the identical
    expression runs on DuckDB BIGINTs (which trap on overflow) — the
    oracles reproduce every value exactly.  Collisions in the 31-bit
    space are hash-function-deterministic, hence identical across
    engines.
    """
    return F.array_distinct(positional_shingle_hashes(toks, n))


def positional_shingle_hashes(toks: Column, n: int = 3) -> Column:
    """Word-n-gram shingle hashes in POSITION order (index i = shingle
    starting at token i), duplicates kept — the positional form span
    detectors need.  Same arithmetic-combine hashing as
    ``shingle_hashes`` (which is just the distinct of this)."""
    from functools import reduce

    hs = F.transform(toks, lambda t: portable_hash60(t) % MERSENNE31)
    m = F.size(toks) - (n - 1)
    parts = [F.slice(hs, i + 1, m) for i in range(n)]
    combined = reduce(
        lambda a, b: F.zip_with(a, b, lambda x, y: (x * 31 + y) % MERSENNE31), parts
    )
    return F.when(m > 0, combined).otherwise(F.array().cast("array<long>"))


def _tokenized(df: DataFrame, text_col: str, id_col: str, extra: tuple[str, ...] = ()) -> DataFrame:
    """Materialize the token array below a shuffle barrier.

    The projection computes the (regex-heavy) tokenizer exactly once per
    row *before* the exchange; everything above sees ``__toks`` as a
    plain attribute, so per-element shingle lambdas never re-run the
    tokenizer.  Round 14: the barrier is UNCONDITIONAL — the old
    ``ensure_parallelism`` guard no-oped whenever the input already had
    ≥ 8 partitions (any real-scale scan, or a source repartitioned by
    the round-14 payload-scan guard), CollapseProject then merged the
    token projection into its consumers, and the md5-per-token shingle
    chain re-evaluated once per ``__toks`` reference (the 3 slice arms
    + size: measured 2.6× total-CPU inflation on lsh_power_curve).
    Hash-partitioning by ``__id`` skips round-robin's
    sort-before-repartition and inherits the session shuffle-partition
    sizing, so at scale this is one well-sized exchange of the token
    table — cheaper than re-running tokenize+md5 per consumer arm.
    """
    base = df.select(
        *extra, F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks")
    )
    return base.repartition(F.col("__id"))


# --------------------------------------------------------------------------
# Round 11: opt-in amortization of the tokenize -> shingle -> MinHash
# pass.  A real pipeline computes the corpus signature stage ONCE and
# feeds every downstream consumer (filter, funnel, survivor budget,
# recall audit); calling each operator standalone re-runs that chain
# from the parquet scan.  Inside a ``shared_signature_cache()`` block
# the shingle table and the signature aggregate are persisted and
# keyed by (canonicalized input plan, tokenizer/shingle/hash params),
# so repeated operator calls over the SAME corpus reuse one pass.
# Default (no context) behavior is exactly as before — per-call
# ``persist_tracked`` caches released by ``release_persisted()``.
# --------------------------------------------------------------------------

_SHARED_SIG_CACHE: dict | None = None


def _corpus_cache_key(df: DataFrame, *parts):
    """Semantic cache key: the CANONICALIZED analyzed plan (stable
    across separately-built but identical reads, unlike object
    identity) plus the parameter tuple; None (= no caching) when the
    plan can't be canonicalized."""
    try:
        plan = df._jdf.queryExecution().analyzed().canonicalized().toString()
    except Exception:
        return None
    return (plan, *parts)


@contextlib.contextmanager
def shared_signature_cache():
    """Amortize the corpus signature pass across operator calls: within
    the block, ``minhash_lsh_pairs`` / ``minhash_index`` /
    ``ngram_containment_pairs`` persist and reuse their shingle and
    signature stages per (corpus plan, params).  Entries survive
    ``release_persisted()`` (they are deliberately NOT per-call caches)
    and are unpersisted when the block exits.  Nestable; inner blocks
    shadow outer ones."""
    global _SHARED_SIG_CACHE
    prev = _SHARED_SIG_CACHE
    _SHARED_SIG_CACHE = {}
    try:
        yield
    finally:
        cache, _SHARED_SIG_CACHE = _SHARED_SIG_CACHE, prev
        for cached in cache.values():
            with contextlib.suppress(Exception):
                cached.unpersist()


def _cache_stage(df: DataFrame, key) -> DataFrame:
    """Persist ``df`` into the active shared cache under ``key``, or
    fall back to the per-call tracked persist.  Eager either way: the
    shingle/signature stages have several AQE-parallel consumers, and a
    lazy persist is materialized once per concurrent consumer (guide
    §5.3 — see persist_tracked)."""
    if _SHARED_SIG_CACHE is not None and key is not None:
        df = df.persist()
        df.count()
        _SHARED_SIG_CACHE[key] = df
        return df
    return persist_tracked(df, eager=True)


def _shingle_table(
    df: DataFrame, text_col: str, id_col: str, ngram: int
) -> DataFrame:
    """The persisted ``(__id, __sh)`` shingle table — the shared root of
    every MinHash consumer; served from the active shared cache when
    one is installed."""
    key = None
    if _SHARED_SIG_CACHE is not None:
        key = _corpus_cache_key(df, "shingles", text_col, id_col, ngram)
        hit = _SHARED_SIG_CACHE.get(key) if key is not None else None
        if hit is not None:
            return hit
    base = _tokenized(df, text_col, id_col).select(
        "__id", shingle_hashes(F.col("__toks"), ngram).alias("__sh")
    )
    return _cache_stage(base, key)


def shared_corpus_shingles(
    df: DataFrame, text_col: str, id_col: str, *, ngram: int
) -> DataFrame | None:
    """The corpus ``(__id, __sh)`` shingle table served from the ACTIVE
    ``shared_signature_cache()``, or ``None`` when no cache is
    installed.

    Round 14 (guide §5.3, the round-11 amortization extended): the
    contamination/coverage family recomputes the tokenize → md5 →
    shingle corpus pass inline even though the dedup family's shared
    signature stage already holds the identical ``shingle_hashes``
    values for the same (corpus plan, ngram).  Inside a cache block
    those callers should read the shared stage — the real-pipeline
    shape, one corpus signature pass feeding every consumer.
    Standalone callers keep their zero-shuffle inline scan (the
    ``_tokenized`` barrier exchange only pays for itself when the table
    is reused), which is why this returns ``None`` instead of falling
    back to a per-call persist.
    """
    if _SHARED_SIG_CACHE is None:
        return None
    return _shingle_table(df, text_col, id_col, ngram)


def minhash_signature(hashes: Column, k: int = 12) -> Column:
    """k-permutation MinHash signature of a shingle-hash array.

    Empty shingle sets get signature value P (sorts above every real
    hash) so short documents never collide into real buckets.
    """
    sig = []
    for a, b in _coeffs(k):
        perm = F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE31))
        sig.append(F.coalesce(F.array_min(perm), F.lit(MERSENNE31)))
    return F.array(*sig)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.2,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH, verified with exact
    Jaccard over the shingle sets.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥
    threshold.  Candidates are pairs agreeing on at least one full band
    of the signature; the band group-by is the only shuffle.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}); "
            "trailing signature rows would be silently ignored otherwise"
        )
    rows_per_band = num_hashes // bands
    # Shingle-set table: feeds the signature aggregate and both verify
    # joins — persist lazily so shingling runs once (see simhash_pairs).
    # Tracked: released by the caller via release_persisted(), or served
    # from the shared_signature_cache() when one is active.
    base = _shingle_table(df, text_col, id_col, ngram)

    # k permutation minima in one codegen HashAggregate over the
    # exploded shingles instead of k interpreted array transforms;
    # ``explode_outer`` keeps empty shingle sets (null shingle → null
    # permuted values → null min), coalesced to P — the empty-set
    # sentinel that sorts above every real hash, so short documents
    # never collide into real buckets.
    sig_key = (
        _corpus_cache_key(df, "sig", text_col, id_col, ngram, num_hashes)
        if _SHARED_SIG_CACHE is not None
        else None
    )
    sig = (
        _SHARED_SIG_CACHE.get(sig_key)
        if _SHARED_SIG_CACHE is not None and sig_key is not None
        else None
    )
    if sig is None:
        sig = (
            base.select("__id", F.explode_outer("__sh").alias("__s"))
            .groupBy("__id")
            .agg(
                *[
                    F.coalesce(
                        F.min((F.lit(ca) * F.col("__s") + F.lit(cb)) % F.lit(MERSENNE31)),
                        F.lit(MERSENNE31),
                    ).alias(f"__m{i}")
                    for i, (ca, cb) in enumerate(_coeffs(num_hashes))
                ]
            )
        )
        if _SHARED_SIG_CACHE is not None and sig_key is not None:
            sig = sig.persist()
            sig.count()  # eager: both band self-join sides consume it
            _SHARED_SIG_CACHE[sig_key] = sig
    banded = sig.select(
        "__id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"__m{i}").cast("string")
                            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.__band") == F.col("b.__band"),
                F.col("a.__key") == F.col("b.__key"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Verify with exact Jaccard over the persisted shingle arrays —
    # id-only candidates join the arrays back rather than fanning the
    # arrays through the band self-join.
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(base.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
        .join(base.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", F.when(union > 0, inter / union).otherwise(0.0))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(hashes: Column, bits: int = 32) -> Column:
    """SimHash sketch from a *materialized* array of feature hashes:
    per-bit majority vote — bit b is set when more hashes have bit b set
    than not.  The 32 per-bit folds each traverse the array, so the
    input must be an attribute, not an expression (see ``_tokenized``)."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1,
        )
        out = out + F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(0)
    return out


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bits: int = 48,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within hamming distance ``max_hamming`` of the SimHash.

    Pigeonhole blocking: the sketch is split into ``max_hamming + 1``
    bit-blocks; any pair within distance d must agree exactly on ≥ 1
    block, so candidates come from d+1 equi-joins instead of a cross
    join.  Returns (id_a, id_b, hamming).
    """
    blocks = max_hamming + 1
    block_bits = bits // blocks
    # Bit votes as a native aggregation instead of `bits` interpreted
    # array folds: explode the token array, hash in a codegen projection
    # (md5/conv never enter an interpreted lambda), then one
    # HashAggregate computes all per-bit vote sums in whole-stage
    # codegen.  Same semantics as ``simhash`` (kept as the Column-level
    # form).  ``explode_outer`` keeps zero-token docs as a single null
    # row — their votes sum to null, coalesced to the all-zero sketch —
    # so no re-attach join (which would re-run the tokenizer branch).
    rows = (
        _tokenized(df, text_col, id_col)
        .select("__id", F.explode_outer("__toks").alias("__t"))
        .select("__id", portable_hash60(F.col("__t")).alias("__h"))
    )
    votes = rows.groupBy("__id").agg(
        *[
            F.sum(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"__v{b}")
            for b in range(bits)
        ]
    )
    sketch = F.lit(0).cast("long")
    for b in range(bits):
        sketch = sketch + F.when(
            F.coalesce(F.col(f"__v{b}"), F.lit(0)) > 0, F.lit(2**b).cast("long")
        ).otherwise(0)
    base = votes.select("__id", sketch.alias("__sh"))
    # The sketch table is tiny relative to the corpus (one long per doc)
    # and feeds BOTH sides of the block self-join — persist it lazily so
    # the tokenize→md5→vote pipeline runs once, not once per branch
    # (Catalyst does not reuse the subtree across self-join aliases).
    # Same pattern you'd use at 100 TB: materialize the sketch, join on
    # it; the corpus is never re-scanned.
    # Tracked: released by the caller via release_persisted().
    base = persist_tracked(base)
    keyed = base.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("__sh"), b * block_bits).bitwiseAND(
                        F.lit((1 << block_bits) - 1)
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("__block", "__key"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.__block") == F.col("b.__block"),
                F.col("a.__key") == F.col("b.__key"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sh").alias("sh_a"),
            F.col("b.__sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 3,
    threshold: float = 0.15,
    block_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs within blocking keys.

    Candidate generation is the AllPairs/PPJoin shape (Bayardo et al.
    WWW'07, Xiao et al. WWW'08), which keeps the posting-list self-join
    sub-quadratic even when one block dominates (monolingual corpus):

    * **prefix filter** — under a global canonical order, two sets with
      ``J ≥ t`` must share a shingle within their first
      ``n − ⌈t·n⌉ + 1`` shingles; only those prefix postings enter the
      self-join.  The canonical order is document-frequency-ascending,
      so the high-frequency shingles that blow up bucket sizes are
      exactly the ones excluded from prefixes.
    * **length filter** — ``J ≥ t`` implies ``min(|A|,|B|) ≥
      t·max(|A|,|B|)``; applied inside the join condition.
    * **positional filter** — a prefix match at (rank i of |A|, rank j
      of |B|) caps the achievable overlap at ``min(|A|−i, |B|−j) + 1``,
      which must reach ``⌈t/(1+t)·(|A|+|B|)⌉`` (the overlap ``J ≥ t``
      requires); ranks come free from the prefix window.

    All three filters are exact (no false negatives), so the output is
    identical to the naive all-pairs-within-block formulation; survivors
    are verified with exact Jaccard over the full shingle arrays.

    Shingles are carried as portable 31-bit combined token hashes
    (``shingle_hashes``), not strings: posting-join keys and the
    verify-stage ``array_intersect`` run over longs, severalfold
    cheaper than string shingle building + per-shingle hashing, and the
    DuckDB oracle applies the identical arithmetic so results match
    bit-for-bit (collisions, being hash-deterministic, merge in both
    engines alike).
    """
    # Served from the ACTIVE shared_signature_cache() when one is
    # installed (round 14, guide §5.3): the exact-verify arm of every
    # recall/param harness rebuilds the identical tokenize→shingle base
    # over the same sampled corpus — one staged table feeds them all,
    # mirroring what the MinHash arm already does via ``_shingle_table``.
    cache_key = (
        _corpus_cache_key(df, "ngbase", text_col, id_col, ngram, tuple(block_cols))
        if _SHARED_SIG_CACHE is not None
        else None
    )
    base = (
        _SHARED_SIG_CACHE.get(cache_key)
        if _SHARED_SIG_CACHE is not None and cache_key is not None
        else None
    )
    if base is None:
        base = _tokenized(df, text_col, id_col, extra=tuple(block_cols)).select(
            *block_cols,
            "__id",
            shingle_hashes(F.col("__toks"), ngram).alias("__ng"),
        )
        # Materialize the shingle arrays through an exchange before explode
        # (Generate re-evaluates inlined interpreted expressions), and track
        # the cache: base feeds the posting lists AND both verify joins —
        # eager (round 14, guide §5.3): several of those consumers sit on
        # broadcast sides (dfreq, the candidate set), and a lazy persist is
        # re-materialized once per concurrent broadcast thread.
        base = base.repartition(df.sparkSession.sparkContext.defaultParallelism)
        base = _cache_stage(base, cache_key)

    posting = base.select(
        *block_cols, "__id", F.size("__ng").alias("__n"), F.explode("__ng").alias("__s")
    )
    # Document frequency per (block, shingle): the AllPairs canonical
    # order.  A small aggregate over the postings; rarest-first prefixes
    # are what turn the frequent-shingle buckets from O(block²) into
    # near-linear candidate counts.
    dfreq = posting.groupBy(*block_cols, "__s").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("__id").orderBy("__df", "__s")
    # ε guards the float product at exact-multiple boundaries (0.2·10):
    # a too-short prefix would drop true pairs, a one-longer prefix only
    # adds candidates.
    prefix_len = F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9)) + 1
    prefix = (
        posting.join(dfreq, on=[*block_cols, "__s"])
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= prefix_len)
        .select(*block_cols, "__id", "__n", "__s", "__rn")
    )

    a, b = prefix.alias("a"), prefix.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    on.append(F.col("a.__s") == F.col("b.__s"))
    on.append(F.col("a.__id") < F.col("b.__id"))
    # Length filter (float form with ε margin — exact for integer sizes).
    on.append(F.col("a.__n").cast("double") >= F.lit(threshold) * F.col("b.__n") - F.lit(1e-9))
    on.append(F.col("b.__n").cast("double") >= F.lit(threshold) * F.col("a.__n") - F.lit(1e-9))
    # Positional filter (Xiao et al.): overlap still reachable past this
    # match must meet the J ≥ t overlap bound ⌈t/(1+t)·(|A|+|B|)⌉.
    min_overlap = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a.__n") + F.col("b.__n")) - F.lit(1e-9)
    )
    reachable = F.least(F.col("a.__n") - F.col("a.__rn"), F.col("b.__n") - F.col("b.__rn")) + 1
    on.append(reachable >= min_overlap)
    cand = (
        a.join(b, on=on)
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    arr = base.select("__id", "__ng")
    inter = F.size(F.array_intersect("__ga", "__gb"))
    union = F.size("__ga") + F.size("__gb") - inter
    return (
        cand.join(arr.select(F.col("__id").alias("id_a"), F.col("__ng").alias("__ga")), "id_a")
        .join(arr.select(F.col("__id").alias("id_b"), F.col("__ng").alias("__gb")), "id_b")
        .withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "doc_id",
    max_iterations: int = 25,
) -> DataFrame:
    """Duplicate clusters from near-dup pairs: connected components by
    min-label propagation.

    The pair generators (``minhash_lsh_pairs`` / ``simhash_pairs`` /
    ``ngram_jaccard_pairs`` / embedding-cosine) emit an *edge list*;
    what a cleaning pipeline actually needs is the keep/drop decision,
    which requires the transitive closure: if A~B and B~C then A, B, C
    are one duplicate cluster even when A~C was never emitted.  Each
    component's minimum id is its canonical keeper.

    Algorithm: min-label propagation — every node starts labeled with
    its own id; each round every node takes the min of its own and its
    neighbors' labels.  One shuffle per round (edges ⋈ labels, then a
    min-aggregate), converging in O(component diameter) rounds.
    Near-dup clusters are short chains (diameter of a few hops), so
    this settles in 3-5 rounds; ``max_iterations`` bounds pathological
    chains.  For adversarial graphs with long paths the O(log n)-round
    alternative is large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14); min-propagation is
    chosen because dedup graphs are overwhelmingly tiny stars and each
    round is a single co-partitioned shuffle on the node id.

    Convergence detection costs one scalar aggregate per round: labels
    only ever decrease, so an unchanged sum(label) is a fixpoint — no
    old-vs-new join needed.  The per-round ``collect()`` of that single
    scalar is the driver's loop condition, not a data collect; this is
    the same driver-coordinated iteration GraphX/GraphFrames use.

    Each round's label frame is ``localCheckpoint``-ed (eager): the
    label frame feeds both the neighbor join and the union, so without
    lineage truncation the logical plan doubles per round — 2^rounds
    nodes blows the driver heap at analysis time long before any data
    is large.  Checkpointing makes each round's plan O(1); blocks from
    retired rounds are released by Spark's ContextCleaner when the
    superseded frames go out of scope.  (On a fault-tolerant cluster
    run, swap for reliable ``checkpoint()`` against a checkpoint dir —
    same contract, executor-loss-safe.)

    Parameters: ``pairs`` with columns ``id_a``/``id_b``; optional
    ``nodes`` (e.g. the documents table) to include singletons — nodes
    absent from every pair come back as their own cluster of size 1.
    Output: one row per node — ``(node_col, cluster_id, cluster_size,
    is_duplicate)``.
    """
    edges = pairs.select(F.col(id_a).alias("__src"), F.col(id_b).alias("__dst")).unionByName(
        pairs.select(F.col(id_b).alias("__src"), F.col(id_a).alias("__dst"))
    )
    edges = persist_tracked(ensure_parallelism(edges, "__dst"))

    # Init folds the first propagation round into the node-extraction
    # aggregate: label(v) = min(v, min neighbor).  Star-shaped clusters
    # (the overwhelming near-dup case) are already at fixpoint here, so
    # the loop below runs exactly one verification round for them.
    cur = (
        edges.groupBy(F.col("__src").alias("__nid"))
        .agg(F.min("__dst").alias("__mind"))
        .select("__nid", F.least(F.col("__nid"), F.col("__mind")).alias("__comp"))
        .localCheckpoint()
    )
    # Labels are monotone non-increasing under min-propagation, so the
    # sum is a strictly decreasing potential function until fixpoint.
    def _label_sum(labels: DataFrame):
        return labels.agg(F.sum(F.col("__comp").cast("decimal(38,0)"))).collect()[0][0]

    cur_sum = _label_sum(cur)
    for _ in range(max_iterations):
        msgs = edges.join(
            cur.select(F.col("__nid").alias("__dst"), "__comp"), on="__dst"
        ).select(F.col("__src").alias("__nid"), "__comp")
        nxt = (
            cur.select("__nid", "__comp")
            .unionByName(msgs)
            .groupBy("__nid")
            .agg(F.min("__comp").alias("__comp"))
            .localCheckpoint()  # eager: truncates lineage, materializes
        )
        nxt_sum = _label_sum(nxt)
        converged = nxt_sum == cur_sum
        cur, cur_sum = nxt, nxt_sum
        if converged:
            break

    if nodes is not None:
        labeled = (
            nodes.select(F.col(node_col))
            .join(cur.withColumnRenamed("__nid", node_col), on=node_col, how="left")
            .withColumn("cluster_id", F.coalesce("__comp", F.col(node_col)))
            .drop("__comp")
        )
    else:
        labeled = cur.select(F.col("__nid").alias(node_col), F.col("__comp").alias("cluster_id"))
    w = Window.partitionBy("cluster_id")
    return labeled.withColumn(
        "cluster_size", F.count(F.lit(1)).over(w).cast("int")
    ).withColumn("is_duplicate", F.col(node_col) != F.col("cluster_id"))


def unit_dedup(
    df: DataFrame,
    *,
    unit_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sub-document (paragraph-level) exact dedup: split every document
    into consecutive ``unit_tokens``-token units, keep only the globally
    first occurrence of each unit, and report per-document duplication.

    C4 (Raffel et al. 2020 §2.2) dedups three-sentence spans; on a
    corpus without sentence punctuation the deterministic equivalent is
    the fixed-token-window unit used here (swap ``unit_tokens`` for a
    sentence splitter on punctuated text — the pipeline below is
    splitter-agnostic).  "First" is the lexicographically smallest
    ``(doc_id, unit_idx)``, so results are ingestion-order-free and
    re-runnable.

    Scale shape: tokenize + explode (no shuffle), one **map-side
    combinable** ``min(struct(doc_id, idx))`` hash aggregate per unit
    hash — deliberately *not* a ``row_number`` window, whose hot
    duplicated units (the very thing dedup targets) would serialize on
    one reducer — then an equi-join back on the unit hash (AQE handles
    residual skew) and one per-document aggregate.

    Returns ``id_col, n_units, n_dup_units, dup_unit_frac,
    text_deduped`` (``text_deduped`` rejoins surviving units in order;
    documents with no tokens keep ``n_units = 0`` and null text).
    """
    if unit_tokens < 1:
        raise ValueError(f"unit_tokens must be >= 1, got {unit_tokens}")

    k = int(unit_tokens)
    # Stage the token array as a real column: higher-order lambdas run
    # interpreted with no common-subexpression elimination, so slicing
    # `tokens(text)` directly would re-run the regex tokenizer once per
    # unit per row (measured 14s -> 3s on 20k docs).
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    n_units = F.ceil(F.size(toks) / F.lit(float(k))).cast("int")
    units = F.when(
        n_units > 0,
        F.transform(
            F.sequence(F.lit(0), n_units - 1),
            lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))

    ex = staged.select(F.col(id_col), F.posexplode(units).alias("idx", "unit")).withColumn(
        "__h", F.md5("unit")
    )
    firsts = ex.groupBy("__h").agg(F.min(F.struct(id_col, "idx")).alias("__first"))
    marked = ex.join(firsts, "__h").withColumn(
        "__is_first",
        (F.col(id_col) == F.col(f"__first.{id_col}")) & (F.col("idx") == F.col("__first.idx")),
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_units"),
        F.sum(F.when(F.col("__is_first"), 0).otherwise(1)).cast("int").alias("n_dup_units"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("__is_first"), F.struct("idx", "unit")))
                ),
                lambda x: x["unit"],
            ),
            " ",
        ).alias("text_deduped"),
    )
    base = df.select(id_col)
    out = base.join(per_doc, id_col, "left")
    return out.select(
        F.col(id_col),
        F.coalesce("n_units", F.lit(0)).alias("n_units"),
        F.coalesce("n_dup_units", F.lit(0)).alias("n_dup_units"),
        F.when(F.col("n_units") > 0, F.col("n_dup_units") / F.col("n_units").cast("double")).alias(
            "dup_unit_frac"
        ),
        "text_deduped",
    )


def duplicated_span_stats(
    df: DataFrame,
    *,
    ngram: int = 8,
    min_docs: int = 2,
    max_dup_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-span statistics — the distributed
    approximation of exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"; the same shape
    RefinedWeb/Dolma run at web scale instead of a true suffix array).

    Every ``ngram``-token shingle (positional, not distinct) is hashed;
    a shingle is *duplicated* when it occurs in ≥ ``min_docs`` distinct
    documents.  Per document this emits shingle- and token-level
    duplication: ``dup_token_cov`` is the exact size of the union of all
    duplicated spans ``[i, i+ngram)`` — computed with one ``lag`` window
    over the sorted duplicated positions (``Σ min(ngram, pos_i −
    pos_{i−1})``), not by exploding tokens.

    Output: ``doc_id, n_tokens, n_shingles, dup_shingles,
    dup_token_cov, dup_frac, keep`` (keep = ``dup_frac ≤
    max_dup_frac``; docs with no tokens keep).

    100 TB shape: positional shingles explode the corpus ×~1 row per
    token, but every subsequent step is an equi-join or hash aggregate
    on the shingle hash — the global duplicated-shingle set is the only
    wide dependency and it shrinks with ``min_docs``.  No all-pairs
    stage exists anywhere.
    """
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")

    base = _tokenized(df, text_col, id_col)
    totals = base.select(
        F.col("__id"), F.size("__toks").cast("long").alias("n_tokens")
    )
    ps = base.select(
        "__id",
        F.posexplode(positional_shingle_hashes(F.col("__toks"), ngram)).alias(
            "pos", "h"
        ),
    )
    dup = (
        ps.groupBy("h")
        .agg(F.count_distinct("__id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("h")
    )
    hits = ps.join(dup, "h")

    w = Window.partitionBy("__id").orderBy("pos")
    cov_term = F.coalesce(
        F.least(F.lit(ngram), F.col("pos") - F.lag("pos").over(w)),
        F.lit(ngram),
    )
    per_doc = (
        hits.withColumn("__c", cov_term)
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_shingles"),
            F.sum("__c").cast("long").alias("dup_token_cov"),
        )
    )

    out = totals.join(per_doc, "__id", "left")
    n_sh = F.greatest(F.col("n_tokens") - (ngram - 1), F.lit(0)).cast("long")
    dup_sh = F.coalesce("dup_shingles", F.lit(0)).cast("long")
    cov = F.coalesce("dup_token_cov", F.lit(0)).cast("long")
    frac = F.when(
        F.col("n_tokens") > 0, cov / F.col("n_tokens").cast("double")
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        n_sh.alias("n_shingles"),
        dup_sh.alias("dup_shingles"),
        cov.alias("dup_token_cov"),
        frac.alias("dup_frac"),
        (frac <= F.lit(float(max_dup_frac))).alias("keep"),
    )


def _substring_removals(base: DataFrame, k: int) -> DataFrame:
    """Duplicated-span removal positions ``(__id, pos)`` — the shared
    core of ``exact_substring_dedup`` and its ``_clean`` twin: every
    ``k``-token span hash occurring >= 2 times corpus-wide, minus the
    canonical first occurrence (smallest ``(doc, pos)``).

    100 TB shape: the canonical pick is a ``min(struct(doc, pos))``
    map-side-combinable aggregate on the span hash; the duplicated-hash
    set shrinks through ``HAVING count(*) >= 2`` before the join back.
    No all-pairs stage, no suffix sort."""
    ps = base.select(
        "__id",
        F.posexplode(positional_shingle_hashes(F.col("__toks"), k)).alias(
            "pos", "h"
        ),
    )
    occ = (
        ps.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("__occ"),
            F.min(
                F.struct(F.col("__id").alias("d"), F.col("pos").alias("p"))
            ).alias("__keep"),
        )
        .where(F.col("__occ") >= 2)
        .select("h", "__keep")
    )
    return ps.join(occ, "h").where(
        ~(
            (F.col("__id") == F.col("__keep.d"))
            & (F.col("pos") == F.col("__keep.p"))
        )
    )


def exact_substring_dedup(
    df: DataFrame,
    *,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicate-SPAN removal at ``k``-token granularity — the
    keep-first-occurrence form of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"): any ``k``-token span
    whose hash occurs MORE THAN ONCE in the corpus (across documents or
    repeated within one) is removed from every occurrence except the
    canonical first (the smallest ``(doc_id, position)``); overlapping
    and adjacent removals merge into maximal spans, exactly as the
    suffix-array formulation removes byte ranges.  ``k = 50`` is the
    paper's granularity; test registrations use a smaller ``k`` so the
    synthetic corpus carries signal.

    Output per document: ``doc_id, n_tokens, n_shingles,
    removed_tokens`` (exact union-of-spans size), ``removed_spans``
    (count of maximal merged spans), ``kept_tokens, kept_frac``.

    100 TB shape: positional shingles explode the corpus ~1 row per
    token, then everything is hash aggregates and one bounded window —
    the canonical-occurrence pick is a ``min(struct(doc, pos))``
    map-side-combinable aggregate on the span hash, the span-merge is
    one ``lag`` over each document's sorted duplicated positions.  No
    all-pairs stage, no suffix sort; the only wide dependency is the
    duplicated-hash set, which ``HAVING count(*) >= 2`` shrinks.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    base = _tokenized(df, text_col, id_col)
    totals = base.select(
        F.col("__id"), F.size("__toks").cast("long").alias("n_tokens")
    )
    removals = _substring_removals(base, k)

    w = Window.partitionBy("__id").orderBy("pos")
    prev = F.lag("pos").over(w)
    # union of [pos, pos+k): each position contributes min(k, gap);
    # a gap > k starts a new maximal span (adjacent spans merge)
    cov_term = F.coalesce(F.least(F.lit(k), F.col("pos") - prev), F.lit(k))
    span_start = F.when(prev.isNull() | (F.col("pos") - prev > k), 1).otherwise(0)
    per_doc = (
        removals.select(
            "__id",
            cov_term.alias("__c"),
            span_start.alias("__s"),
        )
        .groupBy("__id")
        .agg(
            F.sum("__c").cast("long").alias("removed_tokens"),
            F.sum("__s").cast("long").alias("removed_spans"),
        )
    )

    out = totals.join(per_doc, "__id", "left")
    removed = F.coalesce("removed_tokens", F.lit(0)).cast("long")
    spans = F.coalesce("removed_spans", F.lit(0)).cast("long")
    kept = (F.col("n_tokens") - removed).cast("long")
    frac = F.when(
        F.col("n_tokens") > 0, kept / F.col("n_tokens").cast("double")
    ).otherwise(F.lit(1.0))
    return out.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.greatest(F.col("n_tokens") - (k - 1), F.lit(0))
        .cast("long")
        .alias("n_shingles"),
        removed.alias("removed_tokens"),
        spans.alias("removed_spans"),
        kept.alias("kept_tokens"),
        frac.alias("kept_frac"),
    )


def exact_substring_dedup_clean(
    df: DataFrame,
    *,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ARTIFACT form of ``exact_substring_dedup``: per document, the
    text with every duplicated ``k``-token span removed (keep-first-
    occurrence, Lee et al. 2022) — what a training pipeline actually
    consumes, where the stats twin only reports accounting.  The
    cleaned text is the kept tokens rejoined with single spaces (span
    removal operates on the tokenizer's normalized stream, so original
    whitespace/punctuation inside removed regions is not recoverable —
    the standard formulation).

    Output: ``doc_id, n_tokens, kept_tokens, cleaned_text``.

    100 TB shape: the removal positions per document are merged into
    maximal ``[start, end)`` spans RELATIONALLY (one running-sum window
    over each doc's sorted positions + a hash aggregate), collected
    per-doc (bounded by the doc's own token count — the same bound as
    the text column itself), and the kept tokens are reassembled in ONE
    linear higher-order ``aggregate`` pass over the span list.  No
    per-token × per-removal quadratic work, no Python."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    base = _tokenized(df, text_col, id_col)
    removals = _substring_removals(base, k)

    w = Window.partitionBy("__id").orderBy("pos")
    prev = F.lag("pos").over(w)
    flagged = removals.select(
        "__id",
        "pos",
        F.when(prev.isNull() | (F.col("pos") - prev > k), 1)
        .otherwise(0)
        .alias("__new"),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = (
        flagged.withColumn("__sid", F.sum("__new").over(w_run))
        .groupBy("__id", "__sid")
        .agg(F.min("pos").alias("s"), (F.max("pos") + k).alias("e"))
    )
    doc_spans = spans.groupBy("__id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__spans")
    )

    joined = base.join(doc_spans, "__id", "left").withColumn(
        "__spans",
        F.coalesce("__spans", F.array().cast("array<struct<s:int,e:int>>")),
    )
    toks = F.col("__toks")
    # one linear pass: walk the sorted disjoint spans, concatenating the
    # gap before each span and finally the tail after the last one
    kept_expr = F.aggregate(
        F.col("__spans"),
        F.struct(
            F.lit(0).alias("cur"), F.array().cast("array<string>").alias("kept")
        ),
        lambda acc, sp: F.struct(
            sp["e"].alias("cur"),
            F.concat(
                acc["kept"], F.slice(toks, acc["cur"] + 1, sp["s"] - acc["cur"])
            ).alias("kept"),
        ),
        lambda acc: F.concat(
            acc["kept"],
            F.slice(
                toks,
                acc["cur"] + 1,
                F.greatest(F.size(toks) - acc["cur"], F.lit(0)),
            ),
        ),
    )
    return joined.withColumn("__kept", kept_expr).select(
        F.col("__id").alias(id_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size("__kept").cast("long").alias("kept_tokens"),
        F.array_join("__kept", " ").alias("cleaned_text"),
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 3,
    threshold: float = 0.8,
    max_df_frac: float = 0.2,
) -> DataFrame:
    """ASYMMETRIC near-duplicate pairs by n-gram containment
    ``C(A→B) = |A ∩ B| / |A|`` — the modality Jaccard misses: a short
    document quoted wholesale inside a long one has tiny Jaccard but
    containment ≈ 1 for the short side.  Pairs emit when EITHER
    direction reaches ``threshold``.

    Candidates come from a document-frequency-pruned posting self-join
    (shingles present in more than ``max_df_frac`` of documents are
    dropped from candidate generation — a pair whose ONLY shared
    content is such stop-shingles is not surfaced; that is the explicit
    recall trade documented here, the same dial as TF-IDF's max-df).
    Survivors are verified with ``array_intersect`` over the FULL
    shingle sets, so every emitted score is exact.

    Output: ``id_a, id_b, n_shared, containment_a, containment_b``
    (containment_a = shared/|A| with id_a < id_b).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if not (0.0 < max_df_frac <= 1.0):
        raise ValueError(f"max_df_frac must be in (0, 1], got {max_df_frac}")

    base = _shingle_table(df, text_col, id_col, ngram)

    post = base.select("__id", F.explode("__sh").alias("__h"))
    n_docs = base.agg(F.count(F.lit(1)).cast("double").alias("__nd"))
    dfreq = post.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    pruned = (
        post.join(dfreq, "__h")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("__df") <= F.col("__nd") * F.lit(float(max_df_frac)))
        .select("__id", "__h")
    )
    # eager (round 15, guide §5.3): ``pruned`` feeds BOTH arms of the
    # candidate self-join in one action — unpersisted, each arm re-ran
    # the posting explode + df-count join (two ~7.5s-CPU duplicate
    # stages in the profile).  The frame is the df-pruned posting list,
    # which the self-join materializes anyway; persisting trades one
    # copy in cache for computing it once.
    pruned = persist_tracked(pruned, eager=True)
    cand = (
        pruned.alias("a")
        .join(pruned.alias("b"), on="__h")
        .where(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("__ida"), F.col("b.__id").alias("__idb"))
        .distinct()
    )

    A = base.select(F.col("__id").alias("__ida"), F.col("__sh").alias("__sha"))
    B = base.select(F.col("__id").alias("__idb"), F.col("__sh").alias("__shb"))
    v = (
        cand.join(A, "__ida")
        .join(B, "__idb")
        .withColumn("__shared", F.size(F.array_intersect("__sha", "__shb")))
        .withColumn("__na", F.size("__sha"))
        .withColumn("__nb", F.size("__shb"))
    )
    ca = F.col("__shared") / F.col("__na")
    cb = F.col("__shared") / F.col("__nb")
    return (
        v.where((F.col("__na") > 0) & (F.col("__nb") > 0))
        .where((ca >= threshold) | (cb >= threshold))
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            F.col("__shared").cast("long").alias("n_shared"),
            ca.alias("containment_a"),
            cb.alias("containment_b"),
        )
    )


def cluster_representatives(
    df: DataFrame,
    *,
    quality_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.2,
) -> DataFrame:
    """Quality-aware near-duplicate cluster keeper: instead of the
    min-id survivor (``corpus_filter``'s convention), keep each MinHash
    cluster's HIGHEST-QUALITY document — the dedup policy used when
    near-duplicates differ in cleanliness (one copy is the clean
    original, the others are boilerplate-wrapped or truncated
    re-crawls) and dropping by id would keep an arbitrary copy.

    ``quality_col`` names an existing per-document score; when None the
    shared ``text_profile`` quality heuristic is computed inline.  The
    winner is decided on the score ROUNDED to 6 (round-before-threshold
    convention) with ties to the lowest id, so the choice replays
    identically on any engine.

    Output: one row per document — ``id_col, cluster_id, cluster_size,
    quality_score, is_representative``.

    Scale shape: the pairs/components legs are exactly
    ``corpus_filter``'s (banded LSH candidates, min-label propagation —
    never all-pairs); the selection adds one cluster-keyed window.
    ``cluster_size`` is an integer count over the same partition.
    """
    from polars_trading_spark.functions.text import text_profile

    if quality_col is None:
        scored = text_profile(df, text_col=text_col, keep=(id_col,)).select(
            id_col, F.round("quality_score", 6).alias("__q")
        )
    else:
        scored = df.select(id_col, F.round(F.col(quality_col), 6).alias("__q"))

    pairs = minhash_lsh_pairs(
        df,
        text_col,
        id_col,
        ngram=ngram,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
    )
    comp = connected_components(pairs, nodes=df.select(id_col), node_col=id_col)
    j = comp.select(id_col, "cluster_id").join(scored, id_col)
    w_all = Window.partitionBy("cluster_id")
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.col("__q").desc(), F.col(id_col).asc()
    )
    return j.select(
        F.col(id_col),
        "cluster_id",
        F.count(F.lit(1)).over(w_all).cast("int").alias("cluster_size"),
        F.col("__q").alias("quality_score"),
        (F.row_number().over(w_rank) == 1).alias("is_representative"),
    )


def _recall_sample(
    docs: DataFrame,
    sample_fraction,
    target_docs: int,
    salt: str,
    id_col: str,
) -> DataFrame:
    """Deterministic salted-hash document sample shared by the recall
    harnesses (same engine-portable nested recipe as
    ``stratified_sample``): docs survive iff ``u(id) < fraction``.

    ``sample_fraction="auto"`` (the default) resolves the fraction to
    ``min(1.0, target_docs / n_docs)`` — a CONSTANT sampled-doc budget,
    so the harness's pair cost stays flat as the corpus grows instead
    of merely 4x-cheaper-but-still-quadratic under a static fraction
    (the count is one scalar job; the division is exact in double on
    both engines, so the oracle reproduces the same sample).  A float
    is an explicit static fraction; ``None`` opts in to the full
    corpus.
    """
    if sample_fraction is None:
        return docs
    if sample_fraction == "auto":
        if target_docs < 1:
            raise ValueError(f"target_docs must be >= 1, got {target_docs}")
        # The corpus-size scalar behind the auto fraction is one count
        # job per harness call; inside a shared_signature_cache() block
        # the four recall/param harnesses (and their bench repeats) ask
        # it of the SAME corpus plan — serve it from the shared cache
        # like every other shared corpus stage (round 14, guide §5.3).
        n = None
        nkey = (
            _corpus_cache_key(docs, "ndocs")
            if _SHARED_SIG_CACHE is not None
            else None
        )
        if nkey is not None:
            n = _SHARED_SIG_CACHE.get(nkey)
        if n is None:
            n = docs.count()
            if nkey is not None:
                _SHARED_SIG_CACHE[nkey] = n
        fraction = min(1.0, float(target_docs) / max(n, 1))
    else:
        # strings other than 'auto' must hit the helpful ValueError, not
        # a TypeError from the float comparison below
        if isinstance(sample_fraction, str) or not (
            0.0 < sample_fraction <= 1.0
        ):
            raise ValueError(
                "sample_fraction must be in (0, 1], 'auto', or None, "
                f"got {sample_fraction!r}"
            )
        fraction = float(sample_fraction)
    if fraction >= 1.0:
        return docs
    mod = 1 << 30
    u = (
        F.pmod(
            portable_hash60(
                F.concat(F.lit(salt), F.col(id_col).cast("string"))
            ),
            F.lit(mod),
        )
        / F.lit(float(mod))
    )
    return docs.where(u < F.lit(fraction))


def dedup_recall_stats(
    docs: DataFrame,
    *,
    ngram: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.2,
    sample_fraction: float | str | None = "auto",
    target_docs: int = 2500,
    salt: str = "pts-recall",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash banding recall harness: pairs surviving LSH banding vs
    every pair at the same exact shingle-Jaccard threshold, on a
    deterministic document sample.

    CONTRACT — sampled by default.  The exact arm is PPJoin-filtered
    but GLOBAL: at low thresholds the prefix filter keeps
    ``n - ceil(t*n) + 1`` (~80% at t=0.2) of postings, so its candidate
    generation degrades toward quadratic with corpus size.  That is
    fine for a diagnostic, a scale-killer as a routine job — so the
    harness measures recall on a salted-hash document sample, and the
    DEFAULT ``sample_fraction="auto"`` targets a constant sampled-doc
    budget (``target_docs``, fraction = min(1, target_docs/n)): pair
    cost is then flat in corpus size, while the recall RATIO stays an
    asymptotically unbiased estimate of the full-corpus recall —
    banding survival is decided per-pair by signature agreement, so
    restricting to sampled-doc pairs does not bias which pairs survive.
    A float pins a static fraction; ``sample_fraction=None`` opts in to
    the full-corpus exact arm explicitly.

    Output: one row — ``n_exact, n_lsh, n_hit, recall`` (null when no
    exact pair exists in the sample; widen ``target_docs`` if so).
    """
    base = _recall_sample(docs, sample_fraction, target_docs, salt, id_col)

    exact = persist_tracked(
        ngram_jaccard_pairs(
            base, text_col, id_col, ngram=ngram, threshold=jaccard_threshold,
            block_cols=(),
        ).select("id_a", "id_b")
    )
    lsh = persist_tracked(
        minhash_lsh_pairs(
            base, text_col, id_col,
            ngram=ngram, num_hashes=num_hashes, bands=bands,
            jaccard_threshold=jaccard_threshold,
        ).select("id_a", "id_b")
    )
    e = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    l = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    h = exact.join(lsh, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        e.crossJoin(l)
        .crossJoin(h)
        .select(
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_lsh").cast("long").alias("n_lsh"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.when(
                F.col("n_exact") > 0,
                F.round(F.col("n_hit") / F.col("n_exact").cast("double"), 6)
                + F.lit(0.0),
            ).alias("recall"),
        )
    )


def dedup_recall_curve(
    docs: DataFrame,
    *,
    thresholds: tuple = (0.2, 0.3, 0.4, 0.5),
    ngram: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    sample_fraction: float | str | None = "auto",
    target_docs: int = 2500,
    salt: str = "pts-recall",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash banding recall as a CURVE over Jaccard thresholds — one
    pass, every threshold.

    ``dedup_recall_stats`` answers "what does banding cost at t?";
    tuning bands/rows needs the whole curve, and re-running pair
    generation per threshold re-pays the expensive part each time.
    Here both arms run ONCE at ``min(thresholds)`` (their pair sets
    carry exact Jaccard values), and each requested threshold is a
    filter over the same persisted pair frames — the candidate
    generation cost is paid once for the entire curve.

    Same sampling contract as ``dedup_recall_stats`` (deterministic
    salted-hash document sample; ``"auto"`` targets a constant
    ``target_docs`` budget, full corpus behind an explicit
    ``sample_fraction=None``).  Output one row per threshold:
    ``threshold, n_exact, n_lsh, n_hit, recall``.

    NOTE the one caveat the curve inherits from LSH itself: the banded
    arm's CANDIDATES are generated with the banding probability tuned
    by (num_hashes, bands) — the same candidates for every threshold —
    so recall at t > min(thresholds) measures those bands' behavior at
    stricter verification, exactly what a bands/rows sweep wants.
    """
    ts = sorted(set(float(t) for t in thresholds))
    if not ts or ts[0] <= 0 or ts[-1] > 1:
        raise ValueError(f"thresholds must be in (0, 1], got {thresholds}")
    base = _recall_sample(docs, sample_fraction, target_docs, salt, id_col)

    t0 = ts[0]
    # eager: each pair frame feeds three AQE-parallel threshold
    # aggregates — lazy persists raced to materialize the expensive
    # PPJoin / banded-verify subtrees once per consumer (guide §5.3)
    exact = persist_tracked(
        ngram_jaccard_pairs(
            base, text_col, id_col, ngram=ngram, threshold=t0, block_cols=()
        ).select("id_a", "id_b", F.col("jaccard").alias("__je")),
        eager=True,
    )
    lsh = persist_tracked(
        minhash_lsh_pairs(
            base, text_col, id_col,
            ngram=ngram, num_hashes=num_hashes, bands=bands,
            jaccard_threshold=t0,
        ).select("id_a", "id_b", F.col("jaccard").alias("__jl")),
        eager=True,
    )
    spark = docs.sparkSession
    tf = spark.createDataFrame([(t,) for t in ts], "threshold double")
    e = (
        exact.crossJoin(F.broadcast(tf))
        .where(F.round("__je", 9) >= F.round("threshold", 9))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    l = (
        lsh.crossJoin(F.broadcast(tf))
        .where(F.round("__jl", 9) >= F.round("threshold", 9))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lsh"))
    )
    h = (
        exact.join(lsh.select("id_a", "id_b"), ["id_a", "id_b"])
        .crossJoin(F.broadcast(tf))
        .where(F.round("__je", 9) >= F.round("threshold", 9))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    return (
        tf.join(e, "threshold", "left")
        .join(l, "threshold", "left")
        .join(h, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            F.coalesce("n_lsh", F.lit(0)).alias("n_lsh"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.when(
                F.coalesce("n_exact", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_hit", F.lit(0))
                    / F.col("n_exact").cast("double"),
                    6,
                )
                + F.lit(0.0),
            ).alias("recall"),
        )
    )


def _pow_chain(x, n: int, mul):
    """Fixed-order binary-exponentiation product: x**n as the SAME
    multiplication sequence on any backend (LSB-first squarings,
    ascending set bits) — so a Spark Column chain and the SQL oracle's
    string chain evaluate bit-identical doubles, unlike pow()."""
    if n < 1:
        raise ValueError(f"exponent must be >= 1, got {n}")
    result = None
    sq = x
    while n:
        if n & 1:
            result = sq if result is None else mul(result, sq)
        n >>= 1
        if n:
            sq = mul(sq, sq)
    return result


def lsh_power_curve(
    docs: DataFrame,
    *,
    thresholds: tuple = (0.2, 0.3, 0.4, 0.5),
    ngram: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    sample_fraction: float | str | None = "auto",
    target_docs: int = 2500,
    salt: str = "pts-recall",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Theory-vs-practice banding diagnostic: the analytic LSH S-curve
    ``p(j) = 1 - (1 - j^r)^b`` (r = num_hashes/bands rows per band)
    EVALUATED ON THE ACTUAL PAIR POPULATION against the measured
    banding hits — the tuning companion of ``dedup_recall_curve``.
    A measured recall far below the expected one indicates broken
    signatures/banding, not an unlucky corpus; expected-vs-actual per
    threshold is exactly the evidence a bands/rows sweep needs.

    Per threshold ``t``: ``n_exact`` pairs with exact shingle-Jaccard
    >= t, ``expected_hits`` = sum of p(j) over those pairs (the mean of
    independent per-pair banding-survival Bernoullis), ``n_hit`` =
    pairs the banding actually surfaced, plus both recalls.

    Engine-portable float discipline: ``p(j)`` is built from ``j`` (an
    exact small-integer ratio) with a FIXED-ORDER binary-exponentiation
    multiplication chain (never ``pow``, which is not correctly
    rounded), and the per-threshold sum of p(j) folds as an ORDERED
    running window over (id_a, id_b) read at its last row — the
    SCALING float-association rule.

    Same sampling contract as ``dedup_recall_stats``.  One candidate-
    generation pass at min(thresholds) for the whole curve.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    ts = sorted(set(float(t) for t in thresholds))
    if not ts or ts[0] <= 0 or ts[-1] > 1:
        raise ValueError(f"thresholds must be in (0, 1], got {thresholds}")
    r = num_hashes // bands
    base = _recall_sample(docs, sample_fraction, target_docs, salt, id_col)

    t0 = ts[0]
    exact = persist_tracked(
        ngram_jaccard_pairs(
            base, text_col, id_col, ngram=ngram, threshold=t0, block_cols=()
        ).select("id_a", "id_b", F.col("jaccard").alias("__j"))
    )
    lsh = persist_tracked(
        minhash_lsh_pairs(
            base, text_col, id_col,
            ngram=ngram, num_hashes=num_hashes, bands=bands,
            jaccard_threshold=t0,
        ).select("id_a", "id_b")
    )

    mul = lambda a, b: a * b  # noqa: E731
    jr = _pow_chain(F.col("__j"), r, mul)
    p = F.lit(1.0) - _pow_chain(F.lit(1.0) - jr, bands, mul)
    spark = docs.sparkSession
    tf = spark.createDataFrame([(t,) for t in ts], "threshold double")

    fanned = (
        exact.withColumn("__p", p)
        .crossJoin(F.broadcast(tf))
        .where(F.round("__j", 9) >= F.round("threshold", 9))
    )
    w = Window.partitionBy("threshold").orderBy("id_a", "id_b")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e = (
        fanned.select(
            "threshold",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(full).alias("__cnt"),
            F.sum("__p").over(run).alias("__psum"),
        )
        .where(F.col("__rn") == F.col("__cnt"))
        .select(
            "threshold",
            F.col("__cnt").cast("long").alias("n_exact"),
            F.col("__psum").alias("__expected"),
        )
    )
    h = (
        exact.join(lsh, ["id_a", "id_b"])
        .crossJoin(F.broadcast(tf))
        .where(F.round("__j", 9) >= F.round("threshold", 9))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    z0 = F.lit(0.0)
    return (
        tf.join(e, "threshold", "left")
        .join(h, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.round(F.coalesce("__expected", F.lit(0.0)), 6) + z0).alias(
                "expected_hits"
            ),
            F.when(
                F.coalesce("n_exact", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_hit", F.lit(0))
                    / F.col("n_exact").cast("double"),
                    6,
                )
                + z0,
            ).alias("recall"),
            F.when(
                F.coalesce("n_exact", F.lit(0)) > 0,
                F.round(
                    F.coalesce("__expected", F.lit(0.0))
                    / F.col("n_exact").cast("double"),
                    6,
                )
                + z0,
            ).alias("expected_recall"),
        )
    )


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 3,
    num_hashes: int = 12,
) -> DataFrame:
    """The PERSISTED MinHash signature index of a corpus snapshot: one
    row per document, ``id_col`` plus signature columns ``m0..m{k-1}``
    — exactly what an incremental pipeline writes to parquet after each
    ingest so the NEXT snapshot can near-dedup against it without ever
    re-reading (or even retaining) the base text.  Empty shingle sets
    carry the sentinel ``MERSENNE31`` in every position (short docs
    never collide into real buckets — same convention as
    ``minhash_lsh_pairs``).

    Scale shape: one tokenize + shingle pass, one hash aggregate; the
    index is one slim row per document.
    """
    if _SHARED_SIG_CACHE is not None:
        base = _shingle_table(df, text_col, id_col, ngram)
    else:
        # one-shot: no persist needed, the single aggregate below is the
        # only consumer
        base = _tokenized(df, text_col, id_col).select(
            "__id", shingle_hashes(F.col("__toks"), ngram).alias("__sh")
        )
    sig = (
        base.select("__id", F.explode_outer("__sh").alias("__s"))
        .groupBy("__id")
        .agg(
            *[
                F.coalesce(
                    F.min((F.lit(ca) * F.col("__s") + F.lit(cb)) % F.lit(MERSENNE31)),
                    F.lit(MERSENNE31),
                ).alias(f"m{i}")
                for i, (ca, cb) in enumerate(_coeffs(num_hashes))
            ]
        )
    )
    return sig.withColumnRenamed("__id", id_col)


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    sig_threshold: float = 0.5,
    base_flag_col: str | None = None,
) -> DataFrame:
    """Near-dedup a NEW snapshot against a PERSISTED signature index —
    the incremental form every recurring-crawl pipeline needs: the base
    corpus is touched only through its (slim, text-free)
    ``minhash_index`` table, so at 100 TB the cost per ingest scales
    with the NEW data, not the corpus.

    A new document is dropped when it shares a full signature band with
    — and its SIGNATURE-estimated Jaccard (matching fraction of the
    ``num_hashes`` minima, an exact k-rational) reaches
    ``sig_threshold`` against — either (a) ANY base document (the index
    always wins) or (b) a lower-id new document (the in-batch min-id
    keeper convention shared with ``semdedup``; intentionally
    link-based, not transitive — the components pass stays a batch
    operator).  Signature-estimated similarity is used instead of exact
    shingle Jaccard BECAUSE base text is unavailable by design; empty
    signatures (sentinel in position 0) never match.

    Returns one row per NEW document: ``id_col, keep`` (int),
    ``dup_of`` (the matched doc; highest estimated Jaccard, ties to the
    base side then the smallest id), ``dup_is_base`` (int) and
    ``est_jaccard``.

    ``base_flag_col`` (round 11): name of an int column in ``index``
    marking true base docs (1) vs signatures APPENDED from earlier
    stream micro-batches (0).  Flag-0 index docs compare only against
    higher-id new docs — exactly the in-batch min-id rule — so a
    micro-batched replay (``streaming_incremental_dedup``) reproduces
    this operator's output bit-for-bit when the batch order is
    NON-DECREASING in doc id (monotonic crawl ids, the real ingest
    shape).  Out-of-order splits differ by construction (round-12
    caveat): a later batch carrying a LOWER id than an earlier batch's
    near-duplicate would make the one-shot run rewrite the earlier
    decision, while the replay keeps per-batch finality.  Default None
    = every index row is base (the one-shot contract, unchanged).

    Scale shape: signatures for the new snapshot only; the band
    group-join between the new side and (index UNION new) is the only
    corpus-sized shuffle — in production, persist the index BUCKETED BY
    its band keys and the join co-locates shuffle-free.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    if not (0.0 < sig_threshold <= 1.0):
        raise ValueError(
            f"sig_threshold must be in (0, 1], got {sig_threshold}"
        )
    rows_per_band = num_hashes // bands
    mcols = [f"m{i}" for i in range(num_hashes)]
    for c in mcols:
        if c not in index.columns:
            raise ValueError(
                f"index is missing signature column {c!r}; build it with "
                f"minhash_index(num_hashes={num_hashes})"
            )
    new_sig = minhash_index(
        new_docs, text_col, id_col, ngram=ngram, num_hashes=num_hashes
    )
    new_sig = persist_tracked(new_sig)
    both = new_sig.select(
        F.col(id_col).alias("__id"), F.lit(0).alias("__base"), *mcols
    ).unionByName(
        index.select(
            F.col(id_col).alias("__id"),
            (
                F.col(base_flag_col).cast("int")
                if base_flag_col is not None
                else F.lit(1)
            ).alias("__base"),
            *mcols,
        )
    )

    def _banded(sig_df):
        return sig_df.select(
            "__id",
            "__base",
            *mcols,
            F.posexplode(
                F.array(
                    *[
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"m{i}").cast("string")
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ],
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("__band", "__key"),
        )

    a = _banded(
        new_sig.select(
            F.col(id_col).alias("__id"), F.lit(0).alias("__base"), *mcols
        )
    ).alias("a")
    b = _banded(both).alias("b")
    sent = F.lit(MERSENNE31)
    cand = (
        a.join(
            b,
            on=[
                F.col("a.__band") == F.col("b.__band"),
                F.col("a.__key") == F.col("b.__key"),
                (F.col("b.__base") == 1) | (F.col("b.__id") < F.col("a.__id")),
                F.col("a.m0") != sent,
                F.col("b.m0") != sent,
            ],
        )
        .select(
            F.col("a.__id").alias("__nid"),
            F.col("b.__id").alias("__oid"),
            F.col("b.__base").alias("__obase"),
            *[
                (F.col(f"a.m{i}") == F.col(f"b.m{i}"))
                .cast("long")
                .alias(f"__e{i}")
                for i in range(num_hashes)
            ],
        )
        .dropDuplicates(["__nid", "__oid", "__obase"])
    )
    return _signature_decisions(cand, new_sig, id_col, num_hashes, sig_threshold)


def dedup_cluster_profile(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.2,
) -> DataFrame:
    """Cluster-SIZE distribution of the near-duplicate graph — the
    shape report deduplication papers lead with (how much of the corpus
    sits in pairs vs. deep template families?) and the sanity check
    that catches a broken threshold instantly: a too-low threshold
    shows up as one giant component, a too-high one as all singletons.

    One row per distinct cluster size: ``cluster_size, n_clusters,
    n_docs`` (= size x clusters), ``dup_docs`` (docs a min-id keeper
    policy would drop), ``doc_share`` of the corpus.  Singletons are
    included (size 1, dup_docs 0).

    Scale shape: exactly the ``dedup_clusters`` plan (banded MinHash
    pairs -> min-label components) plus ONE integer hash aggregate
    over the labeled corpus and a size-count-bounded share window;
    every emitted float is a single division of exact integers.
    """
    pairs = minhash_lsh_pairs(
        documents,
        text_col,
        id_col,
        ngram=ngram,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
    )
    labeled = connected_components(pairs, nodes=documents, node_col=id_col)
    prof = labeled.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    from pyspark.sql import Window

    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    size = F.col("cluster_size").cast("long")
    n_clusters = (F.col("n_docs") / size).cast("long")
    return prof.select(
        F.col("cluster_size").cast("int").alias("cluster_size"),
        n_clusters.alias("n_clusters"),
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("n_docs") - n_clusters).cast("long").alias("dup_docs"),
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w_all).cast("double"),
            6,
        ).alias("doc_share"),
    )


def lsh_param_select(
    docs: DataFrame,
    *,
    threshold: float = 0.4,
    floor: float = 0.15,
    num_hashes: int = 12,
    ngram: int = 3,
    sample_fraction: float | str | None = "auto",
    target_docs: int = 2500,
    salt: str = "pts-recall",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Analytic (bands, rows) selection table for a MinHash budget —
    the question ``lsh_power_curve`` leaves open: *given k hashes and a
    target threshold, WHICH factorization should the pipeline run?*
    For EVERY factorization ``k = bands x rows``, the banding S-curve
    ``p(j) = 1 − (1 − j^rows)^bands`` is evaluated on the corpus's
    ACTUAL pair population:

    * ``exp_recall`` — mean p(j) over pairs with exact Jaccard >=
      ``threshold`` (expected fraction of true pairs surfaced);
    * ``exp_near_fp`` — mean p(j) over the NEAR-MISS band ``floor <= j
      < threshold`` (expected fraction of sub-threshold candidates the
      verify stage must pay for — the all-pairs FP mass below ``floor``
      is unmeasurable without an all-pairs join and negligible for the
      verify-cost decision);
    * ``score = exp_recall − exp_near_fp`` — the selection ranking.

    One row per factorization: ``bands, rows_per_band, n_pos_pairs,
    n_near_pairs, exp_recall, exp_near_fp, score``.

    Float discipline: p(j) uses the SAME fixed-order binary-
    exponentiation chains as ``lsh_power_curve`` (never ``pow``), one
    CASE branch per factorization; per-factor sums fold as ORDERED
    (id_a, id_b) running windows read at the last row.  Same sampling
    contract as ``dedup_recall_stats``; ONE pair-generation pass at
    ``floor`` serves every factorization.
    """
    if not (0.0 < floor < threshold <= 1.0):
        raise ValueError(
            f"need 0 < floor < threshold <= 1, got floor={floor} "
            f"threshold={threshold}"
        )
    bs = [b for b in range(1, num_hashes + 1) if num_hashes % b == 0]
    base = _recall_sample(docs, sample_fraction, target_docs, salt, id_col)
    exact = persist_tracked(
        ngram_jaccard_pairs(
            base, text_col, id_col, ngram=ngram, threshold=floor,
            block_cols=(),
        ).select("id_a", "id_b", F.col("jaccard").alias("__j"))
    )
    spark = docs.sparkSession
    factors = spark.createDataFrame(
        [(b, num_hashes // b) for b in bs], "bands int, rows_per_band int"
    )
    fan = exact.crossJoin(F.broadcast(factors))

    mul = lambda a, b: a * b  # noqa: E731
    p_expr = None
    for b in bs:
        r = num_hashes // b
        jr = _pow_chain(F.col("__j"), r, mul)
        pf = F.lit(1.0) - _pow_chain(F.lit(1.0) - jr, b, mul)
        p_expr = (
            pf
            if p_expr is None
            else F.when(F.col("bands") == b, pf).otherwise(p_expr)
        )
    pos = F.round("__j", 9) >= F.round(F.lit(float(threshold)), 9)
    fan = fan.withColumn("__p", p_expr)
    w = Window.partitionBy("bands").orderBy("id_a", "id_b")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy("bands")
    g = fan.select(
        "bands",
        "rows_per_band",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
        F.sum(pos.cast("long")).over(w_all).alias("__npos"),
        F.sum(F.when(pos, F.col("__p"))).over(run).alias("__sp"),
        F.sum(F.when(~pos, F.col("__p"))).over(run).alias("__sn"),
    ).where(F.col("__rn") == F.col("__n"))
    npos = F.col("__npos")
    nneg = F.col("__n") - npos
    er = F.when(npos > 0, F.col("__sp") / npos.cast("double"))
    ef = F.when(nneg > 0, F.col("__sn") / nneg.cast("double"))
    return g.select(
        "bands",
        "rows_per_band",
        npos.cast("long").alias("n_pos_pairs"),
        nneg.cast("long").alias("n_near_pairs"),
        er.alias("exp_recall"),
        ef.alias("exp_near_fp"),
        (F.coalesce(er, F.lit(0.0)) - F.coalesce(ef, F.lit(0.0))).alias(
            "score"
        ),
    )


# --------------------------------------------------------------------------
# Round 11: the bucketed banded index — the docstring promise at
# minhash_index ("persist the index BUCKETED by band keys for a
# shuffle-free join") made concrete.  The exploded band table is
# written bucketBy(__bkey) + sortBy(__bkey), so the per-ingest band
# join reads the index side STRAIGHT OFF DISK: no Exchange, no Sort on
# the corpus-sized branch — only the (small) new snapshot shuffles to
# the bucket count.  tests/test_plans_r11.py pins the no-exchange
# contract against a non-bucketed control.
# --------------------------------------------------------------------------


def _banded_bkey(sig_df: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Explode a signature frame (``__id, __base, m0..``) to one row
    per band with the single join column ``__bkey`` = band index +
    comma-joined band minima — band identity is INSIDE the key, so one
    equi-join column carries the whole banding scheme (bucketable)."""
    rows_per_band = num_hashes // bands
    return sig_df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        F.lit(str(b)),
                        *[
                            F.col(f"m{i}").cast("string")
                            for i in range(
                                b * rows_per_band, (b + 1) * rows_per_band
                            )
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__bkey"),
    )


def _signature_decisions(
    cand: DataFrame,
    new_sig: DataFrame,
    id_col: str,
    num_hashes: int,
    sig_threshold: float,
) -> DataFrame:
    """Shared decision tail of the incremental-dedup family: estimated
    Jaccard from the per-position equality flags, threshold, best match
    per new doc (highest est, ties to the base side then the smallest
    id), left-join back so every new doc keeps a row."""
    est = sum(F.col(f"__e{i}") for i in range(num_hashes)) / F.lit(
        float(num_hashes)
    )
    best = (
        cand.withColumn("__est", est)
        .where(F.col("__est") >= F.lit(float(sig_threshold)))
        .groupBy("__nid")
        .agg(
            F.max(
                F.struct(
                    F.col("__est"),
                    F.col("__obase"),
                    (-F.col("__oid")).alias("__noid"),
                )
            ).alias("__best")
        )
        .select(
            "__nid",
            F.col("__best")["__est"].alias("est_jaccard"),
            F.col("__best")["__obase"].cast("int").alias("dup_is_base"),
            (-F.col("__best")["__noid"]).cast("long").alias("dup_of"),
        )
    )
    return (
        new_sig.select(F.col(id_col).alias("__nid"))
        .join(best, "__nid", "left")
        .select(
            F.col("__nid").alias(id_col),
            F.col("dup_of").isNull().cast("int").alias("keep"),
            "dup_of",
            "dup_is_base",
            "est_jaccard",
        )
    )


def write_banded_minhash_index(
    index: DataFrame,
    table_name: str,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    buckets: int = 32,
    base_flag_col: str | None = None,
) -> None:
    """Persist a ``minhash_index`` frame as the EXPLODED band table,
    BUCKETED (and sorted) by the band key — the layout that makes the
    recurring-ingest band join shuffle-free on the index side.

    Schema written: ``__bkey string, __id long, __base int, m0..m{k-1}``
    (one row per document per band; ``__base`` from ``base_flag_col``
    or 1).  Size the bucket count to the target cluster: at 100 TB a
    few thousand buckets keeps each file in the hundreds of MB and the
    per-ingest join fan-in bounded.  Bucketed writes go through the
    session catalog (``saveAsTable`` — plain ``parquet(path)`` cannot
    record bucketing metadata)."""
    if num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    mcols = [f"m{i}" for i in range(num_hashes)]
    for c in mcols:
        if c not in index.columns:
            raise ValueError(
                f"index is missing signature column {c!r}; build it with "
                f"minhash_index(num_hashes={num_hashes})"
            )
    flag = (
        F.col(base_flag_col).cast("int")
        if base_flag_col is not None
        else F.lit(1)
    )
    banded = _banded_bkey(
        index.select(
            F.col(id_col).cast("long").alias("__id"), flag.alias("__base"), *mcols
        ),
        num_hashes,
        bands,
    )
    (
        banded.select("__bkey", "__id", "__base", *mcols)
        .write.bucketBy(buckets, "__bkey")
        .sortBy("__bkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def incremental_dedup_banded(
    new_docs: DataFrame,
    banded_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    sig_threshold: float = 0.5,
) -> DataFrame:
    """``incremental_dedup`` against a PRE-BANDED, bucket-persisted
    index (``write_banded_minhash_index``): identical output contract
    (keep / dup_of / dup_is_base / est_jaccard, the same min-id and
    base-precedence rules), different physical shape — the index side
    arrives already exploded to band rows and BUCKETED by ``__bkey``,
    so the index-vs-new join needs NO exchange and NO sort on the
    index branch; only the new snapshot's band rows (small by
    definition of an ingest) shuffle to the bucket count.  In-batch
    new-vs-new candidates come from a separate self-join of the new
    side and are unioned before the shared decision tail.

    Pass ``spark.table(name)`` for ``banded_index``; flag-0 index rows
    (appended earlier snapshots) follow the ``base_flag_col`` rule —
    they only match higher-id new docs."""
    if num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    if not (0.0 < sig_threshold <= 1.0):
        raise ValueError(f"sig_threshold must be in (0, 1], got {sig_threshold}")
    mcols = [f"m{i}" for i in range(num_hashes)]
    need = {"__bkey", "__id", "__base", *mcols}
    missing = need - set(banded_index.columns)
    if missing:
        raise ValueError(
            f"banded index is missing columns {sorted(missing)}; write it "
            f"with write_banded_minhash_index(num_hashes={num_hashes}, "
            f"bands={bands})"
        )
    from polars_trading_spark._utils import persist_tracked

    new_sig = persist_tracked(
        minhash_index(
            new_docs, text_col, id_col, ngram=ngram, num_hashes=num_hashes
        )
    )
    new_banded = _banded_bkey(
        new_sig.select(
            F.col(id_col).alias("__id"), F.lit(0).alias("__base"), *mcols
        ),
        num_hashes,
        bands,
    )
    sent = F.lit(MERSENNE31)

    def _cand(other: DataFrame) -> DataFrame:
        a, b = new_banded.alias("a"), other.alias("b")
        return a.join(
            b,
            on=[
                F.col("a.__bkey") == F.col("b.__bkey"),
                (F.col("b.__base") == 1) | (F.col("b.__id") < F.col("a.__id")),
                F.col("a.m0") != sent,
                F.col("b.m0") != sent,
            ],
        ).select(
            F.col("a.__id").alias("__nid"),
            F.col("b.__id").alias("__oid"),
            F.col("b.__base").alias("__obase"),
            *[
                (F.col(f"a.m{i}") == F.col(f"b.m{i}"))
                .cast("long")
                .alias(f"__e{i}")
                for i in range(num_hashes)
            ],
        )

    cand = (
        _cand(banded_index.select("__bkey", "__id", "__base", *mcols))
        .unionByName(_cand(new_banded))
        .dropDuplicates(["__nid", "__oid", "__obase"])
    )
    return _signature_decisions(cand, new_sig, id_col, num_hashes, sig_threshold)
