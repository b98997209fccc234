"""Corpus cleanse: the composite keep/drop pass of a training-data
pipeline, assembled from the text / dedup primitives.

A pretraining-data pipeline rarely runs language-ID, quality scoring,
and dedup as separate jobs over 100 TB — it runs ONE pass that scores
every document and emits a keep decision with an audit trail (which
gate dropped it).  ``corpus_filter`` is that pass:

* **text gates** — language allow-list (stopword language-ID), token
  count bounds, heuristic quality floor.  All from ``text_profile``'s
  single codegen-only scan: no shuffle, no UDF.
* **exact dedup** — fingerprint-group keeper (lowest id survives).
  One window over the fingerprint hash.
* **near dedup** — MinHash-LSH pairs → connected components → only
  each cluster's minimum id survives.  Transitive: if A~B and B~C,
  exactly one of {A, B, C} is kept even though A~C was never emitted.

Gate semantics: dedup keepers are decided on the *full* corpus before
any text gate applies (the industry-standard order — filtering first
would re-introduce duplicates whose keeper was filtered), then ``keep``
is the conjunction of all five gates.  Each gate is also emitted as its
own boolean column so downstream audits can attribute drop rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import persist_tracked
from polars_trading_spark.functions.dedup import connected_components, minhash_lsh_pairs
from polars_trading_spark.functions.text import text_profile

__all__ = ["benchmark_coverage", "chunk_documents", "domain_cap", "contamination_report", "dedup_survivor_budget", "dsir_log_weights", "token_budget_curves", "corpus_filter", "corpus_funnel", "corpus_stats", "decontaminate", "gumbel_topk_sample", "hash_split", "lang_mix", "mix_corpus", "pack_sequences", "bpe_pack_sequences", "stratified_sample", "url_profile", "URL_DOMAIN_PATTERN"]


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 128,
    overlap: int = 16,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-token sliding windows with
    ``overlap`` shared tokens between consecutive chunks — the standard
    pre-training preprocessing step between cleaning and sequence
    packing (long documents become model-sized training examples
    without losing the text that straddles a cut).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; the chunk count is
    ``1`` when ``n <= chunk_tokens`` else
    ``(n - chunk_tokens + stride - 1) // stride + 1`` (the last chunk
    always reaches the final token; only it may be short).  Documents
    with fewer than ``min_tokens`` tokens are dropped.

    Output: ``id_col, chunk_idx, n_chunks, start_token,
    chunk_n_tokens, chunk_text`` (tokens are the normalized whitespace
    tokens shared with the rest of the text stack).

    100 TB shape: ZERO shuffles — stage the token array once, explode a
    bounded integer sequence (fan-out = n/stride per document), slice
    per chunk.  Everything is whole-stage codegen; integer arithmetic
    only, so any engine replays chunk boundaries exactly.
    """
    from polars_trading_spark.functions.text import tokens

    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap} vs {chunk_tokens}"
        )
    stride = chunk_tokens - overlap

    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    n = F.size("__toks")
    t = t.where(n >= int(min_tokens)).withColumn(
        "__n_chunks",
        F.when(n <= chunk_tokens, F.lit(1)).otherwise(
            ((n - chunk_tokens + stride - 1) / stride).cast("int") + 1
        ),
    )
    ex = t.select(
        id_col,
        "__toks",
        "__n_chunks",
        F.explode(F.sequence(F.lit(0), F.col("__n_chunks") - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    chunk = F.slice("__toks", start + 1, chunk_tokens)
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("__n_chunks").cast("int").alias("n_chunks"),
        start.cast("int").alias("start_token"),
        F.size(chunk).cast("int").alias("chunk_n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def corpus_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_quality: float = 0.5,
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.2,
) -> DataFrame:
    """One row per document: text-gate scores, dedup flags, and the
    final ``keep`` decision.

    Output columns: ``(id_col, lang_guess, n_tokens, quality_score,
    pass_lang, pass_tokens, pass_quality, is_exact_dup, is_near_dup,
    keep)``.  ``quality_score`` is unrounded; callers round for
    cross-engine comparison.

    Plan shape at scale: the profile is one scan (codegen only); exact
    dedup adds one shuffle on the fingerprint; the near-dup leg is the
    bucketed MinHash join plus the O(diameter)-round component loop —
    all keyed shuffles, nothing quadratic.  The three legs join back on
    the document id, so AQE can plan them independently.
    """
    prof = text_profile(df, text_col=text_col, keep=(id_col,))
    exact_w = Window.partitionBy("fingerprint")
    prof = prof.withColumn("__exact_keep", F.min(id_col).over(exact_w))

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

    out = prof.join(comp.select(id_col, "cluster_id"), on=id_col)
    return out.select(
        id_col,
        "lang_guess",
        "n_tokens",
        "quality_score",
        F.col("lang_guess").isin(*langs).alias("pass_lang"),
        ((F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)).alias(
            "pass_tokens"
        ),
        (F.col("quality_score") >= min_quality).alias("pass_quality"),
        (F.col(id_col) != F.col("__exact_keep")).alias("is_exact_dup"),
        (F.col(id_col) != F.col("cluster_id")).alias("is_near_dup"),
    ).withColumn(
        "keep",
        F.col("pass_lang")
        & F.col("pass_tokens")
        & F.col("pass_quality")
        & ~F.col("is_exact_dup")
        & ~F.col("is_near_dup"),
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    weights: dict[str, float] | None = None,
    salt: str = "pts-split",
    output_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-free id hash.

    Each row lands in a named split with probability proportional to its
    weight, decided purely by ``md5(salt || id)`` — so the assignment is
    (a) reproducible across runs, engines and cluster layouts, (b) stable
    under re-partitioning/re-ingestion (no random() whose value depends
    on task placement), and (c) leakage-safe: a document keeps its split
    forever, so later pipeline runs can only ever *add* documents to a
    split, never migrate them.  Zero shuffles — one projection.

    Changing ``salt`` re-draws the whole assignment (use per-experiment
    salts); weights are normalized, order defines the cut sequence.
    """
    from polars_trading_spark.functions.text import portable_hash60

    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    # 60-bit hash -> uniform u in [0, 1): positive modulus of a large
    # power of two keeps the arithmetic exact and portable.
    mod = 1 << 30
    u = (
        F.pmod(portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.lit(mod))
        / F.lit(float(mod))
    )
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(output_col, expr)


def corpus_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-group corpus profile: the dashboard aggregate a pipeline run
    reports after each cleanse stage.

    Output per ``group_col`` value: document count, distinct content
    fingerprints (= corpus size after exact dedup), token-count
    percentiles, mean token count and mean quality score.  Floats are
    unrounded; callers round for cross-engine comparison.

    ``exact=True`` uses exact ``percentile`` / ``count(DISTINCT)`` —
    right for oracle-checked correctness and for grouped dashboards
    whose per-group value sets fit an executor.  At 100 TB flip
    ``exact=False``: ``approx_percentile`` (t-digest, bounded memory)
    and HLL ``approx_count_distinct`` turn the same single hash
    aggregate into a sketch merge with fixed-size state per group —
    same plan shape, no precision-driven spill.
    """
    from polars_trading_spark.functions.text import (
        doc_fingerprint,
        quality_score,
        token_count,
    )

    base = df.select(
        F.col(group_col).alias("grp"),
        token_count(F.col(text_col)).alias("__nt"),
        doc_fingerprint(F.col(text_col)).alias("__fp"),
        quality_score(F.col(text_col)).alias("__q"),
    )
    pcts = F.array(*[F.lit(p) for p in percentiles])
    if exact:
        pct_agg = F.percentile(F.col("__nt"), pcts)
        distinct_agg = F.count_distinct(F.col("__fp"))
    else:
        pct_agg = F.approx_percentile(F.col("__nt"), pcts, F.lit(10_000))
        distinct_agg = F.approx_count_distinct(F.col("__fp"))
    agg = base.groupBy(F.col("grp").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        distinct_agg.alias("distinct_fingerprints"),
        pct_agg.alias("__pcts"),
        F.avg("__nt").alias("avg_tokens"),
        F.avg("__q").alias("avg_quality"),
    )
    pct_cols = [
        F.col("__pcts")[i].alias(f"p{int(p * 100):02d}_tokens")
        for i, p in enumerate(percentiles)
    ]
    return agg.select(
        group_col, "n_docs", "distinct_fingerprints", *pct_cols, "avg_tokens", "avg_quality"
    )


def stratified_sample(
    df: DataFrame,
    *,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "pts-sample",
) -> DataFrame:
    """Deterministic per-stratum sampling by content-free id hash.

    The large-corpus rebalancing primitive (downsample the dominant
    language / source, keep the rare ones): each row survives iff
    ``u(id) < fractions[stratum]`` where ``u`` is the same salted
    engine-portable md5 hash ``hash_split`` uses — so the sample is
    reproducible across runs, engines and partitionings, and **nested**:
    a 10% sample is a strict subset of a 20% sample under the same salt,
    which makes scaling ladders and A/B corpora consistent by
    construction.  Unknown strata fall back to ``default_fraction``.

    Zero shuffles — one projection + filter; Catalyst pushes the
    predicate to the scan.  Unlike ``DataFrame.sampleBy``, no RNG state
    and no task-placement dependence.
    """
    from polars_trading_spark.functions.text import portable_hash60

    for name, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"fraction for {name!r} must be in [0, 1], got {f}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")

    mod = 1 << 30
    u = (
        F.pmod(
            portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            F.lit(mod),
        )
        / F.lit(float(mod))
    )
    frac = None
    for name, f in fractions.items():
        cond = F.col(stratum_col) == name
        frac = F.when(cond, f) if frac is None else frac.when(cond, f)
    frac = F.lit(default_fraction) if frac is None else frac.otherwise(default_fraction)
    return df.where(u < frac)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    ngram: int = 3,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing word
    n-grams with an evaluation/benchmark set.

    The standard training-data hygiene pass (GPT-3 appendix C, The Pile,
    FineWeb all ship a variant): any document whose text contains
    ``min_hits`` or more n-grams that also occur in the benchmark is
    flagged so downstream filters can drop it and keep eval scores
    honest.  Matching runs on the engine-portable 31-bit shingle hashes
    (``dedup.shingle_hashes``) — no string n-gram materialization.

    Scale shape: the benchmark side reduces to a DISTINCT hash set that
    is tiny relative to any corpus (benchmarks are thousands of docs,
    corpora billions), so the probe is a **broadcast** mark-join onto
    the exploded corpus grams followed by ONE per-doc hash aggregate
    counting grams and hits together — the corpus-side tokenizer/
    shingle pipeline executes once (an earlier two-consumer shape ran
    it twice and needed a corpus-sized doc-id join to stitch the
    results), the corpus is never shuffled except for that aggregate,
    and the n-gram explosion streams through codegen.  ``explode_outer``
    keeps zero-gram documents.

    Returns one row per corpus doc: ``doc_id, n_grams, n_hits,
    contamination_ratio, is_contaminated``.
    """
    from polars_trading_spark.functions.dedup import shingle_hashes
    from polars_trading_spark.functions.text import tokens

    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            shingle_hashes(tokens(F.col(text_col)), n=ngram).alias("__sh"),
        )

    bench_set = (
        grams(benchmark).select(F.explode("__sh").alias("g")).distinct()
    )
    # Corpus side from the shared signature stage when one is active
    # (identical values — same shingle_hashes over the same corpus);
    # inline zero-shuffle scan otherwise.
    from polars_trading_spark.functions.dedup import shared_corpus_shingles

    corpus_sh = shared_corpus_shingles(corpus, text_col, id_col, ngram=ngram)
    exploded = (corpus_sh if corpus_sh is not None else grams(corpus)).select(
        "__id", F.explode_outer("__sh").alias("g")
    )
    marked = exploded.join(
        F.broadcast(bench_set.withColumn("__hit", F.lit(1))), on="g", how="left"
    )
    out = marked.groupBy("__id").agg(
        F.count("g").alias("n_grams"),
        F.count("__hit").alias("n_hits"),
    )
    return out.select(
        F.col("__id").alias(id_col),
        F.col("n_grams").cast("int").alias("n_grams"),
        F.col("n_hits").cast("int").alias("n_hits"),
        F.when(F.col("n_grams") > 0, F.col("n_hits") / F.col("n_grams"))
        .otherwise(F.lit(0.0))
        .alias("contamination_ratio"),
        (F.col("n_hits") >= min_hits).alias("is_contaminated"),
    )


def mix_corpus(
    df: DataFrame,
    *,
    weights: dict[str, float],
    target_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_epochs: float = 4.0,
    salt: str = "pts-mix",
) -> DataFrame:
    """Compose a training mixture: sample/oversample each source so its
    token share of a ``target_tokens`` budget matches ``weights`` (the
    static domain-mixing step every LLM data recipe ends with — cf. the
    Pile / Llama sampling-proportion tables).

    Per source ``s`` the required rate is ``r_s = w_s * target /
    available_s`` (weights normalized over the sources present).
    ``r_s <= 1`` downsamples by the deterministic salted id hash;
    ``r_s > 1`` *oversamples*: every document appears ``floor(r_s)``
    times and one more with probability ``frac(r_s)`` — epochs over
    small sources, the standard upsampling semantics — capped at
    ``max_epochs`` to bound repetition damage.

    Scale shape: one map-side token-count aggregate per source (rows =
    #sources, broadcast back), then a projection with a hash filter and
    a bounded ``explode(sequence(...))`` for the repeat factor.  No
    driver collect, no unbounded shuffle; determinism is per-document,
    so re-runs and re-partitions reproduce the mixture exactly.

    Returns the sampled rows: all input columns plus ``epoch`` (0-based
    copy index) and ``mix_rate`` (the applied per-source rate).
    """
    from polars_trading_spark.functions.text import portable_hash60, token_count

    if target_tokens <= 0:
        raise ValueError(f"target_tokens must be > 0, got {target_tokens}")
    if not weights:
        raise ValueError("weights must be a non-empty mapping")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")

    wmap = F.create_map(
        *[x for s, w in sorted(weights.items()) for x in (F.lit(s), F.lit(float(w) / total_w))]
    )
    avail = (
        df.groupBy(source_col)
        .agg(F.sum(token_count(F.col(text_col))).cast("double").alias("__avail"))
        .withColumn("__w", wmap[F.col(source_col)])
        .where(F.col("__w").isNotNull())
        .withColumn(
            "mix_rate",
            F.least(
                F.lit(float(max_epochs)),
                F.col("__w") * F.lit(float(target_tokens)) / F.col("__avail"),
            ),
        )
        .select(source_col, "mix_rate")
    )
    mod = 1 << 30
    u = (
        F.pmod(
            portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            F.lit(mod),
        ).cast("double")
        / F.lit(float(mod))
    )
    n_copies = (
        F.floor(F.col("mix_rate")).cast("int")
        + F.when(u < F.col("mix_rate") - F.floor(F.col("mix_rate")), 1).otherwise(0)
    )
    out = (
        df.join(F.broadcast(avail), source_col)
        .withColumn("__n", n_copies)
        .where(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )
    return out


def pack_sequences(
    df: DataFrame,
    *,
    budget_tokens: int,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pts-pack",
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget
    training sequences (the T5/GPT pre-tokenization packing step) after
    a deterministic salted-hash shuffle.

    Documents are hashed into ``n_shards`` shards, ordered inside each
    shard by the same hash (a reproducible global shuffle), then packed
    greedily: a document joins the current sequence if it fits, else
    opens the next one; a document longer than the budget gets a
    sequence of its own.  Packing is the one genuinely sequential step
    of a training-data pipeline, so the shard is the unit of
    parallelism — each shard's greedy scan is an O(bins log n)
    searchsorted loop inside a slim ``applyInPandas`` island, and the
    only waste is the underfill of each shard's final sequence
    (amortized away by shard sizes in the thousands of documents).

    Returns ``id_col, shard, seq_id, seq_offset, n_tokens`` where
    ``seq_id`` counts sequences within the shard and ``seq_offset`` is
    the document's first token slot in its sequence.
    """
    import numpy as np
    import pandas as pd

    from polars_trading_spark.functions.text import portable_hash60, token_count

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    budget = int(budget_tokens)
    h = portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    slim = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        h.alias("__h"),
        F.pmod(h, F.lit(int(n_shards))).cast("int").alias("shard"),
    )
    return _pack_slim(slim, budget, id_col)


def _pack_slim(slim: DataFrame, budget: int, id_col: str) -> DataFrame:
    """Shared greedy packing kernel over a slim ``(id, n_tokens, __h,
    shard)`` frame — the shard-parallel ``applyInPandas`` island behind
    ``pack_sequences`` (whitespace counts) and ``bpe_pack_sequences``
    (trained-tokenizer counts)."""
    import numpy as np
    import pandas as pd

    id_name = id_col
    schema = f"{id_col} long, shard int, seq_id int, seq_offset long, n_tokens int"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__h", id_name], kind="mergesort").reset_index(drop=True)
        tok = pdf["n_tokens"].to_numpy(dtype=np.int64)
        n = len(tok)
        c = np.concatenate(([0], np.cumsum(tok)))
        bins = np.zeros(n, dtype=np.int32)
        offs = np.zeros(n, dtype=np.int64)
        s, b = 0, 0
        while s < n:
            e = int(np.searchsorted(c, c[s] + budget, side="right")) - 1
            if e <= s:
                e = s + 1  # oversized document: its own sequence
            bins[s:e] = b
            offs[s:e] = c[s:e] - c[s]
            b += 1
            s = e
        return pd.DataFrame(
            {
                id_name: pdf[id_name],
                "shard": pdf["shard"],
                "seq_id": bins,
                "seq_offset": offs,
                "n_tokens": tok.astype(np.int32),
            }
        )

    return slim.groupBy("shard").applyInPandas(kernel, schema=schema)


def bpe_pack_sequences(
    documents: DataFrame,
    words: DataFrame,
    *,
    budget_tokens: int,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pts-pack",
) -> DataFrame:
    """``pack_sequences`` under REAL tokenizer counts: documents are
    budgeted by their trained-BPE token count (OOV words at their
    character count — the ``bpe_token_budget`` pricing) instead of the
    whitespace proxy, so the packed sequences match what the training
    loop will actually see.  Same deterministic salted-hash shuffle,
    same shard-parallel greedy kernel, same output schema (``n_tokens``
    is now the BPE count).

    Scale shape: ONE corpus explode hash-joined against the
    vocabulary-sized ``words`` table (``shuffle_hash`` — never sorts
    the corpus-sized probe), one per-doc integer aggregate, then the
    shared packing island.
    """
    from polars_trading_spark.functions.text import portable_hash60, tokens

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    exploded = documents.select(
        F.col(id_col),
        F.explode_outer(tokens(F.col(text_col))).alias("word"),
    )
    joined = exploded.join(
        words.select("word", "n_bpe_tokens").hint("shuffle_hash"),
        "word",
        "left",
    )
    counts = joined.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("word").isNull(), F.lit(0)).otherwise(
                F.coalesce(
                    F.col("n_bpe_tokens").cast("long"),
                    F.length("word").cast("long"),
                )
            )
        )
        .cast("int")
        .alias("n_tokens")
    )
    h = portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    slim = counts.select(
        F.col(id_col),
        "n_tokens",
        h.alias("__h"),
        F.pmod(h, F.lit(int(n_shards))).cast("int").alias("shard"),
    )
    return _pack_slim(slim, int(budget_tokens), id_col)


def corpus_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **filter_kwargs,
) -> DataFrame:
    """End-to-end cleanse funnel: how many documents/tokens survive each
    stage of the standard training-data pipeline — the one-glance
    yield report every corpus build publishes.

    Stages (each nested in the previous):

    0. ``raw``          — everything ingested
    1. ``quality``      — language/token-count/quality gates pass
    2. ``exact_dedup``  — plus not an exact (fingerprint) duplicate
    3. ``near_dedup``   — plus not a MinHash-LSH near-duplicate
                          (== the final ``keep`` set)

    Returns 4 rows: ``stage_idx, stage, n_docs, n_tokens``.  Built on
    ``corpus_filter``'s audit columns, reduced with ONE conditional
    aggregate and unpivoted with a 4-element explode — the funnel adds
    no shuffle beyond what the filter already does.
    """
    flags = corpus_filter(df, text_col, id_col, **filter_kwargs)
    q = F.col("pass_lang") & F.col("pass_tokens") & F.col("pass_quality")
    qe = q & ~F.col("is_exact_dup")
    qen = qe & ~F.col("is_near_dup")
    nt = F.col("n_tokens").cast("long")

    def stage(cond):
        return [
            F.count(F.when(cond, F.lit(1))).cast("long"),
            F.coalesce(F.sum(F.when(cond, nt)), F.lit(0)).cast("long"),
        ]

    agg = flags.agg(
        *stage(F.lit(True)), *stage(q), *stage(qe), *stage(qen)
    )
    c = agg.columns
    names = ["raw", "quality", "exact_dedup", "near_dedup"]
    stages = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(names[i]).alias("stage"),
                F.col(c[2 * i]).alias("n_docs"),
                F.col(c[2 * i + 1]).alias("n_tokens"),
            )
            for i in range(4)
        ]
    )
    return agg.select(F.explode(stages).alias("s")).select(
        F.col("s.stage_idx").cast("int").alias("stage_idx"),
        F.col("s.stage").alias("stage"),
        F.col("s.n_docs").alias("n_docs"),
        F.col("s.n_tokens").alias("n_tokens"),
    )


def dsir_log_weights(
    docs: DataFrame,
    *,
    is_target_col: str,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection with Importance Resampling log-weights (Xie et
    al., NeurIPS 2023) — the standard recipe for tilting a raw crawl
    toward a target domain: score every document by how much more
    likely its hashed-bigram features are under the target corpus than
    under the raw corpus,

        log w(doc) = sum_f count_f(doc) * log(p_target(f) / p_raw(f)),

    with bag-of-hashed-bigrams features (``n_buckets`` buckets, add-1
    smoothing).  Resampling by these weights is the importance-
    sampling step; emitting the raw log-weight keeps this operator
    deterministic (no RNG) and lets the caller pick top-k /
    Gumbel-top-k downstream.

    ``is_target_col`` names a boolean column marking the target
    documents (e.g. a trusted high-quality subset); every document is
    scored, including the target rows themselves.

    Distributed shape: bigram explode → per-(doc, bucket) integer
    counts (one hash aggregate absorbing the fan-out), bucket LMs as
    a ``n_buckets``-sized aggregate (integers, exact), one broadcast
    join of the log-ratio table, and the per-doc reduce as a
    BUCKET-ORDERED running sum read off the last row (fold-order
    deterministic, zipf_fit's trick).  Zero Python.

    Output: ``id_col``, ``n_feats`` (bigram occurrences), ``log_w``
    (null for docs with no bigram features).
    """
    from functools import reduce as _reduce

    from polars_trading_spark.functions.text import portable_hash60, tokens

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")

    toks = tokens(F.col(text_col))
    m = F.size(toks) - 1
    parts = [F.slice(toks, i + 1, m) for i in range(2)]
    grams = F.when(
        m > 0,
        _reduce(lambda a, b: F.zip_with(a, b, lambda x, y: F.concat_ws(" ", x, y)), parts),
    ).otherwise(F.array().cast("array<string>"))

    from polars_trading_spark._utils import persist_tracked

    # STAGED: the (doc, bucket) count aggregate has two consumers (the
    # bucket LMs and the scoring join) — unstaged, the corpus-sized
    # bigram explode re-executes per consumer (the §35 failure mode);
    # the cached frame is bounded by docs x min(bigrams, n_buckets).
    feat = persist_tracked(
        docs.select(id_col, F.col(is_target_col).alias("__tgt"), grams.alias("__g"))
        .select(id_col, "__tgt", F.explode("__g").alias("__gram"))
        .withColumn("__b", F.pmod(portable_hash60(F.col("__gram")), F.lit(n_buckets)))
        .groupBy(id_col, "__tgt", "__b")
        .agg(F.count(F.lit(1)).alias("__c")),
        eager=True,  # two AQE-parallel consumers of the md5-heavy explode
    )

    lm = feat.groupBy("__b").agg(
        F.sum(F.when(F.col("__tgt"), F.col("__c")).otherwise(F.lit(0))).alias("__ct"),
        F.sum("__c").alias("__cr"),
    )
    tot = lm.agg(
        F.sum("__ct").alias("__nt"), F.sum("__cr").alias("__nr")
    )
    # log( ((ct+1)/(nt+B)) / ((cr+1)/(nr+B)) ) from exact integers
    ratio = lm.crossJoin(F.broadcast(tot)).select(
        "__b",
        (
            F.log(
                (F.col("__ct") + 1).cast("double")
                / (F.col("__nt") + n_buckets).cast("double")
            )
            - F.log(
                (F.col("__cr") + 1).cast("double")
                / (F.col("__nr") + n_buckets).cast("double")
            )
        ).alias("__lr"),
    )

    scored = feat.join(F.broadcast(ratio), "__b")
    w_doc = Window.partitionBy(id_col).orderBy("__b")
    run = w_doc.rowsBetween(Window.unboundedPreceding, 0)
    full = w_doc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    last = (
        scored.withColumn("__rn", F.row_number().over(w_doc))
        .withColumn("__k", F.count(F.lit(1)).over(full))
        .withColumn("__nf", F.sum("__c").over(full))
        .withColumn("__w", F.sum(F.col("__c").cast("double") * F.col("__lr")).over(run))
        .where(F.col("__rn") == F.col("__k"))
        .select(id_col, F.col("__nf").alias("n_feats"), F.col("__w").alias("log_w"))
    )
    base = docs.select(id_col)
    return base.join(last, id_col, "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        "log_w",
    )


def gumbel_topk_sample(
    df: DataFrame,
    *,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "pts-gumbel",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    Gumbel-top-k trick (Vieira 2014; Kool et al., ICML 2019): drawing
    the k rows with the largest perturbed keys

        key_i = ln(w_i) + g_i,   g_i = -ln(-ln(u_i))

    is an exact sample without replacement proportional to weights
    ``w_i`` — the selection step after ``dsir_log_weights`` (importance
    resampling) or any quality-weighted corpus draw.  The uniforms come
    from the salted 60-bit portable hash of ``id_col`` (RNG-free,
    engine-portable, reproducible under any partitioning — the
    ``mix_corpus`` convention), so the sample is a pure function of
    (salt, ids, weights).

    Rows with a null or non-positive weight never sample.  Output:
    ``id_col, weight, sample_key, rank`` (rank 1 = first drawn),
    ordered semantics only through ``rank`` — row order itself remains
    non-contractual.

    Scale shape: the top-k is ``orderBy(...).limit(k)`` —
    TakeOrderedAndProject, a per-partition heap + driver merge of k
    rows, NO global sort and NO global window over the corpus; the
    rank window runs on the already-collapsed k-row frame.
    """
    from polars_trading_spark.functions.text import portable_hash60

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    mod = 1 << 30
    w = F.col(weight_col).cast("double")
    u = (
        F.pmod(
            portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            F.lit(mod),
        ).cast("double")
        + 0.5
    ) / F.lit(float(mod))
    key = F.log(w) - F.log(-F.log(u))
    top = (
        df.where(w > 0)
        .select(F.col(id_col), w.alias("weight"), key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    rank_w = Window.orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
    return top.select(
        id_col,
        "weight",
        "sample_key",
        F.row_number().over(rank_w).cast("int").alias("rank"),
    )


# Engine-portable URL/domain extractor: scheme + host captured from the
# lowercased text (Java regex and RE2 evaluate this subset identically).
URL_DOMAIN_PATTERN = r"https?://([a-z0-9.-]+)"


def url_profile(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 100,
) -> DataFrame:
    """Corpus-level domain histogram of in-text URLs — the provenance /
    spam-surface audit a crawl pipeline runs before domain-level
    filtering decisions (blocklists, per-domain caps, licensing tiers):
    which hosts does this corpus cite, in how many documents, how
    often?

    URLs are extracted with one portable regex over the lowercased
    text; the host (capture group) is the domain key.  Output: the
    ``top_k`` domains by total occurrences (ties broken by doc reach
    desc, then domain asc): ``domain, n_docs, n_urls``.

    Scale/determinism shape: regex extraction and explode happen in the
    scan stage; one (domain, doc) hash aggregate absorbs per-doc
    repeats map-side, one domain-keyed reduce is vocabulary-sized, and
    the top-k is TakeOrderedAndProject — never a global sort.  Every
    output is an INTEGER count, so the ordering key is exact and the
    cut set is engine-independent.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    doms = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(URL_DOMAIN_PATTERN), 1)
        ).alias("domain"),
    )
    per_doc = doms.groupBy("__id", "domain").agg(F.count(F.lit(1)).alias("__c"))
    g = per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__c").cast("long").alias("n_urls"),
    )
    return g.orderBy(
        F.desc("n_urls"), F.desc("n_docs"), F.asc("domain")
    ).limit(int(top_k))


def lang_mix(
    df: DataFrame,
    *,
    group_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Language-mix profile per corpus source — the cross-lingual
    contamination gate: a source that claims to be monolingual but
    shows high language entropy is mislabeled, machine-translated, or
    scraped through a boilerplate mixer.

    Per group: document count, distinct languages, the majority
    language and its share, and the Shannon entropy (nats) of the
    language distribution (0 = pure, ln(k) = uniform over k).

    Scale/determinism shape: one (group, lang) hash aggregate (group
    cardinality × language cardinality rows — tiny), then windows over
    that tiny frame only.  The entropy fold runs in ``lang`` order via
    a running window read at the last row (SCALING rule 24) and the
    majority pick is a total ordering (count desc, lang asc), so every
    float is engine-independent.  No data-sized shuffles beyond the one
    aggregate; no Python.
    """
    cnt = df.groupBy(group_col, lang_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    full = Window.partitionBy(group_col)
    by_lang = Window.partitionBy(group_col).orderBy(lang_col)
    run = by_lang.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top_first = Window.partitionBy(group_col).orderBy(
        F.desc("__c"), F.asc(lang_col)
    )
    staged = cnt.select(
        F.col(group_col),
        F.col(lang_col),
        F.col("__c"),
        F.sum("__c").over(full).cast("long").alias("__tot"),
        F.count(F.lit(1)).over(full).cast("long").alias("__k"),
        F.row_number().over(by_lang).alias("__rn"),
        F.row_number().over(top_first).alias("__top"),
    )
    p = F.col("__c").cast("double") / F.col("__tot").cast("double")
    staged2 = staged.select(
        group_col,
        lang_col,
        "__c",
        "__tot",
        "__k",
        "__rn",
        (-(p * F.log(p))).alias("__term"),
        F.when(F.col("__top") == 1, F.col(lang_col)).alias("__tl"),
        F.when(F.col("__top") == 1, F.col("__c")).alias("__tc"),
    )
    folded = staged2.select(
        group_col,
        "__tot",
        "__k",
        "__rn",
        F.sum("__term").over(run).alias("__ent"),
        F.max("__tl").over(full).alias("top_lang"),
        F.max("__tc").over(full).alias("__topc"),
    )
    return folded.where(F.col("__rn") == F.col("__k")).select(
        F.col(group_col),
        F.col("__tot").alias("n_docs"),
        F.col("__k").alias("n_langs"),
        "top_lang",
        (F.col("__topc").cast("double") / F.col("__tot").cast("double")).alias(
            "top_share"
        ),
        F.col("__ent").alias("lang_entropy"),
    )


def token_budget_curves(
    documents: DataFrame,
    *,
    n_cutoffs: int = 10,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source token-budget curves under quality filtering — the
    training-data budgeting question in one frame: "if I keep only each
    source's best-quality documents, how many tokens survive at every
    cutoff?"  (FineWeb/DataComp-style ablations pick their quality
    thresholds off exactly this curve.)

    Within each source, documents rank by ``(quality_score desc,
    doc_id)`` — the score is ROUNDED to 6 before ranking so a 1-ulp
    cross-engine difference cannot reorder the curve (round-before-rank,
    same trick as bm25) — and the curve is sampled at ``n_cutoffs``
    evenly spaced membership fractions.  Output one row per (source,
    cutoff): ``source, cutoff_idx (1..n_cutoffs), n_docs_kept,
    quality_cutoff, cum_tokens, total_tokens, token_share``.

    Scale shape: one projection computing (token count, quality) per
    doc — pure Column expressions, no joins — then ONE per-source
    window pass (rank + ordered integer prefix-sum of tokens + source
    totals over the same partition).  The boundary rows are selected
    with closed-form integer arithmetic (row rn is the decile-d
    boundary iff ``(rn-1)*nc < d*n_src <= rn*nc``), emitting exactly
    ``n_cutoffs`` rows per source via a bounded sequence explode —
    output is (sources x cutoffs)-sized, never corpus-sized.
    """
    from polars_trading_spark.functions.text import quality_score, token_count

    if n_cutoffs < 1:
        raise ValueError(f"n_cutoffs must be >= 1, got {n_cutoffs}")

    base = documents.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("__id"),
        token_count(F.col(text_col)).cast("long").alias("__tok"),
        F.round(quality_score(F.col(text_col)), 6).alias("__q"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("__q"), F.asc("__id"))
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    full = Window.partitionBy("source")
    staged = base.select(
        "source",
        F.row_number().over(w).alias("__rn"),
        F.col("__q"),
        F.sum("__tok").over(run).alias("__cum"),
        F.count(F.lit(1)).over(full).alias("__nsrc"),
        F.sum("__tok").over(full).alias("__tot"),
    )
    nc = F.lit(int(n_cutoffs))
    rn = F.col("__rn")
    nsrc = F.col("__nsrc")
    # integer-exact boundary deciles: d in ((rn-1)*nc/nsrc, rn*nc/nsrc]
    d_min = F.floor(((rn - 1) * nc) / nsrc) + 1
    d_max = F.floor((rn * nc) / nsrc)
    out = staged.where(d_max >= d_min).select(
        "source",
        F.explode(F.sequence(d_min.cast("int"), d_max.cast("int"))).alias(
            "cutoff_idx"
        ),
        rn.cast("long").alias("n_docs_kept"),
        F.col("__q").alias("quality_cutoff"),
        F.col("__cum").cast("long").alias("cum_tokens"),
        F.col("__tot").cast("long").alias("total_tokens"),
        F.round(F.col("__cum") / F.col("__tot").cast("double"), 6).alias(
            "token_share"
        ),
    )
    return out


def dedup_survivor_budget(
    documents: DataFrame,
    *,
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.2,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source token budget AFTER near-duplicate removal — the
    composition every training-data pipeline actually budgets with:
    "how many tokens does source S contribute once MinHash-LSH
    clusters keep one copy each?"

    Pipeline: banded MinHash candidate pairs -> exact-Jaccard verify ->
    connected components -> the canonical (min-id) keeper per cluster
    survives -> per-source integer token aggregates, raw vs surviving.

    Output one row per source: ``source, n_docs, n_survivors,
    raw_tokens, surviving_tokens, token_retention`` (surviving/raw).

    Scale shape: exactly the `dedup_clusters` plan (banding is the only
    corpus-pair shuffle, components iterate label propagation with
    scalar-only convergence collects) plus one integer hash aggregate;
    token counts are zero-join Column expressions.
    """
    from polars_trading_spark.functions.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from polars_trading_spark.functions.text import token_count

    pairs = minhash_lsh_pairs(
        documents,
        text_col,
        id_col,
        ngram=ngram,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
    )
    labeled = connected_components(pairs, nodes=documents.select(id_col))
    base = documents.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        token_count(F.col(text_col)).cast("long").alias("__tok"),
    ).join(labeled.select(id_col, "cluster_id"), id_col)
    survivor = F.col(id_col) == F.col("cluster_id")
    g = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(survivor, 1)).cast("long").alias("n_survivors"),
        F.sum("__tok").cast("long").alias("raw_tokens"),
        F.sum(F.when(survivor, F.col("__tok")).otherwise(F.lit(0)))
        .cast("long")
        .alias("surviving_tokens"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_survivors",
        "raw_tokens",
        "surviving_tokens",
        F.round(
            F.col("surviving_tokens") / F.col("raw_tokens").cast("double"), 6
        ).alias("token_retention"),
    )


def contamination_report(
    corpus: DataFrame,
    benchmarks: DataFrame,
    *,
    ngram: int = 3,
    min_hits: int = 1,
    bench_col: str = "benchmark",
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(benchmark, source) contamination report — ``decontaminate``
    composed with the corpus-governance rollup: instead of a per-doc
    flag against ONE benchmark, the leakage rate of every corpus source
    against every benchmark suite, the table a data audit actually
    publishes (cf. GPT-3 appendix C's per-eval overlap tables).

    ``benchmarks`` carries one row per benchmark document with a
    ``bench_col`` label (the suite name); a corpus document is
    contaminated against suite ``b`` when it shares ``min_hits``+ word
    ``ngram``-shingles with ANY document of ``b``.

    Output one row per (benchmark, source) — including clean pairs:
    ``benchmark, source, n_docs, n_contaminated, contamination_rate,
    tokens_total, tokens_contaminated, token_leak_rate`` (token columns
    use whitespace-token counts, the budget currency of the mix/pack
    pipeline, so the leak rate states how much TRAINING BUDGET the
    contaminated docs represent — doc counts understate big-doc leaks).

    Scale shape (same posture as ``decontaminate``): the benchmark gram
    set collapses to per-suite DISTINCT hashes — tiny versus any corpus
    — broadcast onto the exploded corpus grams; one per-(doc, suite)
    hash aggregate, one per-(suite, source) rollup, and a broadcast
    cross of the (sources x suites) totals grid.  The corpus-side
    tokenizer/shingle pipeline executes ONCE (token count and grams in
    the same staged projection); the corpus never shuffles except for
    the doc-level aggregate.
    """
    from polars_trading_spark.functions.dedup import shingle_hashes
    from polars_trading_spark.functions.text import tokens

    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")

    # one corpus pass: stage the token array once (CollapseProject keeps
    # non-cheap aliases staged when referenced twice — SCALING rule 40)
    staged = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("source"),
        tokens(F.col(text_col)).alias("__toks"),
    ).select(
        "__id",
        "source",
        F.size("__toks").alias("__n_tokens"),
        shingle_hashes(F.col("__toks"), n=ngram).alias("__sh"),
    )

    bench_set = (
        benchmarks.select(
            F.col(bench_col).alias("benchmark"),
            shingle_hashes(tokens(F.col(text_col)), n=ngram).alias("__sh"),
        )
        .select("benchmark", F.explode("__sh").alias("g"))
        .distinct()
    )

    exploded = staged.select(
        "__id", "source", "__n_tokens", F.explode_outer("__sh").alias("g")
    )
    doc_hits = (
        exploded.join(F.broadcast(bench_set), on="g")
        .groupBy("benchmark", "__id", "source", "__n_tokens")
        .agg(F.count(F.lit(1)).alias("__n_hits"))
        .where(F.col("__n_hits") >= min_hits)
    )
    leak = doc_hits.groupBy("benchmark", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_contaminated"),
        F.sum("__n_tokens").cast("long").alias("tokens_contaminated"),
    )

    totals = staged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__n_tokens").cast("long").alias("tokens_total"),
    )
    grid = totals.crossJoin(
        F.broadcast(bench_set.select("benchmark").distinct())
    )
    out = grid.join(F.broadcast(leak), on=["benchmark", "source"], how="left")
    return out.select(
        "benchmark",
        "source",
        "n_docs",
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias(
            "n_contaminated"
        ),
        F.round(
            F.coalesce("n_contaminated", F.lit(0))
            / F.col("n_docs").cast("double"),
            6,
        ).alias("contamination_rate"),
        "tokens_total",
        F.coalesce("tokens_contaminated", F.lit(0)).cast("long").alias(
            "tokens_contaminated"
        ),
        F.when(
            F.col("tokens_total") > 0,
            F.round(
                F.coalesce("tokens_contaminated", F.lit(0))
                / F.col("tokens_total").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("token_leak_rate"),
    )


def benchmark_coverage(
    corpus: DataFrame,
    benchmarks: DataFrame,
    *,
    ngram: int = 3,
    bench_col: str = "benchmark",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Eval-set representativeness: what fraction of each benchmark
    suite's n-gram shingles appear ANYWHERE in the corpus — the flip
    side of ``contamination_report`` (there the corpus leaks INTO the
    benchmark; here the question is whether the benchmark's language is
    even in-distribution for the training set; near-zero coverage means
    the eval measures extrapolation, near-one invites leakage checks).

    Output one row per benchmark: ``benchmark, n_bench_docs,
    n_bench_grams (distinct), n_covered, coverage``.

    Scale shape: the benchmark gram set (tiny) broadcasts onto the
    exploded corpus grams; only MATCHING grams survive the join, so the
    corpus-side shuffle carries at most |bench grams| distinct values —
    the corpus is scanned once and never re-keyed by anything
    corpus-sized.
    """
    from polars_trading_spark.functions.dedup import shingle_hashes
    from polars_trading_spark.functions.text import tokens

    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")

    bench_grams = persist_tracked(
        benchmarks.select(
            F.col(bench_col).alias("benchmark"),
            F.col(id_col).alias("__bid"),
            shingle_hashes(tokens(F.col(text_col)), n=ngram).alias("__sh"),
        ),
        eager=True,  # bench_set + totals are AQE-concurrent (r15 §5.3)
    )
    bench_set = (
        bench_grams.select("benchmark", F.explode("__sh").alias("g")).distinct()
    )
    totals = bench_grams.groupBy("benchmark").agg(
        F.count(F.lit(1)).cast("long").alias("n_bench_docs"),
    )
    gram_totals = bench_set.groupBy("benchmark").agg(
        F.count(F.lit(1)).cast("long").alias("n_bench_grams")
    )

    # Corpus side from the shared signature stage when one is active
    # (same shingle_hashes values); inline zero-shuffle scan otherwise.
    from polars_trading_spark.functions.dedup import shared_corpus_shingles

    corpus_sh = shared_corpus_shingles(corpus, text_col, id_col, ngram=ngram)
    corpus_grams = (
        corpus_sh.select(F.explode("__sh").alias("g"))
        if corpus_sh is not None
        else corpus.select(
            F.explode(shingle_hashes(tokens(F.col(text_col)), n=ngram)).alias("g")
        )
    )
    covered = (
        corpus_grams.join(F.broadcast(bench_set), on="g")
        .select("benchmark", "g")
        .distinct()
        .groupBy("benchmark")
        .agg(F.count(F.lit(1)).cast("long").alias("n_covered"))
    )
    return (
        totals.join(gram_totals, "benchmark")
        .join(covered, "benchmark", "left")
        .select(
            "benchmark",
            "n_bench_docs",
            "n_bench_grams",
            F.coalesce("n_covered", F.lit(0)).cast("long").alias("n_covered"),
            F.when(
                F.col("n_bench_grams") > 0,
                F.round(
                    F.coalesce("n_covered", F.lit(0))
                    / F.col("n_bench_grams").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("coverage"),
        )
    )


def packing_efficiency(
    packed: DataFrame,
    *,
    budget_tokens: int,
) -> DataFrame:
    """One-row padding-waste report over a ``pack_sequences`` /
    ``bpe_pack_sequences`` assignment — the training-throughput audit:
    every token of padding is a token of compute the run pays for and
    the loss never sees.

    Output: ``budget_tokens, n_sequences, n_docs, total_tokens,
    padding_tokens`` (Σ max(0, budget − fill) per sequence),
    ``n_oversized`` (sequences holding a single document longer than
    the budget — they carry no padding but break the fixed-length
    contract), ``min_fill, max_fill, fill_rate``
    (1 − padding/(sequences·budget)) and ``avg_docs_per_seq``.

    Scale shape: one (shard, seq_id) integer hash aggregate over the
    assignment frame, then a single global aggregate over the
    sequence-count-sized result; every emitted float is a single
    division of exact integer sums — order-free, engine-exact.
    """
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    b = F.lit(int(budget_tokens)).cast("long")
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.sum(F.col("n_tokens").cast("long")).alias("__fill"),
        F.count(F.lit(1)).cast("long").alias("__docs"),
    )
    agg = per_seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_sequences"),
        F.sum("__docs").cast("long").alias("n_docs"),
        F.sum("__fill").cast("long").alias("total_tokens"),
        F.sum(F.greatest(F.lit(0).cast("long"), b - F.col("__fill")))
        .cast("long")
        .alias("padding_tokens"),
        F.sum((F.col("__fill") > b).cast("long"))
        .cast("long")
        .alias("n_oversized"),
        F.min("__fill").cast("long").alias("min_fill"),
        F.max("__fill").cast("long").alias("max_fill"),
    )
    ns = F.col("n_sequences")
    return agg.select(
        F.lit(int(budget_tokens)).cast("long").alias("budget_tokens"),
        "n_sequences",
        "n_docs",
        "total_tokens",
        "padding_tokens",
        "n_oversized",
        "min_fill",
        "max_fill",
        F.round(
            F.when(
                ns > 0,
                1
                - F.col("padding_tokens").cast("double")
                / (ns * b).cast("double"),
            ),
            6,
        ).alias("fill_rate"),
        F.round(
            F.when(ns > 0, F.col("n_docs").cast("double") / ns.cast("double")),
            6,
        ).alias("avg_docs_per_seq"),
    )


def perplexity_budget_curves(
    documents: DataFrame,
    *,
    n_cutoffs: int = 10,
    smoothing_k: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source token-budget curves under LM-PERPLEXITY filtering —
    the CCNet-style companion of ``token_budget_curves``: "if I keep
    only each source's most-natural documents (highest mean unigram
    log-probability under the corpus's own model), how many tokens
    survive at every cutoff?"

    Within each source, documents with at least one token rank by
    ``(mean_logprob desc, doc_id)`` — the logprob ROUNDED to 6 before
    ranking (round-before-rank) — and the curve samples ``n_cutoffs``
    evenly spaced membership fractions.  Output one row per (source,
    cutoff): ``source, cutoff_idx, n_docs_kept, logprob_cutoff,
    ppl_cutoff`` (= exp(-logprob) at the boundary), ``cum_tokens,
    total_tokens, token_share``.  Empty documents carry zero tokens and
    are excluded from the ranking (they cannot move any curve).

    Scale shape: the ``unigram_logprob`` pass (one persisted tokenizer
    explode, two aggregates, one vocabulary join) followed by EXACTLY
    the ``token_budget_curves`` window machinery — one per-source
    window pass, integer prefix sums, closed-form boundary selection;
    output is (sources x cutoffs)-sized.
    """
    from polars_trading_spark.functions.text import unigram_logprob

    if n_cutoffs < 1:
        raise ValueError(f"n_cutoffs must be >= 1, got {n_cutoffs}")
    lp = unigram_logprob(
        documents, smoothing_k=smoothing_k, id_col=id_col, text_col=text_col
    )
    base = (
        documents.select(
            F.col(source_col).alias("source"), F.col(id_col).alias("__id")
        )
        .join(
            lp.select(
                F.col(id_col).alias("__id"),
                F.col("n_tokens").cast("long").alias("__tok"),
                F.round("mean_logprob", 6).alias("__s"),
            ),
            "__id",
        )
        .where(F.col("__tok") > 0)
    )
    w = Window.partitionBy("source").orderBy(F.desc("__s"), F.asc("__id"))
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    full = Window.partitionBy("source")
    staged = base.select(
        "source",
        F.row_number().over(w).alias("__rn"),
        F.col("__s"),
        F.sum("__tok").over(run).alias("__cum"),
        F.count(F.lit(1)).over(full).alias("__nsrc"),
        F.sum("__tok").over(full).alias("__tot"),
    )
    nc = F.lit(int(n_cutoffs))
    rn = F.col("__rn")
    nsrc = F.col("__nsrc")
    d_min = F.floor(((rn - 1) * nc) / nsrc) + 1
    d_max = F.floor((rn * nc) / nsrc)
    return staged.where(d_max >= d_min).select(
        "source",
        F.explode(F.sequence(d_min.cast("int"), d_max.cast("int"))).alias(
            "cutoff_idx"
        ),
        rn.cast("long").alias("n_docs_kept"),
        F.col("__s").alias("logprob_cutoff"),
        F.exp(-F.col("__s")).alias("ppl_cutoff"),
        F.col("__cum").cast("long").alias("cum_tokens"),
        F.col("__tot").cast("long").alias("total_tokens"),
        F.round(F.col("__cum") / F.col("__tot").cast("double"), 6).alias(
            "token_share"
        ),
    )


def domain_cap(
    df: DataFrame,
    *,
    max_per_key: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "pts-cap",
) -> DataFrame:
    """Per-key document cap — the crawl-governance primitive (C4 /
    RefinedWeb style "at most N pages per domain") that stops a handful
    of template-heavy hosts from dominating a training mixture.

    Each document gets a ``cap_rank`` inside its ``key_col`` group —
    rank 1 = first kept — ordered by the engine-portable salted hash
    ``md5(salt || id)`` (ties by id), NOT by arrival: the selection is
    a reproducible uniform sample of each domain, stable across runs,
    engines and partitionings (the ``hash_split`` determinism
    contract), and changing ``salt`` re-draws it.  ``keep = 1`` iff
    ``cap_rank <= max_per_key``.

    Returns one row per document: ``id_col, key_col, cap_rank, keep``.

    Scale shape: ONE hash-partitioned window (`row_number` over
    ``key_col``) — the same single shuffle any per-key governance rule
    costs.  Heavy-tailed domains put their whole group in one task;
    at 100 TB either pre-filter with an approximate per-key count to
    short-circuit the far-below-cap majority, or cap in two phases
    (per-partition top-``max_per_key`` by hash, then the window over
    the survivors — at most ``partitions x cap`` rows per key reach
    the shuffle).  The rank contract is unchanged by either rewrite.
    """
    if max_per_key < 1:
        raise ValueError(f"max_per_key must be >= 1, got {max_per_key}")
    from pyspark.sql import Window

    from polars_trading_spark.functions.text import portable_hash60

    h = portable_hash60(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(key_col).orderBy(h.asc(), F.col(id_col).asc())
    return df.select(
        id_col,
        key_col,
        F.row_number().over(w).cast("long").alias("cap_rank"),
    ).withColumn(
        "keep",
        (F.col("cap_rank") <= F.lit(max_per_key)).cast("int"),
    )
