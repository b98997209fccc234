"""TF-IDF scoring and vocabulary building over document tables.

The training-data counterpart of the text-profile pass: turn a corpus
into (a) a ranked vocabulary (the input to tokenizer training and
coverage audits) and (b) per-document top-k salient terms (cheap
keyword extraction / topic tagging for curriculum sampling).

Scale design — everything is explode + hash aggregate + one keyed join:

* term frequencies shuffle once on (doc_id, token) with map-side
  partial aggregation absorbing the explode fan-out;
* document frequencies reduce that relation on token (vocabulary-sized
  output, orders of magnitude smaller than the corpus);
* the corpus size N enters as a broadcast one-row aggregate — no
  driver-side ``.count()`` action, the plan stays lazy end-to-end;
* the IDF join back onto term frequencies is a plain equi-join on token
  (AQE picks broadcast when the vocabulary fits, shuffle-hash when
  not — we deliberately don't force a broadcast, a 100 TB corpus can
  carry a billion-token vocabulary);
* global vocabulary top-k goes through ``orderBy().limit(k)`` which
  Spark executes as TakeOrderedAndProject (per-partition heaps + a
  k-row reduce), never a single-partition global sort; the dense rank
  is attached after the reduce, over k rows only.

IDF uses the smoothed form ln((N + 1)/(df + 1)) + 1, so unseen and
corpus-universal tokens both stay finite and positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark.functions.text import tokens

__all__ = ["term_frequencies", "document_frequencies", "vocabulary", "tfidf_topk", "tfidf_cosine_pairs", "vocab_divergence", "zipf_fit", "heaps_law", "term_burstiness", "bm25_topk"]


def term_frequencies(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, token, tf) — raw within-document term counts over the shared
    normalizing tokenizer (functions/text.py)."""
    toks = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("token"))
    return toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))


def document_frequencies(tf: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """(token, doc_freq, total_count) from a term-frequency relation."""
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_count"),
    )


def vocabulary(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary ranked by document frequency.

    Output: (token, doc_freq, total_count[, rank]).  With ``top_k`` the
    reduce is a distributed top-k (see module docstring) and a dense
    1-based ``rank`` column is attached; ties order deterministically by
    (doc_freq desc, total_count desc, token asc).
    """
    vocab = document_frequencies(
        term_frequencies(df, text_col=text_col, id_col=id_col), id_col=id_col
    )
    if top_k is None:
        return vocab
    order = [F.desc("doc_freq"), F.desc("total_count"), F.asc("token")]
    top = vocab.orderBy(*order).limit(top_k)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("int")
    )


def tfidf_topk(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF.

    Output: (id, token, tf, doc_freq, tfidf, rank) with rank 1..k per
    document; ties order deterministically by (score desc, token asc).
    """
    tf = term_frequencies(df, text_col=text_col, id_col=id_col)
    dfreq = document_frequencies(tf, id_col=id_col).select("token", "doc_freq")
    n_docs = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(dfreq, on="token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.col("__n_docs") + 1.0) / (F.col("doc_freq") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tf", "doc_freq", "tfidf", "rank")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.3,
    max_doc_freq_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Document pairs whose TF-IDF vectors have cosine similarity at or
    above ``threshold`` — topical (bag-of-words) similarity, the IR
    companion to the token-shingle (Jaccard) and embedding (cosine)
    near-dup modalities.

    Sparse formulation: the TF-IDF postings join themselves on the
    *token* key, so a pair is scored only over shared terms and the
    plan never materializes dense vectors.  Tokens appearing in more
    than ``max_doc_freq_frac`` of documents are pruned before the join —
    the standard max-df cut that removes the df² blowup of
    corpus-universal terms, which smoothed IDF has already squashed to
    near-zero weight (documented accuracy trade, exact for the
    surviving vocabulary; the oracle applies the same cut).

    Returns ``doc_a, doc_b, cosine_sim`` with ``doc_a < doc_b``.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if not 0 < max_doc_freq_frac <= 1:
        raise ValueError(f"max_doc_freq_frac must be in (0, 1], got {max_doc_freq_frac}")

    tf = term_frequencies(df, text_col=text_col, id_col=id_col)
    dfreq = document_frequencies(tf, id_col=id_col)
    n_docs = df.select(F.count(F.lit(1)).cast("double").alias("__N"))
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("doc_freq") <= F.col("__N") * F.lit(float(max_doc_freq_frac)))
        .withColumn(
            "w",
            F.col("tf")
            * (F.log((F.col("__N") + 1) / (F.col("doc_freq") + 1)) + F.lit(1.0)),
        )
        .select(id_col, "token", "w")
    )
    norms = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.select(F.col(id_col).alias("doc_a"), "token", F.col("w").alias("wa"))
    b = w.select(F.col(id_col).alias("doc_b"), "token", F.col("w").alias("wb"))
    dots = (
        a.join(b, "token")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col(id_col).alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        # Round before thresholding (same convention as
        # embedding_cosine_pairs): group-sum association differs across
        # engines at the last ulp, and an unrounded >= would make
        # borderline pairs engine-dependent.
        .withColumn(
            "cosine_sim", F.round(F.col("dot") / (F.col("na") * F.col("nb")), round_digits)
        )
        .where(F.col("cosine_sim") >= threshold)
        .select("doc_a", "doc_b", "cosine_sim")
    )


def zipf_fit(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Zipf-law fit of the corpus token-frequency distribution.

    Natural-language corpora follow ``count(rank) ~ C * rank^-alpha``
    with alpha ~ 1 (Zipf 1949); a corpus whose fitted ``alpha`` or
    ``r2`` is far off is a red flag for machine-generated spam, OCR
    noise, or template boilerplate — a standard corpus-level quality
    gate next to the per-document profiles.

    Fits OLS of ``ln(count)`` on ``ln(rank)`` over the ``top_k``
    most-frequent tokens (rank ties broken by token asc) and returns
    ONE row: ``n_ranks`` (points fitted), ``n_vocab`` / ``total_tokens``
    (full-corpus integer stats), ``alpha`` (= -slope), ``intercept``
    (ln C), ``r2``.

    Scale/determinism shape: token counts are one explode + hash
    aggregate; the top-k reduce is TakeOrderedAndProject (never a
    global sort); the OLS power sums then run over only ``top_k`` rows
    — small enough that they are computed as RUNNING sums in rank
    order and read off the last row, so the floating-point fold order
    is identical in any engine that replays the same rank order
    (unordered partial aggregation would reassociate the doubles).
    The full-vocab stats stay integer (exact) and join in as a
    broadcast one-row aggregate.
    """
    if top_k < 3:
        raise ValueError(f"top_k must be >= 3 to fit a line, got {top_k}")

    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    cnt = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    if min_count > 1:
        cnt = cnt.where(F.col("cnt") >= min_count)

    totals = cnt.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("cnt").alias("total_tokens"),
    )

    order = [F.desc("cnt"), F.asc("token")]
    top = cnt.orderBy(*order).limit(top_k)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("int")
    )

    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    run = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    full = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        ranked.withColumn("__x", x)
        .withColumn("__y", y)
        .withColumn("__sx", F.sum("__x").over(run))
        .withColumn("__sy", F.sum("__y").over(run))
        .withColumn("__sxx", F.sum(F.col("__x") * F.col("__x")).over(run))
        .withColumn("__sxy", F.sum(F.col("__x") * F.col("__y")).over(run))
        .withColumn("__syy", F.sum(F.col("__y") * F.col("__y")).over(run))
        .withColumn("__nn", F.count(F.lit(1)).over(full))
        .where(F.col("rank") == F.col("__nn"))
    )

    n = F.col("__nn").cast("double")
    vxx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vyy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = cxy / vxx
    fit = staged.select(
        F.col("__nn").cast("long").alias("n_ranks"),
        (-slope).alias("alpha"),
        ((F.col("__sy") - slope * F.col("__sx")) / n).alias("intercept"),
        F.when(vyy > 0, cxy * cxy / (vxx * vyy)).alias("r2"),
    )
    return fit.crossJoin(F.broadcast(totals)).select(
        "n_ranks", "n_vocab", "total_tokens", "alpha", "intercept", "r2"
    )


def vocab_divergence(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    every pair of document groups (sources, splits, time slices) — the
    standard corpus-drift / domain-shift scalar: 0 for identical token
    distributions, ln 2 for disjoint vocabularies.  The per-pair number
    feeds mixture design (how different is source X from the rest) and
    split audits (did val drift from train).

    For groups a, b with token distributions p, q and m = (p + q)/2:

        JS = 0.5 * Σ p_i ln(p_i / m_i) + 0.5 * Σ q_i ln(q_i / m_i)

    (natural log; ``js_bits`` = JS / ln 2 ∈ [0, 1]).

    Output: one row per unordered group pair — ``group_a < group_b``,
    ``n_vocab_a, n_vocab_b, n_shared`` (distinct-token counts) and
    ``js_nats, js_bits``.

    Scale shape: one (group, token) hash aggregate (map-side
    combinable, vocabulary-sized output), a tiny broadcast pair frame,
    a FULL OUTER equi-join on (token, pair) to line both distributions
    up (tokens missing on one side contribute with probability 0), and
    a token-ORDERED running fold per pair for the float sum (fold-order
    deterministic — SCALING.md rule 24/27).  Nothing is ever quadratic
    in corpus size; the join is vocabulary x pairs.
    """
    from polars_trading_spark._utils import persist_tracked

    # STAGED: (group, token) counts have three consumers (totals, the
    # a-side and b-side pair joins) — unstaged, the corpus-sized
    # tokenizer explode re-executes per consumer (measured 53s -> 18s
    # at 320k docs, SCALING.md §35).  The cached frame itself is only
    # vocabulary x groups.
    tc = persist_tracked(
        df.select(F.col(group_col).alias("__g"), F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).alias("__c")),
        eager=True,  # 3 AQE-concurrent consumers: lazy persists race (r15, guide §5.3)
    )
    totals = tc.groupBy("__g").agg(F.sum("__c").alias("__n"))
    tc = tc.join(totals, "__g")

    groups = totals.select(F.col("__g"), F.col("__n"))
    pairs = (
        groups.select(F.col("__g").alias("group_a"), F.col("__n").alias("__na"))
        .crossJoin(
            groups.select(F.col("__g").alias("group_b"), F.col("__n").alias("__nb"))
        )
        .where(F.col("group_a") < F.col("group_b"))
    )

    a = tc.join(
        F.broadcast(pairs), tc["__g"] == pairs["group_a"]
    ).select(
        "group_a", "group_b", "__na", "__nb",
        F.col("__t").alias("__tok"), F.col("__c").alias("__ca"),
    )
    b = tc.join(
        F.broadcast(pairs), tc["__g"] == pairs["group_b"]
    ).select(
        "group_a", "group_b", "__na", "__nb",
        F.col("__t").alias("__tok"), F.col("__c").alias("__cb"),
    )
    both = a.join(b, ["group_a", "group_b", "__na", "__nb", "__tok"], "full_outer")

    pa = F.coalesce(F.col("__ca"), F.lit(0)).cast("double") / F.col("__na")
    pb = F.coalesce(F.col("__cb"), F.lit(0)).cast("double") / F.col("__nb")
    m = (pa + pb) / 2
    term = F.when(pa > 0, pa * F.log(pa / m)).otherwise(F.lit(0.0)) * 0.5 + F.when(
        pb > 0, pb * F.log(pb / m)
    ).otherwise(F.lit(0.0)) * 0.5

    w_ord = Window.partitionBy("group_a", "group_b").orderBy("__tok")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("group_a", "group_b")
    folded = both.select(
        "group_a",
        "group_b",
        F.row_number().over(w_ord).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__k"),
        F.sum(term).over(w_run).alias("__js"),
        F.count("__ca").over(w_all).alias("n_vocab_a"),
        F.count("__cb").over(w_all).alias("n_vocab_b"),
        F.count(F.when(F.col("__ca").isNotNull() & F.col("__cb").isNotNull(), 1))
        .over(w_all)
        .alias("n_shared"),
    )
    ln2 = 0.6931471805599453
    return folded.where(F.col("__rn") == F.col("__k")).select(
        "group_a",
        "group_b",
        F.col("n_vocab_a").cast("long").alias("n_vocab_a"),
        F.col("n_vocab_b").cast("long").alias("n_vocab_b"),
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("__js").alias("js_nats"),
        (F.col("__js") / ln2).alias("js_bits"),
    )


def heaps_law(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_checkpoints: int = 200,
) -> DataFrame:
    """Heaps'-law fit of corpus vocabulary growth, ``V(N) ~ k * N^beta``
    (Heaps 1978; natural language sits around beta ~ 0.4-0.6).  The
    corpus-level companion to ``zipf_fit``: a beta near 1 means the
    vocabulary never saturates (OCR noise, random ids), a beta near 0
    means template text recycling a closed vocabulary.

    Documents are consumed in ``id_col`` order; the cumulative token
    count N and cumulative distinct-vocabulary count V are checkpointed
    at up to ``n_checkpoints`` evenly-spaced points of the id range and
    OLS fits ``ln V`` on ``ln N`` over the checkpoints.  Returns ONE
    row: ``n_points, n_vocab, total_tokens, k_coef, beta, r2``.

    Scale/determinism shape: the corpus-sized work is two hash
    aggregates — per-token first-occurrence checkpoint (``min`` over
    the doc bucket) and per-bucket token totals; the ordered windows
    and the OLS running folds then touch only ``n_checkpoints`` rows,
    so no global data-sized sort or single-partition window exists.
    Cumulative N and V are INTEGER running sums (exact); the float
    power sums run in checkpoint order and are read off the last row,
    making the fold order engine-independent (SCALING rule 24).  The
    id-range max enters as a broadcast one-row aggregate, not a
    driver-side action.
    """
    if n_checkpoints < 3:
        raise ValueError(f"n_checkpoints must be >= 3 to fit a line, got {n_checkpoints}")

    toks = df.select(F.col(id_col).alias("__id"), F.explode(tokens(F.col(text_col))).alias("__t"))
    bounds = df.agg(
        F.min(id_col).cast("long").alias("__lo"), F.max(id_col).cast("long").alias("__hi")
    )
    # checkpoint bucket of a doc id: floor((id - lo) * C / (hi - lo + 1))
    t2 = toks.crossJoin(F.broadcast(bounds)).withColumn(
        "__b",
        F.floor(
            (F.col("__id") - F.col("__lo")) * F.lit(int(n_checkpoints))
            / (F.col("__hi") - F.col("__lo") + 1)
        ).cast("int"),
    )
    from polars_trading_spark._utils import persist_tracked

    # ONE corpus-sized pass: collapse the explode to (token, bucket)
    # counts, then stage that (distinct-pair-sized) frame for its two
    # consumers — an unstaged t2 re-runs the tokenizer explode per
    # consumer (measured 2x wall, SCALING §41)
    g = persist_tracked(
        t2.groupBy("__t", "__b").agg(F.count(F.lit(1)).alias("__c")),
        eager=True,  # 2 AQE-concurrent consumers (r15, guide §5.3)
    )
    # a token's vocabulary entry is charged to the bucket where it first appears
    first_b = g.groupBy("__t").agg(F.min("__b").alias("__fb"))
    new_types = first_b.groupBy(F.col("__fb").alias("__b")).agg(
        F.count(F.lit(1)).alias("__nv")
    )
    tok_counts = g.groupBy("__b").agg(F.sum("__c").alias("__nt"))
    per_bucket = tok_counts.join(new_types, "__b", "left").select(
        "__b", "__nt", F.coalesce("__nv", F.lit(0)).alias("__nv")
    )

    run = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    full = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        per_bucket.withColumn("__N", F.sum("__nt").over(run))
        .withColumn("__V", F.sum("__nv").over(run))
        .where((F.col("__N") > 0) & (F.col("__V") > 0))
    )
    x = F.log(F.col("__N").cast("double"))
    y = F.log(F.col("__V").cast("double"))
    staged = (
        cum.withColumn("__x", x)
        .withColumn("__y", y)
        .withColumn("__rn", F.row_number().over(Window.orderBy("__b")))
        .withColumn("__sx", F.sum("__x").over(run))
        .withColumn("__sy", F.sum("__y").over(run))
        .withColumn("__sxx", F.sum(F.col("__x") * F.col("__x")).over(run))
        .withColumn("__sxy", F.sum(F.col("__x") * F.col("__y")).over(run))
        .withColumn("__syy", F.sum(F.col("__y") * F.col("__y")).over(run))
        # NB: Spark resolves column names case-insensitively, so the
        # totals must NOT be spelled "__NN"/"__VV" (they would overwrite
        # "__nn" / collide at resolution time).
        .withColumn("__nn", F.count(F.lit(1)).over(full))
        .withColumn("__totn", F.max("__N").over(full))
        .withColumn("__totv", F.max("__V").over(full))
        .withColumn("__vlo", F.min("__V").over(full))
        .where(F.col("__rn") == F.col("__nn"))
    )
    n = F.col("__nn").cast("double")
    vxx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vyy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    slope = cxy / vxx
    return staged.select(
        F.col("__nn").cast("long").alias("n_points"),
        F.col("__totv").cast("long").alias("n_vocab"),
        F.col("__totn").cast("long").alias("total_tokens"),
        F.when(vxx > 0, F.exp((F.col("__sy") - slope * F.col("__sx")) / n)).alias("k_coef"),
        F.when(vxx > 0, slope).alias("beta"),
        # y is exactly constant (degenerate r2) iff V never grows past the
        # first checkpoint — an INTEGER test.  A float `vyy > 0` guard is a
        # knife-edge here: with constant y the fold's true value is 0 and
        # engines whose ln() differs at 1 ulp land on opposite sides.
        F.when(
            (vxx > 0) & (F.col("__totv") > F.col("__vlo")), cxy * cxy / (vxx * vyy)
        ).alias("r2"),
    )


def term_burstiness(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Per-term burstiness (Fano factor of the per-document count
    distribution, zeros included) — Church & Gale (1995): content words
    arrive in bursts (variance far above mean), function words are
    Poisson-ish (Fano ~ 1).  Terms whose burstiness is extreme flag
    template boilerplate (one doc repeating a token hundreds of times)
    and are natural stopword/keyword candidates.

    Over ``D`` corpus documents, with per-doc counts ``c_d`` of a term
    (``S1 = sum c_d``, ``S2 = sum c_d^2``):

    ``fano = var/mean = S2/S1 - S1/D``

    Output: the ``top_k`` terms with document frequency >= ``min_df``
    ranked by Fano factor desc (ties token asc): ``token, df,
    total_count, fano``.

    Scale/determinism shape: one explode into a (doc, token) hash
    aggregate, one token-keyed reduce (vocabulary-sized), D as a
    broadcast one-row aggregate and a TakeOrderedAndProject top-k —
    never a global sort.  S1/S2/D are INTEGER sums; ``fano`` is two
    exact divisions, bit-identical across engines.
    """
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    toks = df.select(F.col(id_col).alias("__id"), F.explode(tokens(F.col(text_col))).alias("__t"))
    per_doc = toks.groupBy("__id", "__t").agg(F.count(F.lit(1)).alias("__c"))
    stats = per_doc.groupBy("__t").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("__c").cast("long").alias("total_count"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__s2"),
    )
    d_total = df.agg(F.count(F.lit(1)).cast("long").alias("__D"))
    scored = (
        stats.where(F.col("df") >= int(min_df))
        .crossJoin(F.broadcast(d_total))
        .select(
            F.col("__t").alias("token"),
            "df",
            "total_count",
            (
                F.col("__s2").cast("double") / F.col("total_count").cast("double")
                - F.col("total_count").cast("double") / F.col("__D").cast("double")
            ).alias("fano"),
        )
    )
    return scored.orderBy(F.desc("fano"), F.asc("token")).limit(int(top_k))


def bm25_topk(
    df: DataFrame,
    *,
    query_terms: tuple[str, ...] | list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 document ranking against a fixed query term set (Robertson
    & Zaragoza 2009; the Lucene non-negative idf variant) — the IR
    staple a data-curation pipeline uses to pull topic-relevant
    training documents out of a crawl.

        score(d,Q) = sum over t in Q of
            idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * |d| / avgdl))
        idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)

    ``query_terms`` must already be normalized (lowercase alnum —
    whatever ``text.tokens`` emits).  Returns the ``top_k`` matching
    documents: ``id_col, n_terms_hit, dl, score``; documents hitting no
    query term never rank.

    Scale/determinism shape: the tokenizer runs ONCE — the token array
    is staged as a real column (CollapseProject keeps non-cheap aliased
    expressions staged), its ``F.size`` gives the document length with
    no corpus explode, and the only exploded tokens are the ones
    surviving an in-array HOF filter to the |Q| query terms
    (``explode_outer`` keeps no-hit docs so N and Σ|d| see the whole
    corpus).  ONE corpus-sized (doc, token) hash aggregate collapses
    everything; N and Σ|d| are INTEGER aggregates over its doc-deduped
    output (avgdl one exact division); per-doc score sums |Q|
    O(1)-magnitude floats.  Ranking rounds the score to 6 BEFORE the
    (score desc, id asc) TakeOrdered top-k — round-before-rank, so
    selection replays on any engine/layout.
    """
    from polars_trading_spark.functions.text import tokens

    terms = sorted({str(t) for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if k1 <= 0 or not (0.0 <= b <= 1.0):
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got k1={k1} b={b}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    base = staged.select(
        id_col,
        F.size("__toks").cast("long").alias("__dl"),
        F.explode_outer(
            F.filter("__toks", lambda t: t.isin(*terms))
        ).alias("token"),
    )
    from polars_trading_spark._utils import persist_tracked

    # g1 is the ONLY corpus-sized pass (tokenize + filter + explode +
    # hash agg); its output is tiny (≤ docs × (|Q|+1) rows) and has two
    # consumers (totals, tf) — stage it so the pipeline runs once
    g1 = persist_tracked(
        base.groupBy(id_col, "__dl", "token").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        ),
        eager=True,  # 2 AQE-concurrent consumers (r15, guide §5.3)
    )
    totals = (
        g1.select(id_col, "__dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("__nd"),
            F.sum("__dl").cast("long").alias("__sumdl"),
        )
    )
    tf = g1.where(F.col("token").isNotNull())
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("__df"))

    nd = F.col("__nd").cast("double")
    dfd = F.col("__df").cast("double")
    avgdl = F.col("__sumdl").cast("double") / nd
    idf = F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
    denom = F.col("tf").cast("double") + F.lit(float(k1)) * (
        F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("__dl").cast("double") / avgdl
    )
    term_score = (idf * (F.col("tf").cast("double") * F.lit(float(k1) + 1.0))) / denom

    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
            F.max("__dl").alias("dl"),
            F.sum(term_score).alias("__score"),
        )
        .withColumn("score", F.round("__score", 6) + F.lit(0.0))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(top_k))
        .select(id_col, "n_terms_hit", "dl", "score")
    )
