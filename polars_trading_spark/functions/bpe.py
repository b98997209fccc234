"""Distributed BPE tokenizer training and application.

Byte-Pair Encoding (Sennrich et al. 2016 for NMT; the GPT/Llama
tokenizer family) learns a merge table greedily: start from characters,
repeatedly merge the most frequent adjacent symbol pair.  The classic
trainer is a single-machine loop over a word-frequency dictionary; the
100 TB shape here keeps that loop but distributes its state:

* ONE corpus pass builds the DISTINCT-WORD frequency table (the only
  corpus-sized job — everything after is vocabulary-sized);
* each merge round is a small Spark job over the word table: explode
  adjacent segment pairs weighted by word count, hash-aggregate, and
  collect the TOP-``candidate_window`` pairs in ``(count desc, left,
  right)`` order (a bounded collect — the same scalar-collect pattern
  as the connected-components convergence check);
* the round then selects up to ``merges_per_round`` pairwise
  NON-CONFLICTING merges from that ordered window (greedy scan: a pair
  is taken iff neither of its symbols appears in an already-taken pair
  this round) and applies them ALL in one greedy left-to-right
  ``aggregate`` fold — so a 32k-vocab tokenizer costs ~vocab/k Spark
  rounds, not 32k sequential jobs.  Token-disjoint merges have
  non-overlapping MATCH positions (a shared position would need a
  shared symbol), so within one left-to-right pass no two of the
  round's pairs compete for a boundary; note the fold CAN still cascade
  across pairs when one pair's merged token string-equals another
  selected pair's left symbol (e.g. ``(a,b)`` then ``('ab',x)``) —
  that cascade is part of the batched algorithm's definition, mirrored
  by the pure-Python golden reference and the SQL oracle.
  ``merges_per_round=1`` reduces exactly to the classic
  one-merge-per-round algorithm; NOTE the default is the batched
  ``merges_per_round=8``, whose learned table deliberately differs
  from classic BPE — pass 1 explicitly for the textbook merge list;
* ``localCheckpoint`` per round keeps the lineage flat, so expression
  depth does not grow with the merge count.

Applying the trained tokenizer to the corpus is then JOIN-shaped, not
loop-shaped: per-document BPE token counts are an explode + hash-join
against the (vocabulary-sized, ``shuffle_hash``-hinted) segmentation
table — no per-row Python in the corpus path.  Words absent from the
training corpus fall back to their character count (the segmentation
an unmerged BPE vocabulary assigns) and are surfaced in an
``n_oov_words`` column rather than silently contributing zero.

Correctness is pinned two ways: exact-match golden tests against an
independent pure-Python BPE reference implementation (classic AND
batched variants) in tests/test_bpe_train.py, and (round 10) a
recursive-CTE DuckDB oracle that replays the batched trainer
bit-exactly (oracles/corpus.py::_BPE_REC — the sequential_bootstrap /
kalman_hedge replay pattern), so the driver hash-gates both
``bpe_train_merges`` and ``bpe_token_budget``.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_token_budget", "bpe_encode"]


def _char_array(col):
    """Character array of a string column (the base BPE alphabet)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: col.substr(i, F.lit(1)),
    )


def _word_table(documents: DataFrame, text_col: str) -> DataFrame:
    """Distinct words + corpus counts, segmented into characters."""
    from polars_trading_spark.functions.text import tokens

    words = (
        documents.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return words.select(
        "__w", "__c", _char_array(F.col("__w")).alias("__seg")
    )


def _adjacent_pairs(seg):
    """arrays_zip of each segment with its right neighbor."""
    return F.arrays_zip(
        F.slice(seg, 1, F.size(seg) - 1).alias("l"),
        F.slice(seg, 2, F.size(seg) - 1).alias("r"),
    )


def _round_fold_expr(seg, selected: list):
    """Apply ALL of a round's (token-disjoint) merges in ONE greedy
    left-to-right ``aggregate`` fold, no Python.

    At each element the fold checks whether (last accumulated segment,
    current segment) matches ANY of the round's pairs — at most one can
    match since the pairs are distinct — and replaces the two by their
    concatenation if so.  Greedy leftmost non-overlapping per pair,
    exactly the reference semantics; cascades within the fold (a merged
    token immediately pairing with the next symbol) are part of the
    batched algorithm's definition and mirrored by the pure-Python
    reference.
    """

    def step(acc, x):
        expr = F.concat(acc, F.array(x))
        for left, right, _ in reversed(selected):
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right))
            )
            expr = F.when(
                hit,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(left + right)),
                ),
            ).otherwise(expr)
        return expr

    return F.aggregate(seg, F.array().cast("array<string>"), step)


def bpe_train(
    documents: DataFrame,
    *,
    n_merges: int = 30,
    min_pair_count: int = 2,
    merges_per_round: int = 8,
    candidate_window: int | None = None,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, words)``:

    * ``merges`` — one row per learned merge in order: ``rank (1-based),
      left, right, merged, pair_count`` (the pair's weighted count at
      the START of its round); training stops early when no candidate
      reaches ``min_pair_count``.
    * ``words`` — the final word table ``word, word_count, n_bpe_tokens,
      bpe_segments`` (each distinct word's segment count AND segment
      array under the learned merges) — the lookup table
      ``bpe_token_budget`` and ``bpe_encode`` join the corpus against.

    ``merges_per_round`` batches the greedy loop: each Spark round
    selects up to that many pairwise non-conflicting merges (no symbol
    shared between selected pairs) from the top ``candidate_window``
    (default ``8 * merges_per_round``) candidates in ``(count desc,
    left, right)`` order, so the number of sequential Spark jobs is
    ~``n_merges / merges_per_round``.  ``merges_per_round=1`` is
    exactly the classic one-merge-at-a-time algorithm.  The candidate
    window, the conflict rule, and the single-fold application are all
    part of the deterministic algorithm definition (mirrored by the
    pure-Python golden reference): the learned table is a pure function
    of ``(corpus, n_merges, min_pair_count, merges_per_round,
    candidate_window)``.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    if merges_per_round < 1:
        raise ValueError(
            f"merges_per_round must be >= 1, got {merges_per_round}"
        )
    window = (
        candidate_window
        if candidate_window is not None
        else 8 * merges_per_round
    )
    if window < merges_per_round:
        raise ValueError(
            f"candidate_window ({window}) must be >= merges_per_round "
            f"({merges_per_round})"
        )

    # Round 14 (guide §5.3, the round-11 shared-signature amortization
    # extended): five registered queries train the IDENTICAL tokenizer
    # over the same corpus (train_merges, token_budget, encode,
    # pack_sequences, fertility) — the real pipeline trains once and
    # feeds every consumer.  Inside a shared_signature_cache() block the
    # learned merge list and the final word/segmentation table are keyed
    # by (canonicalized corpus plan, every training parameter) and
    # reused; standalone calls (no block) are unchanged.
    from polars_trading_spark.functions.dedup import (
        _SHARED_SIG_CACHE,
        _corpus_cache_key,
    )

    spark = documents.sparkSession
    cache_key = (
        _corpus_cache_key(
            documents, "bpe_train", n_merges, min_pair_count,
            merges_per_round, window, text_col,
        )
        if _SHARED_SIG_CACHE is not None
        else None
    )
    if cache_key is not None:
        hit = _SHARED_SIG_CACHE.get(cache_key)
        if hit is not None:
            merges, words_df = hit
            merges_df = spark.createDataFrame(
                list(merges) or [],
                "rank int, left string, right string, merged string, "
                "pair_count long",
            )
            return merges_df, words_df

    words = _word_table(documents, text_col).localCheckpoint()
    merges: list[tuple] = []
    while len(merges) < n_merges:
        k = min(merges_per_round, n_merges - len(merges))
        pairs = words.where(F.size("__seg") >= 2).select(
            "__c", F.explode(_adjacent_pairs(F.col("__seg"))).alias("__p")
        )
        top = (
            pairs.groupBy(
                F.col("__p.l").alias("__l"), F.col("__p.r").alias("__r")
            )
            .agg(F.sum("__c").alias("__n"))
            .orderBy(F.desc("__n"), F.asc("__l"), F.asc("__r"))
            .limit(window)
            .collect()
        )
        selected: list[tuple] = []
        used: set[str] = set()
        for row in top:
            if int(row["__n"]) < min_pair_count:
                break  # ordered desc — every later candidate is smaller
            left, right = row["__l"], row["__r"]
            if left in used or right in used:
                continue
            selected.append((left, right, int(row["__n"])))
            used.update((left, right))
            if len(selected) == k:
                break
        if not selected:
            break
        for left, right, cnt in selected:
            merges.append((len(merges) + 1, left, right, left + right, cnt))
        # rewrite only the words containing at least one selected pair
        # (the fold is the identity for the rest); checkpoint keeps the
        # plan flat across rounds.  LAZY (round 14, guide §1.2): the
        # next round's candidate collect is the first action over the
        # rewrite anyway, so an eager checkpoint here only added one
        # sequential vocab-sized job per round; the final round's
        # rewrite folds into the consumer's first job.
        has_any = F.exists(
            _adjacent_pairs(F.col("__seg")),
            lambda p: functools.reduce(
                operator.or_,
                [
                    (p["l"] == F.lit(left)) & (p["r"] == F.lit(right))
                    for left, right, _ in selected
                ],
            ),
        )
        words = words.select(
            "__w",
            "__c",
            F.when(
                (F.size("__seg") >= 2) & has_any,
                _round_fold_expr(F.col("__seg"), selected),
            )
            .otherwise(F.col("__seg"))
            .alias("__seg"),
        ).localCheckpoint(eager=False)

    merges_df = spark.createDataFrame(
        merges or [],
        "rank int, left string, right string, merged string, pair_count long",
    )
    words_df = words.select(
        F.col("__w").alias("word"),
        F.col("__c").cast("long").alias("word_count"),
        F.size("__seg").cast("int").alias("n_bpe_tokens"),
        F.col("__seg").alias("bpe_segments"),
    )
    if cache_key is not None:
        # The tuple value is inert to the cache's exit-time unpersist
        # sweep (suppressed AttributeError); the checkpoint blocks are
        # reclaimed by the ContextCleaner when the cache dict drops.
        _SHARED_SIG_CACHE[cache_key] = (tuple(merges), words_df)
    return merges_df, words_df


def bpe_token_budget(
    documents: DataFrame,
    words: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source token budget under a trained BPE vocabulary: join the
    corpus' words against the (vocabulary-sized) segmentation table and
    aggregate — the tokenizer-aware sibling of ``token_budget_curves``.

    Output one row per source: ``source, n_docs, whitespace_tokens,
    bpe_tokens, chars, n_oov_words, bpe_per_word`` (BPE tokens per
    whitespace word — the fertility statistic tokenizer papers report).

    Out-of-vocabulary words (any corpus other than the training one)
    fall back to their CHARACTER count — the segmentation an unmerged
    BPE vocabulary assigns — instead of silently contributing zero, and
    are counted in ``n_oov_words`` so a budget over a shifted corpus is
    visibly flagged rather than understated.

    Scale shape: corpus explode -> ``shuffle_hash``-hinted equi-join on
    the word table (vocabulary-sized build side; never sorts the
    corpus-sized probe — SCALING rule on lookup joins) -> per-source
    integer hash aggregate.  Zero Python.
    """
    from polars_trading_spark.functions.text import tokens

    exploded = documents.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("__id"),
        F.length(text_col).cast("long").alias("__chars"),
        F.explode_outer(tokens(F.col(text_col))).alias("word"),
    )
    joined = exploded.join(words.hint("shuffle_hash"), "word", "left")
    oov = F.col("word").isNotNull() & F.col("n_bpe_tokens").isNull()
    per_doc = joined.groupBy("source", "__id").agg(
        F.max("__chars").alias("__chars"),
        F.count("word").cast("long").alias("__ws"),
        F.sum(
            F.when(F.col("word").isNull(), F.lit(0)).otherwise(
                F.coalesce(
                    F.col("n_bpe_tokens").cast("long"),
                    F.length("word").cast("long"),
                )
            )
        ).alias("__bpe"),
        F.sum(oov.cast("long")).alias("__oov"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__ws").cast("long").alias("whitespace_tokens"),
        F.sum("__bpe").cast("long").alias("bpe_tokens"),
        F.sum("__chars").cast("long").alias("chars"),
        F.sum("__oov").cast("long").alias("n_oov_words"),
        F.round(
            F.sum("__bpe") / F.sum("__ws").cast("double"), 6
        ).alias("bpe_per_word"),
    )


def bpe_vocab(merges: DataFrame, words: DataFrame) -> DataFrame:
    """Token-id table of a trained BPE vocabulary: base characters
    first (sorted, ids ``0..C-1``), then merged tokens in merge-rank
    order (ids ``C..C+M-1``; a string learned twice — e.g. ``(a,bc)``
    and ``(ab,c)`` both yielding ``abc`` — keeps its FIRST rank's id).
    One row per token: ``token, token_id``.

    Scale shape: both inputs are VOCABULARY-sized; the global
    ``row_number`` window runs over the bounded char alphabet (the
    rank-after-limit pattern), and the char count joins back as a
    broadcast single-row frame — no driver collect.
    """
    from pyspark.sql import Window

    chars = (
        words.select(F.explode(_char_array(F.col("word"))).alias("token"))
        .distinct()
    )
    char_ids = chars.select(
        "token",
        (F.row_number().over(Window.orderBy("token")) - 1).alias("token_id"),
    )
    n_chars = chars.agg(F.count(F.lit(1)).alias("__nc"))
    merged_ids = (
        merges.crossJoin(F.broadcast(n_chars))
        .select(
            F.col("merged").alias("token"),
            (F.col("__nc") + F.col("rank") - 1).alias("token_id"),
        )
        .groupBy("token")
        .agg(F.min("token_id").alias("token_id"))
    )
    return char_ids.select(
        "token", F.col("token_id").cast("int").alias("token_id")
    ).unionByName(
        merged_ids.select(
            "token", F.col("token_id").cast("int").alias("token_id")
        )
    )


def bpe_encode(
    documents: DataFrame,
    merges: DataFrame,
    words: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode a corpus into REAL BPE token-id arrays under a trained
    vocabulary — the distributed apply-by-join: no per-document Python,
    no training-loop replay at encode time.

    Output one row per document: ``doc_id, n_words, n_tokens,
    n_oov_words, n_unk, token_ids`` where ``token_ids`` is the
    document's tokens in reading order (``array<int>``).  Known words
    take their trained segmentation from the ``words`` table;
    out-of-vocabulary words fall back to their character segmentation
    (the unmerged-BPE assignment, counted in ``n_oov_words``); any
    character absent from the training alphabet encodes as ``-1`` (UNK,
    counted in ``n_unk``).  Empty documents keep a row with
    ``token_ids = []``.

    Scale shape: two corpus-sized explodes (words, then segments), each
    immediately joined against a VOCABULARY-sized ``shuffle_hash``
    build side (never sorts the corpus-sized probe — the SCALING lookup
    rule), then ONE hash aggregate; reading order is restored by
    ``sort_array`` over ``(word_pos, seg_pos)`` structs inside the
    aggregate, so no global sort.  Zero Python.
    """
    from polars_trading_spark.functions.text import tokens

    vocab = bpe_vocab(merges, words)
    ex1 = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(tokens(F.col(text_col))).alias("__wp", "__w"),
    )
    j1 = ex1.join(
        words.select(
            F.col("word").alias("__w"), "bpe_segments"
        ).hint("shuffle_hash"),
        "__w",
        "left",
    )
    seg = F.when(
        F.col("__w").isNotNull(),
        F.coalesce(F.col("bpe_segments"), _char_array(F.col("__w"))),
    )
    oov = F.col("__w").isNotNull() & F.col("bpe_segments").isNull()
    ex2 = j1.select(
        "doc_id",
        "__wp",
        oov.alias("__oov"),
        F.posexplode_outer(seg).alias("__sp", "__t"),
    )
    j2 = ex2.join(
        vocab.select(
            F.col("token").alias("__t"), "token_id"
        ).hint("shuffle_hash"),
        "__t",
        "left",
    )
    tid = F.when(
        F.col("__t").isNotNull(),
        F.coalesce(F.col("token_id"), F.lit(-1)),
    )
    first_seg = F.col("__sp") == 0
    return (
        j2.select(
            "doc_id",
            "__wp",
            "__sp",
            "__oov",
            tid.alias("__tid"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum((first_seg & F.col("__tid").isNotNull()).cast("int"))
            .cast("int")
            .alias("n_words"),
            F.count("__tid").cast("int").alias("n_tokens"),
            F.sum((first_seg & F.col("__oov")).cast("int"))
            .cast("int")
            .alias("n_oov_words"),
            F.sum((F.col("__tid") == -1).cast("int"))
            .cast("int")
            .alias("n_unk"),
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("__tid").isNotNull(),
                            F.struct("__wp", "__sp", "__tid"),
                        )
                    )
                ),
                lambda x: x["__tid"],
            ).alias("token_ids"),
        )
    )


def tokenizer_fertility(
    documents: DataFrame,
    words: DataFrame,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-LANGUAGE fertility audit of a trained BPE vocabulary — the
    tokenizer-equity report (how many tokens a language pays per word /
    how many characters each token carries) that decides whether one
    shared vocabulary underserves part of a multilingual corpus.

    One row per ``lang_col`` value: ``lang, n_docs, whitespace_tokens,
    bpe_tokens, chars, n_oov_words, bpe_per_word`` (fertility),
    ``chars_per_bpe_token`` (compression) and ``oov_rate`` (share of
    words priced by the character-count fallback).  Same OOV semantics
    as ``bpe_token_budget``.

    Scale shape: identical to ``bpe_token_budget`` — corpus explode,
    ``shuffle_hash`` join against the vocabulary-sized segmentation
    table, two integer hash aggregates; every emitted float is a single
    division of exact integer sums.  Zero Python.
    """
    from polars_trading_spark.functions.text import tokens

    exploded = documents.select(
        F.col(lang_col).alias("lang"),
        F.col(id_col).alias("__id"),
        F.length(text_col).cast("long").alias("__chars"),
        F.explode_outer(tokens(F.col(text_col))).alias("word"),
    )
    joined = exploded.join(words.hint("shuffle_hash"), "word", "left")
    oov = F.col("word").isNotNull() & F.col("n_bpe_tokens").isNull()
    per_doc = joined.groupBy("lang", "__id").agg(
        F.max("__chars").alias("__chars"),
        F.count("word").cast("long").alias("__ws"),
        F.sum(
            F.when(F.col("word").isNull(), F.lit(0)).otherwise(
                F.coalesce(
                    F.col("n_bpe_tokens").cast("long"),
                    F.length("word").cast("long"),
                )
            )
        ).alias("__bpe"),
        F.sum(oov.cast("long")).alias("__oov"),
    )
    ws = F.sum("__ws").cast("double")
    bpe = F.sum("__bpe").cast("double")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__ws").cast("long").alias("whitespace_tokens"),
        F.sum("__bpe").cast("long").alias("bpe_tokens"),
        F.sum("__chars").cast("long").alias("chars"),
        F.sum("__oov").cast("long").alias("n_oov_words"),
        F.round(F.when(ws > 0, bpe / ws), 6).alias("bpe_per_word"),
        F.round(
            F.when(bpe > 0, F.sum("__chars").cast("double") / bpe), 6
        ).alias("chars_per_bpe_token"),
        F.round(
            F.when(ws > 0, F.sum("__oov").cast("double") / ws), 6
        ).alias("oov_rate"),
    )
