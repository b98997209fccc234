"""Distributed BPE tokenizer training and application.

Byte-Pair Encoding (Sennrich et al. 2016 for NMT; the GPT/Llama
tokenizer family) learns a merge table greedily: start from characters,
repeatedly merge the most frequent adjacent symbol pair.  The classic
trainer is a single-machine loop over a word-frequency dictionary; the
100 TB shape here keeps that loop but distributes its state:

* ONE corpus pass builds the DISTINCT-WORD frequency table (the only
  corpus-sized job — everything after is vocabulary-sized);
* each merge round is a small Spark job over the word table: explode
  adjacent segment pairs weighted by word count, hash-aggregate, take
  the argmax (a one-row collect — the same scalar-collect pattern as
  the connected-components convergence check), then rewrite the
  segmentations of affected words with a native ``aggregate`` fold
  (greedy leftmost non-overlapping, exactly the reference semantics);
* ``localCheckpoint`` per round keeps the lineage flat, so expression
  depth does not grow with the merge count.

Applying the trained tokenizer to the corpus is then JOIN-shaped, not
loop-shaped: every corpus word is in the word table by construction,
so per-document BPE token counts are an explode + hash-join against
the (vocabulary-sized, ``shuffle_hash``-hinted) segmentation table —
no per-row Python in the corpus path.

No SQL oracle (greedy iterative training is not SQL-expressible; the
driver records rows-only) — correctness is pinned by an exact-match
golden test against an independent pure-Python BPE reference
implementation in tests/test_bpe_train.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import persist_tracked

__all__ = ["bpe_train", "bpe_token_budget"]


def _word_table(documents: DataFrame, text_col: str) -> DataFrame:
    """Distinct words + corpus counts, segmented into characters."""
    from polars_trading_spark.functions.text import tokens

    words = (
        documents.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("__w")),
        lambda i: F.col("__w").substr(i, F.lit(1)),
    )
    return words.select("__w", "__c", chars.alias("__seg"))


def _merge_expr(seg, left: str, right: str):
    """Greedy leftmost non-overlapping replacement of the adjacent
    segment pair (left, right) by their concatenation — one native
    ``aggregate`` fold, no Python."""
    merged = left + right
    return F.aggregate(
        seg,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    documents: DataFrame,
    *,
    n_merges: int = 30,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, words)``:

    * ``merges`` — one row per learned merge in order: ``rank (1-based),
      left, right, merged, pair_count``; training stops early when the
      best pair's weighted count falls below ``min_pair_count``.
    * ``words`` — the final word table ``word, word_count, n_bpe_tokens``
      (each distinct word's segment count under the learned merges) —
      the lookup table ``bpe_token_budget`` joins the corpus against.

    Determinism: the argmax tiebreak is ``(count desc, left, right)``,
    so the learned table is a pure function of the corpus.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")

    spark = documents.sparkSession
    words = _word_table(documents, text_col).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pairs = words.where(F.size("__seg") >= 2).select(
            "__c",
            F.explode(
                F.arrays_zip(
                    F.slice("__seg", 1, F.size("__seg") - 1).alias("l"),
                    F.slice(F.col("__seg"), 2, F.size("__seg") - 1).alias("r"),
                )
            ).alias("__p"),
        )
        best = (
            pairs.groupBy(
                F.col("__p.l").alias("__l"), F.col("__p.r").alias("__r")
            )
            .agg(F.sum("__c").alias("__n"))
            .orderBy(F.desc("__n"), F.asc("__l"), F.asc("__r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["__n"] < min_pair_count:
            break
        left, right, cnt = best[0]["__l"], best[0]["__r"], int(best[0]["__n"])
        merges.append((rank, left, right, left + right, cnt))
        # rewrite only the words that contain the pair; checkpoint keeps
        # the plan flat across rounds
        has_pair = F.exists(
            F.arrays_zip(
                F.slice("__seg", 1, F.size("__seg") - 1).alias("l"),
                F.slice(F.col("__seg"), 2, F.size("__seg") - 1).alias("r"),
            ),
            lambda p: (p["l"] == F.lit(left)) & (p["r"] == F.lit(right)),
        )
        words = words.select(
            "__w",
            "__c",
            F.when(
                (F.size("__seg") >= 2) & has_pair,
                _merge_expr(F.col("__seg"), left, right),
            )
            .otherwise(F.col("__seg"))
            .alias("__seg"),
        ).localCheckpoint()

    merges_df = spark.createDataFrame(
        merges or [],
        "rank int, left string, right string, merged string, pair_count long",
    )
    words_df = words.select(
        F.col("__w").alias("word"),
        F.col("__c").cast("long").alias("word_count"),
        F.size("__seg").cast("int").alias("n_bpe_tokens"),
    )
    return merges_df, words_df


def bpe_token_budget(
    documents: DataFrame,
    words: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token budget under a trained BPE vocabulary: join the
    corpus' words against the (vocabulary-sized) segmentation table and
    aggregate — the tokenizer-aware sibling of ``token_budget_curves``.

    Output one row per source: ``source, n_docs, whitespace_tokens,
    bpe_tokens, chars, bpe_per_word`` (BPE tokens per whitespace word —
    the fertility statistic tokenizer papers report).

    Scale shape: corpus explode -> ``shuffle_hash``-hinted equi-join on
    the word table (vocabulary-sized build side; never sorts the
    corpus-sized probe — SCALING rule on lookup joins) -> per-source
    integer hash aggregate.  Zero Python.
    """
    from polars_trading_spark.functions.text import tokens

    exploded = documents.select(
        F.col(source_col).alias("source"),
        F.col("doc_id"),
        F.length(text_col).cast("long").alias("__chars"),
        F.explode_outer(tokens(F.col(text_col))).alias("word"),
    )
    joined = exploded.join(words.hint("shuffle_hash"), "word", "left")
    per_doc = joined.groupBy("source", "doc_id").agg(
        F.max("__chars").alias("__chars"),
        F.count("word").cast("long").alias("__ws"),
        F.sum(F.coalesce(F.col("n_bpe_tokens").cast("long"), F.lit(0))).alias(
            "__bpe"
        ),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__ws").cast("long").alias("whitespace_tokens"),
        F.sum("__bpe").cast("long").alias("bpe_tokens"),
        F.sum("__chars").cast("long").alias("chars"),
        F.round(
            F.sum("__bpe") / F.sum("__ws").cast("double"), 6
        ).alias("bpe_per_word"),
    )
