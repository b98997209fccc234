"""Cluster topic labeling: TF-IDF keywords per embedding cluster.

The standard "what is in this corpus" map (and the triage view for
SemDeDup/mixing decisions): cluster the embedding space with the same
coarse quantizer the ANN/dedup layers use, then label each cluster with
the tokens whose within-cluster frequency is most surprising against
the corpus (TF-IDF with the cluster as the "document").

Cross-table shape: embeddings assign to cells via the broadcast
centroid pack (one HOF expression, no Python), the documents table
joins in on the shared id, token counts aggregate per (cell, token),
document frequencies per token — every step an equi-join or hash
aggregate, then a per-cell top-k window over the (tiny) scored table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark.functions.similarity import (
    _as_double,
    _centroid_sims_col,
    _vector_pack,
)
from polars_trading_spark.functions.text import tokens

__all__ = ["cluster_keywords"]


def cluster_keywords(
    embeddings: DataFrame,
    documents: DataFrame,
    *,
    n_cells: int = 8,
    k: int = 5,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per embedding cluster.

    Centroids are the ``n_cells`` lowest-id vectors (deterministic, the
    oracle-replayable quantizer; swap in ``kmeans_centroids`` for
    data-shaped cells).  Score = within-cell term count × smoothed IDF
    ``ln((N+1)/(df+1)) + 1`` over the whole corpus.  Ties break by
    token text.  Output: ``cell, rank, token, cell_count, doc_freq,
    score``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    from polars_trading_spark._utils import persist_tracked

    cents = _vector_pack(
        embeddings, n_cells, id_col=vec_id_col, vec_col=vec_col, out_col="__cents"
    )
    # Round 14 (guide §5.3/§3.1): ``cells`` and ``dfreq`` are the small
    # sides of downstream joins, so AQE broadcasts them — and a
    # broadcast subtree is re-executed ON THE BROADCAST THREAD, which
    # re-ran the CPU-dense centroid-sims chain and the tokenize +
    # distinct pass (two ~18s-CPU duplicate stages in the profile).
    # Both frames are bounded (ids x 2 ints; vocab x counts): stage
    # them eagerly so the broadcast reads the cache.
    cells = persist_tracked(
        embeddings.select(
            F.col(vec_id_col).alias("__id"), _as_double(F.col(vec_col)).alias("__v")
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("__sims", _centroid_sims_col(F.col("__v"), F.col("__cents")))
        .select(
            "__id",
            (F.array_position(F.col("__sims"), F.array_max("__sims")) - 1)
            .cast("int")
            .alias("cell"),
        ),
        eager=True,
    )

    # Round 15 (guide §5.3/§2.3): ``cell_counts`` and ``dfreq`` each
    # materialized their own tokenize + explode pass over the corpus
    # (two ~8-10s-CPU duplicate stages in the profile).  Aggregate the
    # exploded tokens ONCE to per-(doc, token) occurrence counts — the
    # common root of both: cell counts are sums of the per-doc counts
    # joined to cells, document frequency is the per-token row count of
    # the same frame.  Integer counts — values identical.  The
    # (doc, token) frame rides the documents scan's doc_id partitioning
    # (partial aggregation compresses before any exchange at scale).
    g = persist_tracked(
        documents.select(
            F.col(doc_id_col).alias("__id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("__id", "token")
        .agg(F.count(F.lit(1)).alias("__tc")),
        eager=True,
    )

    # cell_counts is bounded too (cells x vocab) and is itself the
    # broadcast side of the score join — same staging rationale.
    cell_counts = persist_tracked(
        g.join(cells, "__id")
        .groupBy("cell", "token")
        .agg(F.sum("__tc").cast("long").alias("cell_count")),
        eager=True,
    )
    dfreq = persist_tracked(
        g.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq")),
        eager=True,
    )
    n_docs = documents.agg(F.count(F.lit(1)).cast("double").alias("__N"))
    scored = (
        cell_counts.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("cell_count")
            * (F.log((F.col("__N") + 1) / (F.col("doc_freq") + 1)) + 1),
        )
    )
    w = Window.partitionBy("cell").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("cell", "rank", "token", "cell_count", "doc_freq", "score")
    )
