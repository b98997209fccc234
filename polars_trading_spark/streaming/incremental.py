"""Streaming incremental near-dedup: micro-batches of newly-crawled
documents deduped against a PERSISTED MinHash signature index that the
stream itself grows — the recurring-crawl pipeline as one long-running
job instead of nightly batch reruns.

Reference scope: extends the batch `incremental_dedup`
(functions/dedup.py; the reference repo has no dedup — this is part of
the training-data-pipeline mandate).

Why foreachBatch and not a keyed stateful operator: each micro-batch's
work IS a batch computation (signature pass over the new docs, banded
join against the index) whose state — the signature index — must
outlive the streaming query, be readable by OTHER jobs, and be
bootstrappable from an existing corpus snapshot.  A state-store
implementation would trap the index inside one query's checkpoint;
parquet-on-shared-storage is the production shape (and at 100 TB the
index is the slim text-free signature table, ~100 bytes/doc).  The
engine still gives exactly-once batch boundaries via the checkpointed
epoch id.

Replay equality (exact, tested in tests/test_streaming.py): appended
stream signatures carry ``is_base = 0``, and the batch operator's
``base_flag_col`` contract makes flag-0 index docs compare only
against higher-id new docs — the same in-batch min-id rule — so
running N micro-batches produces bit-for-bit the rows of ONE
``incremental_dedup`` call over the concatenated batches **when batch
order is non-decreasing in doc id** (e.g. monotonic crawl ids — the
shape every real ingest has).  CAVEAT (round 12): if a later batch
carries a LOWER id than an earlier batch's near-duplicate, the
one-shot run marks the higher id as ``dup_of`` the lower, while the
replay — which had already decided the earlier batch — keeps both;
out-of-order ingest trades that rewrite-history case for per-batch
finality.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "seed_minhash_index",
    "incremental_dedup_foreach_batch",
    "streaming_incremental_dedup",
]


def seed_minhash_index(
    documents: DataFrame,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 12,
) -> None:
    """Bootstrap the persisted signature index from an existing corpus
    snapshot: one parquet row per doc — ``id_col, m0..m{k-1},
    is_base=1``.  The base text is never needed again."""
    from polars_trading_spark.functions.dedup import minhash_index

    sig = minhash_index(
        documents, text_col, id_col, ngram=ngram, num_hashes=num_hashes
    ).withColumn("is_base", F.lit(1))
    sig.write.mode("overwrite").parquet(index_dir)


def incremental_dedup_foreach_batch(
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    sig_threshold: float = 0.5,
    sink: Optional[Callable[[DataFrame, int], None]] = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function: dedup the micro-batch
    against the index at ``index_dir`` (creating it empty if absent),
    hand the per-doc decisions to ``sink(result_df, epoch_id)``, then
    write the batch's signatures with ``is_base = 0`` into an
    epoch-id-named subdirectory (overwrite mode — crash-replay
    idempotent) so later batches see this one.  Decisions are
    materialized BEFORE the write so a doc never matches itself.

    Per-ingest cost scales with the NEW batch (one signature pass +
    one banded join); existing index files are never rewritten."""
    from polars_trading_spark.functions.dedup import (
        incremental_dedup,
        minhash_index,
    )

    mcols = [f"m{i}" for i in range(num_hashes)]

    def _fn(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # Probe the index THROUGH Spark's Hadoop FS layer (round 12):
        # a driver-local os.path check is always False for an
        # HDFS/S3 index_dir, which silently ignored a seeded index and
        # deduped every batch only in-batch.  recursiveFileLookup picks
        # up both the seed files at the root and the per-epoch append
        # subdirectories (and disables partition inference).
        try:
            index = (
                spark.read.option("recursiveFileLookup", "true")
                .parquet(index_dir)
            )
            index.schema  # force schema inference now, not at join time
        except Exception as exc:  # empty or absent -> bootstrap empty
            if type(exc).__name__ not in (
                "AnalysisException",
                "IllegalArgumentException",
            ):
                raise
            index = spark.createDataFrame(
                [],
                f"{id_col} long, "
                + ", ".join(f"{c} long" for c in mcols)
                + ", is_base int",
            )
        result = incremental_dedup(
            batch_df,
            index,
            text_col,
            id_col,
            ngram=ngram,
            num_hashes=num_hashes,
            bands=bands,
            sig_threshold=sig_threshold,
            base_flag_col="is_base",
        )
        # materialize decisions BEFORE appending this batch's sigs —
        # the lazy plan must not observe its own batch in the index
        result = result.persist()
        try:
            result.count()
            if sink is not None:
                sink(result, epoch_id)
            # epoch-id-named subdirectory in OVERWRITE mode (round
            # 12): a crash after this write but before the checkpoint
            # commit re-runs the batch, and the overwrite makes the
            # replayed append idempotent — the index never accumulates
            # duplicate signature rows, so the flag-0 count invariant
            # holds across crash-replays
            minhash_index(
                batch_df, text_col, id_col, ngram=ngram, num_hashes=num_hashes
            ).withColumn("is_base", F.lit(0)).write.mode("overwrite").parquet(
                os.path.join(index_dir, f"batch-{epoch_id}")
            )
        finally:
            result.unpersist()

    return _fn


def streaming_incremental_dedup(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    sig_threshold: float = 0.5,
    sink: Optional[Callable[[DataFrame, int], None]] = None,
):
    """Start the streaming query: one ``foreachBatch`` stage per
    micro-batch (see ``incremental_dedup_foreach_batch``), checkpointed
    so a restart resumes at the next unprocessed batch with the index
    reflecting exactly the batches already committed."""
    fn = incremental_dedup_foreach_batch(
        index_dir,
        text_col=text_col,
        id_col=id_col,
        ngram=ngram,
        num_hashes=num_hashes,
        bands=bands,
        sig_threshold=sig_threshold,
        sink=sink,
    )
    return (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
