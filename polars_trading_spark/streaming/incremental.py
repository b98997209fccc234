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
``incremental_dedup`` call over the concatenated batches, no matter
how the snapshot was split.
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
    APPEND the batch's signatures with ``is_base = 0`` so later batches
    see this one.  Decisions are materialized BEFORE the append so a
    doc never matches itself.

    Per-ingest cost scales with the NEW batch (one signature pass +
    one banded join); the index is only ever appended, never
    rewritten."""
    from polars_trading_spark.functions.dedup import (
        incremental_dedup,
        minhash_index,
    )

    mcols = [f"m{i}" for i in range(num_hashes)]

    def _fn(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        has_index = os.path.isdir(index_dir) and any(
            not f.startswith(("_", ".")) for f in os.listdir(index_dir)
        )
        if has_index:
            index = spark.read.parquet(index_dir)
        else:
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
            minhash_index(
                batch_df, text_col, id_col, ngram=ngram, num_hashes=num_hashes
            ).withColumn("is_base", F.lit(0)).write.mode("append").parquet(
                index_dir
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
