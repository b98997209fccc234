"""Streaming exact dedup: drop repeated documents as they arrive.

The batch `exact_dedup` keys every row to its fingerprint group's
keeper; on a stream the same contract becomes "emit a document the
first time its fingerprint is seen, drop re-arrivals".  Spark's
`dropDuplicatesWithinWatermark` is the engine-native stateful
operator for exactly this: fingerprint state lives in the state
store, bounded by the event-time watermark, so a long-running ingest
job holds state only for the dedup horizon instead of forever
(unbounded `dropDuplicates` state is the classic streaming-job OOM).

Semantics vs batch: within one watermark horizon the output matches
`exact_dedup(...).where(~is_duplicate)` up to *which* copy survives —
the stream keeps the first-arriving copy (arrival order), the batch
keeps the lowest id (global order).  A duplicate arriving later than
the watermark horizon after its original is re-emitted; size the
horizon to the window in which duplicates can plausibly arrive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_trading_spark.functions.text import doc_fingerprint

__all__ = ["streaming_dedup_exact"]


def streaming_dedup_exact(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen documents only, keyed by normalized-content fingerprint.

    ``ts_col`` is the event-time column the watermark is tracked on;
    state for a fingerprint is dropped once the watermark passes its
    last occurrence + horizon.
    """
    fp = stream.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
