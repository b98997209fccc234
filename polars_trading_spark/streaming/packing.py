"""Streaming sequence packing.

The batch operator (functions/corpus.py::pack_sequences) shuffles by a
salted hash then packs greedily; on an unbounded stream there is no
global order to shuffle, so the streaming variant packs documents in
*arrival order* per shard and carries two numbers of state — the
current sequence id and its token fill — across micro-batches.  A
sequence that is partially filled when a batch ends is continued by the
next batch (no padding waste at batch boundaries), which is exactly
what a continuously-ingesting pretokenization pipeline wants.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_pack_sequences"]


def streaming_pack_sequences(
    stream: DataFrame,
    *,
    budget_tokens: int,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pts-pack",
) -> DataFrame:
    """Greedy arrival-order packing per hash shard with carried state.

    Emits one row per document: ``id_col, shard, seq_id, seq_offset,
    n_tokens``.  Within a micro-batch documents are processed in
    ``id_col`` order; the open sequence's (id, fill) carries across
    batches, so replaying a stream in batches yields sequences that
    respect the budget globally, with oversized documents alone in
    their own sequence.
    """
    from polars_trading_spark.functions.text import portable_hash60, token_count

    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")

    budget = int(budget_tokens)
    h = portable_hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    slim = stream.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.pmod(h, F.lit(int(n_shards))).cast("int").alias("shard"),
    )
    id_name = id_col

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("shard", T.IntegerType()),
            T.StructField("seq_id", T.IntegerType()),
            T.StructField("seq_offset", T.LongType()),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("seq", T.IntegerType()),
            T.StructField("fill", T.LongType()),
        ]
    )

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (shard,) = key
        seq, fill = state.get if state.exists else (0, 0)
        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        batch = pd.concat(batches).sort_values(id_name).reset_index(drop=True)
        tok = batch["n_tokens"].to_numpy(dtype=np.int64)
        n = len(tok)
        c = np.concatenate(([0], np.cumsum(tok)))
        seqs = np.zeros(n, dtype=np.int32)
        offs = np.zeros(n, dtype=np.int64)
        i = 0
        while i < n:
            e = int(np.searchsorted(c, c[i] + (budget - fill), side="right")) - 1
            if e <= i:
                if fill > 0:
                    seq, fill = seq + 1, 0
                    continue
                e = i + 1  # oversized document: its own sequence
            seqs[i:e] = seq
            offs[i:e] = fill + (c[i:e] - c[i])
            fill += int(c[e] - c[i])
            i = e
            if fill >= budget:
                seq, fill = seq + 1, 0
        state.update((int(seq), int(fill)))
        yield pd.DataFrame(
            {
                id_name: batch[id_name].astype("int64"),
                "shard": np.full(n, shard, dtype=np.int32),
                "seq_id": seqs,
                "seq_offset": offs,
                "n_tokens": tok.astype(np.int32),
            }
        )

    return slim.groupBy("shard").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
