"""Streaming symmetric CUSUM event sampling.

The batch operator (operators/sampling.py) scans each symbol's history
inside an applyInPandas island; on an unbounded stream the same
recursion carries as THREE numbers per symbol — (spos, sneg,
last_price) — updated per micro-batch with the identical chunked
closed-form scan (the scan accepts carried state, so batch and stream
are the same code path and provably agree across batch boundaries).
Emits only the sampled events (append mode), so downstream labeling
pipelines consume a sparse event stream, not the raw ticks.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from polars_trading_spark.config import column_names
from polars_trading_spark.operators.sampling import _cusum_scan

__all__ = ["streaming_cusum_filter"]


def streaming_cusum_filter(
    stream: DataFrame,
    threshold: float,
    *,
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-symbol streaming CUSUM filter: emits (symbol, timestamp, side)
    rows as excursions breach the threshold.

    Within a micro-batch rows are processed in event-time order; state
    (running excursions + last seen price) carries across batches, so a
    replayed stream produces exactly the batch operator's events.
    Late rows arriving in a later batch are processed in arrival order —
    bound lateness upstream with a watermark if exact replay matters.
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    from polars_trading_spark._utils import parse_duration

    ts, price, symbol = column_names.timestamp, column_names.price, column_names.symbol
    h = float(threshold)
    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None

    out_schema = T.StructType(
        [
            T.StructField(symbol, T.StringType()),
            T.StructField(ts, T.TimestampType()),
            T.StructField("side", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("spos", T.DoubleType()),
            T.StructField("sneg", T.DoubleType()),
            T.StructField("last_price", T.DoubleType()),
            T.StructField("seeded", T.BooleanType()),
        ]
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (sym,) = key
        spos, sneg, last_price, seeded = (
            state.get if state.exists else (0.0, 0.0, 0.0, False)
        )
        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        batch = pd.concat(batches).sort_values([ts]).reset_index(drop=True)
        batch = batch[batch[price].notna()]
        if len(batch) == 0:
            return
        p = batch[price].to_numpy(dtype=np.float64)
        if not seeded:
            diffs = np.diff(p)
            offset = 1  # first row only seeds the filter (AFML semantics)
        else:
            diffs = np.diff(np.concatenate(([last_price], p)))
            offset = 0
        idx, side, spos, sneg = _cusum_scan(diffs, h, spos, sneg)
        state.update((spos, sneg, float(p[-1]), True))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if idx.size == 0:
            return
        out = batch.iloc[idx + offset][[ts]].copy()
        out["side"] = side.astype("int32")
        out.insert(0, symbol, sym)
        yield out

    return stream.groupBy(F.col(symbol)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
