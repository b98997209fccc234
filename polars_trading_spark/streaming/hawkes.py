"""Streaming Hawkes self-exciting intensity.

The batch operator (operators/hawkes.py) renormalizes the exponential
kernel over time segments of width ``W = 32 / beta``; on an unbounded
stream the exact same algebra carries as THREE (segment, total) pairs
per symbol — the open segment's running weighted sum plus the two most
recent older segments' totals (anything older carries relative weight
below e^-96, invisible in double).  Each micro-batch is processed
vectorized in event-time order:

* within-batch per-segment exclusive cumulative sums seed from the
  carried open-segment total;
* carry for a row in segment ``s`` reads the MERGED (carried + batch)
  totals of ``s-1`` and ``s-2`` — correct without per-row recursion
  because rows arrive in time order, so every contribution to an
  older segment precedes the first row of a newer one;
* the constants (``exp(-beta*W*l)`` damping, ``exp(±beta*tau)``)
  are the same doubles the batch operator uses.

State is O(1) per symbol; with ``state_ttl`` idle symbols expire.
Late rows arriving after newer segments are processed in arrival
order — bound lateness upstream with a watermark if exact batch
replay matters (same contract as streaming/cusum.py).
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_hawkes_intensity"]

_CARRIED = 2


def streaming_hawkes_intensity(
    stream: DataFrame,
    *,
    beta: float = 0.1,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-symbol streaming Hawkes intensity: emits (symbol, ts, seq,
    intensity, excitation) per event, equal to the batch operator over
    the concatenated stream."""
    if beta <= 0:
        raise ValueError(f"beta must be positive, got {beta}")
    from polars_trading_spark._utils import parse_duration

    b = float(beta)
    w_seg = 32.0 / b
    damp = [math.exp(-b * w_seg * l) for l in range(1, _CARRIED + 1)]
    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("intensity", T.DoubleType()),
            T.StructField("excitation", T.DoubleType()),
        ]
    )
    # up to _CARRIED+1 recent (segment, total) pairs, newest first;
    # the newest pair is the open segment's running sum
    state_schema = T.StructType(
        [
            T.StructField("segs", T.ArrayType(T.LongType())),
            T.StructField("tots", T.ArrayType(T.DoubleType())),
        ]
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (sym,) = key
        carried: dict[int, float] = {}
        if state.exists:
            segs, tots = state.get
            carried = dict(zip(segs, tots))
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches)
            .sort_values([ts_col, seq_col])
            .reset_index(drop=True)
        )
        # event seconds exactly as the batch operator: unix micros / 1e6
        tsec = (
            batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
            / 1_000_000.0
        )
        seg = np.floor(tsec / w_seg).astype("int64")
        tau = tsec - seg * w_seg
        ew = np.exp(b * tau)

        # exclusive per-segment cumsum via grouped shift — the same
        # left-to-right fold as the batch window (cumsum-minus-self
        # would round differently)
        cs = pd.Series(ew).groupby(seg).cumsum()
        s_prev = cs.groupby(seg).shift(1, fill_value=0.0).to_numpy()
        if carried:
            newest = max(carried)
            s_prev = s_prev + np.where(seg == newest, carried[newest], 0.0)

        merged = dict(carried)
        for sg, tot in pd.Series(ew).groupby(seg).sum().items():
            merged[int(sg)] = merged.get(int(sg), 0.0) + float(tot)

        carry = np.zeros_like(ew)
        for l, dmp in enumerate(damp, start=1):
            lookup = np.array([merged.get(int(sg) - l, 0.0) for sg in seg])
            carry += lookup * dmp

        intensity = np.exp(-b * tau) * (s_prev + carry)

        keep = sorted(merged, reverse=True)[: _CARRIED + 1]
        state.update(([int(k) for k in keep], [merged[k] for k in keep]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        out = batch[[ts_col, seq_col]].copy()
        out.insert(0, symbol_col, sym)
        out["intensity"] = intensity
        out["excitation"] = intensity / (intensity + 1)
        yield out

    return stream.groupBy(F.col(symbol_col)).applyInPandasWithState(
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
