"""Streaming volatility signature curve.

The batch operator (operators/volatility.py::rv_signature) is a
lag-ladder of subsampled-average realized variances — every rv(K) is a
function of O(K_max) state per symbol: the ring of the last ``K_max``
log prices (so lag-K diffs straddle micro-batch boundaries, the
``streaming_two_scale_rv`` argument) plus one running Σd² and count
per ladder rung.  This stateful twin carries exactly that state with
``applyInPandasWithState`` and emits, once per micro-batch per symbol,
one row PER LAG with the same columns the batch operator would produce
on the stream's full prefix — the live noise-diagnostic dashboard.

In-order-arrival contract across batches (rows within a batch are
sorted by ``(ts, seq)``); the running sums accumulate one diff at a
time in event order, replaying the batch window's sequential fold.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_rv_signature"]


def streaming_rv_signature(
    stream: DataFrame,
    *,
    lags: tuple[int, ...] = (1, 2, 4, 8, 16, 32),
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
    seq_col: str = "seq",
) -> DataFrame:
    """Running per-symbol volatility signature over a price stream:
    ``symbol, k, n_diffs, rv, noise_ratio`` per (symbol, lag,
    micro-batch) in update mode; the final batch's rows equal the
    batch operator on the replayed stream."""
    if not lags or any(k < 1 for k in lags) or len(set(lags)) != len(lags):
        raise ValueError(f"lags must be distinct positive ints, got {lags}")
    ks = sorted(int(k) for k in lags)
    kmax = ks[-1]

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField("k", T.IntegerType()),
            T.StructField("n_diffs", T.LongType()),
            T.StructField("rv", T.DoubleType()),
            T.StructField("noise_ratio", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ring", T.ArrayType(T.DoubleType())),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
        ]
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout
            state.remove()
            return
        (sym,) = key
        if state.exists:
            ring, sums, counts = state.get
            ring = list(ring)
            sums = list(sums)
            counts = list(counts)
        else:
            ring, sums, counts = [], [0.0] * len(ks), [0] * len(ks)

        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        order = [ts_col] + ([seq_col] if seq_col in batches[0].columns else [])
        batch = pd.concat(batches).sort_values(order).reset_index(drop=True)
        batch = batch[batch[price_col].notna()]
        if len(batch) == 0:
            return
        lps = np.log(batch[price_col].to_numpy(dtype=np.float64))

        combined = ring + [float(x) for x in lps]
        r = len(ring)
        for ki, k in enumerate(ks):
            s, c = sums[ki], counts[ki]
            for p in range(max(r, k), len(combined)):
                d = combined[p] - combined[p - k]
                s += d * d  # one diff at a time — the batch fold order
                c += 1
            sums[ki], counts[ki] = s, c
        ring = combined[-kmax:]
        state.update((ring, sums, counts))

        base = sums[-1] / ks[-1] if counts[-1] >= 1 else None
        rows = []
        for ki, k in enumerate(ks):
            rv = sums[ki] / k if counts[ki] >= 1 else None
            rows.append(
                {
                    symbol_col: sym,
                    "k": k,
                    "n_diffs": counts[ki],
                    "rv": rv,
                    "noise_ratio": (
                        rv / base
                        if rv is not None and base is not None and base > 0
                        else None
                    ),
                }
            )
        yield pd.DataFrame(rows)

    return stream.groupBy(symbol_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
