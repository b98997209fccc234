"""Streaming realized higher moments.

The batch operator (operators/volatility.py::realized_moments) is a
per-(symbol, day) fold of tick-return power sums — O(1) state per key:
the last log price and the running Σr², Σr³, Σr⁴ with the return
count.  This stateful twin carries exactly that state with
``applyInPandasWithState`` keyed by (symbol, day) and emits, once per
micro-batch per key, the same row the batch operator produces on the
stream's full prefix — live intraday variance/skew/kurtosis without
re-scanning the tape.

Rows within a micro-batch are processed in (ts, seq) order; late rows
arriving after newer events are folded in arrival order — bound
lateness upstream with a watermark if exact batch replay matters (the
streaming/cusum.py contract).  Day keys stop receiving events when the
tape rolls over; pass ``state_ttl`` to expire yesterday's state.
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

__all__ = ["streaming_realized_moments", "streaming_two_scale_rv"]


def streaming_realized_moments(
    stream: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Running per-(symbol, day) realized variance/skew/kurtosis.

    Emits one row per (symbol, day, micro-batch) in update mode with
    the batch operator's columns (``symbol, day, n_returns, rv, rskew,
    rkurt``); a replayed stream's final row per key equals the batch
    operator's output.
    """
    from polars_trading_spark._utils import parse_duration

    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField("day", T.DateType()),
            T.StructField("n_returns", T.LongType()),
            T.StructField("rv", T.DoubleType()),
            T.StructField("rskew", T.DoubleType()),
            T.StructField("rkurt", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_lp", T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("s2", T.DoubleType()),
            T.StructField("s3", T.DoubleType()),
            T.StructField("s4", T.DoubleType()),
            T.StructField("seeded", T.BooleanType()),
        ]
    )

    def update(
        key: Tuple[str, object], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        sym, day = key
        if state.exists:
            last_lp, n, s2, s3, s4, seeded = state.get
        else:
            last_lp, n, s2, s3, s4, seeded = 0.0, 0, 0.0, 0.0, 0.0, False

        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        batch = (
            pd.concat(batches)
            .sort_values([ts_col, seq_col], kind="mergesort")
            .reset_index(drop=True)
        )
        batch = batch[batch[price_col].notna() & (batch[price_col] > 0)]
        if len(batch) == 0:
            return
        lp = np.log(batch[price_col].to_numpy(dtype=np.float64))
        if seeded:
            prev = np.concatenate(([last_lp], lp[:-1]))
            r = lp - prev
        else:
            r = lp[1:] - lp[:-1]
        last_lp, seeded = float(lp[-1]), True

        # sequential fold mirrors the batch operator's ordered running
        # sums (pairwise numpy reductions drift at the last ulp)
        r2 = r * r
        for i in range(len(r)):
            s2 += r2[i]
            s3 += r2[i] * r[i]
            s4 += r2[i] * r2[i]
        n += len(r)

        state.update((last_lp, n, s2, s3, s4, seeded))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        ok = n >= 2 and s2 > 0
        rv = s2 if ok else None
        rskew = math.sqrt(n) * s3 / s2 ** 1.5 if ok else None
        rkurt = n * s4 / (s2 * s2) if ok else None
        yield pd.DataFrame(
            {
                symbol_col: [sym],
                "day": [day],
                "n_returns": [n],
                "rv": [rv],
                "rskew": [rskew],
                "rkurt": [rkurt],
            }
        )

    keyed = stream.withColumn("day", F.to_date(ts_col))
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(symbol_col, "day").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )


def streaming_two_scale_rv(
    stream: DataFrame,
    *,
    k: int = 5,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Running per-(symbol, day) two-scale realized variance (the
    streaming twin of operators/volatility.py::two_scale_rv).

    State per key is O(K): the last ``min(K, n)`` log prices (for the
    lag-K subgrid diffs that straddle a micro-batch boundary), the
    price count, and the two running squared-diff sums.  Emits one row
    per (symbol, day, micro-batch) in update mode; a replayed stream's
    final row per key equals the batch operator's output.
    """
    from polars_trading_spark._utils import parse_duration

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField("day", T.DateType()),
            T.StructField("n_ticks", T.LongType()),
            T.StructField("n_returns", T.LongType()),
            T.StructField("rv_all", T.DoubleType()),
            T.StructField("rv_sub_avg", T.DoubleType()),
            T.StructField("tsrv", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("tail", T.ArrayType(T.DoubleType())),
            T.StructField("m", T.LongType()),
            T.StructField("s2", T.DoubleType()),
            T.StructField("sk", T.DoubleType()),
        ]
    )

    def update(
        key: Tuple[str, object], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        sym, day = key
        if state.exists:
            tail, m, s2, sk = state.get
            tail = list(tail)
        else:
            tail, m, s2, sk = [], 0, 0.0, 0.0

        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        batch = (
            pd.concat(batches)
            .sort_values([ts_col, seq_col], kind="mergesort")
            .reset_index(drop=True)
        )
        batch = batch[batch[price_col].notna() & (batch[price_col] > 0)]
        if len(batch) == 0:
            return
        lp = np.log(batch[price_col].to_numpy(dtype=np.float64))

        # `tail` holds the last min(K, m) log prices; its local index
        # aligns with the global one exactly when m < K, and when
        # m >= K every new element has both lags available — so the
        # `i >= 1` / `i >= k` guards below are correct in both regimes.
        full = tail + lp.tolist()
        start = len(tail)
        for i in range(start, len(full)):
            if i >= 1:
                d1 = full[i] - full[i - 1]
                s2 += d1 * d1
            if i >= k:
                dk = full[i] - full[i - k]
                sk += dk * dk
        m += len(lp)
        tail = full[-k:] if len(full) > k else full

        state.update((tail, m, s2, sk))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        n = m - 1
        ok = n > k
        rv_all = s2 if ok else None
        rv_sub = sk / k if ok else None
        tsrv = (
            sk / k - ((n - k + 1) / k) / n * s2 if ok else None
        )
        yield pd.DataFrame(
            {
                symbol_col: [sym],
                "day": [day],
                "n_ticks": [m],
                "n_returns": [n],
                "rv_all": [rv_all],
                "rv_sub_avg": [rv_sub],
                "tsrv": [tsrv],
            }
        )

    keyed = stream.withColumn("day", F.to_date(ts_col))
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(symbol_col, "day").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
