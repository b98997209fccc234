"""Streaming Wilder RSI.

The batch operator (operators/rsi.py) renormalizes the EWM gain/loss
sums over chunks of the per-symbol DIFF INDEX (not event time), so the
streaming state per symbol is: the last price, the diff count, the open
chunk's two running weighted sums, and the two previous chunks' totals
— O(1), carried across micro-batches with the identical constants.

Within a micro-batch the recursion is vectorized: diffs against the
carried last price, global diff indices from the carried count, chunk
ids / local offsets / kernel weights exactly as batch, per-chunk
exclusive cumulative sums seeded from the carried open chunk, and the
two-chunk damped carry read from the merged (carried + batch) totals —
correct without per-row recursion because diff indices are assigned in
event order, so every contribution to an older chunk precedes the
first row of a newer one.

Late rows arriving after newer events are processed in arrival order —
bound lateness upstream with a watermark if exact batch replay matters
(same contract as streaming/cusum.py and streaming/hawkes.py).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_rsi"]

_CARRIED = 2


def streaming_rsi(
    stream: DataFrame,
    *,
    period: int = 14,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-symbol streaming RSI: emits (symbol, ts, seq, rsi) per event,
    equal to the batch operator over the concatenated stream."""
    if period < 2:
        # period=1 gives alpha=1, d=0: the decay-weight base 1/d blows
        # up and the memoryless limit is not representable in this form
        raise ValueError(f"period must be >= 2, got {period}")
    from polars_trading_spark._utils import parse_duration

    alpha = 1.0 / period
    d = 1.0 - alpha
    r = 1.0 / d
    chunk_len = 32 * period
    damp = [d ** (l * chunk_len) for l in range(1, _CARRIED + 1)]
    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("rsi", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_price", T.DoubleType()),
            T.StructField("n_diffs", T.LongType()),
            T.StructField("ks", T.ArrayType(T.LongType())),
            T.StructField("u_tots", T.ArrayType(T.DoubleType())),
            T.StructField("d_tots", T.ArrayType(T.DoubleType())),
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
        if state.exists:
            last_price, n_diffs, ks, u_tots, d_tots, seeded = state.get
            u_map = dict(zip(ks, u_tots))
            d_map = dict(zip(ks, d_tots))
        else:
            last_price, n_diffs, u_map, d_map, seeded = 0.0, 0, {}, {}, False
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches)
            .sort_values([ts_col, seq_col])
            .reset_index(drop=True)
        )
        p = batch[price_col].to_numpy(dtype=np.float64)

        if not seeded:
            diffs = np.diff(p)
            first_null = True
        else:
            diffs = np.diff(np.concatenate(([last_price], p)))
            first_null = False

        up = np.where(diffs > 0, diffs, 0.0)
        dn = np.where(diffs < 0, -diffs, 0.0)
        t = n_diffs + np.arange(len(diffs), dtype=np.int64)
        k = t // chunk_len
        j = (t - k * chunk_len).astype(np.float64)
        rj = r ** j

        cs_u = pd.Series(rj * up).groupby(k).cumsum()
        cs_d = pd.Series(rj * dn).groupby(k).cumsum()
        u_prev = cs_u.groupby(k).shift(1, fill_value=0.0).to_numpy()
        d_prev = cs_d.groupby(k).shift(1, fill_value=0.0).to_numpy()
        if u_map:
            newest = max(u_map)
            u_prev = u_prev + np.where(k == newest, u_map[newest], 0.0)
            d_prev = d_prev + np.where(k == newest, d_map[newest], 0.0)

        u_merged, d_merged = dict(u_map), dict(d_map)
        for kk, tot in pd.Series(rj * up).groupby(k).sum().items():
            u_merged[int(kk)] = u_merged.get(int(kk), 0.0) + float(tot)
        for kk, tot in pd.Series(rj * dn).groupby(k).sum().items():
            d_merged[int(kk)] = d_merged.get(int(kk), 0.0) + float(tot)

        carry_u = np.zeros_like(up)
        carry_d = np.zeros_like(dn)
        for l, dmp in enumerate(damp, start=1):
            carry_u += np.array([u_merged.get(int(kk) - l, 0.0) for kk in k]) * dmp
            carry_d += np.array([d_merged.get(int(kk) - l, 0.0) for kk in k]) * dmp

        dj = d ** j
        # the current diff's own contribution IS included for its row in
        # batch semantics: s_up at row i sums diffs 1..i (running frame
        # ends at the current row), so add the row's own weighted term
        s_up = dj * (u_prev + rj * up + carry_u)
        s_dn = dj * (d_prev + rj * dn + carry_d)
        tot = s_up + s_dn
        with np.errstate(invalid="ignore", divide="ignore"):
            vals = np.where(tot > 0, 100.0 * s_up / tot, np.nan)

        rsi_out = np.full(len(p), np.nan)
        if first_null:
            rsi_out[1:] = vals
        else:
            rsi_out = vals

        keep = sorted(u_merged, reverse=True)[: _CARRIED + 1]
        state.update(
            (
                float(p[-1]),
                int(n_diffs + len(diffs)),
                [int(x) for x in keep],
                [u_merged[x] for x in keep],
                [d_merged[x] for x in keep],
                True,
            )
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        out = batch[[ts_col, seq_col]].copy()
        out.insert(0, symbol_col, sym)
        out["rsi"] = [None if np.isnan(v) else float(v) for v in rsi_out]
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
