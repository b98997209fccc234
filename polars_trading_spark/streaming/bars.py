"""Structured Streaming bar sampling.

The reference is batch-only (Polars' "streaming" engine is an
out-of-core batch executor) — this module is the deliberate extension
SURVEY.md §7 stages: the same bar semantics over unbounded trade
streams.

* ``streaming_time_bars``  — watermark + tumbling event-time window +
  the same OHLCV bundle.  Fully native; late trades beyond the
  watermark are dropped, in-watermark stragglers update their bar
  (append mode emits a bar once its window passes the watermark).
* ``streaming_volume_bars`` — cumulative-volume bucketing is stateful
  across batches: per (symbol, date) group the state carries the open
  bar's FULL OHLCV accumulators (first/last ts, open/high/low, vwap
  numerator, piece count) plus its volume and id, so a bar that spans
  micro-batches is emitted once, complete and correct, when it closes.
  Within a batch the split math is the same integer closed form as the
  batch operator, vectorized with numpy.

Emission contract: a bar row with ``is_final=True`` is exact and
emitted exactly once (when the bar closes).  Each batch additionally
emits one ``is_final=False`` snapshot of the currently open bar —
snapshots for the same ``bar_id`` supersede each other (progressive
changelog); consumers wanting only closed bars filter ``is_final``.

Ordering note: within a micro-batch rows are sorted by (ts) before
accumulation; across micro-batches event-time ordering is the source's
responsibility (same contract as any streaming accumulator).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from polars_trading_spark._utils import duration_to_interval, ohlcv_aggs, parse_duration
from polars_trading_spark.config import column_names

__all__ = ["streaming_time_bars", "streaming_volume_bars"]


def streaming_time_bars(
    stream: DataFrame,
    *,
    bar_size: str = "1m",
    watermark: str = "1 minute",
) -> DataFrame:
    """Event-time OHLCV bars over a streaming trades DataFrame.

    Same output contract as the batch ``time_bars`` with the bucket
    exposed as ``window.start``; no deterministic ``seq`` exists on a
    stream, so open/close ties on identical timestamps are resolved by
    arrival (documented divergence from the batch operator).
    """
    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    interval = duration_to_interval(bar_size)
    out = (
        stream.na.drop(subset=[price])
        .withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), interval), F.col(symbol))
        .agg(*ohlcv_aggs(ts, price, size, seq=None))
        .withColumn(ts, F.col("window.start"))
        .drop("window")
    )
    return out


# Open-bar state: volume + id + full OHLCV accumulators, O(1) per group.
_VOL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("carry", T.LongType()),  # volume in the open bar
        T.StructField("open_id", T.IntegerType()),  # id of the open bar
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("vnum", T.DoubleType()),  # Σ price·amount
        T.StructField("ntr", T.LongType()),  # piece count
    ]
)

def _volume_bars_out_schema(symbol: str, ts: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(symbol, T.StringType()),
            T.StructField("bar_date", T.DateType()),
            T.StructField("bar_id", T.IntegerType()),
            T.StructField(f"{ts}_start", T.TimestampType()),
            T.StructField(f"{ts}_end", T.TimestampType()),
            T.StructField("open", T.DoubleType()),
            T.StructField("high", T.DoubleType()),
            T.StructField("low", T.DoubleType()),
            T.StructField("close", T.DoubleType()),
            T.StructField("volume", T.LongType()),
            T.StructField("vwap", T.DoubleType()),
            T.StructField("n_trades", T.IntegerType()),
            T.StructField("is_final", T.BooleanType()),
        ]
    )


def make_volume_update(
    bar_size: int,
    ts: str,
    price: str,
    size: str,
    symbol: str,
    ttl_ms: int | None,
):
    """Build the stateful update function (module-level for unit tests —
    multi-batch state transitions are exercised directly on a stub
    GroupState without a streaming runtime)."""
    B = int(bar_size)
    out_schema = _volume_bars_out_schema(symbol, ts)
    out_cols = [f.name for f in out_schema.fields]

    def update(
        key: Tuple[str, object],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Closed-day group: the open partial was already emitted as a
            # snapshot; just drop the state.
            state.remove()
            return
        sym, bar_date = key
        carry, open_id, start_us, end_us, op, hi, lo, vnum, ntr = (
            state.get if state.exists else (0, 0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0)
        )

        rows = [pdf for pdf in pdfs]
        if not rows:
            return
        batch = pd.concat(rows).sort_values([ts], kind="mergesort").reset_index(drop=True)
        prices = batch[price].to_numpy(dtype=float)
        sizes = batch[size].to_numpy(dtype="int64")
        stamps = batch[ts].astype("datetime64[us]").astype("int64").to_numpy()
        keep = sizes > 0
        prices, sizes, stamps = prices[keep], sizes[keep], stamps[keep]
        m = len(prices)
        if m == 0:
            return

        # Integer closed-form split math (same as batch volume_bars),
        # offset by the carried volume: global bar index 0 = open bar.
        cs = np.cumsum(sizes)
        cur = carry + cs
        prev = cur - sizes
        start_b = prev // B
        end_b = (cur - 1) // B
        counts = (end_b - start_b + 1).astype(np.int64)

        total = int(counts.sum())
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        tr = np.repeat(np.arange(m), counts)
        within = np.arange(total) - offsets[tr]
        piece_bar = start_b[tr] + within
        piece_amt = np.minimum(cur[tr], (piece_bar + 1) * B) - np.maximum(prev[tr], piece_bar * B)
        piece_price = prices[tr]
        piece_us = stamps[tr]

        change = np.flatnonzero(np.diff(piece_bar)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [total]))
        seg_bar = piece_bar[starts]
        seg_vol = np.add.reduceat(piece_amt, starts)
        seg_vnum = np.add.reduceat(piece_amt * piece_price, starts)
        seg_high = np.maximum.reduceat(piece_price, starts)
        seg_low = np.minimum.reduceat(piece_price, starts)
        seg_open = piece_price[starts]
        seg_close = piece_price[ends - 1]
        seg_start = piece_us[starts]
        seg_end = piece_us[ends - 1]
        seg_ntr = (ends - starts).astype(np.int64)

        # Merge the carried open-bar accumulators into segment 0 (the
        # open bar always receives this batch's first piece when state
        # holds one — carry > 0 implies start_b[0] == 0).
        vol_l, vnum_l = seg_vol.tolist(), seg_vnum.tolist()
        hi_l, lo_l = seg_high.tolist(), seg_low.tolist()
        op_l, cl_l = seg_open.tolist(), seg_close.tolist()
        st_l, en_l, ntr_l = seg_start.tolist(), seg_end.tolist(), seg_ntr.tolist()
        if ntr > 0 and len(seg_bar) and seg_bar[0] == 0:
            vol_l[0] += carry
            vnum_l[0] += vnum
            hi_l[0] = max(hi_l[0], hi)
            lo_l[0] = min(lo_l[0], lo)
            op_l[0] = op
            st_l[0] = start_us
            en_l[0] = max(en_l[0], end_us)
            ntr_l[0] += ntr

        grand_total = carry + int(cs[-1])
        new_open_global = grand_total // B
        new_carry = grand_total % B
        new_open_id = open_id + new_open_global

        out_rows = []
        new_state_acc = (0, 0, 0.0, 0.0, 0.0, 0.0, 0)  # start,end,o,h,l,vnum,ntr
        for i, gb in enumerate(seg_bar.tolist()):
            final = gb < new_open_global
            row = (
                sym,
                bar_date,
                int(open_id + gb),
                pd.Timestamp(st_l[i], unit="us"),
                pd.Timestamp(en_l[i], unit="us"),
                op_l[i],
                hi_l[i],
                lo_l[i],
                cl_l[i],
                int(vol_l[i]),
                vnum_l[i] / vol_l[i],
                int(ntr_l[i]),
                final,
            )
            if final:
                out_rows.append(row)
            else:
                # The (single) still-open segment: snapshot + new state.
                out_rows.append(row)
                new_state_acc = (st_l[i], en_l[i], op_l[i], hi_l[i], lo_l[i], vnum_l[i], ntr_l[i])

        state.update((int(new_carry), int(new_open_id), *new_state_acc))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out_rows, columns=out_cols)

    return update


def streaming_volume_bars(
    stream: DataFrame,
    *,
    bar_size: int = 10_000,
    state_ttl: str | None = "3d",
) -> DataFrame:
    """Stateful volume bars over a stream (split semantics identical to
    the batch operator, including across micro-batch boundaries).

    A bar is emitted with ``is_final=True`` exactly once, when its
    cumulative volume reaches ``bar_size`` — its OHLCV covers every
    piece it received, in whichever batches they arrived.  The open
    partial bar is additionally emitted as an ``is_final=False``
    snapshot each batch (see module docstring for the supersede
    contract).

    State per (symbol, date) is one row of accumulators, so state size
    is O(groups), not O(rows); ``state_ttl`` expires closed-day groups
    (processing-time) so unbounded streams don't accrete dead state.
    """
    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None
    update = make_volume_update(bar_size, ts, price, size, symbol, ttl_ms)
    grouped = (
        stream.na.drop(subset=[price])
        .withColumn("__date", F.to_date(ts))
        .groupBy(F.col(symbol), F.col("__date"))
    )
    return grouped.applyInPandasWithState(
        update,
        outputStructType=_volume_bars_out_schema(symbol, ts),
        stateStructType=_VOL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
