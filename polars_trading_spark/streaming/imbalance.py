"""Streaming tick/volume/dollar imbalance bars and run bars.

The batch operators (operators/imbalance.py) scan per (symbol, date)
inside an island; the streaming forms carry the scan state — the bar
accumulators (running theta for imbalance, the buy/sell pair for runs),
last price, last tick sign — plus the open bar's OHLCV accumulators per
(symbol, date) group, and replay micro-batches through the SAME chunked
closed-form scans (each accepts seeded accumulators and reports how
many bars closed), so a replayed stream emits exactly the batch
operator's bars.

Emission contract mirrors ``streaming_volume_bars``: a bar is emitted
``is_final=True`` exactly once when the clock breaches; the open
partial bar is also emitted as an ``is_final=False`` snapshot each
batch, superseded by later snapshots or its final bar (consumers keep
the last row per (symbol, bar_date, bar_id)).  State is O(1) per
(symbol, date); ``state_ttl`` expires closed days.
"""

from __future__ import annotations

from typing import Callable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from polars_trading_spark._utils import parse_duration
from polars_trading_spark.config import column_names
from polars_trading_spark.operators.bars import _range_scan
from polars_trading_spark.operators.imbalance import _MODES, _imbalance_scan, _run_scan

from polars_trading_spark.streaming.bars import _volume_bars_out_schema

__all__ = ["streaming_imbalance_bars", "streaming_range_bars", "streaming_run_bars"]

# Two generic accumulator slots cover both clocks: (theta, unused) for
# imbalance, (pos, neg) for run bars.
_IMB_STATE_SCHEMA = T.StructType(
    [
        T.StructField("acc1", T.DoubleType()),
        T.StructField("acc2", T.DoubleType()),
        T.StructField("last_price", T.DoubleType()),
        T.StructField("last_sign", T.DoubleType()),
        T.StructField("seeded", T.BooleanType()),
        T.StructField("open_id", T.IntegerType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("vol", T.LongType()),
        T.StructField("vnum", T.DoubleType()),
        T.StructField("ntr", T.LongType()),
    ]
)


def _seeded_signs(
    p: np.ndarray, last_price: float, last_sign: float, seeded: bool
) -> np.ndarray:
    """Tick-rule signs for a batch, carrying the previous batch's last
    price and last non-zero sign.  Unseeded batches give row 0 sign 0
    (it only seeds the rule), matching the batch operator."""
    n = p.size
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    if seeded:
        s = np.sign(np.diff(np.concatenate(([last_price], p))))
        vals = np.concatenate(([last_sign], s))
    else:
        vals = np.concatenate(([0.0], np.sign(np.diff(p))))
        vals = np.concatenate(([0.0], vals))  # virtual seed slot
    idx = np.arange(vals.size)
    last = np.maximum.accumulate(np.where(vals != 0.0, idx, 0))
    carried = np.where(vals[last] != 0.0, vals[last], 0.0)
    return carried[-n:]


def make_imbalance_update(
    threshold: float,
    mode: str,
    ts: str,
    price: str,
    size: str,
    symbol: str,
    ttl_ms: int | None,
    kind: str = "imbalance",
):
    """Stateful update fn (module-level so multi-batch state transitions
    can be unit-tested directly on a stub GroupState).

    ``kind``: ``"imbalance"`` (|net flow| clock) or ``"run"`` (one-sided
    max(buys, sells) clock) — same state machine, different seeded scan.
    """
    h = float(threshold)
    out_schema = _volume_bars_out_schema(symbol, ts)
    out_cols = [f.name for f in out_schema.fields]

    scan: Callable[[np.ndarray, float, float], tuple[np.ndarray, float, float, int]]
    if kind == "imbalance":

        def scan(w, a1, a2):
            ids, theta, closed = _imbalance_scan(w, h, a1)
            return ids, theta, 0.0, closed

    elif kind == "run":

        def scan(w, a1, a2):
            return _run_scan(w, h, a1, a2)

    elif kind == "range":
        # w is the raw price array; acc1 = carried open price, acc2 = a
        # 0/1 "bar is open" flag (the shared state schema's two generic
        # accumulator slots).
        def scan(w, a1, a2):
            ids, open_out, closed = _range_scan(w, h, a1 if a2 > 0 else None)
            return (
                ids,
                open_out if open_out is not None else 0.0,
                1.0 if open_out is not None else 0.0,
                closed,
            )

    else:
        raise ValueError(f"kind must be 'imbalance', 'run' or 'range', got {kind!r}")

    def update(
        key: Tuple[str, object], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        sym, bar_date = key
        (acc1, acc2, last_price, last_sign, seeded, open_id, start_us, end_us,
         op, hi, lo, vol, vnum, ntr) = (
            state.get
            if state.exists
            else (0.0, 0.0, 0.0, 0.0, False, 0, 0, 0, 0.0, 0.0, 0.0, 0, 0.0, 0)
        )
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        batch = pd.concat(rows).sort_values([ts], kind="mergesort").reset_index(drop=True)
        batch = batch[batch[price].notna()]
        if len(batch) == 0:
            return
        p = batch[price].to_numpy(dtype=np.float64)
        # null sizes degrade to 0 like the batch operator's native sum
        # (an int64 cast would throw on NaN and kill the query instead)
        sizes = batch[size].fillna(0).to_numpy(dtype="int64")
        stamps = batch[ts].astype("datetime64[us]").astype("int64").to_numpy()

        b = _seeded_signs(p, last_price, last_sign, bool(seeded))
        if kind == "range":
            w = p  # the price clock scans raw prices, not signed flow
        elif mode == "tick":
            w = b
        elif mode == "volume":
            w = b * sizes.astype(np.float64)
        else:
            w = b * sizes.astype(np.float64) * p
        ids, acc1, acc2, closed = scan(w, float(acc1), float(acc2))

        nz = np.flatnonzero(b != 0.0)
        new_last_sign = float(b[nz[-1]]) if nz.size else float(last_sign)

        change = np.flatnonzero(np.diff(ids)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(ids)]))

        out_frames = []
        for s0, e0 in zip(starts, ends):
            lid = int(ids[s0])
            s_us, e_us = int(stamps[s0]), int(stamps[e0 - 1])
            o, c = float(p[s0]), float(p[e0 - 1])
            h_, l_ = float(p[s0:e0].max()), float(p[s0:e0].min())
            v = int(sizes[s0:e0].sum())
            vn = float((sizes[s0:e0] * p[s0:e0]).sum())
            nt = int(e0 - s0)
            if lid == 0 and ntr > 0:  # merge carried open-bar accumulators
                s_us, e_us = min(s_us, start_us), max(e_us, end_us)
                o = op
                h_, l_ = max(h_, hi), min(l_, lo)
                v += vol
                vn += vnum
                nt += ntr
            final = lid < closed
            out_frames.append(
                [sym, bar_date, open_id + lid, s_us, e_us, o, h_, l_, c, v, vn, nt, final]
            )

        if int(ids[-1]) < closed:  # last row closed the final bar
            state.update((acc1, acc2, float(p[-1]), new_last_sign, True,
                          open_id + closed, 0, 0, 0.0, 0.0, 0.0, 0, 0.0, 0))
        else:  # trailing segment stays open — persist its accumulators
            (_, _, lid2, s_us, e_us, o, h_, l_, _c, v, vn, nt, _f) = out_frames[-1]
            state.update((acc1, acc2, float(p[-1]), new_last_sign, True,
                          lid2, s_us, e_us, o, h_, l_, v, vn, nt))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        out = pd.DataFrame(
            out_frames,
            columns=[symbol, "bar_date", "bar_id", "_s", "_e", "open", "high",
                     "low", "close", "volume", "_vnum", "n_trades", "is_final"],
        )
        out[f"{ts}_start"] = pd.to_datetime(out["_s"], unit="us")
        out[f"{ts}_end"] = pd.to_datetime(out["_e"], unit="us")
        out["vwap"] = out["_vnum"] / out["volume"]
        yield out[out_cols]

    return update


def _streaming_flow_bars(
    stream: DataFrame, *, threshold: float, mode: str, state_ttl: str | None, kind: str
) -> DataFrame:
    if kind != "range" and mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None
    update = make_imbalance_update(threshold, mode, ts, price, size, symbol, ttl_ms, kind)
    grouped = (
        stream.na.drop(subset=[price])
        .withColumn("__date", F.to_date(ts))
        .groupBy(F.col(symbol), F.col("__date"))
    )
    return grouped.applyInPandasWithState(
        update,
        outputStructType=_volume_bars_out_schema(symbol, ts),
        stateStructType=_IMB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_imbalance_bars(
    stream: DataFrame,
    *,
    threshold: float,
    mode: str = "tick",
    state_ttl: str | None = "3d",
) -> DataFrame:
    """Stateful imbalance bars over a stream — batch-operator semantics
    across micro-batch boundaries (see module docstring)."""
    return _streaming_flow_bars(
        stream, threshold=threshold, mode=mode, state_ttl=state_ttl, kind="imbalance"
    )


def streaming_run_bars(
    stream: DataFrame,
    *,
    threshold: float,
    mode: str = "tick",
    state_ttl: str | None = "3d",
) -> DataFrame:
    """Stateful run bars (AFML 2.3.2.2) over a stream: one-sided
    max(buy flow, sell flow) clock, batch-operator semantics across
    micro-batch boundaries.  Both monotone accumulators are carried in
    state and re-seed the chunked scan each batch."""
    return _streaming_flow_bars(
        stream, threshold=threshold, mode=mode, state_ttl=state_ttl, kind="run"
    )


def streaming_range_bars(
    stream: DataFrame,
    *,
    range_size: float,
    state_ttl: str | None = "3d",
) -> DataFrame:
    """Stateful range bars (price clock) over a stream: a bar closes on
    the first trade at least ``range_size`` away from its open price.
    The open bar's opening price is carried in state and re-seeds the
    chunked scan each micro-batch, so a replayed stream emits exactly
    the batch ``range_bars`` output."""
    return _streaming_flow_bars(
        stream, threshold=range_size, mode="tick", state_ttl=state_ttl, kind="range"
    )
