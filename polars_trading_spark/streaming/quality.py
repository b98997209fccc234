"""Streaming data-quality operators: the Hampel tick scrubber.

A centered filter has an inherent lookahead: row i needs the h rows
AFTER it before its window is complete, so the streaming twin emits
each row once h successors have arrived (an h-row emission lag — the
price of a two-sided window on an unbounded tape).  Rows emitted equal
the batch operator exactly; the last h rows of the tape stay pending
until more data lands.

State per symbol is O(window): the 2h most recent rows (the h pending
rows plus the h-row left context their future windows need) and the
total row count.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from polars_trading_spark.streaming.indicators import _common

__all__ = ["streaming_hampel"]


def streaming_hampel(
    stream: DataFrame,
    *,
    window: int = 21,
    k: float = 3.0,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    seq_col: str = "seq",
    price_col: str = "price",
    state_ttl: str | None = None,
) -> DataFrame:
    """Streaming Hampel outlier filter: emits ``(symbol, ts, seq, price,
    rolling_median, rolling_mad, is_outlier, price_clean)`` for every
    row whose centered ``window`` is complete ON THE RIGHT (h rows of
    lookahead have arrived) — identical to the batch
    ``operators/data_quality.py::hampel_filter`` row set minus the
    tape's final h rows, which remain pending.  The MAD is the
    CANONICAL estimator (median of deviations from the center window's
    median), matching the batch operator bit-for-bit: medians of the
    same float sets, flag comparison rounded to 9.

    IN-ORDER ARRIVAL ASSUMPTION (same contract as the other streaming
    twins): rows within a micro-batch are sorted by ``(ts, seq)``, but
    rows are appended to the per-symbol buffer in MICRO-BATCH ARRIVAL
    order across batches — a row arriving in a later micro-batch with
    an earlier ``(ts, seq)`` than already-buffered state lands after
    it, and the windows around it diverge from the batch operator's.
    The bit-for-bit equality claim therefore requires per-symbol
    cross-batch in-order delivery (e.g. a source partitioned by symbol
    and ordered within partition); late/out-of-order ticks need an
    upstream reorder buffer."""
    if window < 3 or window % 2 == 0:
        raise ValueError(f"window must be an odd int >= 3, got {window}")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    h = window // 2
    scale = 1.4826 * float(k)
    ttl_ms, timeout = _common(state_ttl)

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField(price_col, T.DoubleType()),
            T.StructField("rolling_median", T.DoubleType()),
            T.StructField("rolling_mad", T.DoubleType()),
            T.StructField("is_outlier", T.BooleanType()),
            T.StructField("price_clean", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts_us", T.ArrayType(T.LongType())),
            T.StructField("seqs", T.ArrayType(T.LongType())),
            T.StructField("prices", T.ArrayType(T.DoubleType())),
            T.StructField("total", T.LongType()),
        ]
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        (sym,) = key
        ts_us, seqs, prices, total = (
            state.get if state.exists else ([], [], [], 0)
        )
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches).sort_values([ts_col, seq_col]).reset_index(drop=True)
        )
        ts_all = list(ts_us) + (batch[ts_col].astype("int64") // 1000).tolist()
        seq_all = list(seqs) + batch[seq_col].astype("int64").tolist()
        px_all = list(prices) + batch[price_col].astype(float).tolist()
        ring_start = total - len(ts_us)  # absolute index of ring[0]
        new_total = total + len(batch)

        emitted_through = max(0, total - h)  # rows [0, that) already out
        emit_hi = new_total - h  # exclusive
        rows = {c: [] for c in (
            "ts", "seq", "price", "med", "mad", "flag", "clean"
        )}
        px_arr = np.asarray(px_all)
        for i_abs in range(emitted_through, emit_hi):
            i = i_abs - ring_start
            lo = max(0, i - h)
            win = px_arr[lo : i + h + 1]
            price = px_all[i]
            if len(win) == window:
                med = float(np.median(win))
                mad = float(np.median(np.abs(win - med)))
                dev = abs(price - med)
                flag = bool(round(dev, 9) > round(scale * mad, 9))
                rows["med"].append(med)
                rows["mad"].append(mad)
                rows["flag"].append(flag)
                rows["clean"].append(med if flag else price)
            else:  # left-partial window: batch gates these to null
                rows["med"].append(None)
                rows["mad"].append(None)
                rows["flag"].append(False)
                rows["clean"].append(price)
            rows["ts"].append(ts_all[i])
            rows["seq"].append(seq_all[i])
            rows["price"].append(price)

        keep = min(2 * h, new_total)  # pending h + left context h
        state.update(
            (ts_all[-keep:], seq_all[-keep:], px_all[-keep:], new_total)
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if not rows["ts"]:
            return
        out = pd.DataFrame(
            {
                symbol_col: sym,
                ts_col: pd.to_datetime(pd.Series(rows["ts"]), unit="us"),
                seq_col: pd.Series(rows["seq"], dtype="int64"),
                price_col: pd.Series(rows["price"], dtype="float64"),
                "rolling_median": pd.Series(rows["med"], dtype="float64"),
                "rolling_mad": pd.Series(rows["mad"], dtype="float64"),
                "is_outlier": pd.Series(rows["flag"], dtype="bool"),
                "price_clean": pd.Series(rows["clean"], dtype="float64"),
            }
        )
        yield out

    return stream.groupBy(F.col(symbol_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
