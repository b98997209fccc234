"""Streaming ulcer index / drawdown monitor.

The batch operator (operators/backtest.py::ulcer_index) is a drawdown
path plus ordered running folds — O(1) state per symbol: the last
close, the cumulative log return, the running peak, the running sum of
squared fractional drawdowns, the return sum and count.  This stateful
twin carries exactly that state and emits, per micro-batch per symbol,
the same row the batch operator produces on the stream's full prefix —
the live "how deep and how long underwater" risk feed next to
``streaming_backtest_stats``.

Rows within a micro-batch are processed in event-time order; bound
lateness upstream with a watermark if exact batch replay matters (the
streaming/cusum.py contract).
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_ulcer"]


def streaming_ulcer(
    stream: DataFrame,
    *,
    periods_per_year: float,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    close_col: str = "price",
) -> DataFrame:
    """Running per-symbol ulcer index, Martin ratio and current
    drawdown over a price stream (update mode, one row per symbol per
    micro-batch); a replayed stream's final row equals the batch
    ``ulcer_index`` output, plus the live ``cur_drawdown`` the batch
    summary does not carry.
    """
    if periods_per_year <= 0:
        raise ValueError(f"periods_per_year must be > 0, got {periods_per_year}")
    ppy = float(periods_per_year)

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField("n_periods", T.LongType()),
            T.StructField("ann_return", T.DoubleType()),
            T.StructField("ulcer", T.DoubleType()),
            T.StructField("martin", T.DoubleType()),
            T.StructField("cur_drawdown", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_close", T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("s1", T.DoubleType()),
            T.StructField("cum", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
            T.StructField("sdd2", T.DoubleType()),
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
            last_close, n, s1, cum, peak, sdd2, seeded = state.get
        else:
            last_close, n, s1, cum, peak, sdd2, seeded = 0.0, 0, 0.0, 0.0, 0.0, 0.0, False

        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        batch = pd.concat(batches).sort_values([ts_col]).reset_index(drop=True)
        batch = batch[batch[close_col].notna() & (batch[close_col] > 0)]
        if len(batch) == 0:
            return
        p = batch[close_col].to_numpy(dtype=np.float64)
        if seeded:
            prev = np.concatenate(([last_close], p[:-1]))
            cur = p
        else:
            prev = p[:-1]
            cur = p[1:]
        r = np.log(cur / prev)
        last_close, seeded = float(p[-1]), True

        # sequential fold mirrors the batch operator's ordered running
        # sums and the running peak recurrence
        for x in r:
            s1 += x
            cum += x
            peak = max(peak, cum, 0.0)
            ddf = 1.0 - math.exp(cum - peak)
            sdd2 += ddf * ddf
        n += len(r)

        state.update((last_close, n, s1, cum, peak, sdd2, seeded))

        ok = n >= 2
        mu_ann = s1 / n * ppy if ok else None
        ulcer = math.sqrt(sdd2 / n) if ok else None
        martin = mu_ann / ulcer if ok and ulcer and ulcer > 0 else None
        cur_dd = 1.0 - math.exp(cum - peak) if n >= 1 else None
        yield pd.DataFrame(
            {
                symbol_col: [sym],
                "n_periods": [n],
                "ann_return": [mu_ann],
                "ulcer": [ulcer],
                "martin": [martin],
                "cur_drawdown": [cur_dd],
            }
        )

    return stream.groupBy(symbol_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
