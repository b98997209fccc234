"""Streaming implementation shortfall — the live execution monitor.

The batch operator (operators/execution.py::implementation_shortfall)
carves parent orders as consecutive ``trades_per_parent``-fill runs per
symbol and reports each parent's arrival-price shortfall.  Every one of
its per-parent statistics is a function of O(1) running state: the
symbol's global fill counter (which determines the parent id and side),
and the OPEN parent's arrival price, running price*size / size sums and
last price.  This stateful twin carries exactly that state with
``applyInPandasWithState`` and emits each parent's row ONCE, the moment
its final fill arrives — closed orders stream to the dashboard while
the working order stays pending (append-mode semantics; the trailing
partial parent is intentionally unemitted, matching a desk's
closed-order blotter).

In-order-arrival contract (same as ``streaming_hampel``): rows must
arrive in event-time order ACROSS micro-batches per symbol; rows within
a batch are sorted by ``(ts, seq)`` before processing.  Under that
contract the emitted rows equal the batch operator's COMPLETE parents
bit-for-bit in the integer columns and to float-addition associativity
in the folds (cumsum replays the batch window's sequential fold order,
so in practice exactly).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_implementation_shortfall"]


def streaming_implementation_shortfall(
    stream: DataFrame,
    *,
    trades_per_parent: int = 50,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
    size_col: str = "size",
    seq_col: str = "seq",
) -> DataFrame:
    """Per-parent-order shortfall rows, emitted as each parent closes.

    Output columns mirror the batch operator: ``symbol, parent_id,
    side, n_fills, qty, arrival_price, fill_vwap, shortfall_bps,
    market_move_bps`` (``n_fills`` always equals ``trades_per_parent``
    here — only complete parents emit).
    """
    if trades_per_parent < 1:
        raise ValueError(
            f"trades_per_parent must be >= 1, got {trades_per_parent}"
        )
    tpp = int(trades_per_parent)

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField("parent_id", T.LongType()),
            T.StructField("side", T.IntegerType()),
            T.StructField("n_fills", T.IntegerType()),
            T.StructField("qty", T.LongType()),
            T.StructField("arrival_price", T.DoubleType()),
            T.StructField("fill_vwap", T.DoubleType()),
            T.StructField("shortfall_bps", T.DoubleType()),
            T.StructField("market_move_bps", T.DoubleType()),
        ]
    )
    # rn: total fills seen; (spv, sv, arrival): the OPEN parent's
    # accumulators (meaningful only when rn % tpp != 0).
    state_schema = T.StructType(
        [
            T.StructField("rn", T.LongType()),
            T.StructField("spv", T.DoubleType()),
            T.StructField("sv", T.DoubleType()),
            T.StructField("arrival", T.DoubleType()),
        ]
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout
            state.remove()
            return
        (sym,) = key
        rn, spv, sv, arrival = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0)
        )

        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        order = [ts_col] + ([seq_col] if seq_col in batches[0].columns else [])
        batch = pd.concat(batches).sort_values(order).reset_index(drop=True)
        batch = batch[batch[price_col].notna()].reset_index(drop=True)
        if len(batch) == 0:
            return
        p = batch[price_col].to_numpy(dtype=np.float64)
        s = batch[size_col].to_numpy(dtype=np.float64)

        out = []
        i = 0
        n = len(p)
        while i < n:
            fills_open = rn % tpp
            take = min(tpp - fills_open, n - i)
            seg_p = p[i : i + take]
            seg_s = s[i : i + take]
            if fills_open == 0:
                arrival, spv, sv = float(seg_p[0]), 0.0, 0.0
            # sequential fold order == the batch window's running sum
            for j in range(take):
                spv += float(seg_s[j]) * float(seg_p[j])
                sv += float(seg_s[j])
            rn += take
            i += take
            if rn % tpp == 0:  # parent closed on this row
                pid = rn // tpp - 1
                side = 1 if pid % 2 == 0 else -1
                vwap = spv / sv
                last_px = float(seg_p[-1])
                out.append(
                    {
                        symbol_col: sym,
                        "parent_id": pid,
                        "side": side,
                        "n_fills": tpp,
                        "qty": int(sv),
                        "arrival_price": arrival,
                        "fill_vwap": vwap,
                        "shortfall_bps": side * 1e4 * (vwap - arrival) / arrival,
                        "market_move_bps": side
                        * 1e4
                        * (last_px - arrival)
                        / arrival,
                    }
                )
        state.update((rn, spv, sv, arrival))
        if out:
            yield pd.DataFrame(out)

    return stream.groupBy(symbol_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
