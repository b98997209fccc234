"""Event sampling: the symmetric CUSUM filter (AFML 2.5.2.1).

The reference library's labeling pipeline assumes an event index; AFML
samples that index with a symmetric CUSUM filter over price changes —
emit an event when the running positive (negative) excursion exceeds a
threshold, then reset that side.  This completes the sampling → target →
barrier → label → weight chain around the reference's operators.

Semantics match the AFML snippet exactly, including its branch order::

    sPos, sNeg = max(0, sPos + d), min(0, sNeg + d)
    if   sNeg < -h: sNeg = 0; emit(-1)
    elif sPos >  h: sPos = 0; emit(+1)

Scale design: the scan is history-dependent (resets), so it runs as an
``applyInPandas`` island per symbol — the same containment contract as
``dollar_bars``.  Inside the island there is NO per-row Python loop:
between resets the recursion is a Lindley equation whose closed form is
``W_t = max(W_0 + C_t, C_t - min_{j<t} C_j, 0)`` (cumulative sums +
running extrema, all numpy-vectorized); the outer loop steps once per
*emitted event* (and once per 2048-row chunk), not once per trade.
Parallelism is per symbol — the partitioning axis tick data actually
has (SCALING.md §2) — and per-symbol state is two doubles, so the
island never materializes more than one Arrow batch of one symbol.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL
from polars_trading_spark.config import column_names

__all__ = ["cusum_filter"]

_CHUNK = 2048


def _cusum_scan(
    diffs: np.ndarray, h: float, spos: float = 0.0, sneg: float = 0.0
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Indices, sides (±1) and final (spos, sneg) of CUSUM events over a
    diff series, starting from carried state (streaming batches resume
    where the previous one left off).

    Chunked closed-form scan: O(n + events·chunk) numpy work total.
    Within a chunk the no-reset recursions are::

        P_t = max(spos + C_t, C_t - min_{0<=j<t} C_j, 0)   (C_0 = 0)
        N_t = min(sneg + C_t, C_t - max_{0<=j<t} C_j, 0)

    which agree with the sequential recursion because spos >= 0 >= sneg
    hold at every reset boundary.
    """
    n = diffs.size
    idx: list[int] = []
    side: list[int] = []
    i = 0
    while i < n:
        j = min(n, i + _CHUNK)
        c = np.cumsum(diffs[i:j])
        prefix = np.concatenate(([0.0], c))[:-1]
        run_min = np.minimum.accumulate(prefix)
        run_max = np.maximum.accumulate(prefix)
        pos = np.maximum(np.maximum(spos + c, c - run_min), 0.0)
        neg = np.minimum(np.minimum(sneg + c, c - run_max), 0.0)
        hit_neg = neg < -h
        hit = hit_neg | (pos > h)
        if not hit.any():
            spos, sneg = float(pos[-1]), float(neg[-1])
            i = j
            continue
        t = int(np.argmax(hit))
        if hit_neg[t]:  # AFML checks the negative side first
            side.append(-1)
            sneg, spos = 0.0, float(pos[t])
        else:
            side.append(1)
            spos, sneg = 0.0, float(neg[t])
        idx.append(i + t)
        i += t + 1
    return np.asarray(idx, dtype=np.int64), np.asarray(side, dtype=np.int32), spos, sneg


def cusum_filter(df: DataFrame, threshold: float) -> DataFrame:
    """Sampled event timestamps: (symbol?, timestamp, side).

    ``side`` is +1 when the positive excursion fired, -1 for the
    negative.  The first observation per symbol only seeds the filter
    (AFML iterates ``diff.index[1:]``); changes are raw price diffs.
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    ts, price, symbol = column_names.timestamp, column_names.price, column_names.symbol
    has_symbol = symbol in df.columns
    by = [symbol] if has_symbol else []
    order = [ts, SEQ_COL] if SEQ_COL in df.columns else [ts]

    cols = [*by, *order, price]
    slim = df.select(*dict.fromkeys(cols))
    schema = ", ".join(
        [f"`{c}` string" for c in by]
        + [f"`{ts}` timestamp", "side int"]
    )
    h = float(threshold)
    order_cols = list(order)
    price_col, ts_col = price, ts

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        p = pdf[price_col].to_numpy(dtype=np.float64)
        if p.size < 2:
            idx = np.empty(0, dtype=np.int64)
            side = np.empty(0, dtype=np.int32)
        else:
            idx, side, _, _ = _cusum_scan(np.diff(p), h)
        out = pdf.iloc[idx + 1][[*by, ts_col]].copy()  # diffs[k] → row k+1
        out["side"] = side
        return out

    grouped = slim.groupBy(*by) if by else slim.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(scan, schema=schema)
