"""Streaming exponentially-weighted std via O(1) per-group state.

The batch engine computes EWM either exactly in pandas or closed-form
with cumulative sums (operators/ewm.py); neither survives an unbounded
stream (the closed form overflows r^t, pandas needs the whole series).
The streaming form carries West's incremental weighted-variance
accumulators — four numbers per group:

    W1' = (1-α)·W1 + 1            (sum of weights)
    W2' = (1-α)²·W2 + 1           (sum of squared weights)
    d   = x − m
    m'  = m + d / W1'             (weighted mean)
    S'  = (1-α)·S + (1-α)·W1·d·(x − m') · …  — equivalently
    S'  = (1-α)·S + d·(x − m')    (weighted Σ w(x-m)²)

    var = S/W1 · W1²/(W1² − W2)   (bias-corrected, pandas adjust=True)

matching ``pandas.Series.ewm(span).std()`` value-for-value (verified in
tests), with state that never grows — the only formulation that works
at unbounded stream length.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from polars_trading_spark.config import column_names

__all__ = ["streaming_ewm_std", "ewm_step"]


def ewm_step(state: tuple[float, float, float, float], x: float, alpha: float):
    """One West-update: state = (W1, W2, mean, S) → new state + std."""
    w1, w2, m, s = state
    decay = 1.0 - alpha
    w1n = decay * w1 + 1.0
    w2n = decay * decay * w2 + 1.0
    d = x - m
    mn = m + d / w1n
    sn = decay * s + d * (x - mn)
    denom = w1n * w1n - w2n
    if denom <= 0:
        std = None
    else:
        var = (sn / w1n) * (w1n * w1n / denom)
        std = math.sqrt(var) if var > 0 else 0.0
    return (w1n, w2n, mn, sn), std


def streaming_ewm_std(
    stream: DataFrame,
    value_col: str,
    span: int,
    *,
    output_col: str = "ewm_std",
) -> DataFrame:
    """Per-symbol streaming EWM std of ``value_col``.

    Emits one row per input row with the running std (null until two
    observations).  Null values pass through with null std and do not
    advance the weights (pandas ignore-leading-NaN behavior).
    """
    ts, symbol = column_names.timestamp, column_names.symbol
    alpha = 2.0 / (span + 1.0)

    out_schema = T.StructType(
        [
            T.StructField(symbol, T.StringType()),
            T.StructField(ts, T.TimestampType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField(output_col, T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("w1", T.DoubleType()),
            T.StructField("w2", T.DoubleType()),
            T.StructField("m", T.DoubleType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (sym,) = key
        w1, w2, m, s, n = state.get if state.exists else (0.0, 0.0, 0.0, 0.0, 0)
        batches = list(pdfs)
        if not batches:
            return
        batch = pd.concat(batches).sort_values([ts]).reset_index(drop=True)
        stds = []
        for x in batch[value_col]:
            if x is None or (isinstance(x, float) and math.isnan(x)):
                stds.append(None)
                continue
            (w1, w2, m, s), std = ewm_step((w1, w2, m, s), float(x), alpha)
            n += 1
            stds.append(std if n > 1 else None)
        state.update((w1, w2, m, s, n))
        out = batch[[ts, value_col]].copy()
        out[output_col] = pd.array(stds, dtype="float64")
        out.insert(0, symbol, sym)
        yield out

    return stream.groupBy(F.col(symbol)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
