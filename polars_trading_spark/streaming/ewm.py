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


def _std_from(w1: float, w2: float, s: float) -> float | None:
    denom = w1 * w1 - w2
    if denom <= 0:
        return None
    var = (s / w1) * (w1 * w1 / denom)
    return math.sqrt(var) if var > 0 else 0.0


def ewm_step(state: tuple[float, float, float, float], x: float, alpha: float):
    """One West-update: state = (W1, W2, mean, S) → new state + std."""
    w1, w2, m, s = state
    decay = 1.0 - alpha
    w1n = decay * w1 + 1.0
    w2n = decay * decay * w2 + 1.0
    d = x - m
    mn = m + d / w1n
    sn = decay * s + d * (x - mn)
    return (w1n, w2n, mn, sn), _std_from(w1n, w2n, sn)


def ewm_skip(state: tuple[float, float, float, float], alpha: float):
    """Advance past a null observation with pandas ``ignore_na=False``
    semantics: existing observations' weights decay relative to future
    ones (W1·=1−α, W2·=(1−α)², S·=1−α), the mean is unchanged — and so
    is the std, since the decay factors cancel in the bias-corrected
    variance.  This keeps the stream bit-aligned with the batch pandas
    path (``ewm(span).std()``) on series containing interior nulls."""
    w1, w2, m, s = state
    decay = 1.0 - alpha
    return (decay * w1, decay * decay * w2, m, decay * s)


def streaming_ewm_std(
    stream: DataFrame,
    value_col: str,
    span: int,
    *,
    output_col: str = "ewm_std",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-symbol streaming EWM std of ``value_col``.

    Emits one row per input row with the running std (null until two
    observations).  Null values decay the weight accumulators without
    contributing an observation (pandas ``ignore_na=False``, matching
    the batch ``operators/ewm.py`` pandas path value-for-value) and
    emit the unchanged running std.

    ``state_ttl`` (Polars duration string) optionally expires idle
    per-symbol state on a processing-time timeout — EWM state is four
    numbers, so the default keeps it forever; set a TTL when symbol
    cardinality is unbounded.
    """
    from polars_trading_spark._utils import parse_duration

    ts, symbol = column_names.timestamp, column_names.symbol
    alpha = 2.0 / (span + 1.0)
    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None

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
        if state.hasTimedOut:
            state.remove()
            return
        (sym,) = key
        w1, w2, m, s, n = state.get if state.exists else (0.0, 0.0, 0.0, 0.0, 0)
        batches = list(pdfs)
        if not batches:
            return
        batch = pd.concat(batches).sort_values([ts]).reset_index(drop=True)
        stds = []
        for x in batch[value_col]:
            if x is None or (isinstance(x, float) and math.isnan(x)):
                (w1, w2, m, s) = ewm_skip((w1, w2, m, s), alpha)
                stds.append(_std_from(w1, w2, s) if n > 1 else None)
                continue
            (w1, w2, m, s), std = ewm_step((w1, w2, m, s), float(x), alpha)
            n += 1
            stds.append(std if n > 1 else None)
        state.update((w1, w2, m, s, n))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = batch[[ts, value_col]].copy()
        out[output_col] = pd.array(stds, dtype="float64")
        out.insert(0, symbol, sym)
        yield out

    return stream.groupBy(F.col(symbol)).applyInPandasWithState(
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
