"""Streaming backtest statistics.

The batch operator (operators/backtest.py) is two aggregates over a
window pass; every one of its statistics is a function of O(1)
running state per symbol — power sums of returns (n, s1..s4), up/non-
zero counters, the cumulative-return/peak pair, the minimum drawdown,
and the current/maximum underwater spell.  This stateful operator
carries exactly that state with ``applyInPandasWithState`` and emits,
once per micro-batch per symbol, the same row the batch operator would
produce on the stream's full prefix — so monitoring dashboards read
live Sharpe/PSR/drawdown without re-scanning history.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from polars_trading_spark.config import column_names

__all__ = ["streaming_backtest_stats"]


def streaming_backtest_stats(
    stream: DataFrame,
    *,
    periods_per_year: float,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    close_col: str = "price",
) -> DataFrame:
    """Running per-symbol performance statistics over a price stream.

    Emits one row per (symbol, micro-batch) in update mode with the
    batch operator's columns; rows within a batch are processed in
    event-time order and state carries across batches, so a replayed
    stream's final row equals the batch operator's output.
    """
    if periods_per_year <= 0:
        raise ValueError(f"periods_per_year must be > 0, got {periods_per_year}")

    ppy = float(periods_per_year)
    sqrt_ppy = math.sqrt(ppy)

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField("n_periods", T.LongType()),
            T.StructField("ann_return", T.DoubleType()),
            T.StructField("ann_vol", T.DoubleType()),
            T.StructField("sharpe", T.DoubleType()),
            T.StructField("psr_z", T.DoubleType()),
            T.StructField("skew", T.DoubleType()),
            T.StructField("kurtosis", T.DoubleType()),
            T.StructField("hit_ratio", T.DoubleType()),
            T.StructField("max_drawdown", T.DoubleType()),
            T.StructField("max_tuw", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s1", T.DoubleType()),
            T.StructField("s2", T.DoubleType()),
            T.StructField("s3", T.DoubleType()),
            T.StructField("s4", T.DoubleType()),
            T.StructField("n_up", T.LongType()),
            T.StructField("n_nz", T.LongType()),
            T.StructField("last_close", T.DoubleType()),
            T.StructField("cum", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
            T.StructField("min_dd", T.DoubleType()),
            T.StructField("max_tuw", T.LongType()),
            T.StructField("cur_under", T.LongType()),
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
            (n, s1, s2, s3, s4, n_up, n_nz, last_close, cum, peak, min_dd,
             max_tuw, cur_under, seeded) = state.get
        else:
            n, s1, s2, s3, s4, n_up, n_nz = 0, 0.0, 0.0, 0.0, 0.0, 0, 0
            last_close, cum, peak, min_dd = 0.0, 0.0, 0.0, 0.0
            max_tuw, cur_under, seeded = 0, 0, False

        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        batch = pd.concat(batches).sort_values([ts_col]).reset_index(drop=True)
        batch = batch[batch[close_col].notna()]
        if len(batch) == 0:
            return
        p = batch[close_col].to_numpy(dtype=np.float64)
        if not seeded:
            prev = p[:-1]
            cur = p[1:]
        else:
            prev = np.concatenate(([last_close], p[:-1]))
            cur = p
        r = np.log(cur / prev)
        last_close, seeded = float(p[-1]), True

        if len(r):
            n += len(r)
            s1 += float(r.sum())
            s2 += float((r * r).sum())
            s3 += float((r**3).sum())
            s4 += float((r**4).sum())
            n_up += int((r > 0).sum())
            n_nz += int((r != 0).sum())
            cums = cum + np.cumsum(r)
            peaks = np.maximum.accumulate(
                np.maximum(np.concatenate(([peak], np.maximum(cums, 0.0))), 0.0)
            )[1:]
            dd = cums - peaks
            min_dd = min(min_dd, float(dd.min()))
            cum, peak = float(cums[-1]), float(peaks[-1])
            highs = np.flatnonzero(dd >= 0)
            if len(highs) == 0:
                cur_under += len(r)
            else:
                # Rows before the first high extend the carried spell.
                max_tuw = max(max_tuw, cur_under + int(highs[0]))
                # Full spells between consecutive highs inside the batch.
                if len(highs) > 1:
                    max_tuw = max(max_tuw, int(np.max(np.diff(highs)) - 1))
                cur_under = len(r) - 1 - int(highs[-1])

        state.update((n, s1, s2, s3, s4, n_up, n_nz, last_close, cum, peak,
                      min_dd, max_tuw, cur_under, seeded))

        if n == 0:
            return
        mu = s1 / n
        m2 = s2 / n - mu * mu
        m3 = s3 / n - 3 * mu * s2 / n + 2 * mu**3
        m4 = s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n - 3 * mu**4
        var_s = (s2 - n * mu * mu) / (n - 1) if n > 1 else None
        sd = math.sqrt(var_s) if var_s and var_s > 0 else None
        sr = mu / sd if sd else None
        g3 = m3 / m2**1.5 if m2 > 0 else None
        g4 = m4 / (m2 * m2) if m2 > 0 else None
        psr_z = None
        if sr is not None and g3 is not None and n > 1:
            pv = 1 - g3 * sr + (g4 - 1) / 4 * sr * sr
            if pv > 0:
                psr_z = sr * math.sqrt(n - 1) / math.sqrt(pv)
        yield pd.DataFrame(
            [
                {
                    symbol_col: sym,
                    "n_periods": n,
                    "ann_return": mu * ppy,
                    "ann_vol": sd * sqrt_ppy if sd else None,
                    "sharpe": sr * sqrt_ppy if sr else None,
                    "psr_z": psr_z,
                    "skew": g3,
                    "kurtosis": g4,
                    "hit_ratio": n_up / n_nz if n_nz else None,
                    "max_drawdown": 1.0 - math.exp(min_dd),
                    "max_tuw": max(max_tuw, cur_under),
                }
            ]
        )

    return stream.groupBy(symbol_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
