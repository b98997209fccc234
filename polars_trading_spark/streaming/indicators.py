"""Streaming ATR and MACD.

Stateful twins of ``operators/indicators.py``: each EWM mean is the
same segment-renormalized closed form the batch operator computes, so
the per-symbol state per fold is O(1) — the global row count plus the
last ``_CARRIED + 1`` chunk totals (older chunks carry relative weight
below e^-96, invisible in double).  Within a micro-batch the recursion
is vectorized exactly like streaming/rsi.py: global row indices from
the carried count, per-chunk inclusive cumulative sums seeded from the
carried open-chunk total, damped carry from the merged chunk-total
maps.  The weight normalizer needs no data: B_t = (1-d^(t+1))/(1-d).

MACD cascades three folds; the signal fold consumes the MACD line
computed in the same batch, so a replayed stream's rows equal the batch
operator over the full tape to float-fold tolerance (~1e-9 relative,
the streaming/moments.py contract).  ATR carries the previous close to
extend the true-range series across micro-batch boundaries.

Late rows arriving after newer events are processed in arrival order —
bound lateness upstream with a watermark if exact batch replay matters
(the streaming/cusum.py contract).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from polars_trading_spark.operators.indicators import _chunk_len

__all__ = ["streaming_atr", "streaming_macd"]

_CARRIED = 2


class _EwmFold:
    """One segment-renormalized EWM mean, resumable across batches."""

    def __init__(self, alpha: float):
        self.d = 1.0 - alpha
        self.r = 1.0 / self.d
        self.L = _chunk_len(self.d)
        self.damp = [self.d ** (l * self.L) for l in range(1, _CARRIED + 1)]

    def run(
        self, x: np.ndarray, n0: int, ks: list, tots: list
    ) -> tuple[np.ndarray, list, list]:
        """EWM means for ``x`` at global rows n0..n0+len(x)-1; returns
        (means, new_ks, new_tots) with the chunk-total state advanced."""
        tmap = dict(zip(ks, tots))
        t = n0 + np.arange(len(x), dtype=np.int64)
        k = t // self.L
        j = (t - k * self.L).astype(np.float64)
        rj = self.r**j
        w = rj * x
        cs = pd.Series(w).groupby(k).cumsum().to_numpy()
        if tmap:
            newest = max(tmap)
            cs = cs + np.where(k == newest, tmap[newest], 0.0)
        merged = dict(tmap)
        for kk, tot in pd.Series(w).groupby(k).sum().items():
            merged[int(kk)] = merged.get(int(kk), 0.0) + float(tot)
        carry = np.zeros_like(cs)
        for l, dmp in enumerate(self.damp, start=1):
            carry += np.array([merged.get(int(kk) - l, 0.0) for kk in k]) * dmp
        s = self.d**j * (cs + carry)
        b = (1.0 - self.d ** (t + 1).astype(np.float64)) / (1.0 - self.d)
        keep = sorted(merged, reverse=True)[: _CARRIED + 1]
        return s / b, [int(x_) for x_ in keep], [float(merged[x_]) for x_ in keep]


def _common(ttl: str | None):
    from polars_trading_spark._utils import parse_duration

    ttl_ms = parse_duration(ttl)[0] // 1000 if ttl is not None else None
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return ttl_ms, timeout


def streaming_atr(
    stream: DataFrame,
    *,
    period: int = 14,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-bar streaming ATR over an OHLC bar stream: emits
    ``(symbol, ts, seq, tr, atr, natr)`` per event, equal to the batch
    operator over the concatenated stream (float-fold tolerance)."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    fold = _EwmFold(1.0 / period)
    ttl_ms, timeout = _common(state_ttl)

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("tr", T.DoubleType()),
            T.StructField("atr", T.DoubleType()),
            T.StructField("natr", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_close", T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("ks", T.ArrayType(T.LongType())),
            T.StructField("tots", T.ArrayType(T.DoubleType())),
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
            last_close, n, ks, tots, seeded = state.get
            ks, tots = list(ks), list(tots)
        else:
            last_close, n, ks, tots, seeded = 0.0, 0, [], [], False
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches).sort_values([ts_col, seq_col]).reset_index(drop=True)
        )
        hi = batch["high"].to_numpy(dtype=np.float64)
        lo = batch["low"].to_numpy(dtype=np.float64)
        cl = batch["close"].to_numpy(dtype=np.float64)
        pc = np.concatenate(([last_close if seeded else np.nan], cl[:-1]))
        tr = np.where(
            np.isnan(pc),
            hi - lo,
            np.maximum(hi - lo, np.maximum(np.abs(hi - pc), np.abs(lo - pc))),
        )
        atr, ks, tots = fold.run(tr, n, ks, tots)
        state.update((float(cl[-1]), int(n + len(tr)), ks, tots, True))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = batch[[ts_col, seq_col]].copy()
        out.insert(0, symbol_col, sym)
        out["tr"] = tr
        out["atr"] = atr
        out["natr"] = 100.0 * atr / cl
        yield out

    return stream.groupBy(F.col(symbol_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_macd(
    stream: DataFrame,
    *,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    close_col: str = "close",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-event streaming MACD: emits ``(symbol, ts, seq, macd,
    macd_signal, macd_hist)``, equal to the batch operator over the
    concatenated stream (float-fold tolerance).  Three resumable EWM
    folds; the signal fold consumes the in-batch MACD line."""
    if not (1 < fast < slow):
        raise ValueError(f"need 1 < fast < slow, got fast={fast} slow={slow}")
    if signal < 1:
        raise ValueError(f"signal must be >= 1, got {signal}")
    folds = {
        "f": _EwmFold(2.0 / (fast + 1)),
        "s": _EwmFold(2.0 / (slow + 1)),
        "g": _EwmFold(2.0 / (signal + 1)),
    }
    ttl_ms, timeout = _common(state_ttl)

    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("macd", T.DoubleType()),
            T.StructField("macd_signal", T.DoubleType()),
            T.StructField("macd_hist", T.DoubleType()),
        ]
    )
    fields = [T.StructField("n", T.LongType())]
    for tag in ("f", "s", "g"):
        fields.append(T.StructField(f"ks_{tag}", T.ArrayType(T.LongType())))
        fields.append(T.StructField(f"tots_{tag}", T.ArrayType(T.DoubleType())))
    state_schema = T.StructType(fields)

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (sym,) = key
        if state.exists:
            n, kf, tf, ks_, ts_, kg, tg = state.get
            st = {"f": (list(kf), list(tf)), "s": (list(ks_), list(ts_)), "g": (list(kg), list(tg))}
        else:
            n = 0
            st = {t: ([], []) for t in ("f", "s", "g")}
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches).sort_values([ts_col, seq_col]).reset_index(drop=True)
        )
        cl = batch[close_col].to_numpy(dtype=np.float64)
        ema_f, kf2, tf2 = folds["f"].run(cl, n, *st["f"])
        ema_s, ks2, ts2 = folds["s"].run(cl, n, *st["s"])
        line = ema_f - ema_s
        sig, kg2, tg2 = folds["g"].run(line, n, *st["g"])
        state.update((int(n + len(cl)), kf2, tf2, ks2, ts2, kg2, tg2))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = batch[[ts_col, seq_col]].copy()
        out.insert(0, symbol_col, sym)
        out["macd"] = line
        out["macd_signal"] = sig
        out["macd_hist"] = line - sig
        yield out

    return stream.groupBy(F.col(symbol_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
