"""Streaming ATR, MACD, OBV, stochastic, Bollinger, Donchian and session VWAP.

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

__all__ = ["streaming_atr", "streaming_macd", "streaming_obv", "streaming_stochastic", "streaming_bollinger", "streaming_session_vwap", "streaming_donchian"]

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


def streaming_obv(
    stream: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-bar streaming on-balance volume: emits ``(symbol, ts, seq,
    obv)`` per event, EXACTLY equal to the batch operator over the
    concatenated stream — the fold is an integer sum, so there is no
    float tolerance at all.  State: last close + running OBV."""
    ttl_ms, timeout = _common(state_ttl)
    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("obv", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_close", T.DoubleType()),
            T.StructField("obv", T.LongType()),
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
        last_close, run, seeded = state.get if state.exists else (0.0, 0, False)
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches).sort_values([ts_col, seq_col]).reset_index(drop=True)
        )
        cl = batch["close"].to_numpy(dtype=np.float64)
        # null volume contributes 0, matching the batch obv's coalesce —
        # a raw to_numpy(int64) would raise on NaN and kill the query.
        vol = batch["volume"].fillna(0).to_numpy(dtype=np.int64)
        pc = np.concatenate(([last_close if seeded else np.nan], cl[:-1]))
        sv = np.where(np.isnan(pc), 0, np.where(cl > pc, vol, np.where(cl < pc, -vol, 0)))
        obv_out = run + np.cumsum(sv)
        state.update((float(cl[-1]), int(obv_out[-1]), True))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = batch[[ts_col, seq_col]].copy()
        out.insert(0, symbol_col, sym)
        out["obv"] = obv_out.astype(np.int64)
        yield out

    return stream.groupBy(F.col(symbol_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_stochastic(
    stream: DataFrame,
    *,
    k_window: int = 14,
    d_window: int = 3,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-bar streaming stochastic oscillator: emits ``(symbol, ts,
    seq, pct_k, pct_d)`` per event, equal to the batch operator over the
    concatenated stream.  State: rings of the last ``k_window - 1``
    (high, low) pairs and the last ``d_window - 1`` %K values (None for
    pre-window/degenerate rows, so the %D full-window gate replays
    exactly), plus the total bar count."""
    if k_window < 2:
        raise ValueError(f"k_window must be >= 2, got {k_window}")
    if d_window < 1:
        raise ValueError(f"d_window must be >= 1, got {d_window}")
    ttl_ms, timeout = _common(state_ttl)
    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("pct_k", T.DoubleType()),
            T.StructField("pct_d", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("highs", T.ArrayType(T.DoubleType())),
            T.StructField("lows", T.ArrayType(T.DoubleType())),
            # NaN encodes a null %K in the ring (arrays can't hold None
            # reliably through the state pickler round-trip)
            T.StructField("ks", T.ArrayType(T.DoubleType())),
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
            n, highs, lows, ks = state.get
            highs, lows, ks = list(highs), list(lows), list(ks)
        else:
            n, highs, lows, ks = 0, [], [], []
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches).sort_values([ts_col, seq_col]).reset_index(drop=True)
        )
        hi = batch["high"].to_numpy(dtype=np.float64)
        lo = batch["low"].to_numpy(dtype=np.float64)
        cl = batch["close"].to_numpy(dtype=np.float64)

        pct_k_out, pct_d_out = [], []
        for i in range(len(batch)):
            highs.append(float(hi[i]))
            lows.append(float(lo[i]))
            n += 1
            if len(highs) > k_window:
                highs.pop(0)
                lows.pop(0)
            if n >= k_window:
                hh, ll = max(highs), min(lows)
                # plain float: numpy scalars break the state pickler
                k_val = (
                    float(100.0 * (float(cl[i]) - ll) / (hh - ll))
                    if hh > ll
                    else float("nan")
                )
            else:
                k_val = float("nan")
            ks.append(k_val)
            if len(ks) > d_window:
                ks.pop(0)
            window_ks = ks[-d_window:]
            if len(window_ks) == d_window and not any(np.isnan(window_ks)):
                d_val = float(np.mean(window_ks))
            else:
                d_val = float("nan")
            pct_k_out.append(None if np.isnan(k_val) else float(k_val))
            pct_d_out.append(None if np.isnan(d_val) else d_val)

        state.update((int(n), highs[-(k_window - 1):] if k_window > 1 else [],
                      lows[-(k_window - 1):] if k_window > 1 else [],
                      ks[-max(d_window - 1, 0):] if d_window > 1 else []))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = batch[[ts_col, seq_col]].copy()
        out.insert(0, symbol_col, sym)
        out["pct_k"] = pct_k_out
        out["pct_d"] = pct_d_out
        yield out

    return stream.groupBy(F.col(symbol_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_bollinger(
    stream: DataFrame,
    *,
    window: int = 20,
    num_std: float = 2.0,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    close_col: str = "close",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-bar streaming Bollinger bands: emits ``(symbol, ts, seq,
    bb_mid, bb_upper, bb_lower, pct_b, bb_bandwidth)`` per event, equal
    to the batch operator over the concatenated stream.  State: a ring
    of the last ``window - 1`` closes plus the bar count; each emitted
    row recomputes the window mean / sample std from the ring — O(w)
    per row, matching the batch operator's per-row frame aggregate
    bit-for-bit up to float-fold order (~1e-9 relative)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    ttl_ms, timeout = _common(state_ttl)
    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("bb_mid", T.DoubleType()),
            T.StructField("bb_upper", T.DoubleType()),
            T.StructField("bb_lower", T.DoubleType()),
            T.StructField("pct_b", T.DoubleType()),
            T.StructField("bb_bandwidth", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("ring", T.ArrayType(T.DoubleType())),
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
            n, ring = state.get
            ring = list(ring)
        else:
            n, ring = 0, []
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches).sort_values([ts_col, seq_col]).reset_index(drop=True)
        )
        cl = batch[close_col].to_numpy(dtype=np.float64)
        cols = {c: [] for c in ("bb_mid", "bb_upper", "bb_lower", "pct_b", "bb_bandwidth")}
        for i in range(len(batch)):
            ring.append(float(cl[i]))
            n += 1
            if len(ring) > window:
                ring.pop(0)
            if len(ring) == window:
                arr = np.asarray(ring)
                mid = float(arr.mean())
                sd = float(arr.std(ddof=1))
                up, lo_ = mid + num_std * sd, mid - num_std * sd
                width = up - lo_
                cols["bb_mid"].append(mid)
                cols["bb_upper"].append(up)
                cols["bb_lower"].append(lo_)
                cols["pct_b"].append(
                    (float(cl[i]) - lo_) / width if width > 0 else None
                )
                cols["bb_bandwidth"].append(width / mid if mid != 0 else None)
            else:
                for c in cols:
                    cols[c].append(None)
        state.update((int(n), ring[-(window - 1):]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = batch[[ts_col, seq_col]].copy()
        out.insert(0, symbol_col, sym)
        for c, v in cols.items():
            out[c] = v
        yield out

    return stream.groupBy(F.col(symbol_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_session_vwap(
    stream: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
    size_col: str = "size",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-trade streaming session VWAP: emits ``(symbol, ts, seq,
    session_day, cum_volume, session_vwap)`` per event, equal to the
    batch operator over the concatenated stream.  State per symbol is
    O(1): the open session day and its two running sums; the sums reset
    when the UTC day rolls, whether the roll lands inside a micro-batch
    or between batches.  The price·size fold is (ts, seq)-ordered like
    the batch fold, and the volume fold is integer-exact."""
    ttl_ms, timeout = _common(state_ttl)
    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("session_day", T.DateType()),
            T.StructField("cum_volume", T.LongType()),
            T.StructField("session_vwap", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("day_us", T.LongType()),
            T.StructField("pv", T.DoubleType()),
            T.StructField("v", T.LongType()),
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
        day_us, pv0, v0, seeded = state.get if state.exists else (0, 0.0, 0, False)
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches).sort_values([ts_col, seq_col]).reset_index(drop=True)
        )
        day = batch[ts_col].dt.floor("D")
        px = batch[price_col].to_numpy(dtype=np.float64)
        # null sizes contribute 0 (the batch operator's sum ignores
        # nulls); raw to_numpy(int64) would raise on NaN.
        sz = batch[size_col].fillna(0).to_numpy(dtype=np.int64)
        pv = pd.Series(px * sz).groupby(day.values).cumsum().to_numpy()
        v = pd.Series(sz).groupby(day.values).cumsum().to_numpy()
        day_us_arr = (day.astype("int64") // 1000).to_numpy()  # ns -> us
        if seeded:
            same = day_us_arr == day_us
            pv = pv + np.where(same, pv0, 0.0)
            v = v + np.where(same, v0, 0)
        state.update((int(day_us_arr[-1]), float(pv[-1]), int(v[-1]), True))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = batch[[ts_col, seq_col]].copy()
        out.insert(0, symbol_col, sym)
        out["session_day"] = day.dt.date
        out["cum_volume"] = v.astype(np.int64)
        # zero cumulative volume -> null, matching the batch operator's
        # Spark division semantics (x / 0 -> null, not inf/NaN).  The
        # Float64 extension dtype maps NaN -> NA -> Arrow null.
        out["session_vwap"] = pd.Series(
            np.where(v > 0, pv / np.maximum(v, 1), np.nan)
        ).astype("Float64")
        yield out

    return stream.groupBy(F.col(symbol_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_donchian(
    stream: DataFrame,
    *,
    window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-bar streaming Donchian channel: emits ``(symbol, ts, seq,
    dc_upper, dc_lower, dc_mid, breakout_up, breakout_down)`` per
    event, equal to the batch operator over the concatenated stream.
    State: rings of the last ``window`` highs/lows plus the previous
    bar's channel (for the turtle breakout comparison) and the bar
    count."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    ttl_ms, timeout = _common(state_ttl)
    out_schema = T.StructType(
        [
            T.StructField(symbol_col, T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("dc_upper", T.DoubleType()),
            T.StructField("dc_lower", T.DoubleType()),
            T.StructField("dc_mid", T.DoubleType()),
            T.StructField("breakout_up", T.BooleanType()),
            T.StructField("breakout_down", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("highs", T.ArrayType(T.DoubleType())),
            T.StructField("lows", T.ArrayType(T.DoubleType())),
            # NaN encodes "previous channel undefined"
            T.StructField("prev_u", T.DoubleType()),
            T.StructField("prev_l", T.DoubleType()),
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
            n, highs, lows, prev_u, prev_l = state.get
            highs, lows = list(highs), list(lows)
        else:
            n, highs, lows = 0, [], []
            prev_u = prev_l = float("nan")
        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        batch = (
            pd.concat(batches).sort_values([ts_col, seq_col]).reset_index(drop=True)
        )
        hi = batch["high"].to_numpy(dtype=np.float64)
        lo = batch["low"].to_numpy(dtype=np.float64)
        cl = batch["close"].to_numpy(dtype=np.float64)
        cols = {c: [] for c in ("dc_upper", "dc_lower", "dc_mid", "breakout_up", "breakout_down")}
        for i in range(len(batch)):
            cols["breakout_up"].append(
                bool(not np.isnan(prev_u) and cl[i] > prev_u)
            )
            cols["breakout_down"].append(
                bool(not np.isnan(prev_l) and cl[i] < prev_l)
            )
            highs.append(float(hi[i]))
            lows.append(float(lo[i]))
            n += 1
            if len(highs) > window:
                highs.pop(0)
                lows.pop(0)
            if n >= window:
                u, l_ = max(highs), min(lows)
                cols["dc_upper"].append(u)
                cols["dc_lower"].append(l_)
                cols["dc_mid"].append((u + l_) / 2.0)
                prev_u, prev_l = u, l_
            else:
                for c in ("dc_upper", "dc_lower", "dc_mid"):
                    cols[c].append(None)
                prev_u = prev_l = float("nan")
        state.update((int(n), highs, lows, float(prev_u), float(prev_l)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        out = batch[[ts_col, seq_col]].copy()
        out.insert(0, symbol_col, sym)
        for c, v in cols.items():
            out[c] = v
        yield out

    return stream.groupBy(F.col(symbol_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )
