"""Streaming return autocorrelation + Ljung-Box.

Stateful twin of ``operators/regime.py::return_acf``: the batch
operator is one per-symbol hash aggregate over a lag chain, so the
per-symbol streaming state is O(max lag): the last log close (to extend
the return series across micro-batches), a ring of the last ``max(lags)``
returns (so cross-boundary (r_t, r_{t-k}) pairs are formed exactly), the
running return count / sum / sum-of-squares, and per lag the four
partial sums (Σ r·r_lag, Σ r, Σ r_lag, pair count) the batch aggregate
keeps per lag.

Emits one row per (symbol, micro-batch) in update mode with the batch
operator's columns (``symbol, n_obs, acf_<k>..., ljung_box_q``); a
replayed stream's final row per symbol equals the batch operator over
the full tape (float sums associate differently than the batch hash
aggregate, so equality is to ~1e-9 relative, same contract as
streaming/moments.py).

Rows within a micro-batch are processed in (ts, seq) order; late rows
arriving after newer events are folded in arrival order — bound
lateness upstream with a watermark if exact batch replay matters (the
streaming/cusum.py contract).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_return_acf"]


def streaming_return_acf(
    stream: DataFrame,
    *,
    lags: tuple[int, ...] = (1, 2, 3, 5, 10),
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    close_col: str = "close",
    seq_col: str = "seq",
    state_ttl: str | None = None,
) -> DataFrame:
    """Running per-symbol return ACF at ``lags`` plus Ljung-Box Q."""
    if not lags or any(k < 1 for k in lags) or len(set(lags)) != len(lags):
        raise ValueError(f"lags must be distinct positive ints, got {lags}")
    from polars_trading_spark._utils import parse_duration

    lags = tuple(int(k) for k in lags)
    kmax = max(lags)
    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None

    out_fields = [
        T.StructField(symbol_col, T.StringType()),
        T.StructField("n_obs", T.LongType()),
    ]
    out_fields += [T.StructField(f"acf_{k}", T.DoubleType()) for k in lags]
    out_fields.append(T.StructField("ljung_box_q", T.DoubleType()))
    out_schema = T.StructType(out_fields)

    state_schema = T.StructType(
        [
            T.StructField("last_lp", T.DoubleType()),
            T.StructField("ring", T.ArrayType(T.DoubleType())),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("ss", T.DoubleType()),
            T.StructField("pk", T.ArrayType(T.DoubleType())),
            T.StructField("ak", T.ArrayType(T.DoubleType())),
            T.StructField("bk", T.ArrayType(T.DoubleType())),
            T.StructField("nk", T.ArrayType(T.LongType())),
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
            last_lp, ring, n, s, ss, pk, ak, bk, nk, seeded = state.get
            ring = list(ring)
            pk, ak, bk, nk = list(pk), list(ak), list(bk), list(nk)
        else:
            last_lp, ring, n, s, ss, seeded = 0.0, [], 0, 0.0, 0.0, False
            pk = [0.0] * len(lags)
            ak = [0.0] * len(lags)
            bk = [0.0] * len(lags)
            nk = [0] * len(lags)

        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        batch = (
            pd.concat(batches)
            .sort_values([ts_col, seq_col], kind="mergesort")
            .reset_index(drop=True)
        )
        batch = batch[batch[close_col].notna() & (batch[close_col] > 0)]
        if len(batch) == 0:
            return
        lp = np.log(batch[close_col].to_numpy(dtype=np.float64))
        if seeded:
            r = np.diff(np.concatenate(([last_lp], lp)))
        else:
            r = np.diff(lp)
        last_lp, seeded = float(lp[-1]), True

        if len(r):
            ext = np.concatenate((np.asarray(ring, dtype=np.float64), r))
            m = len(ring)
            for i, k in enumerate(lags):
                # partner of new return j (global index n + j) is the
                # return k steps back: ext[m + j - k], present iff
                # m + j - k >= 0 (ring holds min(kmax, n) past returns)
                j0 = max(0, k - m)
                if j0 >= len(r):
                    continue
                cur = r[j0:]
                lagged = ext[m + j0 - k : m + len(r) - k]
                pk[i] += float(np.dot(cur, lagged))
                ak[i] += float(cur.sum())
                bk[i] += float(lagged.sum())
                nk[i] += len(cur)
            s += float(r.sum())
            ss += float(np.dot(r, r))
            n += len(r)
            # plain Python floats: numpy scalars break the state pickler
            ring = [float(x) for x in (ext[-kmax:] if len(ext) > kmax else ext)]

        state.update((last_lp, ring, n, s, ss, pk, ak, bk, nk, seeded))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        mean = s / n if n else 0.0
        den = ss - n * mean * mean
        ok = n >= kmax + 2 and den > 0
        row = {symbol_col: [sym], "n_obs": [n]}
        q = 0.0
        for i, k in enumerate(lags):
            if ok:
                rho = (pk[i] - mean * ak[i] - mean * bk[i] + nk[i] * mean * mean) / den
                row[f"acf_{k}"] = [rho]
                q += rho * rho / (n - k)
            else:
                row[f"acf_{k}"] = [None]
        row["ljung_box_q"] = [n * (n + 2) * q if ok else None]
        yield pd.DataFrame(row)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(symbol_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
