"""Streaming gap-based sessionization.

The stateful twin of ``functions.events.sessionize``: per user, carry
the open session (id, start, last-activity, event count) across
micro-batches and close it when the gap clock breaches — O(1) state per
user, the canonical ``applyInPandasWithState`` shape shared with the
flow-bar machines.

Emission contract mirrors the streaming bars: a session is emitted
``is_final=True`` exactly once when a later event (or the state TTL)
closes it; the open session is also emitted as an ``is_final=False``
snapshot each batch it changes, superseded by later snapshots or its
final row (consumers keep the last row per (user, session_id)).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from polars_trading_spark._utils import parse_duration

__all__ = ["streaming_event_funnel", "streaming_sessionize"]

_SESS_STATE = T.StructType(
    [
        T.StructField("sid", T.IntegerType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _sess_out_schema(user_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(user_col, T.LongType()),
            T.StructField("session_id", T.IntegerType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("is_final", T.BooleanType()),
        ]
    )


def make_sessionize_update(gap_s: float, user_col: str, ts_col: str, ttl_ms: int | None):
    """Stateful update fn (module-level for direct unit testing)."""
    gap_us = int(gap_s * 1e6)

    def update(
        key: Tuple[object], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        if state.hasTimedOut:
            # TTL closes the open session as final.
            sid, start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user_col: [user],
                    "session_id": [sid],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "duration_s": [(last_us - start_us) / 1e6],
                    "is_final": [True],
                }
            )
            return
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        batch = pd.concat(rows).sort_values(ts_col, kind="mergesort")
        stamps = batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()

        if state.exists:
            sid, start_us, last_us, n = state.get
        else:
            sid, start_us, last_us, n = 0, 0, 0, 0

        # Vectorized segmentation (no per-event Python): a break before
        # row i iff the gap clock breaches; row 0 breaks against the
        # carried state (or always, when no session is open).
        import numpy as np

        breaks = np.empty(stamps.size, dtype=bool)
        breaks[0] = (n == 0) or (int(stamps[0]) - last_us > gap_us)
        breaks[1:] = np.diff(stamps) > gap_us
        starts = np.flatnonzero(breaks)
        bounds = np.concatenate((starts, [stamps.size]))

        out = []
        # segment continuing the open session (only when row 0 doesn't break)
        if not breaks[0]:
            seg_end = int(bounds[0]) if starts.size else stamps.size
            last_us = int(stamps[seg_end - 1])
            n += seg_end
        for k in range(starts.size):
            # close whatever is open before starting segment k
            out.append([user, sid, start_us, last_us, n, (last_us - start_us) / 1e6, True])
            lo, hi = int(bounds[k]), int(bounds[k + 1])
            sid += 1
            start_us = int(stamps[lo])
            last_us = int(stamps[hi - 1])
            n = hi - lo
        # the very first "close" above is spurious when no session was
        # open at batch start — drop it.
        if out and (not state.exists or out[0][4] == 0):
            out = out[1:]
        # open-session snapshot
        out.append([user, sid, start_us, last_us, n, (last_us - start_us) / 1e6, False])
        state.update((sid, start_us, last_us, n))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        df = pd.DataFrame(
            out,
            columns=[user_col, "session_id", "session_start", "session_end",
                     "n_events", "duration_s", "is_final"],
        )
        df["session_start"] = pd.to_datetime(df["session_start"], unit="us")
        df["session_end"] = pd.to_datetime(df["session_end"], unit="us")
        yield df

    return update


def streaming_sessionize(
    stream: DataFrame,
    *,
    gap: str = "30m",
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_ttl: str | None = "1d",
) -> DataFrame:
    """Stateful sessionization over a user event stream — batch
    ``sessionize`` semantics across micro-batch boundaries; the state
    TTL finalizes sessions of users who simply stop arriving."""
    gap_s = parse_duration(gap)[0] / 1e6
    ttl_ms = parse_duration(state_ttl)[0] // 1000 if state_ttl is not None else None
    update = make_sessionize_update(gap_s, user_col, ts_col, ttl_ms)
    return stream.groupBy(F.col(user_col)).applyInPandasWithState(
        update,
        outputStructType=_sess_out_schema(user_col),
        stateStructType=_SESS_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def make_funnel_update(steps: list[str], user_col: str, ts_col: str, type_col: str):
    """Stateful ordered-funnel update fn (module-level for unit tests).

    State: one epoch-µs timestamp per step (0 = not reached).  Each
    micro-batch advances the machine step-by-step — for step j, the
    earliest event of that type strictly after step j−1's time — a
    k-pass vectorized scan over the batch, no per-event Python.
    """
    import numpy as np

    k = len(steps)

    def update(key, pdfs, state):
        import pandas as pd

        user = key[0]
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        batch = pd.concat(rows)
        batch = batch[batch[type_col].isin(steps)]
        if len(batch) == 0:
            return
        batch = batch.sort_values(ts_col, kind="mergesort")
        stamps = batch[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        types = batch[type_col].to_numpy()

        reached = list(state.get[0]) if state.exists else [0] * k
        changed = False
        for j, s in enumerate(steps):
            if reached[j]:
                continue
            if j > 0 and not reached[j - 1]:
                break
            mask = types == s
            if j > 0:
                mask &= stamps > reached[j - 1]
            cand = stamps[mask]
            if cand.size:
                reached[j] = int(cand.min())
                changed = True
        if changed or not state.exists:
            state.update((reached,))
        out = {user_col: [user]}
        for j, s in enumerate(steps):
            out[f"ts_{s}"] = [
                pd.Timestamp(reached[j], unit="us") if reached[j] else pd.NaT
            ]
        out["depth"] = [sum(1 for v in reached if v)]
        yield pd.DataFrame(out)

    return update


def streaming_event_funnel(
    stream: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Stateful ordered conversion funnel over a user event stream —
    batch ``event_funnel`` semantics when events arrive in timestamp
    order across micro-batches (per-user snapshot emitted each batch
    the user appears; consumers keep the last row per user).

    Note the greedy-on-arrival caveat: a late event that would have
    enabled an EARLIER chain than the one already locked in cannot
    rewind the machine — the batch operator re-derives the optimal
    chain, the stream commits as it goes.  With in-order delivery the
    two agree exactly (tested); under disorder the stream is the
    standard at-arrival approximation.
    """
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {steps}")
    update = make_funnel_update(list(steps), user_col, ts_col, type_col)
    out_fields = [T.StructField(user_col, T.LongType())]
    out_fields += [T.StructField(f"ts_{s}", T.TimestampType()) for s in steps]
    out_fields.append(T.StructField("depth", T.IntegerType()))
    state_schema = T.StructType([T.StructField("reached", T.ArrayType(T.LongType()))])
    return stream.groupBy(F.col(user_col)).applyInPandasWithState(
        update,
        outputStructType=T.StructType(out_fields),
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
