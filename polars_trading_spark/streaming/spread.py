"""Streaming pairs band backtest: the hysteresis band rule online.

The batch ``operators/mean_reversion.py::spread_band_backtest`` fits the
hedge coefficients on the FULL sample — inherently offline.  The
deployment split desks actually run is: fit (alpha, beta) per pair in a
batch job, then stream the band rule against live bars.  This twin takes
that pre-fitted coefficient table and reproduces the batch band surface
row-for-row over a replayed stream:

* the bar stream fans out to one row per (pair, leg) via a stream-static
  join on the pair-membership table (stateless, broadcast-sized);
* per-pair ``applyInPandasWithState`` pairs the two legs by timestamp
  (unmatched legs wait in state), builds the spread
  ``x_a - alpha - beta * x_b``, z-scores it against the rolling
  ``window``-spread frame (state = the last ``window - 1`` spreads,
  folded left-to-right exactly like the batch window frame), and runs
  the entry/exit hysteresis as the carried last-non-null event;
* P&L per emitted row is the previous position times the spread change
  (null on each pair's first row), identical to the batch convention.

State per pair is O(window + leg skew): the spread ring plus whichever
leg's bars arrived ahead of the other's.  Same cross-batch IN-ORDER
arrival assumption as the other streaming twins (per-symbol bars arrive
in (ts) order across micro-batches); a bar arriving after later
timestamps were already matched would see a stale window.
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from polars_trading_spark.streaming.indicators import _common

__all__ = ["streaming_spread_band"]


def streaming_spread_band(
    stream: DataFrame,
    coefs: DataFrame,
    *,
    entry_z: float = 2.0,
    exit_z: float = 0.5,
    window: int = 50,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    close_col: str = "close",
    use_log: bool = True,
    state_ttl: str | None = None,
) -> DataFrame:
    """Stream the pairs band backtest against pre-fitted coefficients.

    ``coefs`` is a BATCH DataFrame ``(sym_a, sym_b, alpha, beta)`` — the
    output of ``cointegration_fit`` (rounded, as ``spread_zscore_signal``
    rounds it) over the training window; it is collected once (pair-
    table-sized) and closed over.  Emits the batch operator's columns
    ``sym_a, sym_b, ts, spread, z, position, traded, pnl`` for every
    timestamp both legs have arrived."""
    if exit_z < 0 or exit_z >= entry_z:
        raise ValueError(
            f"need 0 <= exit_z < entry_z, got exit_z={exit_z} entry_z={entry_z}"
        )
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    pair_rows = [
        (r["sym_a"], r["sym_b"], float(r["alpha"]), float(r["beta"]))
        for r in coefs.select("sym_a", "sym_b", "alpha", "beta").collect()
        if r["alpha"] is not None and r["beta"] is not None
    ]
    coef_map = {(a, b): (al, be) for a, b, al, be in pair_rows}
    spark = stream.sparkSession
    membership = spark.createDataFrame(
        [(a, a, b, "a") for a, b, _, _ in pair_rows]
        + [(b, a, b, "b") for a, b, _, _ in pair_rows],
        f"{symbol_col} string, sym_a string, sym_b string, __leg string",
    )
    fan = stream.select(
        symbol_col, F.col(ts_col), F.col(close_col).cast("double").alias("__c")
    ).join(membership, on=symbol_col)

    ttl_ms, timeout = _common(state_ttl)
    out_schema = T.StructType(
        [
            T.StructField("sym_a", T.StringType()),
            T.StructField("sym_b", T.StringType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField("spread", T.DoubleType()),
            T.StructField("z", T.DoubleType()),
            T.StructField("position", T.DoubleType()),
            T.StructField("traded", T.BooleanType()),
            T.StructField("pnl", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("pa_ts", T.ArrayType(T.LongType())),
            T.StructField("pa_x", T.ArrayType(T.DoubleType())),
            T.StructField("pb_ts", T.ArrayType(T.LongType())),
            T.StructField("pb_x", T.ArrayType(T.DoubleType())),
            T.StructField("ring", T.ArrayType(T.DoubleType())),
            T.StructField("total", T.LongType()),
            T.StructField("band_pos", T.DoubleType()),
            T.StructField("last_spread", T.DoubleType()),
            T.StructField("seeded", T.BooleanType()),
        ]
    )

    def update(
        key: Tuple[str, str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        sym_a, sym_b = key
        alpha, beta = coef_map.get((sym_a, sym_b), (None, None))
        if state.exists:
            pa_ts, pa_x, pb_ts, pb_x, ring, total, band_pos, last_spread, seeded = (
                state.get
            )
            pa = dict(zip(pa_ts, pa_x))
            pb = dict(zip(pb_ts, pb_x))
            ring = list(ring)
        else:
            pa, pb, ring = {}, {}, []
            total, band_pos, last_spread, seeded = 0, 0.0, 0.0, False

        batches = [b for b in pdfs if len(b)]
        if not batches:
            return
        if alpha is None:
            return  # pair without a usable fit: nothing to emit
        batch = pd.concat(batches)
        for leg, ts, c in zip(
            batch["__leg"], batch[ts_col], batch["__c"]
        ):
            x = math.log(c) if use_log else float(c)
            (pa if leg == "a" else pb)[int(ts.value // 1000)] = x

        out = {k: [] for k in ("ts", "spread", "z", "position", "traded", "pnl")}
        for ts_us in sorted(pa.keys() & pb.keys()):
            spread = pa.pop(ts_us) - alpha - beta * pb.pop(ts_us)
            total += 1
            frame = ring + [spread]  # the last min(total, window) spreads
            z = None
            if total >= window:
                s = 0.0
                s2 = 0.0
                for v in frame:  # left-to-right, same fold as the batch frame
                    s += v
                    s2 += v * v
                n = float(window)
                var = (s2 - s * s / n) / (n - 1)
                sd = math.sqrt(max(var, 0.0))
                if sd > 0:
                    z = (spread - s / n) / sd
            zr = round(z, 6) if z is not None else None
            evt = None
            if zr is not None:
                if zr >= entry_z:
                    evt = -1.0
                elif zr <= -entry_z:
                    evt = 1.0
                elif abs(zr) <= exit_z:
                    evt = 0.0
            prev_pos = band_pos
            if evt is not None:
                band_pos = evt
            out["ts"].append(ts_us)
            out["spread"].append(spread)
            out["z"].append(z)
            out["position"].append(band_pos)
            out["traded"].append(prev_pos != band_pos)
            out["pnl"].append(prev_pos * (spread - last_spread) if seeded else None)
            last_spread, seeded = spread, True
            ring.append(spread)
            if len(ring) >= window:
                ring.pop(0)

        state.update(
            (
                list(pa.keys()),
                list(pa.values()),
                list(pb.keys()),
                list(pb.values()),
                ring,
                total,
                band_pos,
                last_spread,
                seeded,
            )
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if not out["ts"]:
            return
        yield pd.DataFrame(
            {
                "sym_a": sym_a,
                "sym_b": sym_b,
                ts_col: pd.to_datetime(pd.Series(out["ts"]), unit="us"),
                "spread": out["spread"],
                "z": out["z"],
                "position": out["position"],
                "traded": out["traded"],
                "pnl": out["pnl"],
            }
        )

    # "append": every matched timestamp is emitted exactly once (its
    # row never revises), so the twin composes with append-only sinks
    # (parquet checkpoint/restart drills) like the indicator twins
    return fan.groupBy("sym_a", "sym_b").applyInPandasWithState(
        update, out_schema, state_schema, "append", timeout
    )
