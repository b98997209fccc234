"""Streaming capacity/turnover monitor for the cross-sectional
momentum book — the online twin of
``operators/cross_section.py::portfolio_capacity``.

A cross-sectional rank needs EVERY symbol's bar for a bucket before the
book can form, so the stream funnels through ONE stateful group (the
book is a single portfolio-level object; the universe is bounded, so
per-symbol state is O(symbols x window) — this operator monitors a
strategy, it does not scan a corpus).  A bucket is finalized when the
first LATER timestamp arrives (the same close-on-next convention as
streaming time bars), so the tape's final bucket stays pending.

Float discipline mirrors the batch operator exactly: per-symbol dollar
volume accumulates as a LEFT-TO-RIGHT running prefix sum (the batch's
running-frame fold), ADV is the prefix-sum DIFFERENCE, and membership
ranks use the identical (mom desc, symbol) tie-break.  Same cross-batch
in-order arrival assumption as the other twins.
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

__all__ = ["streaming_portfolio_capacity"]


def streaming_portfolio_capacity(
    stream: DataFrame,
    *,
    lookback: int = 5,
    top_n: int = 1,
    adv_window: int = 20,
    max_participation: float = 0.05,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    close_col: str = "close",
    volume_col: str = "volume",
    state_ttl: str | None = None,
) -> DataFrame:
    """Emit the batch ``portfolio_capacity`` row for every FORMED bucket
    whose successor bucket has started arriving (one-bucket emission
    lag; the final bucket stays pending)."""
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if adv_window < 1:
        raise ValueError(f"adv_window must be >= 1, got {adv_window}")
    if not (0.0 < max_participation <= 1.0):
        raise ValueError(
            f"max_participation must be in (0, 1], got {max_participation}"
        )
    mp = float(max_participation)

    ttl_ms, timeout = _common(state_ttl)
    out_schema = T.StructType(
        [
            T.StructField(ts_col, T.TimestampType()),
            T.StructField("n_members", T.IntegerType()),
            T.StructField("n_changed", T.IntegerType()),
            T.StructField("turnover", T.DoubleType()),
            T.StructField("min_member_adv", T.DoubleType()),
            T.StructField("capacity_dollars", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("syms", T.ArrayType(T.StringType())),
            T.StructField("cums", T.ArrayType(T.DoubleType())),
            T.StructField("rns", T.ArrayType(T.LongType())),
            # fixed-stride flattened histories (NaN-padded): per symbol
            # `lookback` prior closes and `adv_window` prior prefix sums
            T.StructField("pclose", T.ArrayType(T.DoubleType())),
            T.StructField("pcdv", T.ArrayType(T.DoubleType())),
            T.StructField("mem_syms", T.ArrayType(T.StringType())),
            T.StructField("mem_sides", T.ArrayType(T.DoubleType())),
            T.StructField("has_prev", T.BooleanType()),
            T.StructField("pend_ts", T.ArrayType(T.LongType())),
            T.StructField("pend_sym", T.ArrayType(T.StringType())),
            T.StructField("pend_close", T.ArrayType(T.DoubleType())),
            T.StructField("pend_vol", T.ArrayType(T.DoubleType())),
        ]
    )
    nan = float("nan")

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (syms, cums, rns, pclose, pcdv, mem_syms, mem_sides, has_prev,
             pend_ts, pend_sym, pend_close, pend_vol) = state.get
            idx = {s: i for i, s in enumerate(syms)}
            per = {
                s: {
                    "cum": cums[i],
                    "rn": rns[i],
                    "pc": [
                        v
                        for v in pclose[i * lookback : (i + 1) * lookback]
                        if not math.isnan(v)
                    ],
                    "pv": [
                        v
                        for v in pcdv[i * adv_window : (i + 1) * adv_window]
                        if not math.isnan(v)
                    ],
                }
                for s, i in idx.items()
            }
            prev_mem = set(zip(mem_syms, mem_sides))
        else:
            per, prev_mem, has_prev = {}, set(), False
            pend_ts, pend_sym, pend_close, pend_vol = [], [], [], []

        batches = [b for b in pdfs if len(b)]
        rows = list(zip(pend_ts, pend_sym, pend_close, pend_vol))
        for b in batches:
            for ts, s, c, v in zip(
                b[ts_col], b[symbol_col], b[close_col], b[volume_col]
            ):
                rows.append(
                    (int(ts.value // 1000), str(s), float(c), float(v))
                )
        if not rows:
            return
        rows.sort(key=lambda r: (r[0], r[1]))
        all_ts = sorted({r[0] for r in rows})
        complete, pending = all_ts[:-1], all_ts[-1]

        out = {
            k: []
            for k in ("ts", "nm", "nc", "to", "minadv", "cap")
        }
        for t in complete:
            bucket = [r for r in rows if r[0] == t]
            ranked = []
            for _, s, c, v in bucket:
                st = per.setdefault(
                    s, {"cum": 0.0, "rn": 0, "pc": [], "pv": []}
                )
                dv = c * v
                cdv = st["cum"] + dv
                rn = st["rn"] + 1
                mom = (
                    math.log(c / st["pc"][0])
                    if len(st["pc"]) == lookback
                    else None
                )
                adv = None
                if rn >= adv_window:
                    lagv = (
                        st["pv"][0]
                        if len(st["pv"]) == adv_window
                        else 0.0
                    )
                    adv = (cdv - lagv) / adv_window
                st["cum"], st["rn"] = cdv, rn
                st["pc"].append(c)
                if len(st["pc"]) > lookback:
                    st["pc"].pop(0)
                st["pv"].append(cdv)
                if len(st["pv"]) > adv_window:
                    st["pv"].pop(0)
                if mom is not None:
                    ranked.append((s, mom, adv))
            if len(ranked) < 2 * top_n:
                continue
            up = sorted(ranked, key=lambda r: (-r[1], r[0]))
            dn = sorted(ranked, key=lambda r: (r[1], r[0]))
            members = [(s, 1.0, a) for s, _, a in up[:top_n]] + [
                (s, -1.0, a) for s, _, a in dn[:top_n]
            ]
            mem_set = {(s, side) for s, side, _ in members}
            nm = len(members)
            nkept = len(mem_set & prev_mem)
            advs = [a for _, _, a in members]
            min_adv = None if any(a is None for a in advs) else min(advs)
            out["ts"].append(t)
            out["nm"].append(nm)
            out["nc"].append(nm - nkept if has_prev else None)
            out["to"].append((nm - nkept) / float(nm) if has_prev else None)
            out["minadv"].append(min_adv)
            out["cap"].append(
                mp * min_adv * nm if min_adv is not None else None
            )
            prev_mem, has_prev = mem_set, True

        # re-pack state
        syms = sorted(per)
        pclose_flat, pcdv_flat = [], []
        for s in syms:
            pc, pv = per[s]["pc"], per[s]["pv"]
            pclose_flat += pc + [nan] * (lookback - len(pc))
            pcdv_flat += pv + [nan] * (adv_window - len(pv))
        keep = [r for r in rows if r[0] == pending]
        state.update(
            (
                syms,
                [per[s]["cum"] for s in syms],
                [per[s]["rn"] for s in syms],
                pclose_flat,
                pcdv_flat,
                [s for s, _ in sorted(prev_mem)],
                [side for _, side in sorted(prev_mem)],
                has_prev,
                [r[0] for r in keep],
                [r[1] for r in keep],
                [r[2] for r in keep],
                [r[3] for r in keep],
            )
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if not out["ts"]:
            return
        yield pd.DataFrame(
            {
                ts_col: pd.to_datetime(pd.Series(out["ts"]), unit="us"),
                "n_members": pd.array(out["nm"], dtype="Int32"),
                "n_changed": pd.array(out["nc"], dtype="Int32"),
                "turnover": pd.array(out["to"], dtype="float64"),
                "min_member_adv": pd.array(out["minadv"], dtype="float64"),
                "capacity_dollars": pd.array(out["cap"], dtype="float64"),
            }
        )

    fan = stream.select(
        F.lit(0).alias("__book"),
        F.col(symbol_col),
        F.col(ts_col),
        F.col(close_col).cast("double").alias(close_col),
        F.col(volume_col).cast("double").alias(volume_col),
    )
    # "append": every finalized bucket is emitted exactly once, so the
    # monitor composes with append-only sinks like the indicator twins
    return fan.groupBy("__book").applyInPandasWithState(
        update, out_schema, state_schema, "append", timeout
    )
