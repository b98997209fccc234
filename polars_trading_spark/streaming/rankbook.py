"""Streaming twins of the cost-aware momentum book: the per-bucket net
backtest (``operators/cross_section.py::rank_portfolio_backtest_net``)
and its one-row tearsheet (``rank_portfolio_tearsheet``) as online
monitors.

Like ``streaming_portfolio_capacity``, a cross-sectional rank needs
EVERY symbol's bar for a bucket before the book can form, so the stream
funnels through ONE stateful group (a strategy-level monitor over a
bounded universe — per-symbol state is O(symbols x window); see the
single-group throughput note in COVERAGE.md).  A bucket is COMPLETE
when the first later timestamp arrives; a complete bucket with at
least ``2 * top_n`` momentum-ranked symbols FORMS a book; a formed
bucket EMITS once every member's forward return has resolved (the
member symbol's next bar arrived — on a dense tape, one bucket later).
The tape's final bucket therefore always stays pending, exactly the
close-on-next convention of the other twins.

Float discipline mirrors the batch operator term for term: momentum is
``log(c_t / c_{t-lookback})`` over the symbol's OWN bar series from a
ring of prior closes; the Corwin-Schultz spread replays the rolling
two-bar beta / gamma / alpha pipeline per bar; rebalance costs are
half-spreads quantized to 1e-6 micro-units with ``floor(x + 0.5)``
(Spark's HALF_UP for the non-negative spread) and summed in INTEGER
space; the tearsheet accumulators fold in bucket order (the batch's
ordered running windows).  Same in-order-arrival contract across
micro-batches as the other twins.
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

__all__ = ["streaming_rank_portfolio_net", "streaming_rank_portfolio_tearsheet"]

_NAN = float("nan")

_CS_DEN = 3.0 - 2.0 * (2.0**0.5)


def _cs_spread(beta, gamma):
    """Corwin-Schultz spread from a full rolling beta and the 2-bar
    gamma — the exact expression order of operators/microstructure.py."""
    if beta is None or gamma is None:
        return None
    alpha = max(
        ((2.0**0.5 - 1.0) * math.sqrt(beta)) / _CS_DEN
        - math.sqrt(gamma / _CS_DEN),
        0.0,
    )
    return (2.0 * (math.exp(alpha) - 1.0)) / (1.0 + math.exp(alpha))


def _rankbook_stream(
    stream: DataFrame,
    *,
    emit: str,
    lookback: int,
    top_n: int,
    cs_window: int,
    symbol_col: str,
    ts_col: str,
    close_col: str,
    high_col: str,
    low_col: str,
    state_ttl: str | None,
) -> DataFrame:
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if cs_window < 2:
        raise ValueError(f"cs_window must be >= 2, got {cs_window}")

    ttl_ms, timeout = _common(state_ttl)
    if emit == "buckets":
        out_schema = T.StructType(
            [
                T.StructField(ts_col, T.TimestampType()),
                T.StructField("n_long", T.IntegerType()),
                T.StructField("n_short", T.IntegerType()),
                T.StructField("pnl", T.DoubleType()),
                T.StructField("turnover", T.DoubleType()),
                T.StructField("cost", T.DoubleType()),
                T.StructField("net_pnl", T.DoubleType()),
            ]
        )
    else:  # tearsheet-as-of rows
        out_schema = T.StructType(
            [
                T.StructField(ts_col, T.TimestampType()),
                T.StructField("n_buckets", T.LongType()),
                T.StructField("gross_pnl", T.DoubleType()),
                T.StructField("total_cost", T.DoubleType()),
                T.StructField("net_pnl", T.DoubleType()),
                T.StructField("gross_sharpe", T.DoubleType()),
                T.StructField("net_sharpe", T.DoubleType()),
                T.StructField("avg_turnover", T.DoubleType()),
                T.StructField("max_drawdown", T.DoubleType()),
            ]
        )
    state_schema = T.StructType(
        [
            T.StructField("syms", T.ArrayType(T.StringType())),
            # per-symbol rings, fixed-stride flattened (NaN-padded):
            # `lookback` prior closes; `cs_window` two-bar betas
            T.StructField("pclose", T.ArrayType(T.DoubleType())),
            T.StructField("tbs", T.ArrayType(T.DoubleType())),
            T.StructField("prev_h", T.ArrayType(T.DoubleType())),
            T.StructField("prev_l", T.ArrayType(T.DoubleType())),
            T.StructField("prev_hl2", T.ArrayType(T.DoubleType())),
            # previous FORMED book (exit charging + turnover)
            T.StructField("mem_syms", T.ArrayType(T.StringType())),
            T.StructField("mem_sides", T.ArrayType(T.DoubleType())),
            T.StructField("has_prev", T.BooleanType()),
            # formed-but-unemitted buckets + their waiting members
            T.StructField("pb_ts", T.ArrayType(T.LongType())),
            T.StructField("pb_nlong", T.ArrayType(T.IntegerType())),
            T.StructField("pb_nshort", T.ArrayType(T.IntegerType())),
            T.StructField("pb_to", T.ArrayType(T.DoubleType())),
            T.StructField("pb_cost", T.ArrayType(T.DoubleType())),
            T.StructField("pm_bidx", T.ArrayType(T.IntegerType())),
            T.StructField("pm_sym", T.ArrayType(T.StringType())),
            T.StructField("pm_side", T.ArrayType(T.DoubleType())),
            T.StructField("pm_close", T.ArrayType(T.DoubleType())),
            T.StructField("pm_fwd", T.ArrayType(T.DoubleType())),
            # raw rows of the not-yet-complete bucket
            T.StructField("raw_ts", T.ArrayType(T.LongType())),
            T.StructField("raw_sym", T.ArrayType(T.StringType())),
            T.StructField("raw_c", T.ArrayType(T.DoubleType())),
            T.StructField("raw_h", T.ArrayType(T.DoubleType())),
            T.StructField("raw_l", T.ArrayType(T.DoubleType())),
            # tearsheet accumulators (bucket-ordered folds)
            T.StructField("acc", T.ArrayType(T.DoubleType())),
        ]
    )

    def update(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (syms, pclose, tbs, prev_h, prev_l, prev_hl2, mem_syms,
             mem_sides, has_prev, pb_ts, pb_nlong, pb_nshort, pb_to,
             pb_cost, pm_bidx, pm_sym, pm_side, pm_close, pm_fwd,
             raw_ts, raw_sym, raw_c, raw_h, raw_l, acc) = state.get
            per = {}
            for i, s in enumerate(syms):
                per[s] = {
                    "pc": [
                        v
                        for v in pclose[i * lookback : (i + 1) * lookback]
                        if not math.isnan(v)
                    ],
                    # the tb ring keeps NaN slots (a null first-bar tb
                    # still occupies a frame row)
                    "tb": [
                        v
                        for v in tbs[i * cs_window : (i + 1) * cs_window]
                        if not (math.isinf(v))
                    ],
                    "ph": None if math.isnan(prev_h[i]) else prev_h[i],
                    "pl": None if math.isnan(prev_l[i]) else prev_l[i],
                    "phl2": None
                    if math.isnan(prev_hl2[i])
                    else prev_hl2[i],
                }
            prev_mem = set(zip(mem_syms, mem_sides))
            buckets = [
                {
                    "ts": pb_ts[i],
                    "nl": pb_nlong[i],
                    "ns": pb_nshort[i],
                    "to": None if math.isnan(pb_to[i]) else pb_to[i],
                    "cost": pb_cost[i],
                    "mem": [],
                }
                for i in range(len(pb_ts))
            ]
            for j in range(len(pm_bidx)):
                buckets[pm_bidx[j]]["mem"].append(
                    [
                        pm_sym[j],
                        pm_side[j],
                        pm_close[j],
                        None if math.isnan(pm_fwd[j]) else pm_fwd[j],
                    ]
                )
            acc = list(acc)
        else:
            per, prev_mem, has_prev, buckets = {}, set(), False, []
            raw_ts, raw_sym, raw_c, raw_h, raw_l = [], [], [], [], []
            # cnt, nto, sg, sg2, sn, sn2, sc, sto, peak, mdd
            acc = [0.0] * 8 + [_NAN, _NAN]

        rows = list(zip(raw_ts, raw_sym, raw_c, raw_h, raw_l))
        for b in pdfs:
            if not len(b):
                continue
            for ts, s, c, h, lo in zip(
                b[ts_col], b[symbol_col], b[close_col], b[high_col], b[low_col]
            ):
                rows.append(
                    (int(ts.value // 1000), str(s), float(c), float(h), float(lo))
                )
        if not rows:
            return
        rows.sort(key=lambda r: (r[0], r[1]))
        all_ts = sorted({r[0] for r in rows})
        complete, pending = all_ts[:-1], all_ts[-1]

        def resolve(sym: str, close: float) -> None:
            for bk in buckets:
                for m in bk["mem"]:
                    if m[0] == sym and m[3] is None:
                        m[3] = math.log(close / m[2])

        for t in complete:
            bucket = [r for r in rows if r[0] == t]
            ranked = []
            cs_at_t = {}
            for _, s, c, h, lo in bucket:
                resolve(s, c)
                st = per.setdefault(
                    s, {"pc": [], "tb": [], "ph": None, "pl": None, "phl2": None}
                )
                hl2 = math.log(h / lo) ** 2
                tb = hl2 + st["phl2"] if st["phl2"] is not None else None
                gamma = (
                    math.log(max(h, st["ph"]) / min(lo, st["pl"])) ** 2
                    if st["ph"] is not None
                    else None
                )
                st["tb"].append(_NAN if tb is None else tb)
                if len(st["tb"]) > cs_window:
                    st["tb"].pop(0)
                beta = (
                    sum(st["tb"]) / cs_window
                    if len(st["tb"]) == cs_window
                    and not any(math.isnan(v) for v in st["tb"])
                    else None
                )
                cs_at_t[s] = _cs_spread(beta, gamma)
                mom = (
                    math.log(c / st["pc"][0])
                    if len(st["pc"]) == lookback
                    else None
                )
                st["ph"], st["pl"], st["phl2"] = h, lo, hl2
                st["pc"].append(c)
                if len(st["pc"]) > lookback:
                    st["pc"].pop(0)
                if mom is not None:
                    ranked.append((s, mom, c))
            if len(ranked) < 2 * top_n:
                continue
            up = sorted(ranked, key=lambda r: (-r[1], r[0]))
            longs = [(s, 1.0, c) for s, _, c in up[:top_n]]
            long_set = {s for s, _, _ in longs}
            dn = sorted(ranked, key=lambda r: (r[1], r[0]))
            shorts = [
                (s, -1.0, c)
                for s, _, c in dn[:top_n]
                if s not in long_set
            ]
            members = longs + shorts
            mem_set = {(s, side) for s, side, _ in members}
            nm = len(mem_set)
            nkept = len(mem_set & prev_mem)
            turnover = 1.0 - nkept / nm if has_prev else None
            # trades: entries at t plus the previous book's exits
            # (charged at this, the NEXT formed bucket); null/missing
            # spreads price as zero micro-units
            entries = [s for s, side in sorted(mem_set - prev_mem)]
            exits = [s for s, side in sorted(prev_mem - mem_set)]
            micro = 0
            for s in entries + exits:
                sp = cs_at_t.get(s)
                if sp is not None:
                    micro += int(math.floor(sp * 1e6 + 0.5))
            cost = micro / 1e6 / (2.0 * top_n)
            buckets.append(
                {
                    "ts": t,
                    "nl": len(longs),
                    "ns": len(shorts),
                    "to": turnover,
                    "cost": cost,
                    "mem": [[s, side, c, None] for s, side, c in members],
                }
            )
            prev_mem, has_prev = mem_set, True

        # the pending bucket's bars are FINAL per (symbol, bucket): they
        # resolve waiting forwards now, and replay for state/formation
        # once their bucket completes in a later batch
        for _, s, c, _, _ in (r for r in rows if r[0] == pending):
            resolve(s, c)

        # emit the resolved PREFIX of formed buckets (bucket order — the
        # tearsheet folds require it; on a dense tape this is every
        # formed bucket whose successor bucket has arrived)
        out = []
        while buckets and all(m[3] is not None for m in buckets[0]["mem"]):
            bk = buckets.pop(0)
            fl = [m[3] for m in bk["mem"] if m[1] > 0]
            fs = [m[3] for m in bk["mem"] if m[1] < 0]
            pnl = (
                sum(fl) / len(fl) - sum(fs) / len(fs)
                if fl and fs
                else None
            )
            net = (pnl if pnl is not None else 0.0) - bk["cost"]
            if emit == "buckets":
                out.append(
                    (bk["ts"], bk["nl"], bk["ns"], pnl, bk["to"],
                     bk["cost"], net)
                )
            else:
                g = pnl if pnl is not None else 0.0
                acc[0] += 1.0  # cnt
                if bk["to"] is not None:
                    acc[1] += 1.0  # nto
                    acc[7] += bk["to"]  # sto
                acc[2] += g
                acc[3] += g * g
                acc[4] += net
                acc[5] += net * net
                acc[6] += bk["cost"]
                peak = acc[4] if math.isnan(acc[8]) else max(acc[8], acc[4])
                acc[8] = peak
                dd = acc[4] - peak
                acc[9] = dd if math.isnan(acc[9]) else min(acc[9], dd)

                def sharpe(s_, s2_):
                    n_ = acc[0]
                    if n_ < 2:
                        return None
                    var = (s2_ - s_ * s_ / n_) / (n_ - 1.0)
                    sd = math.sqrt(max(var, 0.0))
                    return (s_ / n_) / sd if sd > 0 else None

                out.append(
                    (
                        bk["ts"],
                        int(acc[0]),
                        acc[2],
                        acc[6],
                        acc[4],
                        sharpe(acc[2], acc[3]),
                        sharpe(acc[4], acc[5]),
                        acc[7] / acc[1] if acc[1] > 0 else None,
                        acc[9],
                    )
                )

        # re-pack state
        syms2 = sorted(per)
        pclose_f, tbs_f, ph_f, pl_f, phl2_f = [], [], [], [], []
        inf = float("inf")
        for s in syms2:
            st = per[s]
            pclose_f += st["pc"] + [_NAN] * (lookback - len(st["pc"]))
            tbs_f += st["tb"] + [inf] * (cs_window - len(st["tb"]))
            ph_f.append(_NAN if st["ph"] is None else st["ph"])
            pl_f.append(_NAN if st["pl"] is None else st["pl"])
            phl2_f.append(_NAN if st["phl2"] is None else st["phl2"])
        keep = [r for r in rows if r[0] == pending]
        pm = [
            (i, m)
            for i, bk in enumerate(buckets)
            for m in bk["mem"]
        ]
        state.update(
            (
                syms2,
                pclose_f,
                tbs_f,
                ph_f,
                pl_f,
                phl2_f,
                [s for s, _ in sorted(prev_mem)],
                [side for _, side in sorted(prev_mem)],
                has_prev,
                [bk["ts"] for bk in buckets],
                [bk["nl"] for bk in buckets],
                [bk["ns"] for bk in buckets],
                [_NAN if bk["to"] is None else bk["to"] for bk in buckets],
                [bk["cost"] for bk in buckets],
                [i for i, _ in pm],
                [m[0] for _, m in pm],
                [m[1] for _, m in pm],
                [m[2] for _, m in pm],
                [_NAN if m[3] is None else m[3] for _, m in pm],
                [r[0] for r in keep],
                [r[1] for r in keep],
                [r[2] for r in keep],
                [r[3] for r in keep],
                [r[4] for r in keep],
                acc,
            )
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if not out:
            return
        if emit == "buckets":
            yield pd.DataFrame(
                {
                    ts_col: pd.to_datetime(
                        pd.Series([o[0] for o in out]), unit="us"
                    ),
                    "n_long": pd.array([o[1] for o in out], dtype="Int32"),
                    "n_short": pd.array([o[2] for o in out], dtype="Int32"),
                    "pnl": pd.array([o[3] for o in out], dtype="float64"),
                    "turnover": pd.array(
                        [o[4] for o in out], dtype="float64"
                    ),
                    "cost": pd.array([o[5] for o in out], dtype="float64"),
                    "net_pnl": pd.array([o[6] for o in out], dtype="float64"),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    ts_col: pd.to_datetime(
                        pd.Series([o[0] for o in out]), unit="us"
                    ),
                    "n_buckets": pd.array([o[1] for o in out], dtype="Int64"),
                    "gross_pnl": pd.array([o[2] for o in out], dtype="float64"),
                    "total_cost": pd.array([o[3] for o in out], dtype="float64"),
                    "net_pnl": pd.array([o[4] for o in out], dtype="float64"),
                    "gross_sharpe": pd.array(
                        [o[5] for o in out], dtype="float64"
                    ),
                    "net_sharpe": pd.array(
                        [o[6] for o in out], dtype="float64"
                    ),
                    "avg_turnover": pd.array(
                        [o[7] for o in out], dtype="float64"
                    ),
                    "max_drawdown": pd.array(
                        [o[8] for o in out], dtype="float64"
                    ),
                }
            )

    fan = stream.select(
        F.lit(0).alias("__book"),
        F.col(symbol_col),
        F.col(ts_col),
        F.col(close_col).cast("double").alias(close_col),
        F.col(high_col).cast("double").alias(high_col),
        F.col(low_col).cast("double").alias(low_col),
    )
    return fan.groupBy("__book").applyInPandasWithState(
        update, out_schema, state_schema, "append", timeout
    )


def streaming_rank_portfolio_net(
    stream: DataFrame,
    *,
    lookback: int = 5,
    top_n: int = 1,
    cs_window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    close_col: str = "close",
    high_col: str = "high",
    low_col: str = "low",
    state_ttl: str | None = None,
) -> DataFrame:
    """Emit the batch ``rank_portfolio_backtest_net`` row for every
    formed bucket once its members' forward returns have resolved (one
    bucket of emission lag on a dense tape; the final bucket pending)."""
    return _rankbook_stream(
        stream,
        emit="buckets",
        lookback=lookback,
        top_n=top_n,
        cs_window=cs_window,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
        high_col=high_col,
        low_col=low_col,
        state_ttl=state_ttl,
    )


def streaming_rank_portfolio_tearsheet(
    stream: DataFrame,
    *,
    lookback: int = 5,
    top_n: int = 1,
    cs_window: int = 20,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    close_col: str = "close",
    high_col: str = "high",
    low_col: str = "low",
    state_ttl: str | None = None,
) -> DataFrame:
    """Emit the AS-OF ``rank_portfolio_tearsheet`` row after every
    emitted bucket (bucket-ordered accumulator folds — the last row
    equals the batch tearsheet over the emitted prefix)."""
    return _rankbook_stream(
        stream,
        emit="tearsheet",
        lookback=lookback,
        top_n=top_n,
        cs_window=cs_window,
        symbol_col=symbol_col,
        ts_col=ts_col,
        close_col=close_col,
        high_col=high_col,
        low_col=low_col,
        state_ttl=state_ttl,
    )
