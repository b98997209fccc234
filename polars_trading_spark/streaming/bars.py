"""Structured Streaming bar sampling.

The reference is batch-only (Polars' "streaming" engine is an
out-of-core batch executor) — this module is the deliberate extension
SURVEY.md §7 stages: the same bar semantics over unbounded trade
streams.

* ``streaming_time_bars``  — watermark + tumbling event-time window +
  the same OHLCV bundle.  Fully native; late trades beyond the
  watermark are dropped, in-watermark stragglers update their bar
  (append mode emits a bar once its window passes the watermark).
* ``streaming_volume_bars`` — cumulative-volume bucketing is stateful
  across batches: per (symbol, date) group we carry the running volume
  offset in ``applyInPandasWithState``, apply the same closed-form
  split math within each micro-batch, and emit completed bars;
  the still-filling bar stays in state.

Ordering note: within a micro-batch rows are sorted by (ts, seq) before
accumulation, matching the batch operators' deterministic order; across
micro-batches event-time ordering is the source's responsibility (same
contract as any streaming accumulator).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from polars_trading_spark._utils import duration_to_interval, ohlcv_aggs
from polars_trading_spark.config import column_names

__all__ = ["streaming_time_bars", "streaming_volume_bars"]


def streaming_time_bars(
    stream: DataFrame,
    *,
    bar_size: str = "1m",
    watermark: str = "1 minute",
) -> DataFrame:
    """Event-time OHLCV bars over a streaming trades DataFrame.

    Same output contract as the batch ``time_bars`` with the bucket
    exposed as ``window.start``; no deterministic ``seq`` exists on a
    stream, so open/close ties on identical timestamps are resolved by
    arrival (documented divergence from the batch operator).
    """
    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    interval = duration_to_interval(bar_size)
    out = (
        stream.na.drop(subset=[price])
        .withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), interval), F.col(symbol))
        .agg(*ohlcv_aggs(ts, price, size, seq=None))
        .withColumn(ts, F.col("window.start"))
        .drop("window")
    )
    return out


_VOL_STATE_SCHEMA = "carry_volume long, bar_id int"


def streaming_volume_bars(
    stream: DataFrame,
    *,
    bar_size: int = 10_000,
) -> DataFrame:
    """Stateful volume bars over a stream: emits each bar the moment its
    cumulative volume reaches ``bar_size`` (split semantics identical to
    the batch operator); the open partial bar is carried in group state.

    State per (symbol, date) is two numbers — the running volume into
    the current bar and the next bar id — so state size is O(groups),
    not O(rows): the shape that survives unbounded streams.
    """
    ts, price, size, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.size,
        column_names.symbol,
    )
    out_schema = T.StructType(
        [
            T.StructField(symbol, T.StringType()),
            T.StructField("bar_date", T.DateType()),
            T.StructField("bar_id", T.IntegerType()),
            T.StructField(f"{ts}_start", T.TimestampType()),
            T.StructField(f"{ts}_end", T.TimestampType()),
            T.StructField("open", T.DoubleType()),
            T.StructField("high", T.DoubleType()),
            T.StructField("low", T.DoubleType()),
            T.StructField("close", T.DoubleType()),
            T.StructField("volume", T.LongType()),
            T.StructField("vwap", T.DoubleType()),
            T.StructField("n_trades", T.IntegerType()),
            T.StructField("is_final", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("carry_volume", T.LongType()),
            T.StructField("bar_id", T.IntegerType()),
        ]
    )

    def update(
        key: Tuple[str, object],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sym, bar_date = key
        carry, next_bar = state.get if state.exists else (0, 0)

        rows = []
        for pdf in pdfs:
            rows.append(pdf)
        if not rows:
            return
        batch = pd.concat(rows).sort_values([ts]).reset_index(drop=True)

        pieces = []  # (bar_id, ts, price, amount)
        for _, row in batch.iterrows():
            remaining = int(row[size])
            p, t = float(row[price]), row[ts]
            while remaining > 0:
                room = bar_size - carry
                take = min(room, remaining)
                pieces.append((next_bar, t, p, take))
                carry += take
                remaining -= take
                if carry >= bar_size:
                    next_bar += 1
                    carry = 0

        state.update((int(carry), int(next_bar)))

        pdf = pd.DataFrame(pieces, columns=["bar_id", "t", "p", "amt"])
        g = pdf.groupby("bar_id", sort=True)
        bars = pd.DataFrame(
            {
                f"{ts}_start": g["t"].min(),
                f"{ts}_end": g["t"].max(),
                "open": g["p"].first(),
                "high": g["p"].max(),
                "low": g["p"].min(),
                "close": g["p"].last(),
                "volume": g["amt"].sum().astype("int64"),
                "vwap": g.apply(lambda x: float((x["p"] * x["amt"]).sum() / x["amt"].sum())),
                "n_trades": g.size().astype("int32"),
            }
        ).reset_index()
        bars["is_final"] = bars["bar_id"] < next_bar  # open bar id == next_bar
        bars.insert(0, "bar_date", bar_date)
        bars.insert(0, symbol, sym)
        bars["bar_id"] = bars["bar_id"].astype("int32")
        yield bars[[f.name for f in out_schema.fields]]

    grouped = (
        stream.na.drop(subset=[price])
        .withColumn("__date", F.to_date(ts))
        .groupBy(F.col(symbol), F.col("__date"))
    )
    return grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
