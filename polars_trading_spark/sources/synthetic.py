"""Synthetic trade-data generator (test infrastructure parity).

Role of the reference's ``polars_trading._testing.data.generate_trade_data``
(_testing/data.py:8-24): seeded random trades — timestamps over a
multi-day range, prices in [1, 100], integer sizes in [10k, 100k],
tickers from ``n_companies`` symbols.  Deterministic via numpy's
Generator instead of mimesis (not in this environment); generated
driver-side and parallelized, which is fine for its purpose (fixtures
and benchmarks, not data at scale).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import DataFrame, SparkSession

__all__ = ["generate_trade_data"]

_TICKERS = [
    "AAPL", "MSFT", "GOOG", "AMZN", "META", "NVDA", "TSLA", "AMD", "INTC", "IBM",
    "ORCL", "CRM", "NFLX", "UBER", "SHOP", "SQ", "PLTR", "SNOW", "COIN", "ABNB",
]


def generate_trade_data(
    spark: SparkSession,
    n_rows: int = 10_000,
    n_companies: int = 3,
    *,
    seed: int = 42,
    start: dt.datetime = dt.datetime(2024, 1, 1),
    days: int = 7,
) -> DataFrame:
    """Seeded synthetic trades with the reference's column convention
    (``ts_event, price, size, symbol``) plus a deterministic ``seq``."""
    rng = np.random.default_rng(seed)
    span_us = days * 86_400_000_000
    ts_offset = np.sort(rng.integers(0, span_us, size=n_rows))
    prices = rng.uniform(1.0, 100.0, size=n_rows).round(4)
    sizes = rng.integers(10_000, 100_001, size=n_rows)
    symbols = rng.integers(0, n_companies, size=n_rows)
    base = start.replace(tzinfo=None)
    rows = [
        (
            base + dt.timedelta(microseconds=int(o)),
            float(p),
            int(s),
            _TICKERS[int(c) % len(_TICKERS)],
            i,
        )
        for i, (o, p, s, c) in enumerate(zip(ts_offset, prices, sizes, symbols))
    ]
    return spark.createDataFrame(
        rows, "ts_event timestamp, price double, size long, symbol string, __pts_seq long"
    )
