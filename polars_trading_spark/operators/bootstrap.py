"""Sequential bootstrap (AFML 4.5.3): sample events with probability
proportional to their *current* average uniqueness, so overlapping
labels are progressively down-weighted as copies of their span enter
the sample.

The reference stops at label generation (polars_trading/labels/); this
completes AFML ch.4 alongside ``sample_weights``.  The algorithm is
inherently sequential — each draw changes every later draw's
probabilities — so it runs as a slim ``applyInPandas`` island per
symbol with O(n_draws · n_events) vectorized work (prefix sums give all
span uniqueness means in one pass per draw).

**Determinism across engines.**  Randomness comes from the portable
60-bit md5 hash (`functions/text.py::portable_hash60` semantics):
``u(d, i) = (hash60(symbol|draw|idx) + 0.5) / 2^60``.  Each draw picks
``argmax_i ln(u(d, i)) / avgU_i`` — the A-Res weighted-sampling key
(Efraimidis & Spirakis 2006), which selects event ``i`` with
probability proportional to ``avgU_i`` **without any cumulative-sum
comparison**.  That choice is deliberate: per-event keys are computed
with the same operand order in Spark and the DuckDB recursive-CTE
oracle, and the integer coverage state updates exactly, so the only
cross-engine float divergence is ~1-ulp in a key whose distance to the
runner-up key is random O(1) — picks agree except with probability
~1e-12 per draw.  Output columns are integers/timestamps only.

Span convention (AFML 4.5): the timeline is the ordered set of event
``t0`` s per symbol; event ``i`` covers positions ``j`` with
``t0_i <= t0_j <= t1_i`` (its own position through the last event
starting inside its barrier).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL, with_seq

__all__ = ["sequential_bootstrap"]

_TWO60 = float(1 << 60)


def _u(symbol: str, draw: int, idx: int) -> float:
    h = int(hashlib.md5(f"{symbol}|{draw}|{idx}".encode()).hexdigest()[:15], 16)
    return (h + 0.5) / _TWO60


def sequential_bootstrap(
    events: DataFrame,
    *,
    n_draws: int,
    symbol_col: str = "symbol",
    t0_col: str = "t0",
    t1_col: str = "t1",
) -> DataFrame:
    """Draw ``n_draws`` events per symbol by sequential bootstrap.

    Returns ``symbol, draw, event_idx, t0`` (one row per draw, in draw
    order; ``event_idx`` is the 0-based position of the drawn event in
    (t0, seq) order).  Events may repeat — that is the point of a
    bootstrap; the draw distribution tilts toward low-overlap events.
    """
    if n_draws < 1:
        raise ValueError(f"n_draws must be >= 1, got {n_draws}")

    nd = int(n_draws)
    sym_name, t0_name, t1_name = symbol_col, t0_col, t1_col
    slim = with_seq(events).select(symbol_col, t0_col, t1_col, SEQ_COL)
    schema = f"{symbol_col} string, draw int, event_idx int, {t0_col} timestamp"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([t0_name, SEQ_COL], kind="mergesort").reset_index(drop=True)
        sym = pdf[sym_name].iloc[0]
        t0s = pdf[t0_name].to_numpy()
        t1s = pdf[t1_name].to_numpy()
        n = len(pdf)
        ends = np.searchsorted(t0s, t1s, side="right") - 1
        starts = np.arange(n)
        lens = (ends - starts + 1).astype(np.float64)
        c = np.zeros(n, dtype=np.int64)
        draws = np.empty(nd, dtype=np.int64)
        for d in range(1, nd + 1):
            inv = 1.0 / (1.0 + c)
            pref = np.concatenate(([0.0], np.cumsum(inv)))
            scores = (pref[ends + 1] - pref[starts]) / lens
            us = np.array([_u(sym, d, i) for i in range(n)])
            keys = np.log(us) / scores
            pick = int(np.argmax(keys))
            draws[d - 1] = pick
            c[pick : ends[pick] + 1] += 1
        return pd.DataFrame(
            {
                sym_name: sym,
                "draw": np.arange(1, nd + 1, dtype=np.int32),
                "event_idx": draws.astype(np.int32),
                t0_name: t0s[draws],
            }
        )

    return slim.groupBy(symbol_col).applyInPandas(kernel, schema=schema)
