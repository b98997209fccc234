"""Golden and property tests for the Kontoyiannis LZ match-length
entropy estimator (operators/entropy.py::lz_entropy), validated against
a direct O(n^2) suffix-scan replica."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
# ---------------------------------------------------------------------------
# Kontoyiannis LZ entropy (operators/entropy.py::lz_entropy)
# ---------------------------------------------------------------------------


def _naive_lz(prices, window):
    """Direct O(n^2) suffix scan of the non-overlapping match length."""
    bits = (np.diff(np.asarray(prices, dtype=float)) > 0).astype(int)
    n = len(bits)
    L = [None] * n
    H = [None] * n
    cnt = sl = 0
    log2w = math.log2(window)
    for i in range(n):
        if i >= window:
            best = 0
            for j in range(1, window + 1):
                src = i - j
                m = 0
                while m < j and i + m < n and bits[src + m] == bits[i + m]:
                    m += 1
                best = max(best, m)
            L[i] = 1 + best
            cnt += 1
            sl += L[i]
        if cnt:
            H[i] = log2w * cnt / sl
    return L, H


def test_lz_matches_naive_scan(spark):
    from polars_trading_spark.operators.entropy import lz_entropy

    rng = np.random.default_rng(3)
    rows = []
    series = {}
    for sym in ("A", "B"):
        prices = 100 + np.cumsum(rng.normal(0, 1, 300))
        series[sym] = prices
        for i, p in enumerate(prices):
            rows.append(
                {
                    "symbol": sym,
                    "ts_event": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    "price": float(p),
                }
            )
    out = (
        lz_entropy(spark.createDataFrame(pd.DataFrame(rows)), window=20)
        .toPandas()
        .sort_values(["symbol", "ts_event"])
        .reset_index(drop=True)
    )
    for sym, prices in series.items():
        L, H = _naive_lz(prices, 20)
        sub = out[out.symbol == sym].reset_index(drop=True)
        assert len(sub) == len(L)
        got_L = [None if pd.isna(v) else int(v) for v in sub["lz_match_len"]]
        assert got_L == L
        for g, e in zip(sub["lz_entropy"], H):
            if e is None:
                assert pd.isna(g)
            else:
                assert g == pytest.approx(e, rel=1e-12)


def test_lz_entropy_separates_random_from_repetitive(spark):
    """A fair-coin walk estimates ~1 bit/symbol; a strictly alternating
    (period-2, perfectly predictable) path collapses well below it."""
    from polars_trading_spark.operators.entropy import lz_entropy

    rng = np.random.default_rng(9)
    rows = []
    n = 400
    rand_walk = 100 + np.cumsum(np.where(rng.random(n) > 0.5, 1.0, -1.0))
    alt = 100 + np.cumsum(np.tile([1.0, -1.0], n // 2))
    for sym, prices in (("RAND", rand_walk), ("ALT", alt)):
        for i, p in enumerate(prices):
            rows.append(
                {
                    "symbol": sym,
                    "ts_event": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    "price": float(p),
                }
            )
    out = lz_entropy(spark.createDataFrame(pd.DataFrame(rows)), window=32).toPandas()
    last = out.dropna(subset=["lz_entropy"]).groupby("symbol").lz_entropy.last()
    assert last["RAND"] > 0.6
    assert last["ALT"] < 0.4
    assert last["ALT"] < last["RAND"]


def test_lz_window_validation(spark):
    from polars_trading_spark.operators.entropy import lz_entropy

    with pytest.raises(ValueError, match="window"):
        lz_entropy(spark.range(1), window=1)


class TestPermutationEntropy:
    def _trades(self, spark, prices, symbol="A"):
        import datetime as dt

        base = dt.datetime(2024, 1, 2)
        rows = [
            (symbol, base + dt.timedelta(seconds=i), i, float(p))
            for i, p in enumerate(prices)
        ]
        return spark.createDataFrame(
            rows, "symbol string, ts_event timestamp, seq long, price double"
        )

    @staticmethod
    def _ref(prices):
        import math
        from collections import Counter

        codes = Counter()
        for a, b, c in zip(prices, prices[1:], prices[2:]):
            codes[(b < a) * 4 + (c < a) * 2 + (c < b) * 1] += 1
        tot = sum(codes.values())
        h = -sum((n / tot) * math.log(n / tot) for n in codes.values())
        return h / math.log(6), tot, max(codes.values()) / tot

    def test_matches_reference_counter(self, spark):
        import numpy as np
        import pytest as pt

        from polars_trading_spark.operators.entropy import permutation_entropy

        rng = np.random.RandomState(3)
        prices = list(100 + np.cumsum(rng.normal(0, 1, 500)))
        row = permutation_entropy(
            self._trades(spark, prices), seq_col="seq"
        ).collect()[0]
        h, tot, share = self._ref(prices)
        assert row["n_windows"] == tot == 498
        assert row["perm_entropy"] == pt.approx(h, rel=1e-12)
        assert row["top_pattern_share"] == pt.approx(share, rel=1e-12)
        # a random walk is near-maximally irregular
        assert row["perm_entropy"] > 0.9

    def test_monotone_path_entropy_zero_and_invariance(self, spark):
        import numpy as np
        import pytest as pt

        from polars_trading_spark.operators.entropy import permutation_entropy

        row = permutation_entropy(
            self._trades(spark, list(range(1, 50))), seq_col="seq"
        ).collect()[0]
        assert row["perm_entropy"] == 0.0  # one pattern only
        assert row["top_pattern_share"] == 1.0
        # monotone-transform invariance: exp(price) gives identical output
        rng = np.random.RandomState(5)
        p = list(np.cumsum(rng.normal(0, 1, 200)))
        a = permutation_entropy(self._trades(spark, p), seq_col="seq").collect()[0]
        b = permutation_entropy(
            self._trades(spark, list(np.exp(np.array(p) / 10))), seq_col="seq"
        ).collect()[0]
        assert a["perm_entropy"] == pt.approx(b["perm_entropy"], rel=1e-12)

    def test_plan(self, spark):
        from polars_trading_spark.operators.entropy import permutation_entropy
        from polars_trading_spark.plans import count_python_stages

        out = permutation_entropy(self._trades(spark, [1, 2, 3, 4]), seq_col="seq")
        assert count_python_stages(out) == 0
