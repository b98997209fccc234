"""quantile_profile / key_skew_profile (operators/stats.py)."""

from __future__ import annotations

import pytest

from polars_trading_spark.operators.stats import key_skew_profile, quantile_profile


class TestQuantileProfile:
    def test_matches_count_based_selection(self, spark):
        import random

        rng = random.Random(3)
        vals = {"A": [rng.uniform(0, 100) for _ in range(137)],
                "B": [float(i) for i in range(10)]}
        rows = [(s, v) for s, vs in vals.items() for v in vs]
        df = spark.createDataFrame(rows, "symbol string, v double")
        out = {
            r["symbol"]: r
            for r in quantile_profile(
                df, "v", by="symbol", percents=(25, 50, 90, 99, 100)
            ).collect()
        }
        for s, vs in vals.items():
            srt = sorted(vs)
            n = len(vs)
            assert out[s]["n"] == n
            for p in (25, 50, 90, 99, 100):
                k = (p * n + 99) // 100
                assert out[s][f"p{p}"] == srt[k - 1], (s, p)

    def test_nulls_excluded_and_validation(self, spark):
        df = spark.createDataFrame(
            [("A", 1.0), ("A", None), ("A", 3.0), ("B", None)],
            "symbol string, v double",
        )
        out = {r["symbol"]: r for r in quantile_profile(df, "v", by="symbol").collect()}
        assert out["A"]["n"] == 2 and out["A"]["p50"] == 1.0
        assert "B" not in out  # all-null group emits nothing
        with pytest.raises(ValueError, match="percents"):
            quantile_profile(df, "v", by="symbol", percents=(0,))

    def test_plan_zero_python(self, spark):
        from polars_trading_spark.plans import count_python_stages

        df = spark.createDataFrame([("A", 1.0)], "symbol string, v double")
        assert count_python_stages(quantile_profile(df, "v", by="symbol")) == 0


class TestKeySkewProfile:
    def test_heavy_hitters_and_ratio(self, spark):
        rows = [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
        df = spark.createDataFrame(rows, "k string")
        out = sorted(key_skew_profile(df, "k", top_k=2).collect(), key=lambda r: r["rank"])
        assert [r["key"] for r in out] == ["hot", "warm"]
        assert out[0]["n_rows"] == 80
        assert out[0]["share"] == pytest.approx(0.8)
        assert out[0]["n_keys"] == 3 and out[0]["total_rows"] == 100
        # max 80 vs mean 100/3 -> ratio 2.4
        assert out[0]["skew_ratio"] == pytest.approx(80 / (100 / 3))

    def test_null_key_counts_and_validation(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), (None,), (None,)], "k string"
        )
        out = sorted(key_skew_profile(df, "k", top_k=5).collect(), key=lambda r: r["rank"])
        assert out[0]["key"] is None and out[0]["n_rows"] == 3
        assert out[0]["n_keys"] == 2
        with pytest.raises(ValueError, match="top_k"):
            key_skew_profile(df, "k", top_k=0)

    def test_plan_take_ordered(self, spark):
        from polars_trading_spark.plans import count_python_stages, plan_string

        df = spark.createDataFrame([("a",)], "k string")
        out = key_skew_profile(df, "k")
        assert count_python_stages(out) == 0
        assert "TakeOrderedAndProject" in plan_string(out, "executed")
