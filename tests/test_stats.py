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


def test_robust_moments_matches_python_reference(spark):
    import numpy as np

    from polars_trading_spark.operators.stats import robust_moments

    rng = np.random.RandomState(23)
    rows = []
    for sym in ("A", "B"):
        vals = rng.normal(0, 1, size=57).tolist() + [40.0, -35.0, 60.0]
        for i, x in enumerate(vals):
            rows.append((sym, i, float(x)))
    df = spark.createDataFrame(rows, "symbol string, i long, value double")
    alpha = 0.1
    out = {
        r["symbol"]: r
        for r in robust_moments(
            df, alpha=alpha, group_col="symbol", value_col="value", order_cols=("i",)
        ).collect()
    }
    by_sym = {}
    for sym, i, x in rows:
        by_sym.setdefault(sym, []).append(x)
    for sym, vals in by_sym.items():
        n = len(vals)
        k = int(np.floor(alpha * n))
        s = sorted(vals)
        trimmed = s[k : n - k]
        winsor = [s[k]] * k + trimmed + [s[n - k - 1]] * k
        r = out[sym]
        assert r["n"] == n and r["n_cut"] == k
        assert r["trimmed_mean"] == pytest.approx(np.mean(trimmed), rel=1e-9)
        assert r["winsor_mean"] == pytest.approx(np.mean(winsor), rel=1e-9)
        assert r["winsor_std"] == pytest.approx(np.std(winsor, ddof=1), rel=1e-9)
        # the planted 40/-35/60 outliers must not survive the trim:
        # robust mean stays near 0 while the raw mean is dragged
        assert abs(r["trimmed_mean"]) < 0.5 < abs(np.mean(vals))


def test_robust_moments_validation_degenerate_and_plan(spark):
    from polars_trading_spark.operators.stats import robust_moments
    from polars_trading_spark.plans import (
        count_python_stages,
        has_unbounded_following_frame,
        unbounded_global_windows,
    )

    df = spark.createDataFrame(
        [("A", 0, 1.0), ("A", 1, 2.0)], "symbol string, i long, value double"
    )
    with pytest.raises(ValueError):
        robust_moments(df, alpha=0.0)
    with pytest.raises(ValueError):
        robust_moments(df, alpha=0.5)
    # n=2, alpha=0.4 -> k=0: nothing trimmed, plain moments
    out = robust_moments(
        df, alpha=0.4, group_col="symbol", value_col="value", order_cols=("i",)
    ).collect()[0]
    assert out["n_cut"] == 0
    assert out["trimmed_mean"] == pytest.approx(1.5)
    assert out["winsor_mean"] == pytest.approx(1.5)
    assert out["winsor_std"] == pytest.approx(0.7071067811865476)

    plan = robust_moments(
        df, group_col="symbol", value_col="value", order_cols=("i",)
    )
    assert count_python_stages(plan) == 0
    assert unbounded_global_windows(plan) == []
    assert not has_unbounded_following_frame(plan)
