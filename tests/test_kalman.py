"""kalman_hedge (operators/kalman.py) vs a pure-python reference."""

from __future__ import annotations

import datetime as dt

import pytest

from polars_trading_spark.operators.kalman import kalman_hedge

BASE = dt.datetime(2024, 1, 1)


def _py_kf(xs, ys, q=1e-5, r=1e-3, beta0=0.0, p0=1.0):
    beta, p, out = beta0, p0, []
    for x, y in zip(xs, ys):
        p_pred = p + q
        innov = y - beta * x
        gain = p_pred * x / (x * x * p_pred + r)
        beta = beta + gain * innov
        p = (1.0 - gain * x) * p_pred
        out.append((beta, innov))
    return out


class TestKalmanHedge:
    def _bars(self, spark, series):
        rows = [
            (s, BASE + dt.timedelta(minutes=15 * i), p)
            for s, ps in series.items()
            for i, p in enumerate(ps)
        ]
        return spark.createDataFrame(rows, "symbol string, ts timestamp, close double")

    def test_matches_python_reference(self, spark):
        import math
        import random

        rng = random.Random(11)
        xs = [50.0]
        for _ in range(59):
            xs.append(max(1.0, xs[-1] + rng.gauss(0, 0.5)))
        true_beta = 2.0
        ys = [true_beta * x + rng.gauss(0, 0.2) for x in xs]
        bars = self._bars(spark, {"A": ys, "B": xs})  # sym_a=A is y, sym_b=B is x
        out = sorted(
            kalman_hedge(bars, ts_col="ts", close_col="close").collect(),
            key=lambda r: r["ts"],
        )
        ref = _py_kf(xs, ys)
        assert len(out) == 60
        for r, (beta, innov) in zip(out, ref):
            assert (r["sym_a"], r["sym_b"]) == ("A", "B")
            assert r["beta"] == pytest.approx(beta, rel=1e-12, abs=1e-12)
            assert r["spread"] == pytest.approx(innov, rel=1e-12, abs=1e-12)
        # the filter converges toward the true hedge ratio
        assert abs(out[-1]["beta"] - true_beta) < 0.2
        assert abs(out[0]["beta"] - true_beta) > abs(out[-1]["beta"] - true_beta)
        assert not math.isnan(out[-1]["spread"])

    def test_pairs_and_shared_bars_only(self, spark):
        series = {
            "A": [1.0, 2.0, 3.0],
            "B": [2.0, 4.0, 6.0],
            "C": [1.0, 1.0],  # one bar short
        }
        bars = self._bars(spark, series)
        out = kalman_hedge(bars, ts_col="ts", close_col="close").collect()
        pairs = {(r["sym_a"], r["sym_b"]) for r in out}
        assert pairs == {("A", "B"), ("A", "C"), ("B", "C")}
        counts = {}
        for r in out:
            counts[(r["sym_a"], r["sym_b"])] = counts.get((r["sym_a"], r["sym_b"]), 0) + 1
        assert counts[("A", "B")] == 3 and counts[("A", "C")] == 2

    def test_validation_and_single_python_island(self, spark):
        from polars_trading_spark.plans import count_python_stages

        bars = self._bars(spark, {"A": [1.0], "B": [2.0]})
        with pytest.raises(ValueError, match="q and r"):
            kalman_hedge(bars, q=0.0, ts_col="ts")
        with pytest.raises(ValueError, match="p0"):
            kalman_hedge(bars, p0=0.0, ts_col="ts")
        out = kalman_hedge(bars, ts_col="ts", close_col="close")
        assert count_python_stages(out) == 1  # exactly the sequential island
