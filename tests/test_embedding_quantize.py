"""INT8 embedding quantization audit (functions/similarity.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from polars_trading_spark.functions.similarity import embedding_quantize_report


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_quantize_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 6) * np.array([1.0, 0.1, 5.0, 0.01, 2.0, 1.0])
    vecs[:, 5] = 0.0  # constant-zero dimension
    out = {
        r["dim"]: r
        for r in embedding_quantize_report(_emb(spark, vecs)).collect()
    }
    x = np.asarray(vecs, dtype=np.float64)
    amax = np.abs(x).max(axis=0)
    scale = amax / 127.0
    for d in range(6):
        r = out[d]
        assert r["n"] == 40
        assert r["scale"] == pytest.approx(scale[d], abs=1e-15)
        if scale[d] == 0:
            assert r["mse"] == 0.0 and r["max_abs_err"] == 0.0
            continue
        q = np.clip(np.floor(x[:, d] / scale[d] + 0.5), -127, 127)
        err = x[:, d] - q * scale[d]
        assert r["mse"] == pytest.approx(float(np.mean(err**2)), rel=1e-9)
        assert r["max_abs_err"] == pytest.approx(
            float(np.max(np.abs(err))), rel=1e-12
        )
        # floor-half-up bounds the error by half a quantization step
        assert r["max_abs_err"] <= scale[d] / 2 + 1e-15


def test_quantize_layout_invariant(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(130, 4)
    df = _emb(spark, vecs)
    a = sorted(
        embedding_quantize_report(df.repartition(1)).collect(),
        key=lambda r: r["dim"],
    )
    b = sorted(
        embedding_quantize_report(df.repartition(13)).collect(),
        key=lambda r: r["dim"],
    )
    # hierarchical folds -> bit-exact under any partition layout
    for ra, rb in zip(a, b):
        assert ra == rb


def test_quantize_validation(spark):
    df = _emb(spark, [[1.0, 2.0]])
    with pytest.raises(ValueError):
        embedding_quantize_report(df, n_fold_buckets=0)
