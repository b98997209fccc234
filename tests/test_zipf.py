"""Zipf-law corpus fit (functions/tfidf.py::zipf_fit)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from polars_trading_spark.functions.tfidf import zipf_fit


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9 ]", " ", text.lower())
    return [x for x in re.sub(r" +", " ", t).strip().split(" ") if x]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref_fit(texts, top_k):
    counts = Counter(tok for t in texts for tok in _norm_tokens(t))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _, c in top]
    n = len(top)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    vxx, vyy, cxy = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy
    slope = cxy / vxx
    return {
        "n_ranks": n,
        "n_vocab": len(counts),
        "total_tokens": sum(counts.values()),
        "alpha": -slope,
        "intercept": (sy - slope * sx) / n,
        "r2": cxy * cxy / (vxx * vyy) if vyy > 0 else None,
    }


def test_matches_numpy_reference_on_synthetic_zipf(spark):
    # build a corpus whose token counts follow count(r) = round(600/r):
    # the log-log fit must recover alpha ~ 1 with high r2
    texts = []
    for r in range(1, 40):
        texts.append(" ".join([f"tok{r:03d}"] * max(1, round(600 / r))))
    out = zipf_fit(_docs(spark, texts), top_k=30).collect()
    assert len(out) == 1
    row, ref = out[0], _ref_fit(texts, 30)
    assert row["n_ranks"] == ref["n_ranks"] == 30
    assert row["n_vocab"] == ref["n_vocab"]
    assert row["total_tokens"] == ref["total_tokens"]
    assert row["alpha"] == pytest.approx(ref["alpha"], rel=1e-12)
    assert row["intercept"] == pytest.approx(ref["intercept"], rel=1e-12)
    assert row["r2"] == pytest.approx(ref["r2"], rel=1e-12)
    assert 0.9 < row["alpha"] < 1.1 and row["r2"] > 0.99


def test_flat_distribution_null_r2(spark):
    # every token appears exactly once -> y is constant -> vyy == 0 -> r2 null
    texts = ["alpha beta gamma delta epsilon zeta eta theta"]
    row = zipf_fit(_docs(spark, texts), top_k=5).collect()[0]
    assert row["r2"] is None
    assert row["alpha"] == pytest.approx(0.0)


def test_validation_and_plan(spark):
    from polars_trading_spark.plans import (
        count_python_stages,
        unbounded_global_windows,
    )

    with pytest.raises(ValueError):
        zipf_fit(_docs(spark, ["a b c"]), top_k=2)
    out = zipf_fit(_docs(spark, ["a a b b c"] * 3), top_k=5)
    assert count_python_stages(out) == 0
    # the global running-sum windows must sit above the top-k limit
    assert unbounded_global_windows(out) == []
