"""IRLS quality classifier (functions/quality_model.py)."""

from __future__ import annotations

import pytest

from polars_trading_spark.functions.quality_model import (
    _gauss_jordan,
    quality_classifier,
)


def test_gauss_jordan_matches_numpy():
    import numpy as np

    rng = np.random.RandomState(11)
    for _ in range(5):
        a = rng.randn(7, 7)
        a = a @ a.T + 7 * np.eye(7)  # SPD, well-conditioned, no pivoting
        b = rng.randn(7)
        aug = [list(a[i]) + [b[i]] for i in range(7)]
        got = _gauss_jordan(aug)
        want = np.linalg.solve(a, b)
        assert np.allclose(got, want, rtol=1e-9)


@pytest.fixture(scope="module")
def qdocs(spark):
    # separable corpus: 'good' docs are long prose with common words,
    # 'bad' docs are short shouty repetition — the heuristic gate labels
    # them apart and the hashed-bucket profile differs
    good = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "slowly home while the evening light fades over the quiet town"
    )
    bad = "BUY NOW!!! CLICK CLICK CLICK"
    rows = [
        (i, good if i % 2 == 0 else bad, "en", f"s{i % 2}", 10)
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )


def test_quality_classifier_fits_the_heuristic(qdocs, spark):
    out = quality_classifier(qdocs, n_fold_buckets=8).collect()
    assert len(out) == 40
    by_id = {r["doc_id"]: r for r in out}
    labels = {r["doc_id"]: r["label"] for r in out}
    assert set(labels.values()) == {0, 1}  # both classes present
    for r in out:
        assert 0.0 < r["score"] < 1.0
        assert r["pred"] == (r["score"] >= 0.5)
    # the two duplicated texts get identical scores; a fitted model
    # separates them perfectly (identical features per class)
    acc = sum(1 for r in out if r["pred"] == bool(r["label"])) / len(out)
    assert acc == 1.0
    assert by_id[0]["score"] == by_id[2]["score"]
    assert by_id[1]["score"] == by_id[3]["score"]


def test_quality_classifier_is_deterministic(qdocs, spark):
    a = {r["doc_id"]: r["score"] for r in quality_classifier(qdocs, n_fold_buckets=8).collect()}
    b = {
        r["doc_id"]: r["score"]
        for r in quality_classifier(
            qdocs.repartition(7), n_fold_buckets=8
        ).collect()
    }
    assert a == b  # bit-identical across partition layouts


def test_quality_classifier_validation(qdocs):
    with pytest.raises(ValueError):
        quality_classifier(qdocs, n_buckets=0)
    with pytest.raises(ValueError):
        quality_classifier(qdocs, n_iters=0)
