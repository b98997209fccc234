"""Winnowing fingerprints (functions/winnow.py) vs a sequential
reference implementation of Schleimer et al.'s robust winnowing."""

from __future__ import annotations

import hashlib

import pytest

from polars_trading_spark.functions.winnow import (
    winnow_duplicate_pairs,
    winnow_fingerprints,
)


def _norm_tokens(text: str) -> list[str]:
    import re

    t = re.sub(r"[^a-z0-9 ]", " ", text.lower())
    return [x for x in re.sub(r" +", " ", t).strip().split(" ") if x]


def _h40(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:10], 16)


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Sequential robust winnowing: per window of w k-gram hashes keep
    the minimum, rightmost on ties; return distinct (hash, pos)."""
    toks = _norm_tokens(text)
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [_h40(g) for g in grams]
    out: set[tuple[int, int]] = set()
    for start in range(0, len(hs) - w + 1):
        window = hs[start : start + w]
        m = min(window)
        # rightmost occurrence of the minimum
        pos = start + max(i for i, v in enumerate(window) if v == m)
        out.add((m, pos))
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


TEXTS = [
    "the quick brown fox jumps over the lazy dog while the quick brown fox naps",
    "pack my box with five dozen liquor jugs and pack my box again carefully",
    "the quick brown fox jumps over the lazy dog",  # prefix of doc 0
    "completely unrelated content about winnowing fingerprints and rolling hashes",
    "short doc",  # below k+w-1 tokens at k=4,w=4 -> no fingerprints
]


@pytest.mark.parametrize("k,w", [(4, 4), (3, 5), (2, 2), (1, 3)])
def test_matches_sequential_reference(spark, k, w):
    out = winnow_fingerprints(_docs(spark, TEXTS), k=k, w=w).collect()
    got: dict[int, set] = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add((r["fp"], r["pos"]))
    for i, t in enumerate(TEXTS):
        assert got.get(i, set()) == _ref_winnow(t, k, w), (i, k, w)


def test_shared_substring_guarantee(spark):
    # doc 2 is a full prefix of doc 0 (9 tokens >= w + k - 1 = 7):
    # the winnowing guarantee forces at least one shared fingerprint.
    out = winnow_fingerprints(_docs(spark, TEXTS), k=4, w=4).collect()
    by_doc: dict[int, set] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[2]
    # density sanity: expected 2/(w+1) of k-gram count, allow wide band
    n_grams = len(_norm_tokens(TEXTS[0])) - 3
    assert 1 <= len(by_doc[0]) <= n_grams


def test_short_doc_emits_nothing(spark):
    out = winnow_fingerprints(_docs(spark, TEXTS), k=4, w=4).collect()
    assert not [r for r in out if r["doc_id"] == 4]


def test_duplicate_pairs_and_pruning(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in winnow_duplicate_pairs(
            _docs(spark, TEXTS), k=4, w=4, min_shared=1, max_df=50
        ).collect()
    }
    assert (0, 2) in pairs
    r = pairs[(0, 2)]
    ref_a = {h for h, _ in _ref_winnow(TEXTS[0], 4, 4)}
    ref_b = {h for h, _ in _ref_winnow(TEXTS[2], 4, 4)}
    assert r["shared"] == len(ref_a & ref_b)
    assert r["overlap"] == pytest.approx(
        len(ref_a & ref_b) / min(len(ref_a), len(ref_b))
    )
    # max_df=1 prunes every fingerprint shared by two docs -> no pairs
    assert (
        winnow_duplicate_pairs(
            _docs(spark, TEXTS), k=4, w=4, min_shared=1, max_df=1
        ).count()
        == 0
    )


def test_validation_and_plan(spark):
    from polars_trading_spark.plans import (
        count_python_stages,
        unbounded_global_windows,
    )

    with pytest.raises(ValueError):
        winnow_fingerprints(_docs(spark, TEXTS), k=0)
    out = winnow_fingerprints(_docs(spark, TEXTS), k=4, w=4)
    assert count_python_stages(out) == 0
    assert unbounded_global_windows(out) == []
