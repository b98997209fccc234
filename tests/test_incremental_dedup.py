"""Incremental MinHash dedup against a persisted signature index
(functions/dedup.py::minhash_index / incremental_dedup)."""

from __future__ import annotations

import pytest

from polars_trading_spark.functions.dedup import (
    MERSENNE31,
    incremental_dedup,
    minhash_index,
)

_BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_golden(spark):
    base = _docs(spark, [(1, _BASE_TEXT), (2, "completely unrelated words here")])
    index = minhash_index(base)
    new = _docs(
        spark,
        [
            (10, _BASE_TEXT),  # exact copy of base doc 1
            (11, "novel content about spark engines and shuffle plans"),
            (12, "novel content about spark engines and shuffle plans"),
            (13, ""),  # empty: sentinel signature, never matches
        ],
    )
    out = {r["doc_id"]: r for r in incremental_dedup(new, index).collect()}
    assert len(out) == 4
    # exact copy: all 12 minima equal -> est 1.0, base wins
    assert out[10]["keep"] == 0
    assert out[10]["dup_of"] == 1 and out[10]["dup_is_base"] == 1
    assert out[10]["est_jaccard"] == pytest.approx(1.0)
    # first of the in-batch pair survives, the second points at it
    assert out[11]["keep"] == 1 and out[11]["dup_of"] is None
    assert out[12]["keep"] == 0
    assert out[12]["dup_of"] == 11 and out[12]["dup_is_base"] == 0
    assert out[12]["est_jaccard"] == pytest.approx(1.0)
    # empty doc never collides
    assert out[13]["keep"] == 1 and out[13]["est_jaccard"] is None


def test_incremental_base_precedence(spark):
    # the same text exists in the index AND as a lower-id new doc: the
    # tie (equal est) must resolve to the BASE side
    base = _docs(spark, [(5, _BASE_TEXT)])
    index = minhash_index(base)
    new = _docs(spark, [(20, _BASE_TEXT), (21, _BASE_TEXT)])
    out = {r["doc_id"]: r for r in incremental_dedup(new, index).collect()}
    assert out[20]["keep"] == 0 and out[20]["dup_of"] == 5
    assert out[20]["dup_is_base"] == 1
    assert out[21]["dup_of"] == 5 and out[21]["dup_is_base"] == 1


def test_incremental_index_columns_and_sentinel(spark):
    base = _docs(spark, [(1, _BASE_TEXT)])
    index = minhash_index(base)
    assert set(index.columns) == {"doc_id"} | {f"m{i}" for i in range(12)}
    # empty-text signature is all-sentinel
    empty_sig = minhash_index(_docs(spark, [(9, "")])).collect()[0]
    assert all(empty_sig[f"m{i}"] == MERSENNE31 for i in range(12))
    new = _docs(spark, [(30, "some fresh text never seen before today")])
    with pytest.raises(ValueError, match="missing signature column"):
        incremental_dedup(new, index.drop("m3"))
    with pytest.raises(ValueError):
        incremental_dedup(new, index, bands=5)
    with pytest.raises(ValueError):
        incremental_dedup(new, index, sig_threshold=0.0)


def test_incremental_scales_with_new_side_only(spark):
    # the plan must tokenize/shingle ONLY the new snapshot: the index
    # side is consumed as-is (no text column needed at all)
    base = _docs(spark, [(i, f"base document number {i} filler words") for i in range(20)])
    index = minhash_index(base).select("doc_id", *[f"m{i}" for i in range(12)])
    new = _docs(spark, [(100, "a brand new document about engines")])
    out = incremental_dedup(new, index)
    assert out.collect()[0]["keep"] == 1
