"""BM25 ranking (functions/tfidf.py::bm25_topk) vs a python reference."""

from __future__ import annotations

import math

import pytest

from polars_trading_spark.functions.tfidf import bm25_topk

DOCS = [
    (0, "spark joins the hash table fast"),
    (1, "merge merge merge conflict in the merge queue"),
    (2, "the quick brown fox"),
    (3, "hash join hash join hash join"),
    (4, "stream processing with watermark and stream state"),
    (5, ""),
]
TERMS = ("hash", "join", "merge", "stream")


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _ref_scores(k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(DOCS)
    dls = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dls.values()) / n
    df = {q: sum(1 for t in toks.values() if q in t) for q in TERMS}
    out = {}
    for i, t in toks.items():
        s, hits = 0.0, 0
        for q in TERMS:
            tf = t.count(q)
            if tf == 0:
                continue
            hits += 1
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
        if hits:
            out[i] = (hits, dls[i], s)
    return out


def test_bm25_matches_python_reference(spark):
    got = {
        r["doc_id"]: r
        for r in bm25_topk(_docs(spark), query_terms=TERMS, top_k=10).collect()
    }
    ref = _ref_scores()
    assert set(got) == set(ref)  # doc 2 (no hit) and doc 5 (empty) excluded
    for i, (hits, dl, score) in ref.items():
        assert got[i]["n_terms_hit"] == hits
        assert got[i]["dl"] == dl
        assert got[i]["score"] == pytest.approx(round(score, 6), abs=1e-9)


def test_bm25_ranking_and_topk_truncation(spark):
    rows = bm25_topk(_docs(spark), query_terms=TERMS, top_k=2).collect()
    assert len(rows) == 2
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    ref = _ref_scores()
    best2 = sorted(ref, key=lambda i: (-round(ref[i][2], 6), i))[:2]
    assert [r["doc_id"] for r in rows] == best2


def test_bm25_term_saturation_monotone(spark):
    # k1 caps per-term contribution: tripling tf must NOT triple score
    ref = _ref_scores()
    one = ref[0][2]  # doc 0: one 'hash', one 'join'... baseline
    assert ref[3][2] < 3 * one + 3 * one  # doc 3: 3x hash + 3x join saturates


def test_bm25_validation_and_plan(spark):
    from polars_trading_spark.plans import count_python_stages, plan_string

    d = _docs(spark)
    with pytest.raises(ValueError):
        bm25_topk(d, query_terms=())
    with pytest.raises(ValueError):
        bm25_topk(d, query_terms=TERMS, k1=0)
    with pytest.raises(ValueError):
        bm25_topk(d, query_terms=TERMS, b=1.5)
    with pytest.raises(ValueError):
        bm25_topk(d, query_terms=TERMS, top_k=0)
    out = bm25_topk(d, query_terms=TERMS)
    assert count_python_stages(out) == 0
    assert "TakeOrderedAndProject" in plan_string(out, "executed")
