"""Brute-force differential for exact substring dedup (round-13
ADVICE follow-through): random tiny corpora with a small vocabulary
(so duplicated spans arise naturally) checked against an INDEPENDENT
pure-Python reference that works on token tuples — no shingle hashes,
no SQL, no window functions — for both the stats and cleaned-text
forms.  A shared algorithmic error in the canonical-pick or span-union
rule cannot pass this and the DuckDB replay oracle simultaneously."""

from __future__ import annotations

import random
import re

import pytest

from polars_trading_spark.functions.dedup import (
    exact_substring_dedup,
    exact_substring_dedup_clean,
)

VOCAB = ["aa", "bb", "cc", "dd", "ee"]


def _tokens(text: str) -> list[str]:
    norm = re.sub(r"[^a-z0-9 ]", " ", text.lower())
    return [t for t in norm.split() if t]


def _reference(docs: list[tuple[int, str]], k: int):
    """Token-tuple brute force: duplicated k-shingles corpus-wide,
    keep-first (smallest (doc, pos)), per-doc span union."""
    toks = {d: _tokens(t) for d, t in docs}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[p : p + k]), []).append((d, p))
    removals: dict[int, set[int]] = {d: set() for d in toks}
    for positions in occ.values():
        if len(positions) >= 2:
            keep = min(positions)
            for d, p in positions:
                if (d, p) != keep:
                    removals[d].add(p)
    out = {}
    for d, ts in toks.items():
        covered = set()
        for p in sorted(removals[d]):
            covered.update(range(p, p + k))
        spans = 0
        prev = None
        for p in sorted(removals[d]):
            if prev is None or p - prev > k:
                spans += 1
            prev = p
        kept = [t for i, t in enumerate(ts) if i not in covered]
        out[d] = {
            "n_tokens": len(ts),
            "removed_tokens": len(covered),
            "removed_spans": spans,
            "kept_tokens": len(ts) - len(covered),
            "cleaned_text": " ".join(kept),
        }
    return out


def _random_corpus(seed: int):
    rng = random.Random(seed)
    docs = []
    for d in range(rng.randint(3, 6)):
        n = rng.randint(0, 18)
        docs.append((d + 1, " ".join(rng.choice(VOCAB) for _ in range(n))))
    return docs


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_stats_and_clean_match_brute_force(spark, seed):
    k = 3
    docs = _random_corpus(seed)
    ref = _reference(docs, k)
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    stats = {r["doc_id"]: r for r in exact_substring_dedup(df, k=k).collect()}
    clean = {
        r["doc_id"]: r for r in exact_substring_dedup_clean(df, k=k).collect()
    }
    for d, want in ref.items():
        s, c = stats[d], clean[d]
        assert s["n_tokens"] == want["n_tokens"], (seed, d)
        assert s["removed_tokens"] == want["removed_tokens"], (seed, d)
        assert s["removed_spans"] == want["removed_spans"], (seed, d)
        assert s["kept_tokens"] == want["kept_tokens"], (seed, d)
        assert c["cleaned_text"] == want["cleaned_text"], (seed, d)
        assert c["kept_tokens"] == want["kept_tokens"], (seed, d)
