"""SemDeDup (functions/similarity.py::semdedup) and BPE pair counts
(functions/text.py::bpe_pair_counts)."""

from __future__ import annotations

import pytest

from polars_trading_spark.functions.similarity import semdedup
from polars_trading_spark.functions.text import bpe_pair_counts


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_drops_higher_id_near_dup(spark):
    # Centroids (lowest-id) are vecs 1 and 2 — the near-dup pair sits at
    # higher ids so both land in vec 1's cell.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.999, 0.001, 0.0]),  # near-dup of 1
        (4, [0.0, 0.7, 0.7]),      # same cell as 2, sim ~0.71: not a dup
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup(
            _emb(spark, rows), n_cells=2, threshold=0.95, centroid_method="lowest_id"
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[3]["keep"] is False and out[3]["dup_of"] == 1
    assert out[3]["dup_sim"] >= 0.99
    assert out[2]["keep"] is True
    assert out[4]["keep"] is True


def test_semdedup_dup_of_prefers_highest_similarity(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.045]),   # sim to 1 ~0.999
        (3, [0.9999, 0.014]),  # sim to 1 ~0.9999, sim to 2 even higher?
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup(
            _emb(spark, rows), n_cells=1, threshold=0.95, centroid_method="lowest_id"
        ).collect()
    }
    # 3's best lower-id match is whichever of 1/2 is most similar.
    assert out[3]["keep"] is False
    assert out[3]["dup_of"] in (1, 2)
    assert out[2]["dup_of"] == 1


def test_semdedup_cells_scope_comparisons(spark):
    # Identical vectors forced into different cells are NOT compared —
    # cells are the scale contract.  With orthogonal cell centroids the
    # two identical vectors land in the same cell and dedup fires.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [1.0, 0.0]),
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup(
            _emb(spark, rows), n_cells=2, threshold=0.99, centroid_method="lowest_id"
        ).collect()
    }
    assert out[3]["keep"] is False and out[3]["dup_of"] == 1
    assert out[2]["keep"] is True


def test_semdedup_kmeans_variant_runs(spark):
    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)]) for i in range(12)]
    out = semdedup(_emb(spark, rows), n_cells=3, threshold=0.99).collect()
    assert len(out) == 12
    # identical one-hot vectors: exactly one keeper per direction
    assert sum(1 for r in out if r["keep"]) == 3


def test_semdedup_validation(spark):
    df = _emb(spark, [(1, [1.0])])
    with pytest.raises(ValueError, match="threshold"):
        semdedup(df, threshold=0.0)
    with pytest.raises(ValueError, match="centroid_method"):
        semdedup(df, centroid_method="nope")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_pair_counts_golden(spark):
    out = bpe_pair_counts(_docs(spark, [(1, "aaab aab")]), top_k=10).collect()
    got = {(r["pair"]): (r["count"], r["rank"]) for r in out}
    # 'aaab' -> aa, aa, ab ; 'aab' -> aa, ab
    assert got["aa"] == (3, 1)
    assert got["ab"] == (2, 2)
    assert len(got) == 2


def test_bpe_normalization_and_single_chars(spark):
    out = bpe_pair_counts(_docs(spark, [(1, "A-B ab! c")]), top_k=10).collect()
    got = {r["pair"]: r["count"] for r in out}
    # "A-B" normalizes to tokens "a", "b" (punct -> space): no pairs;
    # "ab!" -> "ab": one pair; "c" single char ignored.
    assert got == {"ab": 1}


def test_bpe_tie_order_and_cutoff(spark):
    # Four pairs each count 1: top_k=2 keeps lexicographically first two.
    out = bpe_pair_counts(_docs(spark, [(1, "xy wv ut sr")]), top_k=2).collect()
    pairs = [r["pair"] for r in sorted(out, key=lambda r: r["rank"])]
    assert pairs == ["sr", "ut"]


def test_bpe_validation(spark):
    with pytest.raises(ValueError, match="top_k"):
        bpe_pair_counts(_docs(spark, [(1, "ab")]), top_k=0)


def test_semdedup_imi_near_dups_colocated_and_deterministic(spark):
    """Above imi_flat_max the two-level product quantizer takes over:
    planted near-dups (positive-scaled copies) must land in the same
    cell and be flagged, and the cell assignment must replay under a
    pure-Python IMI implementation of the same rule."""
    import math
    import random

    rng = random.Random(7)
    dim, n = 8, 300
    base = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    dups = [
        (i + n, [x * 1.000001 for x in v]) for i, v in base if i % 10 == 0
    ]
    rows = base + dups
    n_cells = 100  # > imi_flat_max=64 -> IMI path; k = 10
    out = semdedup(
        _emb(spark, rows),
        n_cells=n_cells,
        threshold=0.95,
        centroid_method="lowest_id",
    ).collect()
    by_id = {r["vec_id"]: r for r in out}

    # every planted dup shares its source's cell and is dropped
    for i, _ in base:
        if i % 10 == 0:
            assert by_id[i + n]["cell"] == by_id[i]["cell"], (i, by_id[i + n], by_id[i])
            assert by_id[i + n]["keep"] is False
            assert by_id[i + n]["dup_of"] is not None

    # Python replay of the IMI rule: codebooks = k lowest-id vectors,
    # halved; sequential-sum dots; ties -> lowest index.
    k = int(math.ceil(math.sqrt(n_cells)))
    cb = [v for _, v in sorted(rows)[:k]]
    h = dim // 2
    book_a = [v[:h] for v in cb]
    book_b = [v[h:] for v in cb]

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def best(half, book):
        sims = [seq_dot(half, c) / math.sqrt(seq_dot(c, c)) for c in book]
        return sims.index(max(sims))

    for vid, v in rows:
        expect = best(v[:h], book_a) * k + best(v[h:], book_b)
        assert by_id[vid]["cell"] == expect, (vid, by_id[vid]["cell"], expect)


def test_semdedup_imi_flat_below_threshold(spark):
    """n_cells <= imi_flat_max keeps the flat quantizer — the registry
    oracle (n_cells=8) replays flat argmax-cosine assignment."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.999, 0.001, 0.0]),
    ]
    flat = semdedup(
        _emb(spark, rows), n_cells=2, threshold=0.95, centroid_method="lowest_id"
    ).collect()
    forced_flat = semdedup(
        _emb(spark, rows),
        n_cells=2,
        threshold=0.95,
        centroid_method="lowest_id",
        imi_flat_max=None,
    ).collect()
    assert sorted(map(tuple, flat)) == sorted(map(tuple, forced_flat))
