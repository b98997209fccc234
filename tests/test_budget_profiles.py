"""perplexity_budget_curves (functions/corpus.py) and
dedup_cluster_profile (functions/dedup.py)."""

from __future__ import annotations

import pytest

from polars_trading_spark.functions.corpus import perplexity_budget_curves
from polars_trading_spark.functions.dedup import dedup_cluster_profile


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_perplexity_curves_golden(spark):
    # one source, 4 ranked docs: common words score high logprob,
    # hapax gibberish scores low; token counts 4 / 4 / 2 / 2
    docs = _docs(
        spark,
        [
            (1, "s", "the cat the cat"),
            (2, "s", "the cat sat here"),
            (3, "s", "zq wv"),
            (4, "s", "the cat"),
            (5, "s", ""),  # empty: excluded from the curve
        ],
    )
    out = perplexity_budget_curves(docs, n_cutoffs=4).collect()
    rows = {r["cutoff_idx"]: r for r in out}
    assert len(rows) == 4
    total = rows[4]["total_tokens"]
    assert total == 4 + 4 + 2 + 2
    # last cutoff covers every token-bearing doc
    assert rows[4]["n_docs_kept"] == 4
    assert rows[4]["token_share"] == pytest.approx(1.0)
    assert rows[4]["cum_tokens"] == total
    # cum_tokens monotone in cutoff, ppl_cutoff monotone non-decreasing
    for d in (2, 3, 4):
        assert rows[d]["cum_tokens"] >= rows[d - 1]["cum_tokens"]
        assert rows[d]["ppl_cutoff"] >= rows[d - 1]["ppl_cutoff"] - 1e-9
    # the gibberish doc (hapax-only) ranks LAST: it enters only at the
    # final cutoff, so the cutoff-3 keep-set excludes exactly its 2
    # tokens
    assert rows[3]["cum_tokens"] == total - 2
    # ppl consistency at each boundary
    import math

    for r in out:
        assert r["ppl_cutoff"] == pytest.approx(
            math.exp(-r["logprob_cutoff"]), rel=1e-6
        )
    with pytest.raises(ValueError):
        perplexity_budget_curves(docs, n_cutoffs=0)


def test_dedup_cluster_profile_golden(spark):
    body = (
        "the quick brown fox jumps over the lazy dog near the quiet "
        "river bank while birds sing in the morning light"
    )
    other = (
        "completely different content about distributed query engines "
        "and shuffle partitioning strategies for large scale analytics"
    )
    docs = _docs(
        spark,
        [
            (1, "s", body),
            (2, "s", body),            # pair with 1
            (3, "s", other),
            (4, "s", other),
            (5, "s", other),           # triple with 3, 4
            (6, "s", "unique text one about gardening tools"),
            (7, "s", "unique text two about ocean navigation"),
        ],
    )
    out = {r["cluster_size"]: r for r in dedup_cluster_profile(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[1]["n_clusters"] == 2 and out[1]["dup_docs"] == 0
    assert out[2]["dup_docs"] == 1 and out[3]["dup_docs"] == 2
    assert sum(r["n_docs"] for r in out.values()) == 7
    assert sum(r["doc_share"] for r in out.values()) == pytest.approx(
        1.0, abs=1e-5
    )


def test_lsh_param_select_reference_and_monotonicity(spark):
    from itertools import combinations

    from polars_trading_spark._utils import release_persisted
    from polars_trading_spark.functions.dedup import lsh_param_select

    body = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    variants = [
        body,
        body,  # exact duplicate (j = 1)
        body.replace("gamma", "clone") + " extra words trailing here",
        "totally different text about storage engines and page caches "
        "with write ahead logging and checkpoint scheduling policies",
        body.replace("alpha beta", "first second").replace("tau", "x"),
    ]
    docs = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(variants)],
        "doc_id long, source string, text string",
    )
    try:
        out = {
            r["bands"]: r
            for r in lsh_param_select(
                docs, threshold=0.4, floor=0.1, num_hashes=12,
                sample_fraction=None,
            ).collect()
        }
    finally:
        release_persisted()
    assert set(out) == {1, 2, 3, 4, 6, 12}
    # python reference over the same pair population
    import math

    def toks(t):
        import re

        return [w for w in re.sub(r"[^a-z0-9 ]", " ", t.lower()).split() if w]

    def shingles(t):
        ws = toks(t)
        return {tuple(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sh = [shingles(t) for t in variants]
    pairs = []
    for a, b in combinations(range(len(variants)), 2):
        u = len(sh[a] | sh[b])
        j = len(sh[a] & sh[b]) / u if u else 0.0
        if j >= 0.1:
            pairs.append(j)
    for b in (1, 2, 3, 4, 6, 12):
        r = 12 // b
        pos = [j for j in pairs if round(j, 9) >= 0.4]
        neg = [j for j in pairs if round(j, 9) < 0.4]
        exp_r = sum(1 - (1 - j**r) ** b for j in pos) / len(pos)
        row = out[b]
        assert row["n_pos_pairs"] == len(pos)
        assert row["n_near_pairs"] == len(neg)
        assert row["exp_recall"] == pytest.approx(exp_r, rel=1e-6), b
        if neg:
            exp_f = sum(1 - (1 - j**r) ** b for j in neg) / len(neg)
            assert row["exp_near_fp"] == pytest.approx(exp_f, rel=1e-6), b
    # more bands (fewer rows) -> the S-curve shifts left: recall AND
    # near-miss mass both rise monotonically
    for lo, hi in ((1, 2), (2, 3), (3, 4), (4, 6), (6, 12)):
        assert out[hi]["exp_recall"] >= out[lo]["exp_recall"] - 1e-12
    assert out[12]["exp_recall"] > 0.99  # r=1, b=12 catches everything
    with pytest.raises(ValueError):
        lsh_param_select(docs, threshold=0.2, floor=0.3)


def test_lang_confusion_golden(spark):
    from polars_trading_spark.functions.text import lang_confusion

    en = "the quick brown fox and the lazy dog are in the house with it"
    de = "der schnelle braune fuchs und die katze sind nicht in dem haus"
    docs = spark.createDataFrame(
        [
            (1, "en", en),           # correct
            (2, "en", en),           # correct
            (3, "en", de),           # mislabeled: guess de, label en
            (4, "de", de),           # correct
            (5, "fr", "zzz qqq xxx www"),  # no stopword hits -> unknown
            (6, "zh", "这是一个中文文档的例子" * 3),  # CJK -> zh
        ],
        "doc_id long, lang string, text string",
    )
    out = {(r["lang"], r["lang_guess"]): r for r in lang_confusion(docs).collect()}
    assert out[("en", "en")]["n_docs"] == 2
    assert out[("en", "en")]["is_correct"] == 1
    assert out[("en", "de")]["n_docs"] == 1
    assert out[("en", "de")]["is_correct"] == 0
    assert out[("en", "en")]["share_of_lang"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[("en", "de")]["share_of_lang"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[("de", "de")]["share_of_lang"] == pytest.approx(1.0)
    assert out[("fr", "unknown")]["n_docs"] == 1
    assert out[("zh", "zh")]["is_correct"] == 1
    # shares sum to 1 within each label
    from collections import defaultdict

    sums = defaultdict(float)
    for (lang, _), r in out.items():
        sums[lang] += r["share_of_lang"]
    for v in sums.values():
        assert v == pytest.approx(1.0, abs=1e-5)
