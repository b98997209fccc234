"""Tests for return-sign entropy (operators/entropy.py) and deterministic
stratified sampling (functions/corpus.py::stratified_sample)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from polars_trading_spark.functions.corpus import stratified_sample
from polars_trading_spark.operators.entropy import return_entropy


@pytest.fixture(scope="module")
def price_pdf():
    rng = np.random.default_rng(17)
    rows = []
    for sym in ("A", "B"):
        price = 20.0
        t = pd.Timestamp("2024-05-01")
        for _ in range(340):
            t = t + pd.Timedelta(seconds=int(rng.integers(1, 20)))
            price = max(0.5, price + rng.choice([-0.5, 0.0, 0.5], p=[0.4, 0.2, 0.4]))
            rows.append({"symbol": sym, "ts_event": t, "price": price})
    return pd.DataFrame(rows)


def _entropy_golden(prices, word_len, block):
    s = np.sign(np.diff(prices))
    chars = np.where(s > 0, "u", np.where(s < 0, "d", "f"))
    words = ["".join(chars[i : i + word_len]) for i in range(len(chars) - word_len + 1)]
    out = []
    for b in range(0, len(words), block):
        blk = words[b : b + block]
        n = len(blk)
        counts = pd.Series(blk).value_counts()
        h = -sum((c / n) * math.log2(c / n) for c in counts)
        out.append((n, h))
    return out


def test_entropy_matches_golden(spark, price_pdf):
    word_len, block = 2, 50
    out = (
        return_entropy(spark.createDataFrame(price_pdf), word_len=word_len, block=block)
        .toPandas()
        .sort_values(["symbol", "ts_event_start"])
        .reset_index(drop=True)
    )
    for sym, grp in price_pdf.groupby("symbol"):
        grp = grp.sort_values("ts_event")
        exp = _entropy_golden(grp["price"].to_numpy(), word_len, block)
        got = out[out.symbol == sym].reset_index(drop=True)
        assert len(got) == len(exp)
        for i, (n, h) in enumerate(exp):
            assert got.loc[i, "n_words"] == n
            assert got.loc[i, "entropy"] == pytest.approx(h, abs=2e-6)
            assert got.loc[i, "entropy_rate"] == pytest.approx(h / word_len, abs=2e-6)


def test_entropy_bounds(spark, price_pdf):
    out = return_entropy(spark.createDataFrame(price_pdf), word_len=2, block=50).toPandas()
    # 3-symbol alphabet, word length 2 -> entropy in [0, 2*log2(3)]
    assert (out["entropy"] >= 0).all()
    assert (out["entropy"] <= 2 * math.log2(3) + 1e-9).all()


def test_entropy_constant_series_is_zero(spark):
    pdf = pd.DataFrame(
        {
            "symbol": ["A"] * 40,
            "ts_event": pd.date_range("2024-01-01", periods=40, freq="1min"),
            "price": [5.0] * 40,
        }
    )
    out = return_entropy(spark.createDataFrame(pdf), word_len=2, block=10).toPandas()
    assert (out["entropy"] == 0).all()


def test_entropy_validation(spark, price_pdf):
    sdf = spark.createDataFrame(price_pdf)
    with pytest.raises(ValueError):
        return_entropy(sdf, word_len=0)
    with pytest.raises(ValueError):
        return_entropy(sdf, block=0)


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_pdf():
    rng = np.random.default_rng(23)
    langs = rng.choice(["en", "de", "fr"], size=3000, p=[0.7, 0.2, 0.1])
    return pd.DataFrame({"doc_id": np.arange(3000), "lang": langs})


def test_sample_rates_and_determinism(spark, docs_pdf):
    sdf = spark.createDataFrame(docs_pdf)
    fr = {"en": 0.2, "de": 0.8}
    a = stratified_sample(sdf, stratum_col="lang", fractions=fr, default_fraction=1.0).toPandas()
    b = stratified_sample(sdf, stratum_col="lang", fractions=fr, default_fraction=1.0).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)  # deterministic
    rates = a.groupby("lang").size() / docs_pdf.groupby("lang").size()
    assert rates["en"] == pytest.approx(0.2, abs=0.05)
    assert rates["de"] == pytest.approx(0.8, abs=0.07)
    assert rates["fr"] == 1.0  # default keeps unknown strata


def test_sample_nesting(spark, docs_pdf):
    """A smaller fraction must select a strict subset of a larger one."""
    sdf = spark.createDataFrame(docs_pdf)
    small = set(
        stratified_sample(sdf, stratum_col="lang", fractions={"en": 0.1}).toPandas().doc_id
    )
    big = set(
        stratified_sample(sdf, stratum_col="lang", fractions={"en": 0.3}).toPandas().doc_id
    )
    assert small <= big


def test_sample_salt_redraws(spark, docs_pdf):
    sdf = spark.createDataFrame(docs_pdf)
    a = set(stratified_sample(sdf, stratum_col="lang", fractions={"en": 0.5}).toPandas().doc_id)
    b = set(
        stratified_sample(sdf, stratum_col="lang", fractions={"en": 0.5}, salt="other")
        .toPandas()
        .doc_id
    )
    assert a != b


def test_sample_validation(spark, docs_pdf):
    sdf = spark.createDataFrame(docs_pdf)
    with pytest.raises(ValueError):
        stratified_sample(sdf, stratum_col="lang", fractions={"en": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(sdf, stratum_col="lang", fractions={}, default_fraction=-0.1)


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

from polars_trading_spark.functions.corpus import decontaminate


@pytest.fixture(scope="module")
def contamination_pdf():
    bench_rows = [
        {"doc_id": 1000, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 1001, "text": "to be or not to be that is the question"},
    ]
    corpus_rows = [
        # contains benchmark trigram "quick brown fox"
        {"doc_id": 1, "text": "I saw a quick brown fox yesterday evening"},
        # verbatim copy of a benchmark doc
        {"doc_id": 2, "text": "to be or not to be that is the question"},
        # clean
        {"doc_id": 3, "text": "completely unrelated sentence about spark engines"},
        # too short for any trigram
        {"doc_id": 4, "text": "hi there"},
    ]
    return pd.DataFrame(corpus_rows), pd.DataFrame(bench_rows)


def test_decontaminate_flags(spark, contamination_pdf):
    corpus, bench = contamination_pdf
    out = (
        decontaminate(spark.createDataFrame(corpus), spark.createDataFrame(bench), ngram=3)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[1, "is_contaminated"])
    assert bool(out.loc[2, "is_contaminated"])
    assert not bool(out.loc[3, "is_contaminated"])
    assert not bool(out.loc[4, "is_contaminated"])
    # verbatim copy: every one of its n-grams hits
    assert out.loc[2, "contamination_ratio"] == 1.0
    assert out.loc[4, "n_grams"] == 0 and out.loc[4, "contamination_ratio"] == 0.0
    # partial overlap flags but with ratio < 1
    assert 0 < out.loc[1, "contamination_ratio"] < 1


def test_decontaminate_broadcast_plan(spark, contamination_pdf):
    corpus, bench = contamination_pdf
    plan = (
        decontaminate(spark.createDataFrame(corpus), spark.createDataFrame(bench))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_decontaminate_validation(spark, contamination_pdf):
    corpus, bench = contamination_pdf
    c, b = spark.createDataFrame(corpus), spark.createDataFrame(bench)
    with pytest.raises(ValueError):
        decontaminate(c, b, ngram=0)
    with pytest.raises(ValueError):
        decontaminate(c, b, min_hits=0)


def test_contamination_report_hand_computed(spark, contamination_pdf):
    """Round-9 rollup: per-(benchmark, source) leakage, hand-checked —
    suite_fox contaminates only src_x (doc 1 partial + nothing else);
    suite_hamlet catches the verbatim copy in src_y; clean pairs emit
    zero rows with full totals; token leak weights by doc token count."""
    from polars_trading_spark.functions.corpus import contamination_report

    corpus, bench = contamination_pdf
    corpus = corpus.assign(source=["src_x", "src_y", "src_y", "src_x"])
    bench = bench.assign(benchmark=["suite_fox", "suite_hamlet"])
    out = (
        contamination_report(
            spark.createDataFrame(corpus),
            spark.createDataFrame(bench),
            ngram=3,
        )
        .toPandas()
        .set_index(["benchmark", "source"])
        .sort_index()
    )
    # full grid: 2 suites x 2 sources, including clean combinations
    assert len(out) == 4
    toks = corpus.text.str.split().str.len()
    for src, n in (("src_x", 2), ("src_y", 2)):
        for suite in ("suite_fox", "suite_hamlet"):
            r = out.loc[(suite, src)]
            assert r.n_docs == n
            assert r.tokens_total == toks[corpus.source == src].sum()
    fox_x = out.loc[("suite_fox", "src_x")]
    assert fox_x.n_contaminated == 1  # doc 1 only
    assert fox_x.contamination_rate == 0.5
    assert fox_x.tokens_contaminated == toks[0]
    ham_y = out.loc[("suite_hamlet", "src_y")]
    assert ham_y.n_contaminated == 1  # the verbatim copy (doc 2)
    assert ham_y.tokens_contaminated == toks[1]
    assert out.loc[("suite_fox", "src_y")].n_contaminated == 0
    assert out.loc[("suite_fox", "src_y")].token_leak_rate == 0.0
    assert out.loc[("suite_hamlet", "src_x")].n_contaminated == 0


def test_contamination_report_broadcast_plan_and_validation(
    spark, contamination_pdf
):
    from polars_trading_spark.functions.corpus import contamination_report

    corpus, bench = contamination_pdf
    c = spark.createDataFrame(corpus.assign(source="s"))
    b = spark.createDataFrame(bench.assign(benchmark="x"))
    plan = (
        contamination_report(c, b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError):
        contamination_report(c, b, ngram=0)
    with pytest.raises(ValueError):
        contamination_report(c, b, min_hits=0)


def test_benchmark_coverage_hand_computed(spark, contamination_pdf):
    """Coverage = |suite grams ∩ corpus grams| / |suite grams|, per
    suite — recomputed from the (independently golden-tested) shingle
    arrays via python set algebra."""
    from pyspark.sql import functions as F

    from polars_trading_spark.functions.corpus import benchmark_coverage
    from polars_trading_spark.functions.dedup import shingle_hashes
    from polars_trading_spark.functions.text import tokens as tok

    corpus, bench = contamination_pdf
    bench = bench.assign(benchmark=["suite_fox", "suite_hamlet"])
    c = spark.createDataFrame(corpus)
    b = spark.createDataFrame(bench)
    out = {
        r["benchmark"]: r
        for r in benchmark_coverage(c, b, ngram=3).collect()
    }

    def grams(df):
        return {
            r["doc_id"]: set(r["g"])
            for r in df.select(
                "doc_id", shingle_hashes(tok(F.col("text")), n=3).alias("g")
            ).collect()
        }

    cg = set().union(*grams(c).values())
    bg = grams(b)
    suites = {"suite_fox": bg[1000], "suite_hamlet": bg[1001]}
    for suite, gs in suites.items():
        r = out[suite]
        assert r["n_bench_docs"] == 1
        assert r["n_bench_grams"] == len(gs)
        assert r["n_covered"] == len(gs & cg)
        assert r["coverage"] == pytest.approx(
            round(len(gs & cg) / len(gs), 6)
        )
    # the fixture exercises both regimes: partial coverage and a
    # verbatim copy (full coverage)
    assert 0 < out["suite_fox"]["coverage"] < 1
    assert out["suite_hamlet"]["coverage"] == 1.0

    with pytest.raises(ValueError):
        benchmark_coverage(c, b, ngram=0)
