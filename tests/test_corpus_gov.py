"""Round-7 corpus-governance ops: URL/domain profile, code detection,
language-mix entropy, rank IC."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from polars_trading_spark.functions.corpus import lang_mix, url_profile
from polars_trading_spark.functions.text import code_detection
from polars_trading_spark.operators.cross_section import rank_ic


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------- urls


def test_url_profile_extracts_and_aggregates(spark):
    texts = [
        "see https://EN.Wikipedia.org/wiki/Spark and http://a.example.com/x",
        "again https://en.wikipedia.org/wiki/SQL here",
        "nothing here",
        "http://a.example.com/y http://a.example.com/z",
    ]
    rows = {r.domain: r for r in url_profile(_docs(spark, texts)).collect()}
    assert rows["en.wikipedia.org"].n_docs == 2
    assert rows["en.wikipedia.org"].n_urls == 2
    assert rows["a.example.com"].n_docs == 2
    assert rows["a.example.com"].n_urls == 3
    assert set(rows) == {"en.wikipedia.org", "a.example.com"}


def test_url_profile_top_k_ordering(spark):
    texts = ["http://b.com/x http://b.com/y", "http://a.com/x", "http://c.com/x"]
    out = url_profile(_docs(spark, texts), top_k=2).collect()
    assert [r.domain for r in out] == ["b.com", "a.com"]


def test_url_profile_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        url_profile(_docs(spark, ["x"]), top_k=0)


# ---------------------------------------------------------------- code


def test_code_detection_separates_code_from_prose(spark):
    code = (
        "def add(a, b):\n"
        "    total = a + b;\n"
        "    return total;\n"
        "\tprint(add(1, 2));"
    )
    prose = "This is a long plain sentence about markets and nothing else at all."
    rows = {r.doc_id: r for r in code_detection(_docs(spark, [code, prose])).collect()}
    assert rows[0].is_code and not rows[1].is_code
    assert rows[0].n_lines == 4
    assert rows[0].indent_lines == 3  # three lines start with space/tab
    assert rows[0].semi_lines == 3
    assert rows[1].symbol_chars == 0


def test_code_detection_empty_doc(spark):
    r = code_detection(_docs(spark, [""])).collect()[0]
    assert r.n_chars == 0 and r.n_lines == 0
    assert r.symbol_ratio is None and not r.is_code


def test_code_detection_crlf_semi_lines(spark):
    r = code_detection(_docs(spark, ["a = 1;\r\nb = 2;"])).collect()[0]
    assert r.semi_lines == 2


# ---------------------------------------------------------------- lang mix


def test_lang_mix_hand_computed(spark):
    df = spark.createDataFrame(
        [("s1", "en")] * 3 + [("s1", "fr")] * 1 + [("s2", "de")] * 4,
        "source string, lang string",
    )
    rows = {r.source: r for r in lang_mix(df).collect()}
    s1 = rows["s1"]
    assert s1.n_docs == 4 and s1.n_langs == 2
    assert s1.top_lang == "en" and s1.top_share == pytest.approx(0.75)
    expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert s1.lang_entropy == pytest.approx(expected)
    s2 = rows["s2"]
    assert s2.n_langs == 1 and s2.top_share == pytest.approx(1.0)
    assert s2.lang_entropy == pytest.approx(0.0)


def test_lang_mix_majority_tie_breaks_lang_asc(spark):
    df = spark.createDataFrame(
        [("s", "fr"), ("s", "en")], "source string, lang string"
    )
    r = lang_mix(df).collect()[0]
    assert r.top_lang == "en"


# ---------------------------------------------------------------- rank IC


def _bars(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts_event_start long, close double"
    )


def test_rank_ic_perfectly_aligned_signal(spark):
    # three symbols whose momentum ordering always predicts the next
    # return ordering -> ic = 1 at every scored period
    rows = []
    for t in range(12):
        rows += [
            ("A", t, 100.0 * (1.01**t)),
            ("B", t, 100.0 * (1.02**t)),
            ("C", t, 100.0 * (1.03**t)),
        ]
    out = rank_ic(_bars(spark, rows), momentum_lag=2).collect()
    scored = [r for r in out if r.ic is not None]
    assert scored and all(r.ic == pytest.approx(1.0) for r in scored)


def test_rank_ic_anti_aligned_signal(spark):
    # momentum ordering exactly reversed in the next step each time:
    # prices zig-zag so past winners are next losers -> ic = -1
    rows = []
    for t in range(13):
        rows += [
            ("A", t, 100.0 * (1.05 ** ((t + 1) // 2)) * (0.9 ** (t // 2))),
            ("B", t, 100.0),
            ("C", t, 100.0 * (0.9 ** ((t + 1) // 2)) * (1.05 ** (t // 2))),
        ]
    out = rank_ic(_bars(spark, rows), momentum_lag=1).collect()
    scored = [r for r in out if r.ic is not None]
    assert scored
    assert all(abs(r.ic) == pytest.approx(1.0) for r in scored)


def test_rank_ic_null_below_three_symbols(spark):
    rows = [("A", t, 100.0 + t) for t in range(6)] + [
        ("B", t, 100.0 - t) for t in range(6)
    ]
    out = rank_ic(_bars(spark, rows), momentum_lag=1).collect()
    assert out and all(r.ic is None for r in out)
    assert all(r.n_sym == 2 for r in out)


def test_rank_ic_rejects_bad_lag(spark):
    with pytest.raises(ValueError):
        rank_ic(_bars(spark, [("A", 1, 1.0)]), momentum_lag=0)


def test_domain_cap_golden_and_determinism(spark):
    from polars_trading_spark.functions.corpus import domain_cap

    rows = [(i, "a" if i < 7 else "b") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_cap(df, max_per_key=3).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 10
    # per-key rank sets are exactly 1..n_key
    for key, n in (("a", 7), ("b", 3)):
        ranks = sorted(r["cap_rank"] for r in out if r["source"] == key)
        assert ranks == list(range(1, n + 1))
    # cap honored: 3 keepers in 'a', all 3 of 'b' kept
    assert sum(r["keep"] for r in out if r["source"] == "a") == 3
    assert sum(r["keep"] for r in out if r["source"] == "b") == 3
    # hash-ordered, not id-ordered: the kept set of 'a' is a salted
    # sample, and a different salt re-draws it
    kept_a = {r["doc_id"] for r in out if r["source"] == "a" and r["keep"]}
    kept_a2 = {
        r["doc_id"]
        for r in domain_cap(df, max_per_key=3, salt="other").collect()
        if r["source"] == "a" and r["keep"]
    }
    assert kept_a != set(range(3)) or kept_a2 != kept_a
    # layout invariance: identical decisions under repartitioning
    out7 = {
        (r["doc_id"], r["cap_rank"], r["keep"])
        for r in domain_cap(df.repartition(7), max_per_key=3).collect()
    }
    assert out7 == {(r["doc_id"], r["cap_rank"], r["keep"]) for r in out}


def test_domain_cap_validation(spark):
    from polars_trading_spark.functions.corpus import domain_cap

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    import pytest as _pt

    with _pt.raises(ValueError, match="max_per_key"):
        domain_cap(df, max_per_key=0)
