"""Hand-computed fixture tests for exact substring dedup (Lee et al.
2022 keep-first-occurrence form) — INDEPENDENT of the shared shingle-
hash helpers: the expected removed/kept accounting and the cleaned text
below were derived by hand on paper from the k=3 span rule, so a shared
algorithmic error in the span-union or canonical-pick code cannot pass
both this test and the SQL-replay oracle (round-13 ADVICE item).

Fixture (k = 3):
    doc 1: "a b c d e f"        spans: abc@0 bcd@1 cde@2 def@3
    doc 2: "x y a b c d z"      spans: xya@0 yab@1 abc@2 bcd@3 cdz@4
    doc 3: "a b c q r s"        spans: abc@0 bcq@1 cqr@2 qrs@3

Duplicated hashes: abc -> {(1,0), (2,2), (3,0)} canonical (1,0);
bcd -> {(1,1), (2,3)} canonical (1,1).  Removal positions: doc 2 at
{2, 3}, doc 3 at {0}; doc 1 keeps everything.

    doc 1: removed 0 tokens / 0 spans, kept "a b c d e f"
    doc 2: union [2,5)+[3,6) = [2,6) -> 4 tokens, 1 span, kept "x y z"
    doc 3: [0,3) -> 3 tokens, 1 span, kept "q r s"
"""

from __future__ import annotations

from polars_trading_spark.functions.dedup import (
    exact_substring_dedup,
    exact_substring_dedup_clean,
)

DOCS = [
    (1, "a b c d e f"),
    (2, "x y a b c d z"),
    (3, "a b c q r s"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_stats_hand_computed(spark):
    rows = {
        r["doc_id"]: r
        for r in exact_substring_dedup(_docs_df(spark), k=3).collect()
    }
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["n_shingles"] == 4
    assert rows[1]["removed_tokens"] == 0
    assert rows[1]["removed_spans"] == 0
    assert rows[1]["kept_tokens"] == 6
    assert rows[1]["kept_frac"] == 1.0

    assert rows[2]["n_tokens"] == 7
    assert rows[2]["n_shingles"] == 5
    assert rows[2]["removed_tokens"] == 4  # [2,6): a b c d
    assert rows[2]["removed_spans"] == 1  # adjacent removals merge
    assert rows[2]["kept_tokens"] == 3
    assert abs(rows[2]["kept_frac"] - 3 / 7) < 1e-12

    assert rows[3]["removed_tokens"] == 3
    assert rows[3]["removed_spans"] == 1
    assert rows[3]["kept_tokens"] == 3


def test_clean_hand_computed(spark):
    rows = {
        r["doc_id"]: r
        for r in exact_substring_dedup_clean(_docs_df(spark), k=3).collect()
    }
    assert rows[1]["cleaned_text"] == "a b c d e f"
    assert rows[2]["cleaned_text"] == "x y z"
    assert rows[3]["cleaned_text"] == "q r s"
    for d in (1, 2, 3):
        assert rows[d]["kept_tokens"] == len(rows[d]["cleaned_text"].split())


def test_clean_within_doc_repeat(spark):
    # a span repeated INSIDE one document: the first occurrence is the
    # canonical keeper, later ones are removed — "p q r p q r p q r"
    # (k=3) keeps only the leading period.  Hand derivation: spans
    # pqr@0 qrp@1 rpq@2 pqr@3 qrp@4 rpq@5 pqr@6 all duplicated;
    # removals at {3, 4, 5, 6} -> union [3,9), one merged span.
    df = spark.createDataFrame([(7, "p q r p q r p q r")], ["doc_id", "text"])
    stats = exact_substring_dedup(df, k=3).collect()[0]
    assert stats["removed_tokens"] == 6
    assert stats["removed_spans"] == 1
    clean = exact_substring_dedup_clean(df, k=3).collect()[0]
    assert clean["cleaned_text"] == "p q r"
    assert clean["n_tokens"] == 9
    assert clean["kept_tokens"] == 3


def test_clean_no_duplicates_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r for r in exact_substring_dedup_clean(df, k=3).collect()
    }
    assert rows[1]["cleaned_text"] == "alpha beta gamma delta"
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["kept_tokens"] == 0
    assert rows[2]["cleaned_text"] == ""


def test_clean_removal_at_document_head_and_tail(spark):
    # duplicated spans touching BOTH ends of a doc: slice bookkeeping
    # (1-based, zero-length head/tail gaps) must not off-by-one.
    # doc 5 = doc 4's head 3 tokens + "m" + doc 4's tail 3 tokens;
    # canonical copies live in doc 4, so doc 5 loses its head AND tail.
    df = spark.createDataFrame(
        [(4, "h i j k l t u v"), (5, "h i j m t u v")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r for r in exact_substring_dedup_clean(df, k=3).collect()
    }
    assert rows[4]["cleaned_text"] == "h i j k l t u v"
    assert rows[5]["cleaned_text"] == "m"
    assert rows[5]["kept_tokens"] == 1
