"""Golden + differential tests for PII scrubbing (functions/pii.py) and
C4 boilerplate flags (functions/text.py::boilerplate_profile).

The driver-gate corpus contains no digits/punctuation, so the oracle
rows are degenerate there; these tests plant real PII/boilerplate and
additionally run the same expressions through DuckDB to prove the
Java-regex / RE2 pattern subset really is engine-identical.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from polars_trading_spark.functions.pii import PII_PATTERNS, PII_TOKENS, pii_profile
from polars_trading_spark.functions.text import boilerplate_profile

PLANTED = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "Contact john.doe+spam@sub.example.co.uk or MARY@EXAMPLE.ORG today.",
            "SSN 123-45-6789 card 4111-1111-1111-1111 and 4111111111111111.",
            "Hosts 10.0.0.1 and 192.168.255.254; call +1 (555) 123-4567 or 555-867-5309.",
            "No pii here, just text with numbers like 42 and 3.14.",
            "Overlap test: 987-65-4321 should be SSN, not phone.",
        ],
    }
)


def test_pii_counts_golden(spark):
    out = pii_profile(spark.createDataFrame(PLANTED)).toPandas().set_index("doc_id")
    assert out.loc[0, "n_email"] == 2 and out.loc[0, "n_pii_total"] == 2
    assert out.loc[1, "n_ssn"] == 1
    assert out.loc[1, "n_credit_card"] == 2
    assert out.loc[2, "n_ipv4"] == 2 and out.loc[2, "n_phone"] == 2
    assert out.loc[3, "n_pii_total"] == 0 and not out.loc[3, "has_pii"]
    # Disjoint counting: the SSN is consumed before the phone pass.
    assert out.loc[4, "n_ssn"] == 1 and out.loc[4, "n_phone"] == 0


def test_pii_scrub_redacts_everything(spark):
    out = pii_profile(spark.createDataFrame(PLANTED)).toPandas()
    joined = " ".join(out["text_scrubbed"])
    assert "@" not in joined
    assert "123-45-6789" not in joined
    assert "4111" not in joined
    assert "<EMAIL>" in joined and "<SSN>" in joined and "<CREDIT_CARD>" in joined
    assert "<IP>" in joined and "<PHONE>" in joined


def test_pii_differential_vs_duckdb(spark):
    """Same sequential count+scrub pipeline in DuckDB (RE2) must agree
    with Spark (Java regex) on text that actually contains PII."""
    sdf = pii_profile(spark.createDataFrame(PLANTED)).toPandas()
    con = duckdb.connect()
    con.register("documents", PLANTED)
    t = "text"
    cols = []
    for name, pat in PII_PATTERNS.items():
        esc = pat.replace("'", "''")
        cols.append(f"len(regexp_extract_all({t}, '{esc}')) AS n_{name}")
        t = f"regexp_replace({t}, '{esc}', '{PII_TOKENS[name]}', 'g')"
    ddf = con.sql(
        f"SELECT doc_id, {', '.join(cols)}, {t} AS text_scrubbed FROM documents ORDER BY doc_id"
    ).df()
    sdf = sdf.sort_values("doc_id").reset_index(drop=True)
    for name in PII_PATTERNS:
        assert sdf[f"n_{name}"].astype(int).tolist() == ddf[f"n_{name}"].astype(int).tolist(), name
    assert sdf["text_scrubbed"].tolist() == ddf["text_scrubbed"].tolist()


BOILER = pd.DataFrame(
    {
        "doc_id": [0, 1, 2],
        "text": [
            "First sentence here. Second one follows! A third, naturally?\nShort trailer",
            "- item one\n- item two\n* item three",
            "lorem ipsum dolor sit amet. function() { return 1; } javascript stub. Yes.",
        ],
    }
)


def test_boilerplate_flags_golden(spark):
    out = boilerplate_profile(spark.createDataFrame(BOILER)).toPandas().set_index("doc_id")
    # doc 0: two non-blank lines, first ends '?', second bare.
    assert out.loc[0, "n_lines"] == 2
    assert out.loc[0, "end_punct_frac"] == pytest.approx(0.5)
    assert out.loc[0, "n_sentences"] == 4
    assert bool(out.loc[0, "c4_keep"])
    # doc 1: all bullets, no sentence-ending punctuation.
    assert out.loc[1, "bullet_frac"] == pytest.approx(1.0)
    assert not bool(out.loc[1, "c4_keep"])
    # doc 2: artifact flags all fire.
    assert bool(out.loc[2, "has_lorem"])
    assert bool(out.loc[2, "has_curly"])
    assert bool(out.loc[2, "has_javascript"])
    assert not bool(out.loc[2, "c4_keep"])
