"""PII detection and scrubbing over document tables.

A 100 TB training-data pipeline has to strip personally identifiable
information before anything ships; these operators do the regex tier
(emails, SSN-style ids, credit-card numbers, IPv4 addresses, phone
numbers) as pure Column expressions — no Python UDFs, one scan, zero
shuffles, fully codegen like the rest of ``functions/text.py``.

Patterns are restricted to the syntax subset Java regex (Spark) and RE2
(DuckDB) evaluate identically — no lookaround, no backreferences — so
the DuckDB oracle is an exact twin.

Counting is **sequential**: each category counts its matches on the text
with all *earlier* categories already redacted, then redacts its own.
That makes the category counts disjoint (an SSN never also counts as a
phone number, an IPv4 never as a phone) and makes scrub+count one
deterministic pipeline in both engines.  Order: email → SSN →
credit-card → IPv4 → phone (most-specific first; the loose phone
pattern goes last because it would otherwise swallow the others).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_trading_spark._utils import col_or_lit

__all__ = ["PII_PATTERNS", "PII_TOKENS", "pii_profile", "pii_scrub"]

# Ordered: counts/redactions are computed in this sequence.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "credit_card": r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b|\b[0-9]{15,16}\b",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-. ]{7,14}[0-9]",
}

PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ssn": "<SSN>",
    "credit_card": "<CREDIT_CARD>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def pii_scrub(text) -> Column:
    """The text with every PII category redacted to its placeholder
    token, applied in the canonical order."""
    t = col_or_lit(text)
    for name, pat in PII_PATTERNS.items():
        t = F.regexp_replace(t, pat, PII_TOKENS[name])
    return t


def pii_profile(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document disjoint PII counts plus the scrubbed text.

    Returns ``id_col, n_email, n_ssn, n_credit_card, n_ipv4, n_phone,
    n_pii_total, has_pii, text_scrubbed``.  Counts are taken on the
    progressively redacted text (see module docstring), so they sum to
    the number of redactions actually applied.
    """
    t = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, PII_TOKENS[name])
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return df.select(F.col(id_col), *counts, t.alias("text_scrubbed")).withColumns(
        {
            "n_pii_total": total,
            "has_pii": total > 0,
        }
    )
