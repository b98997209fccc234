"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm) and the fingerprint-overlap
duplicate screen built on them.

Winnowing selects a deterministic, position-aware subset of a
document's k-gram hashes: slide a window of ``w`` consecutive k-gram
hashes over the token sequence and keep each window's minimum (the
RIGHTMOST minimum on ties).  The guarantee is structural: any shared
substring of at least ``w + k - 1`` tokens produces at least one
shared fingerprint, while the expected density is ``2 / (w + 1)`` —
so fingerprints are a provably-sound sketch for partial-overlap /
plagiarism-style duplicate detection, cheaper than full shingle sets
and stronger than MinHash for *localized* overlap (MinHash estimates
global Jaccard; winnowing catches a single lifted paragraph).

Distributed shape.  The sequential formulation keeps a rolling
min-queue; the Spark shape is a per-document bounded window frame:

1. positional k-grams via the shifted-slice ``zip_with`` chain
   (functions/text.py::word_ngrams_from's trick — no per-element
   regex re-evaluation), ``posexplode`` to (doc, pos, gram);
2. one 40-bit portable hash per gram (first 10 hex digits of md5 —
   identical in Spark and DuckDB), packed with its reversed position
   into a single BIGINT ``h * 2^22 + (2^22 - 1 - pos)`` so that an
   integer ``min`` over the frame IS the rightmost-min-tie argmin
   (smaller hash wins; equal hashes → larger pos wins);
3. ``min`` over ``ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING``
   partitioned by document — a bounded frame over at most ``w`` rows,
   evaluated only at valid window-start positions — then DISTINCT to
   collapse windows that picked the same (hash, pos).

Everything is a hash aggregate / bounded window on the document key:
one exchange, zero Python, zero joins until the pair screen.  The
pair screen is a df-pruned posting-list equi-join (the PPJoin /
tf-idf pattern): fingerprints appearing in more than ``max_df``
documents are boilerplate and dropped before the join, so hot keys
never explode and the join stays bucketed at corpus scale.

The classic rolling (Karp–Rabin) hash is a *sequential* optimization
for computing k-gram hashes in O(1) each; hashing each k-gram
independently is the embarrassingly-parallel equivalent and keeps the
kernel deterministic across engines.

Reference scope: the reference repo has no fingerprinting surface;
this extends the LLM-data-pipeline family (SURVEY.md §2-ext) with the
standard document-fingerprinting primitive.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_trading_spark.functions.text import tokens

__all__ = ["winnow_fingerprints", "winnow_duplicate_pairs"]

# Positions are packed into the low 22 bits of the selection key:
# documents are capped at 2^22 - 1 = 4,194,303 k-grams (a ~4M-token
# document; longer inputs raise at runtime via the guard column).
_POS_CAP = 1 << 22
_HASH_HEX_DIGITS = 10  # 40-bit hash: key = h * 2^22 + pos' < 2^62


def _positional_grams(toks: Column, k: int) -> Column:
    """Ordered (non-distinct) k-gram strings of a token array."""
    m = F.size(toks) - (k - 1)
    parts = [F.slice(toks, i + 1, m) for i in range(k)]
    joined = reduce(
        lambda a, b: F.zip_with(a, b, lambda x, y: F.concat_ws(" ", x, y)), parts
    )
    return F.when(m > 0, joined).otherwise(F.array().cast("array<string>"))


def winnow_fingerprints(
    docs: DataFrame,
    *,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprints: one row per selected (document,
    fingerprint-hash, k-gram position).

    Output columns: ``id_col``, ``fp`` (40-bit k-gram hash, long),
    ``pos`` (0-based k-gram position, int).  Documents with fewer than
    ``k + w - 1`` tokens emit no rows (no complete hash window).

    Guarantees (Schleimer et al. §3): every shared token run of length
    >= ``w + k - 1`` yields a shared fingerprint; expected density is
    ``2 / (w + 1)`` of the k-gram count.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")

    grams = _positional_grams(tokens(F.col(text_col)), k)
    g = (
        docs.select(id_col, grams.alias("__grams"))
        .select(
            id_col,
            F.size("__grams").alias("__ng"),
            F.posexplode("__grams").alias("pos", "__gram"),
        )
    )
    h = F.conv(F.substring(F.md5("__gram"), 1, _HASH_HEX_DIGITS), 16, 10).cast(
        "long"
    )
    # Rightmost-min tie rule folded into one integer key (see module doc).
    key = h * F.lit(_POS_CAP) + (
        F.lit(_POS_CAP - 1) - F.col("pos")
    )
    staged = g.withColumn(
        "__key",
        F.when(F.col("pos") < _POS_CAP, key).otherwise(
            F.raise_error(F.format_string("document exceeds %d k-grams", F.lit(_POS_CAP)))
        ),
    )

    frame = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = (
        staged.withColumn("__wmin", F.min("__key").over(frame))
        # only complete windows select fingerprints
        .where(F.col("pos") <= F.col("__ng") - w)
        .select(
            id_col,
            # exact integer decode — float division would lose low bits
            F.shiftright("__wmin", 22).alias("fp"),
            (
                F.lit(_POS_CAP - 1) - F.col("__wmin").bitwiseAND(_POS_CAP - 1)
            ).cast("int").alias("pos"),
        )
        .distinct()
    )
    return sel


def winnow_duplicate_pairs(
    docs: DataFrame,
    *,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints.

    Output: ``doc_a`` < ``doc_b``, ``shared`` (distinct shared
    fingerprint hashes), ``overlap`` = shared / least(fingerprint
    count of a, of b) — an asymmetric containment-style score that
    stays high when a short document is lifted into a long one.

    Fingerprints present in more than ``max_df`` documents are
    boilerplate and pruned BEFORE the self-join (df-pruned posting
    lists), so no hot key ever drives a quadratic bucket.
    """
    from polars_trading_spark._utils import persist_tracked

    fps = winnow_fingerprints(
        docs, k=k, w=w, id_col=id_col, text_col=text_col
    )
    # distinct hash per doc: position is irrelevant for the overlap count.
    # Staged: three consumers (per-doc counts, doc-frequency pruning, the
    # self-join probe) would otherwise each re-run the whole winnowing
    # window pipeline.
    df_fp = persist_tracked(
        fps.select(F.col(id_col).alias("doc"), "fp").distinct(),
        eager=True,  # the 3 consumers are AQE-concurrent: lazy persists
        # race, one winnowing-pipeline execution per consumer (r15 §5.3)
    )
    n_fp = df_fp.groupBy("doc").agg(F.count("*").alias("n_fp"))

    doc_freq = df_fp.groupBy("fp").agg(F.count("*").alias("__df"))
    pruned = (
        df_fp.join(doc_freq.where(F.col("__df") <= max_df), "fp", "inner")
        .select("doc", "fp")
    )

    a = pruned.select(F.col("doc").alias("doc_a"), "fp")
    b = pruned.select(F.col("doc").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    out = (
        pairs.join(
            n_fp.select(F.col("doc").alias("doc_a"), F.col("n_fp").alias("__na")),
            "doc_a",
        )
        .join(
            n_fp.select(F.col("doc").alias("doc_b"), F.col("n_fp").alias("__nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "shared",
            (
                F.col("shared").cast("double")
                / F.least("__na", "__nb").cast("double")
            ).alias("overlap"),
        )
    )
    return out
