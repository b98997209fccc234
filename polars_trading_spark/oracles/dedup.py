"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark.functions import dedup as dedup_ops
from polars_trading_spark.functions import similarity as sim_ops
from polars_trading_spark.functions.dedup import MERSENNE31
from polars_trading_spark.functions.dedup import _coeffs
from polars_trading_spark.sources.tables import read_table
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from polars_trading_spark.oracles._shared import (  # noqa: F401
    register,
)
from polars_trading_spark.oracles.text import (  # noqa: F401
    _DOCS_TOK_CTE,
    _docs_tok_cte,
    _QUALITY_SQL,
    _TEXT_FEAT_CTES,
    _sql_hash60,
    _sql_shingle_sh_cte,
)
from polars_trading_spark.oracles.similarity import (  # noqa: F401
    _EMB_CTE,
)



# --------------------------------------------------------------------------
# dedup_exact: fingerprint-group keeper assignment.
# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    f"""
WITH
{_DOCS_TOK_CTE},
fp AS (SELECT doc_id, md5(norm) AS fingerprint FROM docs)
SELECT doc_id, fingerprint,
       CAST(min(doc_id) OVER (PARTITION BY fingerprint) AS BIGINT) AS keep_id,
       CAST(count(*) OVER (PARTITION BY fingerprint) AS INTEGER) AS n_copies,
       doc_id <> min(doc_id) OVER (PARTITION BY fingerprint) AS is_duplicate
FROM fp
""",
    "Exact dedup on the normalized-content fingerprint (hash groupBy)",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup_ops.exact_dedup(docs).select(
        "doc_id", "fingerprint", "keep_id", "n_copies", "is_duplicate"
    )



# --------------------------------------------------------------------------
# dedup_minhash_lsh: banded MinHash candidates + exact Jaccard verify.
# --------------------------------------------------------------------------

_MH_K, _MH_BANDS, _MH_NGRAM, _MH_THRESHOLD = 12, 4, 3, 0.2

_ROWS_PER_BAND = _MH_K // _MH_BANDS


_SIG_SQL = ", ".join(
    f"coalesce(list_min([({a} * h + {b}) % {MERSENNE31} for h in sh]), {MERSENNE31}) AS s{i}"
    for i, (a, b) in enumerate(_coeffs(_MH_K))
)

_BAND_KEYS_SQL = ", ".join(
    "concat_ws(',', "
    + ", ".join(f"s{i}" for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND))
    + f") AS band{b}"
    for b in range(_MH_BANDS)
)

_BAND_UNION_SQL = " UNION ALL ".join(
    f"SELECT doc_id, sh, {b} AS band, concat_ws(',', "
    + ", ".join(f"s{i}" for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND))
    + ") AS key FROM sig"
    for b in range(_MH_BANDS)
)



# The minhash pair-generation CTE chain (sans docs/tok, so composites
# can prepend their own shared scan CTEs), used by the pairs oracle, the
# connected-components (dedup_clusters) oracle, and corpus_filter.
_MH_PAIR_TAIL = f"""{_sql_shingle_sh_cte(_MH_NGRAM)},
sig AS (SELECT doc_id, sh, {_SIG_SQL} FROM sh),
banded AS ({_BAND_UNION_SQL}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.id_a, c.id_b,
         CASE WHEN len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) > 0
              THEN len(list_intersect(x.sh, y.sh))::DOUBLE
                   / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
              ELSE 0.0 END AS jaccard
  FROM cand c JOIN sh x ON c.id_a = x.doc_id JOIN sh y ON c.id_b = y.doc_id
)"""


_MH_PAIR_CTES = f"""{_DOCS_TOK_CTE},
{_MH_PAIR_TAIL}"""


# Transitive closure of the verified pairs (recursive CTE) down to the
# per-document canonical label — shared by dedup_clusters/corpus_filter.
_CC_TAIL = f"""pairs AS (SELECT id_a, id_b FROM verified WHERE jaccard >= {_MH_THRESHOLD}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS doc_id, min(dst) AS mind FROM reach GROUP BY src),
labeled AS (
  SELECT d.doc_id,
         coalesce(least(c.doc_id, c.mind), d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
)"""



@register(
    "dedup_minhash_lsh",
    f"""
WITH
{_MH_PAIR_CTES}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard
FROM verified WHERE jaccard >= {_MH_THRESHOLD}
""",
    "Near-dup pairs: word-3-gram shingles → 12-perm MinHash → 4-band LSH "
    "buckets → exact-Jaccard verification",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = dedup_ops.minhash_lsh_pairs(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    return out.withColumn("jaccard", F.round("jaccard", 6))



# --------------------------------------------------------------------------
# dedup_clusters: transitive closure of the near-dup pairs -> keep/drop.
# --------------------------------------------------------------------------


@register(
    "dedup_clusters",
    f"""
WITH RECURSIVE
{_MH_PAIR_CTES},
{_CC_TAIL}
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS INTEGER) AS cluster_size,
       doc_id <> cluster_id AS is_duplicate
FROM labeled
""",
    "Duplicate clusters: MinHash-LSH pairs -> connected components "
    "(min-label propagation) -> canonical keeper per cluster, singletons "
    "included",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup_ops.minhash_lsh_pairs(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    return dedup_ops.connected_components(pairs, nodes=docs)



# --------------------------------------------------------------------------
# dedup_simhash: 32-bit simhash, pigeonhole-blocked hamming pairs.
# --------------------------------------------------------------------------

_SH_BITS, _SH_MAXHAM = 48, 3

_SH_BLOCKS = _SH_MAXHAM + 1

_SH_BLOCK_BITS = _SH_BITS // _SH_BLOCKS


_SIMHASH_SQL = " + ".join(
    f"CASE WHEN list_sum([CAST(((h >> {b}) & 1) * 2 - 1 AS BIGINT) for h in hs]) > 0 "
    f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
    for b in range(_SH_BITS)
)

_SH_BLOCK_UNION = " UNION ALL ".join(
    f"SELECT doc_id, sh, {b} AS blk, (sh >> {b * _SH_BLOCK_BITS}) & {(1 << _SH_BLOCK_BITS) - 1} AS key FROM sh"
    for b in range(_SH_BLOCKS)
)



@register(
    "dedup_simhash",
    f"""
WITH
{_DOCS_TOK_CTE},
hashes AS (SELECT doc_id, [{_sql_hash60("t")} for t in toks] AS hs FROM tok),
sh AS (SELECT doc_id, {_SIMHASH_SQL} AS sh FROM hashes),
blocked AS ({_SH_BLOCK_UNION}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
  FROM blocked a JOIN blocked b
    ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= {_SH_MAXHAM}
""",
    "SimHash near-dup pairs: 48-bit token-majority sketch, hamming ≤ 3 via "
    "pigeonhole block joins (no cross product)",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup_ops.simhash_pairs(docs, bits=_SH_BITS, max_hamming=_SH_MAXHAM)



# --------------------------------------------------------------------------
# dedup_ngram_jaccard: exact Jaccard within (lang) blocks.
# --------------------------------------------------------------------------

_NJ_THRESHOLD = 0.2



@register(
    "dedup_ngram_jaccard",
    f"""
WITH
{_DOCS_TOK_CTE},
{_sql_shingle_sh_cte(3)},
ng AS (
  SELECT s.doc_id, t.lang, s.sh AS g
  FROM sh s JOIN tok t ON s.doc_id = t.doc_id
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CASE WHEN len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) > 0
              THEN len(list_intersect(a.g, b.g))::DOUBLE
                   / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
              ELSE 0.0 END AS jaccard
  FROM ng a JOIN ng b ON a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM pairs WHERE jaccard >= {_NJ_THRESHOLD}
""",
    "Exact word-3-gram Jaccard pairs within language blocks",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = dedup_ops.ngram_jaccard_pairs(docs, threshold=_NJ_THRESHOLD, block_cols=("lang",))
    return out.withColumn("jaccard", F.round("jaccard", 6))



# --------------------------------------------------------------------------
# dedup_embedding_cosine: the 5th dedup modality — near-dups in embedding
# space, SRP-bucketed candidates + exact cosine verify.
# --------------------------------------------------------------------------

_EC_THRESHOLD, _EC_PLANES = 0.42, 6



@register(
    "dedup_embedding_cosine",
    f"""
WITH
{_EMB_CTE},
planes AS (
  SELECT v AS pv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_EC_PLANES})
),
bucketed AS (
  SELECT c.vec_id, c.v,
         CAST(sum(CASE WHEN list_sum([pv[i+1] * v[i+1] for i in range(0, len(v))]) >= 0
                       THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
  FROM c CROSS JOIN planes
  GROUP BY c.vec_id, c.v
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_sum([a.v[i+1] * b.v[i+1] for i in range(0, len(a.v))])
               / (sqrt(list_sum([x * x for x in a.v])) * sqrt(list_sum([x * x for x in b.v]))), 6)
           AS cosine_sim
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= {_EC_THRESHOLD}
""",
    "Embedding-cosine near-dup pairs: SRP bucket candidates (6 planes), "
    "exact cosine verification at threshold 0.42",
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return sim_ops.embedding_cosine_pairs(
        emb, threshold=_EC_THRESHOLD, num_planes=_EC_PLANES
    )



# --------------------------------------------------------------------------
# C-ext. Paragraph-level (unit) dedup (functions/dedup.py::unit_dedup)
# --------------------------------------------------------------------------

_UNIT_K = 10



@register(
    "dedup_paragraph",
    f"""
WITH
{_DOCS_TOK_CTE},
units AS (
  SELECT doc_id, g.i AS idx,
    array_to_string(toks[g.i * {_UNIT_K} + 1 : g.i * {_UNIT_K} + {_UNIT_K}], ' ') AS unit
  FROM tok
  CROSS JOIN generate_series(0, 4999) AS g(i)
  WHERE g.i < ceil(len(toks) / CAST({_UNIT_K} AS DOUBLE))
),
marked AS (
  SELECT doc_id, idx, unit,
    row_number() OVER (PARTITION BY md5(unit) ORDER BY doc_id, idx) = 1 AS is_first
  FROM units
),
per_doc AS (
  SELECT doc_id,
    count(*) AS n_units,
    sum(CASE WHEN is_first THEN 0 ELSE 1 END) AS n_dup,
    coalesce(string_agg(unit, ' ' ORDER BY idx) FILTER (WHERE is_first), '')
      AS text_deduped
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(p.n_units, 0) AS INTEGER) AS n_units,
  CAST(coalesce(p.n_dup, 0) AS INTEGER) AS n_dup_units,
  round(CASE WHEN p.n_units > 0 THEN p.n_dup / CAST(p.n_units AS DOUBLE) END, 6)
    AS dup_unit_frac,
  md5(p.text_deduped) AS dedup_md5
FROM docs d LEFT JOIN per_doc p USING (doc_id)
""",
    f"Paragraph-level exact dedup over {_UNIT_K}-token units: per-doc "
    "duplicated-unit fraction and the fingerprint of the deduped text "
    "(C4-style span dedup, splitter-agnostic)",
)
def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.dedup import unit_dedup

    docs = read_table(spark, sf_dir, "documents")
    out = unit_dedup(docs, unit_tokens=_UNIT_K)
    return out.select(
        "doc_id",
        "n_units",
        "n_dup_units",
        F.round("dup_unit_frac", 6).alias("dup_unit_frac"),
        F.md5("text_deduped").alias("dedup_md5"),
    )



# --------------------------------------------------------------------------
# C-ext. Cross-doc duplicated spans (functions/dedup.py::
# duplicated_span_stats) — the exact-substring-dedup approximation.
# --------------------------------------------------------------------------

_DSP_N = 8



def _sql_positional_shingles(n: int) -> str:
    """DuckDB twin of ``dedup.positional_shingle_hashes``: (doc_id, pos,
    h) rows, pos 0-based, duplicates kept.  Expects the ``tok`` CTE."""
    combined = "hs[i+1]"
    for j in range(2, n + 1):
        combined = f"(({combined}) * 31 + hs[i+{j}]) % {MERSENNE31}"
    return f"""hs AS (
  SELECT doc_id, [{_sql_hash60("t")} % {MERSENNE31} for t in toks] AS hs FROM tok
),
ps AS (
  SELECT doc_id, u.pos AS pos, u.h AS h
  FROM (SELECT doc_id,
          unnest([{{'pos': i, 'h': {combined}}}
                  for i in range(0, len(hs) - {n - 1})]) AS u
        FROM hs)
)"""



@register(
    "dup_spans",
    f"""
WITH
{_DOCS_TOK_CTE},
{_sql_positional_shingles(_DSP_N)},
dup AS (SELECT h FROM ps GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
lagged AS (
  SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM (SELECT ps.doc_id, ps.pos FROM ps JOIN dup USING (h))
),
cov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_shingles,
    CAST(sum(CASE WHEN prev IS NULL THEN {_DSP_N}
             ELSE least({_DSP_N}, pos - prev) END) AS BIGINT) AS dup_token_cov
  FROM lagged GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok)
SELECT t.doc_id, t.n_tokens,
  CAST(greatest(t.n_tokens - {_DSP_N - 1}, 0) AS BIGINT) AS n_shingles,
  coalesce(c.dup_shingles, CAST(0 AS BIGINT)) AS dup_shingles,
  coalesce(c.dup_token_cov, CAST(0 AS BIGINT)) AS dup_token_cov,
  round(CASE WHEN t.n_tokens > 0
        THEN coalesce(c.dup_token_cov, 0) / CAST(t.n_tokens AS DOUBLE)
        ELSE 0.0 END, 6) AS dup_frac,
  (CASE WHEN t.n_tokens > 0
   THEN coalesce(c.dup_token_cov, 0) / CAST(t.n_tokens AS DOUBLE)
   ELSE 0.0 END) <= 0.5 AS keep
FROM tot t LEFT JOIN cov c USING (doc_id)
""",
    f"Cross-doc duplicated {_DSP_N}-gram spans (exact-substring-dedup "
    "approximation): per-doc duplicated shingle count and exact "
    "union-of-spans token coverage",
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.dedup import duplicated_span_stats

    docs = read_table(spark, sf_dir, "documents")
    out = duplicated_span_stats(docs, ngram=_DSP_N, min_docs=2, max_dup_frac=0.5)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_shingles",
        "dup_shingles",
        "dup_token_cov",
        F.round("dup_frac", 6).alias("dup_frac"),
        "keep",
    )


# --------------------------------------------------------------------------
# dedup_exact_substring (round 12): the keep-first-occurrence span
# REMOVAL form of Lee et al. 2022 — any k-token span hash occurring more
# than once in the corpus is removed from every non-canonical
# occurrence; overlapping/adjacent removals merge into maximal spans.
# The oracle replays the whole computation in DuckDB: same tokenizer,
# same arithmetic shingle hashes, the same min-(doc,pos) canonical pick
# and the same lag-window span union — byte-for-byte accounting.
# --------------------------------------------------------------------------

_ESD_N = 8  # registration granularity; the API default is the paper's 50


@register(
    "dedup_exact_substring",
    f"""
WITH
{_DOCS_TOK_CTE},
{_sql_positional_shingles(_ESD_N)},
occ AS (
  SELECT h,
         min(struct_pack(d := doc_id, p := pos)) AS keep
  FROM ps GROUP BY h HAVING count(*) >= 2
),
removals AS (
  SELECT ps.doc_id, ps.pos
  FROM ps JOIN occ USING (h)
  WHERE NOT (ps.doc_id = occ.keep.d AND ps.pos = occ.keep.p)
),
lagged AS (
  SELECT doc_id, pos,
         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM removals
),
agg AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN prev IS NULL THEN {_ESD_N}
             ELSE least({_ESD_N}, pos - prev) END) AS BIGINT) AS removed_tokens,
    CAST(sum(CASE WHEN prev IS NULL OR pos - prev > {_ESD_N} THEN 1
             ELSE 0 END) AS BIGINT) AS removed_spans
  FROM lagged GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok)
SELECT t.doc_id, t.n_tokens,
  CAST(greatest(t.n_tokens - {_ESD_N - 1}, 0) AS BIGINT) AS n_shingles,
  coalesce(a.removed_tokens, CAST(0 AS BIGINT)) AS removed_tokens,
  coalesce(a.removed_spans, CAST(0 AS BIGINT)) AS removed_spans,
  CAST(t.n_tokens - coalesce(a.removed_tokens, 0) AS BIGINT) AS kept_tokens,
  CASE WHEN t.n_tokens > 0
       THEN (t.n_tokens - coalesce(a.removed_tokens, 0)) / CAST(t.n_tokens AS DOUBLE)
       ELSE 1.0 END AS kept_frac
FROM tot t LEFT JOIN agg a USING (doc_id)
""",
    f"EXACT substring dedup (Lee et al. 2022, keep-first-occurrence) at "
    f"{_ESD_N}-token registration granularity: duplicated span hashes "
    "-> min-(doc,pos) canonical pick -> per-doc maximal-span union via "
    "one lag window; removed/kept token accounting replayed exactly in "
    "SQL — no suffix sort, no all-pairs stage anywhere",
)
def q_dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup_ops.exact_substring_dedup(docs, k=_ESD_N)


# --------------------------------------------------------------------------
# dedup_exact_substring_clean (round 13): the ARTIFACT form — per-doc
# text with every duplicated span removed, what the training pipeline
# actually consumes.  The oracle deliberately uses a DIFFERENT
# formulation than the engine: Spark merges removals into maximal
# spans relationally and reassembles kept tokens in one linear
# higher-order aggregate walk; DuckDB filters each token by a direct
# per-token coverage test (exists removal p with p <= i < p+k) — a
# shared span-union bug cannot pass both sides.
# --------------------------------------------------------------------------


@register(
    "dedup_exact_substring_clean",
    f"""
WITH
{_DOCS_TOK_CTE},
{_sql_positional_shingles(_ESD_N)},
occ AS (
  SELECT h,
         min(struct_pack(d := doc_id, p := pos)) AS keep
  FROM ps GROUP BY h HAVING count(*) >= 2
),
removals AS (
  SELECT ps.doc_id, ps.pos
  FROM ps JOIN occ USING (h)
  WHERE NOT (ps.doc_id = occ.keep.d AND ps.pos = occ.keep.p)
),
rp AS (SELECT doc_id, list(pos) AS rps FROM removals GROUP BY doc_id),
kept AS (
  SELECT t.doc_id, t.toks,
         list_filter(
           t.toks,
           (x, i) -> len(list_filter(
             coalesce(r.rps, CAST([] AS BIGINT[])),
             p -> p <= i - 1 AND p > i - 1 - {_ESD_N}
           )) = 0
         ) AS kt
  FROM tok t LEFT JOIN rp r USING (doc_id)
)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(kt) AS BIGINT) AS kept_tokens,
  coalesce(array_to_string(kt, ' '), '') AS cleaned_text
FROM kept
""",
    f"Cleaned-text exact substring dedup at {_ESD_N}-token granularity "
    "(Lee et al. 2022 keep-first-occurrence): the engine reassembles "
    "kept tokens via relational span-merge + one linear HOF walk; the "
    "oracle re-derives the same text with an independent per-token "
    "coverage filter",
)
def q_dedup_exact_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup_ops.exact_substring_dedup_clean(docs, k=_ESD_N)





# --------------------------------------------------------------------------
# C-ext. n-gram containment pairs (functions/dedup.py::
# ngram_containment_pairs) — the asymmetric dedup modality.
# --------------------------------------------------------------------------

_CT_N, _CT_T, _CT_MAXDF = 3, 0.6, 0.2



@register(
    "dedup_containment",
    f"""
WITH
{_DOCS_TOK_CTE},
{_sql_shingle_sh_cte(_CT_N)},
post AS (SELECT doc_id, unnest(sh) AS h FROM sh),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs),
dfq AS (SELECT h, count(*) AS df FROM post GROUP BY h),
pruned AS (
  SELECT p.doc_id, p.h FROM post p JOIN dfq USING (h) CROSS JOIN nd
  WHERE dfq.df <= nd.n * {_CT_MAXDF!r}
),
cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
  FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id
),
v AS (
  SELECT c.ida, c.idb,
    len(list_intersect(sa.sh, sb.sh)) AS shared,
    len(sa.sh) AS na, len(sb.sh) AS nb
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.ida
  JOIN sh sb ON sb.doc_id = c.idb
)
SELECT ida AS id_a, idb AS id_b, CAST(shared AS BIGINT) AS n_shared,
  round(shared / CAST(na AS DOUBLE), 6) + 0 AS containment_a,
  round(shared / CAST(nb AS DOUBLE), 6) + 0 AS containment_b
FROM v
WHERE na > 0 AND nb > 0
  AND (shared / CAST(na AS DOUBLE) >= {_CT_T!r}
       OR shared / CAST(nb AS DOUBLE) >= {_CT_T!r})
""",
    f"Asymmetric n-gram containment pairs (either direction >= {_CT_T}; "
    f"df-pruned candidates at max-df {_CT_MAXDF}, exact verify) — "
    "catches quote-inclusion near-dups Jaccard misses",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.dedup import ngram_containment_pairs

    docs = read_table(spark, sf_dir, "documents")
    out = ngram_containment_pairs(
        docs, ngram=_CT_N, threshold=_CT_T, max_df_frac=_CT_MAXDF
    )
    z0 = F.lit(0.0)
    return out.select(
        "id_a",
        "id_b",
        "n_shared",
        (F.round("containment_a", 6) + z0).alias("containment_a"),
        (F.round("containment_b", 6) + z0).alias("containment_b"),
    )



# --------------------------------------------------------------------------
# C-ext (round 6). Quality-aware near-dup cluster keeper
# (functions/dedup.py::cluster_representatives) — reuses corpus_filter's
# pairs/components/quality CTEs.
# --------------------------------------------------------------------------


@register(
    "cluster_representatives",
    f"""
WITH RECURSIVE
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES},
{_MH_PAIR_TAIL},
{_CC_TAIL},
scored AS (
  SELECT doc_id, round({_QUALITY_SQL}, 6) AS q FROM feat
),
m AS (
  SELECT l.doc_id, l.cluster_id, s.q
  FROM labeled l JOIN scored s USING (doc_id)
),
sel AS (
  SELECT *,
    count(*) OVER (PARTITION BY cluster_id) AS csize,
    row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rk
  FROM m
)
SELECT doc_id, cluster_id, CAST(csize AS INTEGER) AS cluster_size,
  q + 0 AS quality_score, rk = 1 AS is_representative
FROM sel
""",
    "Quality-aware near-dup keeper: each MinHash cluster's highest-"
    "quality document survives (round-6-then-rank, ties to lowest id) "
    "instead of the arbitrary min-id copy",
)
def q_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.dedup import cluster_representatives

    docs = read_table(spark, sf_dir, "documents")
    out = cluster_representatives(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    return out.withColumn(
        "quality_score", F.col("quality_score") + F.lit(0.0)
    )



# --------------------------------------------------------------------------
# C-ext (round 6, sampled round 8). MinHash banding recall harness:
# LSH-surviving pairs vs ALL pairs at the same exact-Jaccard threshold
# (the dedup sibling of ann_recall).  Round 8: the harness runs on a
# deterministic salted-hash HALF of the corpus (the exact arm is global
# PPJoin — sub-quadratic but still the slowest bench query full-corpus;
# the sampled recall ratio is an unbiased estimate, full-corpus mode
# stays behind an explicit sample_fraction=None).
# --------------------------------------------------------------------------

_RECALL_TARGET = 2500  # auto fraction = min(1, target / n_docs)
_RECALL_SALT = "pts-recall"
_RECALL_MOD = 1 << 30
_RECALL_EXPR = f"concat('{_RECALL_SALT}', CAST(doc_id AS VARCHAR))"
# Same auto-fraction as functions/dedup.py::_recall_sample: the count
# and the division are exact in double on both engines, so the sampled
# document set is identical.
_RECALL_WHERE = (
    f"WHERE ({_sql_hash60(_RECALL_EXPR)} % {_RECALL_MOD})"
    f" / {float(_RECALL_MOD)}"
    f" < least(1.0, CAST({_RECALL_TARGET} AS DOUBLE)"
    f" / greatest((SELECT count(*) FROM documents), 1))"
)


@register(
    "dedup_recall",
    f"""
WITH
{_docs_tok_cte(_RECALL_WHERE)},
{_MH_PAIR_TAIL},
exact AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
             THEN len(list_intersect(a.sh, b.sh))::DOUBLE
                  / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
             ELSE 0.0 END >= {_MH_THRESHOLD}
),
lshp AS (SELECT DISTINCT id_a, id_b FROM verified WHERE jaccard >= {_MH_THRESHOLD}),
h AS (
  SELECT count(*) AS c
  FROM exact e JOIN lshp l ON e.id_a = l.id_a AND e.id_b = l.id_b
)
SELECT
  CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
  CAST((SELECT count(*) FROM lshp) AS BIGINT) AS n_lsh,
  CAST((SELECT c FROM h) AS BIGINT) AS n_hit,
  CASE WHEN (SELECT count(*) FROM exact) > 0
       THEN round((SELECT c FROM h)
                  / CAST((SELECT count(*) FROM exact) AS DOUBLE), 6) + 0
  END AS recall
""",
    f"MinHash banding recall: pairs surviving {_MH_BANDS}-band LSH vs "
    f"every pair with exact shingle Jaccard >= {_MH_THRESHOLD} on a "
    f"deterministic salted-hash document sample auto-sized to "
    f"~{_RECALL_TARGET} docs (flat pair cost in corpus size) — "
    "unbiased estimate of the candidate-generation loss; the global "
    "exact arm stays behind sample_fraction=None",
)
def q_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup_ops.dedup_recall_stats(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
        sample_fraction="auto",
        target_docs=_RECALL_TARGET,
        salt=_RECALL_SALT,
    )


# --------------------------------------------------------------------------
# C-ext (round 8). Banding recall CURVE (functions/dedup.py::
# dedup_recall_curve) — one candidate-generation pass at the lowest
# threshold, every requested threshold a filter over the same pair
# sets; same salted-hash document sample as dedup_recall.
# --------------------------------------------------------------------------

_RC_THRESHOLDS = (0.2, 0.3, 0.4, 0.5)
_RC_VALUES = ", ".join(f"({t!r})" for t in _RC_THRESHOLDS)


@register(
    "dedup_recall_curve",
    f"""
WITH
{_docs_tok_cte(_RECALL_WHERE)},
{_MH_PAIR_TAIL},
th(threshold) AS (SELECT CAST(x AS DOUBLE) FROM (VALUES {_RC_VALUES}) v(x)),
exact AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
         THEN len(list_intersect(a.sh, b.sh))::DOUBLE
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         ELSE 0.0 END AS je
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
),
exact_t AS (SELECT * FROM exact WHERE je >= {_RC_THRESHOLDS[0]!r}),
lsh_t AS (
  SELECT DISTINCT id_a, id_b, jaccard AS jl
  FROM verified WHERE jaccard >= {_RC_THRESHOLDS[0]!r}
),
e AS (
  SELECT t.threshold, CAST(count(x.id_a) AS BIGINT) AS n_exact
  FROM th t LEFT JOIN exact_t x ON round(x.je, 9) >= round(t.threshold, 9)
  GROUP BY t.threshold
),
l AS (
  SELECT t.threshold, CAST(count(x.id_a) AS BIGINT) AS n_lsh
  FROM th t LEFT JOIN lsh_t x ON round(x.jl, 9) >= round(t.threshold, 9)
  GROUP BY t.threshold
),
h AS (
  SELECT t.threshold, CAST(count(x.id_a) AS BIGINT) AS n_hit
  FROM th t LEFT JOIN (
    SELECT e0.id_a, e0.id_b, e0.je
    FROM exact_t e0 JOIN lsh_t l0 ON e0.id_a = l0.id_a AND e0.id_b = l0.id_b
  ) x ON round(x.je, 9) >= round(t.threshold, 9)
  GROUP BY t.threshold
)
SELECT e.threshold, e.n_exact, l.n_lsh, h.n_hit,
  CASE WHEN e.n_exact > 0
       THEN round(h.n_hit / CAST(e.n_exact AS DOUBLE), 6) + 0 END AS recall
FROM e JOIN l USING (threshold) JOIN h USING (threshold)
""",
    f"Banding recall curve over thresholds {_RC_THRESHOLDS}: one pair-"
    "generation pass at the lowest threshold, recall per threshold as "
    "filters over the same (sampled) pair sets — the bands/rows tuning "
    "diagnostic without re-paying candidate generation",
)
def q_dedup_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup_ops.dedup_recall_curve(
        docs,
        thresholds=_RC_THRESHOLDS,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        sample_fraction="auto",
        target_docs=_RECALL_TARGET,
        salt=_RECALL_SALT,
    )


# --------------------------------------------------------------------------
# C-ext (round 9). LSH power-curve diagnostic (functions/dedup.py::
# lsh_power_curve): the analytic banding S-curve p(j) = 1 - (1 - j^r)^b
# evaluated on the actual pair population vs the measured banding hits.
# p(j) is built with the SAME fixed-order binary-exponentiation chain
# as the Spark Column (never pow), and the per-threshold sum of p folds
# as an ORDERED (id_a, id_b) running window read at its last row.
# --------------------------------------------------------------------------


def _sql_pow_chain(x: str, n: int) -> str:
    """SQL twin of functions/dedup.py::_pow_chain — identical
    multiplication order, hence identical doubles."""
    from polars_trading_spark.functions.dedup import _pow_chain

    return _pow_chain(x, n, lambda a, b: f"({a} * {b})")


_PC_R = _MH_K // _MH_BANDS
_PC_JR_SQL = _sql_pow_chain("je", _PC_R)
_PC_MISS_SQL = _sql_pow_chain(f"(1.0 - {_PC_JR_SQL})", _MH_BANDS)
_PC_P_SQL = f"1.0 - {_PC_MISS_SQL}"


@register(
    "lsh_power_curve",
    f"""
WITH
{_docs_tok_cte(_RECALL_WHERE)},
{_MH_PAIR_TAIL},
exact AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
         THEN len(list_intersect(a.sh, b.sh))::DOUBLE
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         ELSE 0.0 END AS je
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
),
th(threshold) AS (SELECT CAST(x AS DOUBLE) FROM (VALUES {_RC_VALUES}) v(x)),
exact_t AS (
  SELECT *, {_PC_P_SQL} AS p
  FROM exact WHERE je >= {_RC_THRESHOLDS[0]!r}
),
lsh_t AS (
  SELECT DISTINCT id_a, id_b FROM verified
  WHERE jaccard >= {_RC_THRESHOLDS[0]!r}
),
fanned AS (
  SELECT t.threshold, x.id_a, x.id_b, x.p
  FROM th t JOIN exact_t x ON round(x.je, 9) >= round(t.threshold, 9)
),
e AS (
  SELECT threshold,
    CAST(cnt AS BIGINT) AS n_exact, psum AS expected
  FROM (
    SELECT threshold,
      row_number() OVER w AS rn,
      count(*) OVER (PARTITION BY threshold) AS cnt,
      sum(p) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS psum
    FROM fanned
    WINDOW w AS (PARTITION BY threshold ORDER BY id_a, id_b)
  ) WHERE rn = cnt
),
h AS (
  SELECT t.threshold, CAST(count(x.id_a) AS BIGINT) AS n_hit
  FROM th t LEFT JOIN (
    SELECT e0.id_a, e0.id_b, e0.je FROM exact_t e0
    JOIN lsh_t l0 ON e0.id_a = l0.id_a AND e0.id_b = l0.id_b
  ) x ON round(x.je, 9) >= round(t.threshold, 9)
  GROUP BY t.threshold
)
SELECT t.threshold,
  CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
  coalesce(h.n_hit, 0) AS n_hit,
  round(coalesce(e.expected, 0.0), 6) + 0 AS expected_hits,
  CASE WHEN coalesce(e.n_exact, 0) > 0
       THEN round(h.n_hit / CAST(e.n_exact AS DOUBLE), 6) + 0 END AS recall,
  CASE WHEN coalesce(e.n_exact, 0) > 0
       THEN round(e.expected / CAST(e.n_exact AS DOUBLE), 6) + 0 END
    AS expected_recall
FROM th t LEFT JOIN e ON t.threshold = e.threshold
LEFT JOIN h ON t.threshold = h.threshold
""",
    f"LSH power-curve diagnostic: analytic banding survival "
    f"1-(1-j^{_PC_R})^{_MH_BANDS} summed over the actual pair "
    "population (ordered fold) vs measured banding hits per threshold "
    "— separates a broken banding pipeline from an unlucky corpus",
)
def q_lsh_power_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return dedup_ops.lsh_power_curve(
        docs,
        thresholds=_RC_THRESHOLDS,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        sample_fraction="auto",
        target_docs=_RECALL_TARGET,
        salt=_RECALL_SALT,
    )


# --------------------------------------------------------------------------
# C-ext (round 10). Incremental near-dedup against a persisted MinHash
# signature index (functions/dedup.py::minhash_index /
# incremental_dedup): the corpus splits into a base snapshot (80%, by
# salted id hash) whose SIGNATURES stand in for the parquet index a
# recurring-crawl pipeline persists, and a new snapshot (20%) deduped
# against (index UNION lower-id new) via band collisions + signature-
# estimated Jaccard (an exact k-rational — engine-portable).
# --------------------------------------------------------------------------

_INC_SALT = "pts-inc"

_INC_THRESHOLD = 0.5

_INC_EQ_SQL = (
    "("
    + " + ".join(
        f"(CASE WHEN x.s{i} = y.s{i} THEN 1 ELSE 0 END)" for i in range(_MH_K)
    )
    + ") / 12.0"
)

_INC_BAND_UNION = " UNION ALL ".join(
    f"SELECT doc_id, isnew, s0, {b} AS band, concat_ws(',', "
    + ", ".join(f"s{i}" for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND))
    + ") AS key FROM sigx"
    for b in range(_MH_BANDS)
)


@register(
    "dedup_incremental",
    f"""
WITH
{_DOCS_TOK_CTE},
{_sql_shingle_sh_cte(_MH_NGRAM)},
isplit AS (
  SELECT doc_id,
    ({_sql_hash60("'" + _INC_SALT + "' || CAST(doc_id AS VARCHAR)")}) % 5 = 0 AS isnew
  FROM docs
),
sig0 AS (SELECT doc_id, {_SIG_SQL} FROM sh),
sigx AS (
  SELECT g.*, p.isnew FROM sig0 g JOIN isplit p USING (doc_id)
),
ibanded AS ({_INC_BAND_UNION}),
icand AS (
  SELECT DISTINCT a.doc_id AS nid, b.doc_id AS oid,
    CASE WHEN b.isnew THEN 0 ELSE 1 END AS obase
  FROM ibanded a JOIN ibanded b
    ON a.band = b.band AND a.key = b.key
   AND a.isnew AND (NOT b.isnew OR b.doc_id < a.doc_id)
   AND a.s0 <> {MERSENNE31} AND b.s0 <> {MERSENNE31}
),
iest AS (
  SELECT c.nid, c.oid, c.obase, {_INC_EQ_SQL} AS est
  FROM icand c
  JOIN sigx x ON c.nid = x.doc_id
  JOIN sigx y ON c.oid = y.doc_id
),
ibest AS (
  SELECT nid, est, obase, oid FROM (
    SELECT *, row_number() OVER (
      PARTITION BY nid ORDER BY est DESC, obase DESC, oid ASC) AS rk
    FROM iest WHERE est >= {_INC_THRESHOLD}
  ) WHERE rk = 1
)
SELECT s.doc_id,
  CAST(CASE WHEN b.nid IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep,
  CAST(b.oid AS BIGINT) AS dup_of,
  CAST(b.obase AS INTEGER) AS dup_is_base,
  round(b.est, 6) + 0 AS est_jaccard
FROM (SELECT doc_id FROM isplit WHERE isnew) s
LEFT JOIN ibest b ON s.doc_id = b.nid
""",
    "Incremental near-dedup of a 20% new snapshot against the 80% base "
    "snapshot's persisted MinHash signature index (text-free): band "
    "collisions vs (index UNION lower-id new), signature-estimated "
    "Jaccard >= 0.5 — per-ingest cost scales with the NEW data only",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import portable_hash60

    docs = read_table(spark, sf_dir, "documents")
    h = portable_hash60(
        F.concat(F.lit(_INC_SALT), F.col("doc_id").cast("string"))
    )
    docs = docs.withColumn("__isnew", (h % 5) == 0)
    base = docs.where(~F.col("__isnew")).drop("__isnew")
    new = docs.where(F.col("__isnew")).drop("__isnew")
    index = dedup_ops.minhash_index(
        base, ngram=_MH_NGRAM, num_hashes=_MH_K
    )
    out = dedup_ops.incremental_dedup(
        new,
        index,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        sig_threshold=_INC_THRESHOLD,
    )
    z0 = F.lit(0.0)
    return out.select(
        "doc_id",
        "keep",
        "dup_of",
        "dup_is_base",
        (F.round("est_jaccard", 6) + z0).alias("est_jaccard"),
    )


@register(
    "dedup_cluster_profile",
    f"""
WITH RECURSIVE
{_MH_PAIR_CTES},
{_CC_TAIL},
csize AS (
  SELECT cluster_id, count(*) AS sz FROM labeled GROUP BY cluster_id
),
cprof AS (
  SELECT sz AS cluster_size, count(*) AS n_clusters,
         CAST(sz * count(*) AS BIGINT) AS n_docs
  FROM csize GROUP BY sz
)
SELECT CAST(cluster_size AS INTEGER) AS cluster_size,
  CAST(n_clusters AS BIGINT) AS n_clusters,
  n_docs,
  CAST(n_docs - n_clusters AS BIGINT) AS dup_docs,
  round(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 6) + 0 AS doc_share
FROM cprof
""",
    "Cluster-size distribution of the MinHash near-dup graph "
    "(singletons included): one integer aggregate over the labeled "
    "corpus — the threshold sanity report dedup papers lead with",
)
def q_dedup_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = dedup_ops.dedup_cluster_profile(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    z0 = F.lit(0.0)
    return out.select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        "dup_docs",
        (F.round("doc_share", 6) + z0).alias("doc_share"),
    )


# --------------------------------------------------------------------------
# C-ext (round 10). LSH (bands, rows) selection table (functions/
# dedup.py::lsh_param_select): every factorization of the MinHash
# budget scored analytically on the actual pair population — expected
# recall above the target threshold vs expected near-miss candidate
# mass; identical fixed-order pow chains, ordered per-factor folds.
# --------------------------------------------------------------------------

_PS_T, _PS_FLOOR = 0.4, 0.15

_PS_BS = [b for b in range(1, _MH_K + 1) if _MH_K % b == 0]


def _ps_p_sql(b: int) -> str:
    jr = _sql_pow_chain("je", _MH_K // b)
    return f"(1.0 - {_sql_pow_chain(f'(1.0 - {jr})', b)})"


_PS_P_CASE = (
    "CASE "
    + " ".join(
        f"WHEN f.bands = {b} THEN {_ps_p_sql(b)}" for b in _PS_BS[::-1][:-1]
    )
    + f" ELSE {_ps_p_sql(_PS_BS[0])} END"
)


@register(
    "lsh_param_select",
    f"""
WITH
{_docs_tok_cte(_RECALL_WHERE)},
{_sql_shingle_sh_cte(_MH_NGRAM)},
psx AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
         THEN len(list_intersect(a.sh, b.sh))::DOUBLE
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         ELSE 0.0 END AS je
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
),
psp AS (SELECT * FROM psx WHERE je >= {_PS_FLOOR!r}),
psf AS (
  SELECT p.id_a, p.id_b, f.bands, f.rows_per_band,
    {_PS_P_CASE} AS pp,
    CASE WHEN round(p.je, 9) >= round({_PS_T!r}, 9) THEN 1 ELSE 0 END AS pos
  FROM psp p CROSS JOIN (
    SELECT unnest([{", ".join(str(b) for b in _PS_BS)}]) AS bands,
           unnest([{", ".join(str(_MH_K // b) for b in _PS_BS)}]) AS rows_per_band
  ) f
),
psg AS (
  SELECT bands, rows_per_band, n, npos, sp, sn FROM (
    SELECT bands, rows_per_band,
      row_number() OVER wo AS rn,
      count(*) OVER wa AS n,
      sum(pos) OVER wa AS npos,
      sum(CASE WHEN pos = 1 THEN pp END) OVER wr AS sp,
      sum(CASE WHEN pos = 0 THEN pp END) OVER wr AS sn
    FROM psf
    WINDOW wo AS (PARTITION BY bands ORDER BY id_a, id_b),
           wr AS (PARTITION BY bands ORDER BY id_a, id_b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wa AS (PARTITION BY bands)
  ) WHERE rn = n
)
SELECT CAST(bands AS INTEGER) AS bands,
  CAST(rows_per_band AS INTEGER) AS rows_per_band,
  CAST(npos AS BIGINT) AS n_pos_pairs,
  CAST(n - npos AS BIGINT) AS n_near_pairs,
  round(CASE WHEN npos > 0 THEN sp / CAST(npos AS DOUBLE) END, 6) + 0
    AS exp_recall,
  round(CASE WHEN n - npos > 0 THEN sn / CAST(n - npos AS DOUBLE) END, 6) + 0
    AS exp_near_fp,
  round(coalesce(CASE WHEN npos > 0 THEN sp / CAST(npos AS DOUBLE) END, 0.0)
        - coalesce(CASE WHEN n - npos > 0
                        THEN sn / CAST(n - npos AS DOUBLE) END, 0.0), 6) + 0
    AS score
FROM psg
""",
    f"LSH (bands, rows) selection table for the {_MH_K}-hash budget at "
    f"threshold {_PS_T}: every factorization's expected recall vs "
    "expected near-miss candidate mass on the actual (sampled) pair "
    "population — fixed-order pow chains, ordered per-factor folds",
)
def q_lsh_param_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = dedup_ops.lsh_param_select(
        docs,
        threshold=_PS_T,
        floor=_PS_FLOOR,
        num_hashes=_MH_K,
        ngram=_MH_NGRAM,
        sample_fraction="auto",
        target_docs=_RECALL_TARGET,
        salt=_RECALL_SALT,
    )
    z0 = F.lit(0.0)
    return out.select(
        "bands",
        "rows_per_band",
        "n_pos_pairs",
        "n_near_pairs",
        (F.round("exp_recall", 6) + z0).alias("exp_recall"),
        (F.round("exp_near_fp", 6) + z0).alias("exp_near_fp"),
        (F.round("score", 6) + z0).alias("score"),
    )
