"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark.functions import corpus as corpus_ops
from polars_trading_spark.sources.tables import TRADES_CTE
from polars_trading_spark.sources.tables import read_table
from polars_trading_spark.sources.tables import trades_from_events
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from polars_trading_spark.oracles._shared import (  # noqa: F401
    QUERIES,
    Query,
    register,
)
from polars_trading_spark.oracles.text import (  # noqa: F401
    _DOCS_TOK_CTE,
    _QUALITY_SQL,
    _TEXT_FEAT_CTES,
    _sql_hash60,
    _sql_shingle_sh_cte,
)
from polars_trading_spark.oracles.dedup import (  # noqa: F401
    _CC_TAIL,
    _MH_BANDS,
    _MH_K,
    _MH_NGRAM,
    _MH_PAIR_TAIL,
    _MH_THRESHOLD,
)



# --------------------------------------------------------------------------
# corpus_stats — per-language corpus profile: counts, distinct
# fingerprints, token percentiles, mean quality.  Exact percentile /
# count-distinct here (oracle-checkable); the operator's exact=False
# flips the same aggregate to t-digest + HLL sketches for 100 TB runs.
# --------------------------------------------------------------------------


@register(
    "corpus_stats",
    f"""
WITH
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES},
q AS (
  SELECT lang, n_tokens, fingerprint, {_QUALITY_SQL} AS quality FROM feat
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT fingerprint) AS BIGINT) AS distinct_fingerprints,
       round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
       round(quantile_cont(n_tokens, 0.9), 6) AS p90_tokens,
       round(quantile_cont(n_tokens, 0.99), 6) AS p99_tokens,
       round(avg(n_tokens), 6) AS avg_tokens,
       round(avg(quality), 6) AS avg_quality
FROM q
GROUP BY lang
""",
    "Per-language corpus dashboard: doc counts, post-exact-dedup size, "
    "token percentiles, mean quality — one hash aggregate; sketch "
    "variants (t-digest/HLL) behind exact=False",
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = corpus_ops.corpus_stats(docs, exact=True)
    return out.select(
        "lang",
        "n_docs",
        "distinct_fingerprints",
        *[F.round(c, 6).alias(c) for c in ("p50_tokens", "p90_tokens", "p99_tokens")],
        F.round("avg_tokens", 6).alias("avg_tokens"),
        F.round("avg_quality", 6).alias("avg_quality"),
    )



# --------------------------------------------------------------------------
# corpus_filter: the composite training-data cleanse (gates + dedup).
# --------------------------------------------------------------------------

_CF_LANGS = ("en", "de", "fr", "es")

_CF_MIN_TOKENS, _CF_MAX_TOKENS, _CF_MIN_QUALITY = 20, 100_000, 0.5

_CF_LANGS_SQL = ", ".join(f"'{lang}'" for lang in _CF_LANGS)

_CF_GATES_SQL = f"""s.lang_guess IN ({_CF_LANGS_SQL})
        AND s.n_tokens BETWEEN {_CF_MIN_TOKENS} AND {_CF_MAX_TOKENS}
        AND s.q >= {_CF_MIN_QUALITY}"""



@register(
    "corpus_filter",
    f"""
WITH RECURSIVE
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES},
{_MH_PAIR_TAIL},
{_CC_TAIL},
scored AS (
  SELECT doc_id, lang_guess, n_tokens, fingerprint,
         {_QUALITY_SQL} AS q
  FROM feat
),
ex AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY fingerprint) AS keep_id
  FROM scored
)
SELECT s.doc_id, s.lang_guess, s.n_tokens,
       round(s.q, 6) AS quality_score,
       s.lang_guess IN ({_CF_LANGS_SQL}) AS pass_lang,
       s.n_tokens BETWEEN {_CF_MIN_TOKENS} AND {_CF_MAX_TOKENS} AS pass_tokens,
       s.q >= {_CF_MIN_QUALITY} AS pass_quality,
       s.doc_id <> e.keep_id AS is_exact_dup,
       s.doc_id <> l.cluster_id AS is_near_dup,
       ({_CF_GATES_SQL}
        AND s.doc_id = e.keep_id
        AND s.doc_id = l.cluster_id) AS keep
FROM scored s JOIN ex e USING (doc_id) JOIN labeled l USING (doc_id)
""",
    "Training-data cleanse: language/token/quality gates + exact-dedup "
    "keeper + near-dup cluster keeper -> keep decision with audit trail",
)
def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = corpus_ops.corpus_filter(
        docs,
        langs=_CF_LANGS,
        min_tokens=_CF_MIN_TOKENS,
        max_tokens=_CF_MAX_TOKENS,
        min_quality=_CF_MIN_QUALITY,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    return out.withColumn("quality_score", F.round("quality_score", 6))



# --------------------------------------------------------------------------
# corpus_split: deterministic hash-based train/val/test assignment.
# --------------------------------------------------------------------------

_SPLIT_MOD = 1 << 30

_SPLIT_SALT = "pts-split"

_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}



@register(
    "corpus_split",
    f"""
WITH u AS (
  SELECT doc_id,
         ({_sql_hash60(f"concat('{_SPLIT_SALT}', CAST(doc_id AS VARCHAR))")} % {_SPLIT_MOD})
           / {float(_SPLIT_MOD)} AS u
  FROM documents
)
SELECT doc_id,
       CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM u
""",
    "Deterministic, engine-portable train/val/test split by salted id "
    "hash — stable under re-ingestion, leakage-safe",
)
def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return corpus_ops.hash_split(docs, weights=_SPLIT_WEIGHTS, salt=_SPLIT_SALT).select(
        "doc_id", "split"
    )



# --------------------------------------------------------------------------
# C-ext. Stratified corpus sampling (functions/corpus.py) — deterministic
# per-language rebalancing by the same engine-portable salted hash the
# split assignment uses.
# --------------------------------------------------------------------------

_SAMPLE_SALT = "pts-sample"

_SAMPLE_FRACS = {"en": 0.25, "de": 0.75, "fr": 0.75, "es": 0.75}

_SAMPLE_DEFAULT = 1.0

_SAMPLE_MOD = 1 << 30


_SAMPLE_CASE = " ".join(
    [f"WHEN lang = '{k}' THEN {v!r}" for k, v in _SAMPLE_FRACS.items()]
)



@register(
    "stratified_sample",
    f"""
WITH u AS (
  SELECT doc_id, lang,
         ({_sql_hash60(f"concat('{_SAMPLE_SALT}', CAST(doc_id AS VARCHAR))")} % {_SAMPLE_MOD})
           / {float(_SAMPLE_MOD)} AS u
  FROM documents
)
SELECT doc_id, lang
FROM u
WHERE u < CASE {_SAMPLE_CASE} ELSE {_SAMPLE_DEFAULT!r} END
""",
    "Deterministic stratified corpus sample: downweight the dominant "
    "language via salted id hash — nested, engine-portable, zero-shuffle",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import stratified_sample

    docs = read_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs.select("doc_id", "lang"),
        stratum_col="lang",
        fractions=_SAMPLE_FRACS,
        default_fraction=_SAMPLE_DEFAULT,
        salt=_SAMPLE_SALT,
    )
    return out



# --------------------------------------------------------------------------
# C-ext. Benchmark decontamination (functions/corpus.py::decontaminate)
# --------------------------------------------------------------------------

_DECON_NGRAM = 3



@register(
    "decontaminate",
    f"""
WITH {_DOCS_TOK_CTE},
{_sql_shingle_sh_cte(_DECON_NGRAM)},
bench AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 20 = 0
),
grams AS (
  SELECT doc_id, unnest(sh) AS g FROM sh
),
hits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM grams JOIN bench USING (g)
  GROUP BY doc_id
)
SELECT s.doc_id,
  CAST(len(s.sh) AS INTEGER) AS n_grams,
  CAST(coalesce(h.n_hits, 0) AS INTEGER) AS n_hits,
  CASE WHEN len(s.sh) > 0
       THEN CAST(coalesce(h.n_hits, 0) AS DOUBLE) / len(s.sh)
       ELSE 0.0 END AS contamination_ratio,
  coalesce(h.n_hits, 0) >= 1 AS is_contaminated
FROM sh s LEFT JOIN hits h USING (doc_id)
""",
    f"Benchmark decontamination: {_DECON_NGRAM}-gram shingle-hash overlap "
    "against the benchmark subset (doc_id % 20 = 0) via broadcast "
    "semi-probe (GPT-3 appx C / FineWeb hygiene pass)",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import decontaminate

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    return decontaminate(docs, bench, ngram=_DECON_NGRAM)



# --------------------------------------------------------------------------
# C-ext. Training-mixture sampling (functions/corpus.py::mix_corpus)
# --------------------------------------------------------------------------

_MIX_TARGET = 12_000

_MIX_WEIGHTS = {"src0": 0.70, "src1": 0.10, "src2": 0.10, "src3": 0.10}



def _mix_oracle() -> str:
    total_w = sum(_MIX_WEIGHTS.values())
    wcase = " ".join(
        f"WHEN '{s}' THEN CAST({w / total_w!r} AS DOUBLE)"
        for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"""
WITH
{_DOCS_TOK_CTE},
avail AS (
  SELECT source, CAST(sum(len(toks)) AS DOUBLE) AS av,
    CASE source {wcase} END AS w
  FROM tok GROUP BY source
),
rates AS (
  SELECT source, least(4.0, w * {_MIX_TARGET} / av) AS mix_rate
  FROM avail WHERE w IS NOT NULL
),
drawn AS (
  SELECT d.doc_id, d.source, r.mix_rate,
    CAST(floor(r.mix_rate) AS INTEGER)
      + CASE WHEN CAST(('0x' || substr(md5('pts-mix' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 1073741824 / 1073741824.0
                < r.mix_rate - floor(r.mix_rate) THEN 1 ELSE 0 END AS n
  FROM docs d JOIN rates r USING (source)
)
SELECT doc_id, source, round(mix_rate, 6) AS mix_rate, g.e AS epoch
FROM drawn
JOIN generate_series(0, 7) AS g(e) ON g.e < n
WHERE n > 0
""",



@register(
    "mix_corpus",
    _mix_oracle()[0],
    "Static domain mixing: per-source sample/oversample rates hitting a "
    "40k-token budget at pinned weights, deterministic salted-hash draws "
    "with epoch expansion",
)
def q_mix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import mix_corpus

    docs = read_table(spark, sf_dir, "documents")
    out = mix_corpus(docs, weights=_MIX_WEIGHTS, target_tokens=_MIX_TARGET)
    return out.select(
        "doc_id",
        "source",
        F.round("mix_rate", 6).alias("mix_rate"),
        "epoch",
    )



# --------------------------------------------------------------------------
# C-ext. Sequence packing (functions/corpus.py::pack_sequences)
# --------------------------------------------------------------------------

_PACK_BUDGET, _PACK_SHARDS = 512, 4



def _pack_chain_sql(budget: int, shards: int) -> str:
    """The greedy-packing CTE chain (assumes a ``pdocs(doc_id, n_tok,
    h)`` CTE; recursion named ``prec`` so it can compose with other
    recursive chains like _BPE_REC in one WITH RECURSIVE)."""
    return f"""sharded AS (
  SELECT doc_id, n_tok, h, CAST(h % {shards} AS INTEGER) AS shard,
    row_number() OVER (PARTITION BY h % {shards} ORDER BY h, doc_id) - 1 AS idx
  FROM pdocs
),
pre AS (
  SELECT *,
    sum(n_tok) OVER (PARTITION BY shard ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_end,
    sum(n_tok) OVER (PARTITION BY shard ORDER BY idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS c_start
  FROM sharded
),
nmax AS (SELECT shard, count(*) AS n FROM pre GROUP BY shard),
prec AS (
  SELECT shard, 0 AS s, 0 AS b FROM nmax
  UNION ALL
  SELECT r.shard,
    CAST(greatest(r.s + 1,
      coalesce((SELECT min(p.idx) FROM pre p
                WHERE p.shard = r.shard AND p.idx >= r.s
                  AND p.c_end - coalesce((SELECT p2.c_end FROM pre p2
                                          WHERE p2.shard = r.shard AND p2.idx = r.s - 1), 0)
                      > {budget}),
               (SELECT n FROM nmax WHERE nmax.shard = r.shard))) AS INTEGER) AS s,
    r.b + 1 AS b
  FROM prec r
  WHERE r.s < (SELECT n FROM nmax WHERE nmax.shard = r.shard)
),
assign AS (
  SELECT p.shard, p.doc_id, p.idx, p.n_tok, p.c_start,
    (SELECT max(r.b) FROM prec r WHERE r.shard = p.shard AND r.s <= p.idx) AS seq_id,
    (SELECT max(r.s) FROM prec r WHERE r.shard = p.shard AND r.s <= p.idx) AS bstart
  FROM pre p
)"""


# CAST notes: DuckDB window sums of integers are HUGEINT; an uncast
# HUGEINT output column survives fetchall() (python int) but turns
# float64 under a pandas-based fetch, which stringifies 100 as "100.0"
# and broke the driver's string-keyed value hash (round-5 red row).
_PACK_FINAL_SQL = """SELECT a.doc_id, a.shard,
  CAST(a.seq_id AS INTEGER) AS seq_id,
  CAST(a.c_start - p2.c_start AS BIGINT) AS seq_offset,
  CAST(a.n_tok AS INTEGER) AS n_tokens
FROM assign a
JOIN pre p2 ON p2.shard = a.shard AND p2.idx = a.bstart"""


@register(
    "pack_sequences",
    f"""
WITH RECURSIVE
pdocs AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x != '')) AS INTEGER) AS n_tok,
    CAST(('0x' || substr(md5('pts-pack' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM documents
),
{_pack_chain_sql(_PACK_BUDGET, _PACK_SHARDS)}
{_PACK_FINAL_SQL}
""",
    f"Greedy {_PACK_BUDGET}-token sequence packing after a deterministic "
    f"salted-hash shuffle, {_PACK_SHARDS} parallel shards (T5-style "
    "pre-tokenization packing), replayed by a recursive-CTE oracle",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import pack_sequences

    docs = read_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget_tokens=_PACK_BUDGET, n_shards=_PACK_SHARDS)



# --------------------------------------------------------------------------
# C-ext. Corpus cleanse funnel (functions/corpus.py::corpus_funnel) — the
# per-stage yield report; oracle wraps the corpus_filter oracle verbatim.
# --------------------------------------------------------------------------

_FUNNEL_SQL = f"""
WITH agg AS (
  SELECT
    CAST(count(*) AS BIGINT) AS d0, CAST(sum(n_tokens) AS BIGINT) AS t0,
    CAST(count(CASE WHEN pass_lang AND pass_tokens AND pass_quality THEN 1 END) AS BIGINT) AS d1,
    CAST(coalesce(sum(CASE WHEN pass_lang AND pass_tokens AND pass_quality THEN n_tokens END), 0) AS BIGINT) AS t1,
    CAST(count(CASE WHEN pass_lang AND pass_tokens AND pass_quality AND NOT is_exact_dup THEN 1 END) AS BIGINT) AS d2,
    CAST(coalesce(sum(CASE WHEN pass_lang AND pass_tokens AND pass_quality AND NOT is_exact_dup THEN n_tokens END), 0) AS BIGINT) AS t2,
    CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS d3,
    CAST(coalesce(sum(CASE WHEN keep THEN n_tokens END), 0) AS BIGINT) AS t3
  FROM ({{base}}) b
)
SELECT 0 AS stage_idx, 'raw' AS stage, d0 AS n_docs, t0 AS n_tokens FROM agg
UNION ALL SELECT 1, 'quality', d1, t1 FROM agg
UNION ALL SELECT 2, 'exact_dedup', d2, t2 FROM agg
UNION ALL SELECT 3, 'near_dedup', d3, t3 FROM agg
"""



@register(
    "corpus_funnel",
    None,  # filled in immediately below from the corpus_filter oracle
    "Cleanse funnel: docs/tokens surviving raw -> quality gates -> "
    "exact dedup -> near dedup",
)
def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return corpus_ops.corpus_funnel(
        docs,
        langs=_CF_LANGS,
        min_tokens=_CF_MIN_TOKENS,
        max_tokens=_CF_MAX_TOKENS,
        min_quality=_CF_MIN_QUALITY,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    ).withColumn("stage_idx", F.col("stage_idx").cast("int"))



QUERIES["corpus_funnel"] = Query(
    name="corpus_funnel",
    spark=QUERIES["corpus_funnel"].spark,
    oracle=_FUNNEL_SQL.format(base=QUERIES["corpus_filter"].oracle),
    description=QUERIES["corpus_funnel"].description,
)



# --------------------------------------------------------------------------
# C-ext. PSI feature drift (operators/drift.py::psi_drift)
# --------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-08 00:00:00"

_PSI_BINS, _PSI_EPS = 10, 1e-4



@register(
    "psi_drift",
    f"""
WITH trades AS ({TRADES_CTE}),
t AS (
  SELECT symbol, price AS x, ts_event < TIMESTAMP '{_PSI_SPLIT}' AS is_ref
  FROM trades WHERE price IS NOT NULL
),
rng AS (
  SELECT symbol, min(x) AS mn, max(x) AS mx FROM t WHERE is_ref GROUP BY symbol
),
b AS (
  SELECT t.symbol, t.is_ref,
    CASE WHEN r.mx > r.mn
         THEN least(greatest(CAST(floor((t.x - r.mn) / (r.mx - r.mn) * {_PSI_BINS}) AS BIGINT), 0), {_PSI_BINS - 1})
         ELSE 0 END AS bin
  FROM t JOIN rng r USING (symbol)
),
g AS (
  SELECT symbol, bin,
    count(CASE WHEN is_ref THEN 1 END) AS cr,
    count(CASE WHEN NOT is_ref THEN 1 END) AS cc
  FROM b GROUP BY symbol, bin
),
tot AS (SELECT symbol, CAST(sum(cr) AS BIGINT) AS n_ref, CAST(sum(cc) AS BIGINT) AS n_cur
        FROM g GROUP BY symbol),
s AS (
  SELECT g.symbol, tot.n_ref, tot.n_cur,
    sum((cc / CAST(n_cur AS DOUBLE) + {_PSI_EPS!r} - (cr / CAST(n_ref AS DOUBLE) + {_PSI_EPS!r}))
        * ln((cc / CAST(n_cur AS DOUBLE) + {_PSI_EPS!r}) / (cr / CAST(n_ref AS DOUBLE) + {_PSI_EPS!r}))) AS psi
  FROM g JOIN tot USING (symbol)
  GROUP BY g.symbol, tot.n_ref, tot.n_cur
)
SELECT symbol, n_ref, n_cur,
  round(CASE WHEN n_ref > 0 AND n_cur > 0 THEN psi END, 6) AS psi,
  CASE WHEN n_ref > 0 AND n_cur > 0 THEN psi > 0.2 END AS drifted
FROM s
""",
    f"Population Stability Index of tick prices per symbol ({_PSI_BINS} "
    f"reference-range bins, split at {_PSI_SPLIT}) — the deployed-model "
    "drift monitor",
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.drift import psi_drift

    t = trades_from_events(spark, sf_dir)
    out = psi_drift(
        t, "price", split_ts=_PSI_SPLIT, bins=_PSI_BINS, epsilon=_PSI_EPS
    )
    return out.select(
        "symbol", "n_ref", "n_cur", F.round("psi", 6).alias("psi"), "drifted"
    )



# --------------------------------------------------------------------------
# C-ext. Kolmogorov-Smirnov drift (operators/drift.py::ks_drift) — the
# binning-free sibling of psi_drift; integer cumulative CDFs replayed.
# --------------------------------------------------------------------------

_KS_COEFF = 1.358



@register(
    "ks_drift",
    f"""
WITH trades AS ({TRADES_CTE}),
t AS (
  SELECT symbol, price AS x, ts_event < TIMESTAMP '{_PSI_SPLIT}' AS is_ref
  FROM trades WHERE price IS NOT NULL
),
g AS (
  SELECT symbol, x,
    count(CASE WHEN is_ref THEN 1 END) AS r,
    count(CASE WHEN NOT is_ref THEN 1 END) AS c
  FROM t GROUP BY symbol, x
),
cum AS (
  SELECT symbol,
    sum(r) OVER (PARTITION BY symbol) AS nr,
    sum(c) OVER (PARTITION BY symbol) AS nc,
    sum(r) OVER (PARTITION BY symbol ORDER BY x
                 ROWS UNBOUNDED PRECEDING) AS cr,
    sum(c) OVER (PARTITION BY symbol ORDER BY x
                 ROWS UNBOUNDED PRECEDING) AS cc
  FROM g
),
per AS (
  SELECT symbol, CAST(max(nr) AS BIGINT) AS n_ref, CAST(max(nc) AS BIGINT) AS n_cur,
    max(CASE WHEN nr > 0 AND nc > 0
             THEN abs(cr / CAST(nr AS DOUBLE) - cc / CAST(nc AS DOUBLE)) END) AS ks
  FROM cum GROUP BY symbol
)
SELECT symbol, n_ref, n_cur,
  round(CASE WHEN n_ref > 0 AND n_cur > 0 THEN ks END, 6) AS ks,
  round(CASE WHEN n_ref > 0 AND n_cur > 0
             THEN {_KS_COEFF} * sqrt((n_ref + n_cur) / (CAST(n_ref AS DOUBLE) * n_cur)) END, 6)
    AS ks_critical,
  CASE WHEN n_ref > 0 AND n_cur > 0
       THEN ks > {_KS_COEFF} * sqrt((n_ref + n_cur) / (CAST(n_ref AS DOUBLE) * n_cur)) END
    AS drifted
FROM per
""",
    f"Exact two-sample KS drift of tick prices per symbol (split at "
    f"{_PSI_SPLIT}, alpha 0.05 critical value) — binning-free sibling "
    "of psi_drift",
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.drift import ks_drift

    t = trades_from_events(spark, sf_dir)
    out = ks_drift(t, "price", split_ts=_PSI_SPLIT, alpha_coeff=_KS_COEFF)
    return out.select(
        "symbol",
        "n_ref",
        "n_cur",
        F.round("ks", 6).alias("ks"),
        F.round("ks_critical", 6).alias("ks_critical"),
        "drifted",
    )



# --------------------------------------------------------------------------
# C-ext. DSIR importance log-weights (functions/corpus.py::
# dsir_log_weights) — hashed-bigram target/raw LM ratio; integer bucket
# LMs + doc-ordered running reduce replayed exactly.
# --------------------------------------------------------------------------

_DSIR_B = 4096



@register(
    "dsir_weights",
    f"""
WITH
{_DOCS_TOK_CTE},
db0 AS (
  SELECT doc_id, lang = 'en' AS tgt, toks, len(toks) AS ntok FROM tok
),
dg AS (
  SELECT doc_id, tgt, toks[i] || ' ' || toks[i + 1] AS gram
  FROM db0, unnest(generate_series(1, ntok - 1)) AS gs(i)
  WHERE ntok >= 2
),
dfeat AS (
  SELECT doc_id, tgt, {_sql_hash60('gram')} % {_DSIR_B} AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM dg GROUP BY 1, 2, 3
),
dlm AS (
  SELECT b, CAST(sum(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(c) AS BIGINT) AS cr
  FROM dfeat GROUP BY b
),
dtot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt_, CAST(sum(cr) AS BIGINT) AS nr_ FROM dlm),
drat AS (
  SELECT b,
    ln(CAST(ct + 1 AS DOUBLE) / CAST(nt_ + {_DSIR_B} AS DOUBLE))
    - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr_ + {_DSIR_B} AS DOUBLE)) AS lr
  FROM dlm CROSS JOIN dtot
),
dsc AS (SELECT f.doc_id, f.b, f.c, r.lr FROM dfeat f JOIN drat r USING (b)),
drun AS (
  SELECT doc_id, b,
    row_number() OVER (PARTITION BY doc_id ORDER BY b) AS rn,
    count(*) OVER (PARTITION BY doc_id) AS k,
    sum(c) OVER (PARTITION BY doc_id) AS nf,
    sum(CAST(c AS DOUBLE) * lr) OVER (PARTITION BY doc_id ORDER BY b
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w
  FROM dsc
),
dlast AS (SELECT doc_id, CAST(nf AS BIGINT) AS n_feats, w AS log_w
          FROM drun WHERE rn = k)
SELECT d.doc_id, coalesce(l.n_feats, 0) AS n_feats,
  round(l.log_w, 6) + 0 AS log_w
FROM documents d LEFT JOIN dlast l USING (doc_id)
""",
    f"DSIR importance log-weights (hashed bigrams, {_DSIR_B} buckets, "
    "add-1 smoothing; target = lang='en') — domain-tilted data "
    "selection; integer bucket LMs, broadcast ratio join, "
    "bucket-ordered per-doc reduce, zero Python",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import dsir_log_weights

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "__is_en", F.col("lang") == "en"
    )
    out = dsir_log_weights(docs, is_target_col="__is_en", n_buckets=_DSIR_B)
    return out.select(
        "doc_id",
        "n_feats",
        (F.round("log_w", 6) + F.lit(0.0)).alias("log_w"),
    )



# --------------------------------------------------------------------------
# C-ext (round 6). Gumbel-top-k weighted sampling without replacement
# (functions/corpus.py::gumbel_topk_sample).
# --------------------------------------------------------------------------

_GUM_K = 50



@register(
    "gumbel_topk",
    f"""
WITH g AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
    ln(CAST(n_chars AS DOUBLE))
      - ln(-ln(((CAST(('0x' || substr(md5('pts-gumbel' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 1073741824) + 0.5) / 1073741824.0)) AS sample_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight, round(sample_key, 6) + 0 AS sample_key,
  CAST(rnk AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY sample_key DESC, doc_id) AS rnk FROM g)
WHERE rnk <= {_GUM_K}
""",
    f"Deterministic weighted sampling without replacement: top-{_GUM_K} "
    "Gumbel-perturbed keys (ln w + Gumbel noise from the salted 60-bit "
    "hash) over document char counts — RNG-free importance resampling",
)
def q_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import gumbel_topk_sample

    docs = read_table(spark, sf_dir, "documents")
    out = gumbel_topk_sample(docs, k=_GUM_K, weight_col="n_chars")
    return out.select(
        "doc_id",
        "weight",
        (F.round("sample_key", 6) + F.lit(0.0)).alias("sample_key"),
        "rank",
    )



# --------------------------------------------------------------------------
# C-ext (round 6). Distribution diagnostics (operators/stats.py):
# exact group quantiles and join-key skew profiling.
# --------------------------------------------------------------------------

_QP_PCTS = (25, 50, 75, 90, 99)

_SKEW_TOPK = 10



@register(
    "size_quantiles",
    f"""
WITH trades AS ({TRADES_CTE}),
r AS (
  SELECT symbol, size AS v,
    row_number() OVER (PARTITION BY symbol ORDER BY size) AS rn,
    count(*) OVER (PARTITION BY symbol) AS n
  FROM trades
)
SELECT symbol, CAST(max(n) AS BIGINT) AS n,
  {", ".join(f"max(CASE WHEN rn = ({p} * n + 99) // 100 THEN v END) AS p{p}" for p in _QP_PCTS)}
FROM r GROUP BY symbol
""",
    "Exact per-symbol trade-size percentiles via integer-ceil count-based "
    "selection (the reproducible sibling of approx_percentile)",
)
def q_size_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.stats import quantile_profile

    t = trades_from_events(spark, sf_dir)
    return quantile_profile(t, "size", by="symbol", percents=_QP_PCTS)



@register(
    "key_skew",
    f"""
WITH c AS (
  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_rows
  FROM events GROUP BY 1
),
t AS (SELECT count(*) AS nk, sum(n_rows) AS tot, max(n_rows) AS mx FROM c),
top AS (
  SELECT * FROM c ORDER BY n_rows DESC, key ASC NULLS LAST LIMIT {_SKEW_TOPK}
)
SELECT
  CAST(row_number() OVER (ORDER BY n_rows DESC, key ASC NULLS LAST) AS INTEGER) AS rank,
  key,
  CAST(n_rows AS BIGINT) AS n_rows,
  round(n_rows / CAST(tot AS DOUBLE), 6) + 0 AS share,
  CAST(nk AS BIGINT) AS n_keys,
  CAST(tot AS BIGINT) AS total_rows,
  round(mx / (tot / CAST(nk AS DOUBLE)), 6) + 0 AS skew_ratio
FROM top, t
""",
    f"Join-key heavy-hitter report: top-{_SKEW_TOPK} event user_ids by "
    "row count with share and max/mean skew ratio — the salting/AQE "
    "decision input",
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.stats import key_skew_profile

    ev = read_table(spark, sf_dir, "events")
    out = key_skew_profile(ev, "user_id", top_k=_SKEW_TOPK)
    return out.select(
        "rank",
        "key",
        "n_rows",
        (F.round("share", 6) + F.lit(0.0)).alias("share"),
        "n_keys",
        "total_rows",
        (F.round("skew_ratio", 6) + F.lit(0.0)).alias("skew_ratio"),
    )


# --------------------------------------------------------------------------
# C-ext (round 8). Per-source token-budget curves under quality cutoffs
# (functions/corpus.py::token_budget_curves) — quality rounded to 6
# BEFORE ranking (round-before-rank), ordered integer token prefix-sum,
# boundary rows picked with closed-form integer arithmetic.
# --------------------------------------------------------------------------

_TBC_NC = 10


@register(
    "token_budget_curves",
    f"""
WITH
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES},
base AS (
  SELECT d.source, f.doc_id AS id, CAST(f.n_tokens AS BIGINT) AS tok,
         round({_QUALITY_SQL}, 6) AS q
  FROM feat f JOIN docs d USING (doc_id)
),
staged AS (
  SELECT source,
    row_number() OVER w AS rn,
    q,
    CAST(sum(tok) OVER (PARTITION BY source ORDER BY q DESC, id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum,
    count(*) OVER (PARTITION BY source) AS nsrc,
    CAST(sum(tok) OVER (PARTITION BY source) AS BIGINT) AS tot
  FROM base WINDOW w AS (PARTITION BY source ORDER BY q DESC, id)
),
bounded AS (
  SELECT *,
    ((rn - 1) * {_TBC_NC}) // nsrc + 1 AS d_min,
    (rn * {_TBC_NC}) // nsrc AS d_max
  FROM staged
)
SELECT source,
  CAST(unnest(range(d_min, d_max + 1)) AS INTEGER) AS cutoff_idx,
  CAST(rn AS BIGINT) AS n_docs_kept,
  q + 0 AS quality_cutoff,
  cum AS cum_tokens,
  tot AS total_tokens,
  round(cum / CAST(tot AS DOUBLE), 6) + 0 AS token_share
FROM bounded WHERE d_max >= d_min
""",
    f"Per-source token-budget curves: tokens surviving at {_TBC_NC} "
    "quality-cutoff fractions per source — the training-data budgeting "
    "curve; one window pass, integer prefix-sums, output "
    "sources x cutoffs",
)
def q_token_budget_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import token_budget_curves

    docs = read_table(spark, sf_dir, "documents")
    out = token_budget_curves(docs, n_cutoffs=_TBC_NC)
    z0 = F.lit(0.0)
    return out.select(
        "source",
        "cutoff_idx",
        "n_docs_kept",
        (F.round("quality_cutoff", 6) + z0).alias("quality_cutoff"),
        "cum_tokens",
        "total_tokens",
        (F.round("token_share", 6) + z0).alias("token_share"),
    )


# --------------------------------------------------------------------------
# C-ext (round 8). Distributed BPE training + tokenizer-aware budget
# (functions/bpe.py).  Round 10: the greedy iterative trainer is now
# replayed bit-exactly by a recursive-CTE oracle (the sequential_bootstrap
# / kalman_hedge precedent, oracles/labels.py) — the recursion carries the
# evolving word-segmentation table as LIST state in a single row, one
# iteration per batched merge round: a correlated subquery unnests the
# adjacent-pair multiset, GROUP-BY-aggregates the weighted counts, takes
# the ordered top-window, a list_reduce fold replays the greedy
# token-disjoint selection, and a nested fold replays the one-pass
# left-to-right merge application.  The exact-match golden tests against
# the independent pure-Python reference (tests/test_bpe_train.py) remain
# the algorithmic anchor.
# --------------------------------------------------------------------------

_BPE_MERGES = 20

# Mirrors functions/bpe.py defaults: merges_per_round=8, candidate
# window 8 * merges_per_round, min_pair_count=2.
_BPE_MPR = 8

_BPE_WIN = 8 * _BPE_MPR

_BPE_MINC = 2


# Shared recursive chain ending at `rec` (one row per training round;
# final row = trained state).  Selection fold: list_reduce's implicit
# init (first element) is correct because the first ordered candidate is
# always selected (selected empty, used empty, k >= 1).  Merge fold:
# elements are wrapped as single-element lists so the accumulator is the
# growing segment list; at most one selected pair can match a boundary
# (pairs are token-disjoint), exactly functions/bpe.py::_round_fold_expr.
# DuckDB 1.0 trap: a list_reduce lambda branch that returns `acc`
# UNCHANGED corrupts the accumulator (probe: CASE-skip fold returns only
# the last kept element) — every branch must CONSTRUCT a list, so skips
# are written `acc || x[1:0]` (typed empty), never bare `acc`.
_BPE_REC = f"""
{_DOCS_TOK_CTE},
w0 AS (SELECT unnest(toks) AS w FROM tok),
wt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w0 GROUP BY w),
st0 AS (
  SELECT list(w ORDER BY w) AS words,
         list(c ORDER BY w) AS cnts,
         list(string_split(w, '') ORDER BY w) AS segs
  FROM wt
),
rec AS (
  SELECT 0 AS d,
         CAST([] AS STRUCT(rnk INTEGER, l VARCHAR, r VARCHAR, n BIGINT)[]) AS merges,
         segs
  FROM st0
  UNION ALL
  SELECT d, merges || sel_ranked,
    list_transform(segs, g -> CASE WHEN len(g) >= 2 THEN
      list_reduce(list_transform(g, x -> [x]), (acc, x) ->
        CASE WHEN len(list_filter(sel, m -> m.l = acc[-1] AND m.r = x[1])) > 0
             THEN acc[1:len(acc) - 1] || [acc[-1] || x[1]]
             ELSE acc || x END)
      ELSE g END) AS segs
  FROM (
    SELECT d, merges, segs, sel,
      list_transform(range(len(sel)), i -> {{'rnk': CAST(len(merges) + i + 1 AS INTEGER),
        'l': sel[i + 1].l, 'r': sel[i + 1].r, 'n': sel[i + 1].n}}) AS sel_ranked
    FROM (
      SELECT d, merges, segs,
        CASE WHEN len(cands) = 0
             THEN CAST([] AS STRUCT(l VARCHAR, r VARCHAR, n BIGINT)[])
             ELSE list_reduce(list_transform(cands, cnd -> [cnd]), (acc, x) ->
               acc || CASE WHEN len(acc) < k
                     AND NOT list_contains(flatten(list_transform(acc, m -> [m.l, m.r])), x[1].l)
                     AND NOT list_contains(flatten(list_transform(acc, m -> [m.l, m.r])), x[1].r)
                    THEN x ELSE x[1:0] END)
        END AS sel
      FROM (
        SELECT r2.d + 1 AS d, r2.merges, r2.segs,
          least({_BPE_MPR}, {_BPE_MERGES} - len(r2.merges)) AS k,
          COALESCE(
            (SELECT (list({{'l': pl, 'r': pr, 'n': pn}} ORDER BY pn DESC, pl, pr))[1:{_BPE_WIN}]
             FROM (SELECT u.p.l AS pl, u.p.r AS pr, CAST(sum(u.p.c) AS BIGINT) AS pn
                   FROM unnest(flatten(list_transform(range(len(r2.segs)), i ->
                          list_transform(range(len(r2.segs[i + 1]) - 1), j ->
                            {{'l': r2.segs[i + 1][j + 1], 'r': r2.segs[i + 1][j + 2],
                              'c': s.cnts[i + 1]}})))) AS u(p)
                   GROUP BY u.p.l, u.p.r
                   HAVING sum(u.p.c) >= {_BPE_MINC})),
            CAST([] AS STRUCT(l VARCHAR, r VARCHAR, n BIGINT)[])) AS cands
        FROM rec r2, st0 s
        WHERE len(r2.merges) < {_BPE_MERGES}
      )
    )
  )
  WHERE len(sel) > 0
)"""


@register(
    "bpe_train_merges",
    f"""
WITH RECURSIVE
{_BPE_REC}
SELECT CAST(m.rnk AS INTEGER) AS rank, m.l AS "left", m.r AS "right",
       m.l || m.r AS merged, CAST(m.n AS BIGINT) AS pair_count
FROM (SELECT unnest((SELECT merges FROM rec ORDER BY d DESC LIMIT 1)) AS m)
""",
    f"Distributed BPE trainer: {_BPE_MERGES} merges learned on the "
    "distinct-word table (one corpus pass; each Spark round applies up "
    "to 8 pairwise token-disjoint merges in one aggregate fold, so "
    "rounds ~ vocab/8; bounded top-window collects only); replayed "
    "bit-exactly by a recursive-CTE oracle carrying the segmentation "
    "table as list state",
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.bpe import bpe_train

    docs = read_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, n_merges=_BPE_MERGES)
    return merges


@register(
    "bpe_token_budget",
    f"""
WITH RECURSIVE
{_BPE_REC},
fin AS (SELECT segs FROM rec ORDER BY d DESC LIMIT 1),
vocab AS (
  SELECT unnest(s.words) AS word,
         unnest(list_transform(f.segs, g -> CAST(len(g) AS INTEGER))) AS n_bpe
  FROM st0 s, fin f
),
ex AS (
  SELECT source, doc_id, CAST(length(text) AS BIGINT) AS chars_,
         unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS word
  FROM tok
),
j AS (SELECT e.*, v.n_bpe FROM ex e LEFT JOIN vocab v USING (word)),
pd AS (
  SELECT source, doc_id, max(chars_) AS chars_,
    CAST(count(word) AS BIGINT) AS ws,
    CAST(sum(CASE WHEN word IS NULL THEN 0
                  ELSE coalesce(n_bpe, length(word)) END) AS BIGINT) AS bpe,
    CAST(sum(CASE WHEN word IS NOT NULL AND n_bpe IS NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS oov
  FROM j GROUP BY source, doc_id
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(ws) AS BIGINT) AS whitespace_tokens,
  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
  CAST(sum(chars_) AS BIGINT) AS chars,
  CAST(sum(oov) AS BIGINT) AS n_oov_words,
  round(CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6) + 0 AS bpe_per_word
FROM pd GROUP BY source
""",
    "Per-source token budget under the trained BPE vocabulary "
    "(fertility = BPE tokens per whitespace word): corpus explode + "
    "shuffle_hash join on the vocabulary-sized segmentation table; "
    "OOV words fall back to character count and are flagged in "
    "n_oov_words",
)
def q_bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.bpe import bpe_token_budget, bpe_train

    docs = read_table(spark, sf_dir, "documents")
    _, words = bpe_train(docs, n_merges=_BPE_MERGES)
    out = bpe_token_budget(docs, words)
    z0 = F.lit(0.0)
    return out.select(
        "source",
        "n_docs",
        "whitespace_tokens",
        "bpe_tokens",
        "chars",
        "n_oov_words",
        (F.round("bpe_per_word", 6) + z0).alias("bpe_per_word"),
    )


# --------------------------------------------------------------------------
# C-ext (round 10, gate shape fixed round 11). Corpus encode under the
# trained vocabulary (functions/bpe.py::bpe_encode) — REAL token-id
# arrays, the apply-by-join shape: two corpus explodes each hash-joined
# against a vocabulary-sized build side, reading order restored inside
# the one aggregate.  The oracle composes the _BPE_REC trainer replay
# with the same joins.
#
# Gate shape: the driver canonicalizes results by sorting EVERY column
# through pandas, which cannot sort list cells (round-10's red row:
# ``TypeError: unhashable type: 'list'``).  The public API keeps real
# ``token_ids array<int>``; the REGISTERED projection replaces the
# array with an ORDER-SENSITIVE fold checksum
# ``ck = fold(acc, x -> (acc*31 + x + 2) mod 2147483647, zero=0)``
# computed identically on both engines (Spark ``F.aggregate`` /
# DuckDB ``list_reduce(list_prepend(0, ids), ...)`` — DuckDB's reduce
# seeds from the first element, so prepending the zero reproduces
# Spark's explicit-zero semantics; ``+ 2`` keeps every step
# non-negative for tid >= -1 so ``%`` == ``pmod``).  Any reorder,
# insertion, or substitution of a single token id changes the checksum,
# so the hash gate still verifies full reading-order token streams.
# --------------------------------------------------------------------------


@register(
    "bpe_encode",
    f"""
WITH RECURSIVE
{_BPE_REC},
fin AS (SELECT merges, segs FROM rec ORDER BY d DESC LIMIT 1),
segtab AS (
  SELECT unnest(s.words) AS word, unnest(f.segs) AS segs
  FROM st0 s, fin f
),
chars AS (SELECT DISTINCT unnest(string_split(w, '')) AS token FROM wt),
charid AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY token) - 1 AS INTEGER) AS token_id
  FROM chars
),
nch AS (SELECT count(*) AS nc FROM chars),
mtok AS (
  SELECT u.m.l || u.m.r AS token,
         CAST(min(n.nc + u.m.rnk - 1) AS INTEGER) AS token_id
  FROM (SELECT unnest(merges) AS m FROM fin) u, nch n
  GROUP BY u.m.l || u.m.r
),
vocab AS (
  SELECT token, token_id FROM charid
  UNION ALL
  SELECT token, token_id FROM mtok
),
ex1 AS (
  SELECT doc_id, u.w.wp AS wp, u.w.w AS w
  FROM tok, unnest(
    CASE WHEN len(toks) = 0
         THEN [{{'wp': CAST(NULL AS BIGINT), 'w': CAST(NULL AS VARCHAR)}}]
         ELSE list_transform(range(len(toks)),
                             i -> {{'wp': i, 'w': toks[i + 1]}}) END
  ) AS u(w)
),
j1 AS (
  SELECT e.doc_id, e.wp,
    CASE WHEN e.w IS NOT NULL
         THEN coalesce(s.segs, string_split(e.w, '')) END AS seg,
    (e.w IS NOT NULL AND s.segs IS NULL) AS oov
  FROM ex1 e LEFT JOIN segtab s ON e.w = s.word
),
ex2 AS (
  SELECT doc_id, wp, oov, u.s2.sp AS sp, u.s2.t AS t
  FROM j1, unnest(
    CASE WHEN seg IS NULL
         THEN [{{'sp': CAST(NULL AS BIGINT), 't': CAST(NULL AS VARCHAR)}}]
         ELSE list_transform(range(len(seg)),
                             i -> {{'sp': i, 't': seg[i + 1]}}) END
  ) AS u(s2)
),
j2 AS (
  SELECT e.doc_id, e.wp, e.sp, e.oov,
    CASE WHEN e.t IS NOT NULL THEN coalesce(v.token_id, -1) END AS tid
  FROM ex2 e LEFT JOIN vocab v ON e.t = v.token
)
SELECT doc_id,
  CAST(count(CASE WHEN sp = 0 AND tid IS NOT NULL THEN 1 END) AS INTEGER) AS n_words,
  CAST(count(tid) AS INTEGER) AS n_tokens,
  CAST(count(CASE WHEN sp = 0 AND oov THEN 1 END) AS INTEGER) AS n_oov_words,
  CAST(count(CASE WHEN tid = -1 THEN 1 END) AS INTEGER) AS n_unk,
  CAST(list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      coalesce(
        list(CAST(tid AS BIGINT) ORDER BY wp, sp) FILTER (WHERE tid IS NOT NULL),
        CAST([] AS BIGINT[]))),
    (acc, x) -> (acc * 31 + x + 2) % 2147483647) AS BIGINT) AS token_checksum
FROM j2 GROUP BY doc_id
""",
    "REAL BPE corpus encode under the trained vocabulary: per-document "
    "token-id streams in reading order (chars 0..C-1, merges by rank; "
    "OOV words char-fallback, unknown chars -1/UNK) — two corpus "
    "explodes x vocabulary-sized shuffle_hash joins, one aggregate; "
    "gated as an order-sensitive fold checksum over the id array "
    "(driver-sortable scalar; public API returns the real arrays)",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.bpe import bpe_encode, bpe_train

    docs = read_table(spark, sf_dir, "documents")
    merges, words = bpe_train(docs, n_merges=_BPE_MERGES)
    out = bpe_encode(docs, merges, words)
    ck = F.aggregate(
        "token_ids",
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(
            acc * F.lit(31) + x.cast("long") + F.lit(2),
            F.lit(2147483647).cast("long"),
        ),
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_tokens",
        "n_oov_words",
        "n_unk",
        ck.alias("token_checksum"),
    )


# --------------------------------------------------------------------------
# C-ext (round 8). Dedup-survivor token budget (functions/corpus.py::
# dedup_survivor_budget) — the dedup x budgeting composition: per-source
# tokens surviving MinHash-LSH near-dup removal (min-id keeper per
# connected component).  Integer aggregates; reuses the shared MinHash
# pair + connected-components CTE chains verbatim.
# --------------------------------------------------------------------------


@register(
    "dedup_survivor_budget",
    f"""
WITH RECURSIVE
{_DOCS_TOK_CTE},
{_MH_PAIR_TAIL},
{_CC_TAIL},
base AS (
  SELECT t.doc_id, t.source, CAST(len(t.toks) AS BIGINT) AS tok, l.cluster_id
  FROM tok t JOIN labeled l USING (doc_id)
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(CASE WHEN doc_id = cluster_id THEN 1 END) AS BIGINT) AS n_survivors,
  CAST(sum(tok) AS BIGINT) AS raw_tokens,
  CAST(sum(CASE WHEN doc_id = cluster_id THEN tok ELSE 0 END) AS BIGINT)
    AS surviving_tokens,
  round(sum(CASE WHEN doc_id = cluster_id THEN tok ELSE 0 END)
        / CAST(sum(tok) AS DOUBLE), 6) + 0 AS token_retention
FROM base GROUP BY source
""",
    "Per-source token budget after MinHash-LSH near-dup removal "
    "(min-id keeper per connected component): raw vs surviving tokens "
    "and retention — the dedup x budgeting composition a training "
    "pipeline actually plans capacity with",
)
def q_dedup_survivor_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import dedup_survivor_budget

    docs = read_table(spark, sf_dir, "documents")
    out = dedup_survivor_budget(
        docs,
        ngram=_MH_NGRAM,
        num_hashes=_MH_K,
        bands=_MH_BANDS,
        jaccard_threshold=_MH_THRESHOLD,
    )
    z0 = F.lit(0.0)
    return out.select(
        "source",
        "n_docs",
        "n_survivors",
        "raw_tokens",
        "surviving_tokens",
        (F.round("token_retention", 6) + z0).alias("token_retention"),
    )


# --------------------------------------------------------------------------
# C-ext (round 9). Per-(benchmark, source) contamination report
# (functions/corpus.py::contamination_report) — decontaminate composed
# with the corpus-governance rollup: leakage rates of every source
# against every benchmark suite, doc- and token-weighted.
# --------------------------------------------------------------------------

_CR_NGRAM = 3
_CR_MIN_HITS = 1


@register(
    "contamination_report",
    f"""
WITH {_DOCS_TOK_CTE},
{_sql_shingle_sh_cte(_CR_NGRAM)},
bench AS (
  SELECT 'bench_a' AS benchmark, sh FROM sh WHERE doc_id % 20 = 0
  UNION ALL
  SELECT 'bench_b' AS benchmark, sh FROM sh WHERE doc_id % 20 = 7
),
bset AS (SELECT DISTINCT benchmark, unnest(sh) AS g FROM bench),
grams AS (SELECT doc_id, unnest(sh) AS g FROM sh),
docmeta AS (SELECT doc_id, source, len(toks) AS n_tokens FROM tok),
hits AS (
  SELECT b.benchmark, g.doc_id, count(*) AS n_hits
  FROM grams g JOIN bset b USING (g)
  GROUP BY b.benchmark, g.doc_id
),
contaminated AS (
  SELECT h.benchmark, d.source,
    CAST(count(*) AS BIGINT) AS n_contaminated,
    CAST(sum(d.n_tokens) AS BIGINT) AS tokens_contaminated
  FROM hits h JOIN docmeta d USING (doc_id)
  WHERE h.n_hits >= {_CR_MIN_HITS}
  GROUP BY h.benchmark, d.source
),
totals AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS tokens_total
  FROM docmeta GROUP BY source
),
grid AS (
  SELECT b.benchmark, t.source, t.n_docs, t.tokens_total
  FROM (SELECT DISTINCT benchmark FROM bset) b, totals t
)
SELECT g.benchmark, g.source, g.n_docs,
  CAST(coalesce(c.n_contaminated, 0) AS BIGINT) AS n_contaminated,
  round(coalesce(c.n_contaminated, 0) / CAST(g.n_docs AS DOUBLE), 6)
    AS contamination_rate,
  g.tokens_total,
  CAST(coalesce(c.tokens_contaminated, 0) AS BIGINT) AS tokens_contaminated,
  CASE WHEN g.tokens_total > 0
       THEN round(coalesce(c.tokens_contaminated, 0)
                  / CAST(g.tokens_total AS DOUBLE), 6)
       ELSE 0.0 END AS token_leak_rate
FROM grid g LEFT JOIN contaminated c USING (benchmark, source)
""",
    f"Per-(benchmark, source) contamination report: {_CR_NGRAM}-gram "
    "shingle leakage of every corpus source against two benchmark "
    "suites (doc_id % 20 = 0 / 7), doc- and token-budget-weighted "
    "(the per-eval overlap table of GPT-3 appx C, rolled up by source)",
)
def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    bench = (
        docs.where(F.col("doc_id") % 20 == 0)
        .withColumn("benchmark", F.lit("bench_a"))
        .unionByName(
            docs.where(F.col("doc_id") % 20 == 7).withColumn(
                "benchmark", F.lit("bench_b")
            )
        )
    )
    return corpus_ops.contamination_report(
        docs, bench, ngram=_CR_NGRAM, min_hits=_CR_MIN_HITS
    )


# --------------------------------------------------------------------------
# C-ext (round 9). Benchmark n-gram coverage (functions/corpus.py::
# benchmark_coverage) — the flip side of contamination_report: is the
# eval suite's language in-distribution for the training corpus at all?
# The corpus side EXCLUDES the benchmark docs, so coverage is a real
# fraction rather than a trivial 1.0.
# --------------------------------------------------------------------------


@register(
    "benchmark_coverage",
    f"""
WITH {_DOCS_TOK_CTE},
{_sql_shingle_sh_cte(_CR_NGRAM)},
bench AS (
  SELECT 'bench_a' AS benchmark, doc_id, sh FROM sh WHERE doc_id % 20 = 0
  UNION ALL
  SELECT 'bench_b' AS benchmark, doc_id, sh FROM sh WHERE doc_id % 20 = 7
),
bset AS (SELECT DISTINCT benchmark, unnest(sh) AS g FROM bench),
totals AS (
  SELECT benchmark, CAST(count(*) AS BIGINT) AS n_bench_docs
  FROM bench GROUP BY benchmark
),
gt AS (
  SELECT benchmark, CAST(count(*) AS BIGINT) AS n_bench_grams
  FROM bset GROUP BY benchmark
),
cg AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh
  WHERE doc_id % 20 NOT IN (0, 7)
),
cov AS (
  SELECT b.benchmark, CAST(count(*) AS BIGINT) AS n_covered
  FROM bset b JOIN cg ON b.g = cg.g GROUP BY b.benchmark
)
SELECT t.benchmark, t.n_bench_docs, g.n_bench_grams,
  CAST(coalesce(c.n_covered, 0) AS BIGINT) AS n_covered,
  CASE WHEN g.n_bench_grams > 0
       THEN round(coalesce(c.n_covered, 0)
                  / CAST(g.n_bench_grams AS DOUBLE), 6)
       ELSE 0.0 END AS coverage
FROM totals t JOIN gt g USING (benchmark) LEFT JOIN cov c USING (benchmark)
""",
    f"Benchmark {_CR_NGRAM}-gram coverage: the fraction of each eval "
    "suite's distinct shingles present anywhere in the (benchmark-"
    "excluded) corpus — eval representativeness, the flip side of the "
    "contamination report",
)
def q_benchmark_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    mod = F.col("doc_id") % 20
    bench = (
        docs.where(mod == 0)
        .withColumn("benchmark", F.lit("bench_a"))
        .unionByName(
            docs.where(mod == 7).withColumn("benchmark", F.lit("bench_b"))
        )
    )
    corpus = docs.where((mod != 0) & (mod != 7))
    return corpus_ops.benchmark_coverage(corpus, bench, ngram=_CR_NGRAM)


# --------------------------------------------------------------------------
# C-ext (round 10). Sequence packing under REAL tokenizer counts
# (functions/corpus.py::bpe_pack_sequences) — pack_sequences budgeted by
# the trained-BPE token count instead of the whitespace proxy; the
# oracle composes the _BPE_REC trainer replay with the shared greedy
# packing chain (recursions `rec` and `prec` coexist in one
# WITH RECURSIVE).
# --------------------------------------------------------------------------


@register(
    "bpe_pack_sequences",
    f"""
WITH RECURSIVE
{_BPE_REC},
fin AS (SELECT segs FROM rec ORDER BY d DESC LIMIT 1),
vocab AS (
  SELECT unnest(s.words) AS word,
         unnest(list_transform(f.segs, g -> CAST(len(g) AS BIGINT))) AS n_bpe
  FROM st0 s, fin f
),
ex AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS word
  FROM tok
),
j AS (
  SELECT e.doc_id,
         CASE WHEN e.word IS NULL THEN 0
              ELSE coalesce(v.n_bpe, length(e.word)) END AS nb
  FROM ex e LEFT JOIN vocab v USING (word)
),
pdocs AS (
  SELECT doc_id, CAST(sum(nb) AS INTEGER) AS n_tok,
    CAST(('0x' || substr(md5('pts-pack' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM j GROUP BY doc_id
),
{_pack_chain_sql(_PACK_BUDGET, _PACK_SHARDS)}
{_PACK_FINAL_SQL}
""",
    f"Greedy {_PACK_BUDGET}-token sequence packing budgeted by REAL "
    "trained-BPE token counts (OOV words priced at char count) — the "
    "packed sequences match what the training loop actually sees; "
    "trainer replay + packing replay composed in one recursive oracle",
)
def q_bpe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.bpe import bpe_train
    from polars_trading_spark.functions.corpus import bpe_pack_sequences

    docs = read_table(spark, sf_dir, "documents")
    _, words = bpe_train(docs, n_merges=_BPE_MERGES)
    return bpe_pack_sequences(
        docs, words, budget_tokens=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )


# --------------------------------------------------------------------------
# C-ext (round 10). Hashed-ngram quality classifier
# (functions/quality_model.py::quality_classifier) — IRLS logistic
# regression on hashed token-bucket frequencies against the heuristic
# gate's own label.  The oracle replays training EXACTLY: hierarchical
# deterministic moment folds (list_reduce over doc-id-ordered lists per
# fold bucket, then over the bounded bucket partials — the same fold
# order as the operator's two-stage ordered windows) and the identical
# no-pivot Gauss-Jordan elimination as a list_reduce over pivot
# indices carrying the augmented matrix as DOUBLE[][] state.
# --------------------------------------------------------------------------

_QC_D = 6

_QC_N = _QC_D + 1

_QC_ITERS = 3

_QC_RIDGE = "1e-3"

_QC_FOLD_BUCKETS = 64

_QC_MINQ = 0.5


def _qc_oracle_sql() -> str:
    d, n = _QC_D, _QC_N
    xs = ["1e0"] + [f"f{k}" for k in range(d)]
    # 35 moment terms: A upper triangle row-major, then b
    names, exprs = [], []
    w_e = "(p * (1e0 - p))"
    r_e = "(y - p)"
    for i in range(n):
        for j in range(i, n):
            names.append(f"t_a_{i}_{j}")
            exprs.append(f"{w_e} * {xs[i]} * {xs[j]}")
    for i in range(n):
        names.append(f"t_b_{i}")
        exprs.append(f"{r_e} * {xs[i]}")
    term_cols = ",\n            ".join(
        f"{e} AS {nm}" for nm, e in zip(names, exprs)
    )
    s1_cols = ",\n          ".join(
        f"list_reduce(list({nm} ORDER BY doc_id), (acc, x) -> acc + x) AS {nm}"
        for nm in names
    )
    s2_cols = ",\n        ".join(
        f"list_reduce(list({nm} ORDER BY fb), (acc, x) -> acc + x) AS {nm}"
        for nm in names
    )
    # augmented matrix literal: symmetric A (+ ridge on the diagonal) | b
    rows = []
    for i in range(n):
        cells = [
            f"t_a_{min(i, j)}_{max(i, j)}" + (f" + {_QC_RIDGE}" if i == j else "")
            for j in range(n)
        ] + [f"t_b_{i}"]
        rows.append("[" + ", ".join(cells) + "]")
    m_lit = "[\n            " + ",\n            ".join(rows) + "]"
    # one Gauss-Jordan pivot step; px = pivot index (1-based)
    px = "(CAST(x[1][1] AS INTEGER) + 1)"
    gauss = (
        f"list_transform(range({n}), rr -> "
        f"CASE WHEN rr + 1 = {px} "
        f"THEN list_transform(acc[{px}], v -> v / acc[{px}][{px}]) "
        f"ELSE list_transform(range({n + 1}), cc -> "
        f"acc[rr + 1][cc + 1] - acc[rr + 1][{px}] * "
        f"(acc[{px}][cc + 1] / acc[{px}][{px}])) END)"
    )
    dot0 = "r0.beta[1]" + "".join(
        f" + r0.beta[{k + 2}] * f0.f{k}" for k in range(d)
    )
    f_pass = ", ".join(f"f0.f{k}" for k in range(d))
    dot_final = "b.beta[1]" + "".join(
        f" + b.beta[{k + 2}] * f.f{k}" for k in range(d)
    )
    fcols = ",\n    ".join(
        f"coalesce(c.c{k} / (CASE WHEN c.nt > 0e0 THEN c.nt ELSE 1e0 END), 0e0) AS f{k}"
        for k in range(d)
    )
    ccols = ",\n    ".join(
        f"CAST(count(CASE WHEN b = {k} THEN 1 END) AS DOUBLE) AS c{k}"
        for k in range(d)
    )
    zeros = ", ".join(["CAST(0 AS DOUBLE)"] * n)
    return f"""
WITH RECURSIVE
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES},
qlab AS (
  SELECT doc_id,
    CASE WHEN {_QUALITY_SQL} >= {_QC_MINQ} THEN CAST(1 AS DOUBLE)
         ELSE CAST(0 AS DOUBLE) END AS y
  FROM feat
),
qex AS (
  SELECT doc_id,
    {_sql_hash60("concat('qc|', t.tk)")} % {_QC_D} AS b
  FROM tok, unnest(toks) AS t(tk)
),
qcnt AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS nt,
    {ccols}
  FROM qex GROUP BY doc_id
),
feats AS (
  SELECT l.doc_id, l.y, l.doc_id % {_QC_FOLD_BUCKETS} AS fb,
    {fcols}
  FROM qlab l LEFT JOIN qcnt c USING (doc_id)
),
qrec AS (
  SELECT 0 AS it, [{zeros}] AS beta
  UNION ALL
  SELECT it, list_transform(range({n}), k -> beta[k + 1] + g[k + 1][{n + 1}]) AS beta
  FROM (
    SELECT it, beta,
      list_reduce(
        [{m_lit}] || list_transform(range({n}), i -> [[CAST(i AS DOUBLE)]]),
        (acc, x) -> {gauss}) AS g
    FROM (
      SELECT it, beta,
        {s2_cols}
      FROM (
        SELECT it, beta, fb,
          {s1_cols}
        FROM (
          SELECT it, beta, doc_id, fb,
            {term_cols}
          FROM (
            SELECT r0.it + 1 AS it, r0.beta AS beta, f0.doc_id, f0.fb, f0.y,
              {f_pass},
              1e0 / (1e0 + exp(-({dot0}))) AS p
            FROM qrec r0, feats f0
            WHERE r0.it < {_QC_ITERS}
          )
        ) GROUP BY it, beta, fb
      ) GROUP BY it, beta
    )
  )
)
SELECT f.doc_id,
  CAST(f.y AS INTEGER) AS label,
  round(1e0 / (1e0 + exp(-({dot_final}))), 6) + 0 AS score,
  (1e0 / (1e0 + exp(-({dot_final})))) >= 0.5 AS pred
FROM feats f, (SELECT beta FROM qrec WHERE it = {_QC_ITERS}) b
"""


@register(
    "quality_classifier",
    _qc_oracle_sql(),
    f"Hashed-ngram IRLS quality classifier: logistic regression on "
    f"{_QC_D} hashed token-bucket frequencies against the heuristic "
    f"gate's label ({_QC_ITERS} Newton steps, ridge {_QC_RIDGE}); "
    "moment sums fold as hierarchical deterministic sums "
    f"({_QC_FOLD_BUCKETS} doc-id buckets then a bounded fold), the "
    "7x7 solve is no-pivot Gauss-Jordan replayed term-for-term by a "
    "list_reduce fold — the learned per-doc scores are the output",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.quality_model import quality_classifier

    docs = read_table(spark, sf_dir, "documents")
    out = quality_classifier(
        docs,
        n_buckets=_QC_D,
        n_iters=_QC_ITERS,
        ridge=1e-3,
        min_quality=_QC_MINQ,
        n_fold_buckets=_QC_FOLD_BUCKETS,
    )
    return out.select(
        "doc_id",
        "label",
        (F.round("score", 6) + F.lit(0.0)).alias("score"),
        "pred",
    )


@register(
    "tokenizer_fertility",
    f"""
WITH RECURSIVE
{_BPE_REC},
tfin AS (SELECT segs FROM rec ORDER BY d DESC LIMIT 1),
tvocab AS (
  SELECT unnest(s.words) AS word,
         unnest(list_transform(f.segs, g -> CAST(len(g) AS INTEGER))) AS n_bpe
  FROM st0 s, tfin f
),
tex AS (
  SELECT lang, doc_id, CAST(length(text) AS BIGINT) AS chars_,
         unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) AS word
  FROM tok
),
tj AS (SELECT e.*, v.n_bpe FROM tex e LEFT JOIN tvocab v USING (word)),
tpd AS (
  SELECT lang, doc_id, max(chars_) AS chars_,
    CAST(count(word) AS BIGINT) AS ws,
    CAST(sum(CASE WHEN word IS NULL THEN 0
                  ELSE coalesce(n_bpe, length(word)) END) AS BIGINT) AS bpe,
    CAST(sum(CASE WHEN word IS NOT NULL AND n_bpe IS NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS oov
  FROM tj GROUP BY lang, doc_id
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(ws) AS BIGINT) AS whitespace_tokens,
  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
  CAST(sum(chars_) AS BIGINT) AS chars,
  CAST(sum(oov) AS BIGINT) AS n_oov_words,
  round(CASE WHEN sum(ws) > 0
             THEN CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE) END,
        6) + 0 AS bpe_per_word,
  round(CASE WHEN sum(bpe) > 0
             THEN CAST(sum(chars_) AS DOUBLE) / CAST(sum(bpe) AS DOUBLE) END,
        6) + 0 AS chars_per_bpe_token,
  round(CASE WHEN sum(ws) > 0
             THEN CAST(sum(oov) AS DOUBLE) / CAST(sum(ws) AS DOUBLE) END,
        6) + 0 AS oov_rate
FROM tpd GROUP BY lang
""",
    "Per-language fertility audit of the trained BPE vocabulary "
    "(tokens per word, chars per token, OOV fallback rate) — the "
    "tokenizer-equity report; same vocabulary join shape as "
    "bpe_token_budget, integer sums with single final divisions",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.bpe import bpe_train, tokenizer_fertility

    docs = read_table(spark, sf_dir, "documents")
    _, words = bpe_train(docs, n_merges=_BPE_MERGES)
    out = tokenizer_fertility(docs, words)
    z0 = F.lit(0.0)
    return out.select(
        "lang",
        "n_docs",
        "whitespace_tokens",
        "bpe_tokens",
        "chars",
        "n_oov_words",
        (F.round("bpe_per_word", 6) + z0).alias("bpe_per_word"),
        (F.round("chars_per_bpe_token", 6) + z0).alias("chars_per_bpe_token"),
        (F.round("oov_rate", 6) + z0).alias("oov_rate"),
    )


@register(
    "packing_efficiency",
    f"""
WITH RECURSIVE
pdocs AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x != '')) AS INTEGER) AS n_tok,
    CAST(('0x' || substr(md5('pts-pack' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM documents
),
{_pack_chain_sql(_PACK_BUDGET, _PACK_SHARDS)},
pk AS ({_PACK_FINAL_SQL}),
pseq AS (
  SELECT shard, seq_id,
    CAST(sum(n_tokens) AS BIGINT) AS fill,
    CAST(count(*) AS BIGINT) AS docs
  FROM pk GROUP BY shard, seq_id
)
SELECT CAST({_PACK_BUDGET} AS BIGINT) AS budget_tokens,
  CAST(count(*) AS BIGINT) AS n_sequences,
  CAST(sum(docs) AS BIGINT) AS n_docs,
  CAST(sum(fill) AS BIGINT) AS total_tokens,
  CAST(sum(greatest(0, {_PACK_BUDGET} - fill)) AS BIGINT) AS padding_tokens,
  CAST(sum(CASE WHEN fill > {_PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT) AS n_oversized,
  CAST(min(fill) AS BIGINT) AS min_fill,
  CAST(max(fill) AS BIGINT) AS max_fill,
  round(CASE WHEN count(*) > 0 THEN 1 - CAST(sum(greatest(0, {_PACK_BUDGET} - fill)) AS DOUBLE)
        / CAST(count(*) * {_PACK_BUDGET} AS DOUBLE) END, 6) + 0 AS fill_rate,
  round(CASE WHEN count(*) > 0 THEN CAST(sum(docs) AS DOUBLE)
        / CAST(count(*) AS DOUBLE) END, 6) + 0 AS avg_docs_per_seq
FROM pseq
""",
    f"Padding-waste audit of the {_PACK_BUDGET}-token greedy packing: "
    "per-sequence fill aggregated into one row of padding, fill-rate, "
    "oversized-sequence and docs-per-sequence statistics — integer "
    "sums with single final divisions",
)
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import (
        pack_sequences,
        packing_efficiency,
    )

    docs = read_table(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs, budget_tokens=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )
    out = packing_efficiency(packed, budget_tokens=_PACK_BUDGET)
    z0 = F.lit(0.0)
    return out.select(
        "budget_tokens",
        "n_sequences",
        "n_docs",
        "total_tokens",
        "padding_tokens",
        "n_oversized",
        "min_fill",
        "max_fill",
        (F.round("fill_rate", 6) + z0).alias("fill_rate"),
        (F.round("avg_docs_per_seq", 6) + z0).alias("avg_docs_per_seq"),
    )


_PBC_NC = 10

_PBC_K = 0.5


@register(
    "perplexity_budget_curves",
    f"""
WITH
{_DOCS_TOK_CTE},
pbex AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
pbmodel AS (SELECT tok, count(*) AS c FROM pbex GROUP BY tok),
pbtotals AS (
  SELECT CAST(sum(c) AS DOUBLE) AS N, CAST(count(*) AS DOUBLE) AS V
  FROM pbmodel
),
pbscored AS (
  SELECT e.doc_id, ln((m.c + {_PBC_K}) / (t.N + {_PBC_K} * t.V)) AS lp
  FROM pbex e JOIN pbmodel m USING (tok) CROSS JOIN pbtotals t
),
pbdoc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS tok,
         round(avg(lp), 6) AS s
  FROM pbscored GROUP BY doc_id
),
pbbase AS (
  SELECT d.source, p.doc_id AS id, p.tok, p.s
  FROM pbdoc p JOIN docs d USING (doc_id)
  WHERE p.tok > 0
),
pbstaged AS (
  SELECT source,
    row_number() OVER w AS rn,
    s,
    CAST(sum(tok) OVER (PARTITION BY source ORDER BY s DESC, id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum,
    count(*) OVER (PARTITION BY source) AS nsrc,
    CAST(sum(tok) OVER (PARTITION BY source) AS BIGINT) AS tot
  FROM pbbase WINDOW w AS (PARTITION BY source ORDER BY s DESC, id)
),
pbbounded AS (
  SELECT *,
    ((rn - 1) * {_PBC_NC}) // nsrc + 1 AS d_min,
    (rn * {_PBC_NC}) // nsrc AS d_max
  FROM pbstaged
)
SELECT source,
  CAST(unnest(range(d_min, d_max + 1)) AS INTEGER) AS cutoff_idx,
  CAST(rn AS BIGINT) AS n_docs_kept,
  s + 0 AS logprob_cutoff,
  round(exp(-s), 6) + 0 AS ppl_cutoff,
  cum AS cum_tokens,
  tot AS total_tokens,
  round(cum / CAST(tot AS DOUBLE), 6) + 0 AS token_share
FROM pbbounded WHERE d_max >= d_min
""",
    f"Per-source token-budget curves under LM-perplexity filtering "
    f"(CCNet-style): tokens surviving at {_PBC_NC} mean-unigram-logprob "
    "cutoff fractions per source — round-before-rank, one window pass, "
    "integer prefix-sums, output sources x cutoffs",
)
def q_perplexity_budget_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import perplexity_budget_curves

    docs = read_table(spark, sf_dir, "documents")
    out = perplexity_budget_curves(docs, n_cutoffs=_PBC_NC, smoothing_k=_PBC_K)
    z0 = F.lit(0.0)
    return out.select(
        "source",
        "cutoff_idx",
        "n_docs_kept",
        (F.round("logprob_cutoff", 6) + z0).alias("logprob_cutoff"),
        (F.round("ppl_cutoff", 6) + z0).alias("ppl_cutoff"),
        "cum_tokens",
        "total_tokens",
        (F.round("token_share", 6) + z0).alias("token_share"),
    )


# --------------------------------------------------------------------------
# C-ext (round 11). Per-domain document cap (functions/corpus.py::
# domain_cap) — the C4/RefinedWeb crawl-governance rule: at most N docs
# per source, selected by the reproducible salted hash (not arrival
# order), so the cap is a uniform per-domain sample stable across
# engines and partitionings.
# --------------------------------------------------------------------------

_CAP_N = 10


@register(
    "domain_cap",
    f"""
WITH h AS (
  SELECT doc_id, source,
    CAST(('0x' || substr(md5('pts-cap' || CAST(doc_id AS VARCHAR)), 1, 15))
         AS BIGINT) AS hh
  FROM documents
),
r AS (
  SELECT doc_id, source,
    CAST(row_number() OVER (PARTITION BY source ORDER BY hh, doc_id)
         AS BIGINT) AS cap_rank
  FROM h
)
SELECT doc_id, source, cap_rank,
  CAST(CASE WHEN cap_rank <= {_CAP_N} THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM r
""",
    "Per-domain document cap (at most N docs per source, C4/RefinedWeb "
    "style): rank inside each source by the engine-portable salted "
    "md5 hash — a reproducible uniform per-domain sample, stable under "
    "repartitioning — one hash-partitioned row_number window",
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import domain_cap

    docs = read_table(spark, sf_dir, "documents")
    return domain_cap(docs, max_per_key=_CAP_N)
