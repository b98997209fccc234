"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark.sources.tables import read_table
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from polars_trading_spark.oracles._shared import (  # noqa: F401
    register,
)
from polars_trading_spark.oracles.text import (  # noqa: F401
    _DOCS_TOK_CTE,
)
from polars_trading_spark.oracles.similarity import (  # noqa: F401
    _EMB_CTE,
    _NORM_V,
    _N_CELLS,
)



# --------------------------------------------------------------------------
# tfidf_topk / vocab_topk — TF-IDF keyword extraction and ranked
# vocabulary building (tokenizer-training / coverage-audit inputs).
# Both reduce to explode → hash aggregates → one token join; the global
# vocabulary top-k is a distributed TakeOrderedAndProject, not a
# single-partition sort.
# --------------------------------------------------------------------------

TFIDF_K = 5

VOCAB_K = 100


_TF_CTES = """
toksx AS (
  SELECT doc_id, unnest(toks) AS token FROM tok
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toksx GROUP BY doc_id, token
),
dfq AS (
  SELECT token, count(*) AS doc_freq, sum(tf) AS total_count FROM tf GROUP BY token
)
"""



@register(
    "tfidf_topk",
    f"""
WITH
{_DOCS_TOK_CTE},
{_TF_CTES},
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfq.doc_freq,
         tf.tf * (ln((n.n_docs + 1.0) / (dfq.doc_freq + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN dfq ON tf.token = dfq.token CROSS JOIN n
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(doc_freq AS BIGINT) AS doc_freq,
       round(tfidf, 6) AS tfidf, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
  FROM scored
)
WHERE rn <= {TFIDF_K}
""",
    "Top-5 smoothed-TF-IDF terms per document — keyword extraction via "
    "explode, two hash aggregates and a token join; no Python",
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions import tfidf as tfidf_ops

    docs = read_table(spark, sf_dir, "documents")
    out = tfidf_ops.tfidf_topk(docs, k=TFIDF_K)
    return out.withColumn("tfidf", F.round("tfidf", 6))



@register(
    "vocab_topk",
    f"""
WITH
{_DOCS_TOK_CTE},
{_TF_CTES}
SELECT token, CAST(doc_freq AS BIGINT) AS doc_freq,
       CAST(total_count AS BIGINT) AS total_count, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY doc_freq DESC, total_count DESC, token) AS rn
  FROM dfq
)
WHERE rn <= {VOCAB_K}
""",
    "Top-100 vocabulary by document frequency — distributed top-k "
    "(per-partition heaps), rank attached after the k-row reduce",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions import tfidf as tfidf_ops

    docs = read_table(spark, sf_dir, "documents")
    return tfidf_ops.vocabulary(docs, top_k=VOCAB_K)



# --------------------------------------------------------------------------
# C-ext. Unigram-LM scoring (functions/text.py::unigram_logprob)
# --------------------------------------------------------------------------

_LM_K = 0.5



@register(
    "unigram_logprob",
    f"""
WITH
{_DOCS_TOK_CTE},
ex AS (SELECT doc_id, unnest(toks) AS tok FROM tok),
model AS (SELECT tok, count(*) AS c FROM ex GROUP BY tok),
totals AS (SELECT CAST(sum(c) AS DOUBLE) AS N, CAST(count(*) AS DOUBLE) AS V FROM model),
scored AS (
  SELECT e.doc_id, ln((m.c + {_LM_K}) / (t.N + {_LM_K} * t.V)) AS lp
  FROM ex e JOIN model m USING (tok) CROSS JOIN totals t
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens, avg(lp) AS mean_logprob
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(p.n_tokens, 0) AS n_tokens,
  round(p.mean_logprob, 6) AS mean_logprob,
  round(exp(-p.mean_logprob), 6) AS ppl
FROM docs d LEFT JOIN per_doc p USING (doc_id)
""",
    "Per-document mean log-probability and perplexity under the corpus's "
    "add-k unigram model (CCNet-style LM quality signal)",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import unigram_logprob

    docs = read_table(spark, sf_dir, "documents")
    out = unigram_logprob(docs, smoothing_k=_LM_K)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("mean_logprob", 6).alias("mean_logprob"),
        F.round("ppl", 6).alias("ppl"),
    )



# --------------------------------------------------------------------------
# C-ext. TF-IDF cosine pairs (functions/tfidf.py::tfidf_cosine_pairs)
# --------------------------------------------------------------------------

_TC_THRESH, _TC_MAXDF = 0.5, 0.5



@register(
    "tfidf_cosine_pairs",
    f"""
WITH
{_DOCS_TOK_CTE},
tf AS (
  SELECT doc_id, t.tok AS token, count(*) AS tf
  FROM tok, unnest(toks) AS t(tok)
  GROUP BY doc_id, t.tok
),
dfreq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY token),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM docs),
w AS (
  SELECT tf.doc_id, tf.token,
    tf.tf * (ln((nn.N + 1) / (dfreq.doc_freq + 1)) + 1.0) AS w
  FROM tf JOIN dfreq USING (token) CROSS JOIN nn
  WHERE dfreq.doc_freq <= nn.N * {_TC_MAXDF!r}
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, cosine_sim FROM (
  SELECT d.doc_a, d.doc_b,
    round(d.dot / (na.nrm * nb.nrm), 6) AS cosine_sim
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_a
  JOIN norms nb ON nb.doc_id = d.doc_b
) WHERE cosine_sim >= {_TC_THRESH!r}
""",
    f"TF-IDF cosine document pairs >= {_TC_THRESH} over shared-term sparse "
    f"postings (max-df {_TC_MAXDF} cut; smoothed IDF)",
)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import tfidf_cosine_pairs

    docs = read_table(spark, sf_dir, "documents")
    out = tfidf_cosine_pairs(docs, threshold=_TC_THRESH, max_doc_freq_frac=_TC_MAXDF)
    return out.select("doc_a", "doc_b", F.round("cosine_sim", 6).alias("cosine_sim"))



# --------------------------------------------------------------------------
# C-ext. BPE pair statistics (functions/text.py::bpe_pair_counts) — the
# tokenizer-training merge-round count.
# --------------------------------------------------------------------------

_BPE_K = 50



@register(
    "bpe_pairs",
    f"""
WITH
{_DOCS_TOK_CTE},
words AS (SELECT unnest(toks) AS w FROM tok),
pairs AS (
  SELECT unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair
  FROM words WHERE len(w) >= 2
),
counts AS (SELECT pair, CAST(count(*) AS BIGINT) AS count FROM pairs GROUP BY pair)
SELECT pair, count,
       CAST(row_number() OVER (ORDER BY count DESC, pair) AS INTEGER) AS rank
FROM counts ORDER BY count DESC, pair LIMIT {_BPE_K}
""",
    f"Top-{_BPE_K} adjacent in-word character pairs (the BPE tokenizer "
    "merge-round statistic) with deterministic tie order",
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import bpe_pair_counts

    docs = read_table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, top_k=_BPE_K)



# --------------------------------------------------------------------------
# C-ext. Interpolated bigram LM scoring (functions/text.py::bigram_logprob)
# --------------------------------------------------------------------------

_BG_K, _BG_LAM = 0.5, 0.7



@register(
    "bigram_logprob",
    f"""
WITH
{_DOCS_TOK_CTE},
ex AS (
  SELECT doc_id, u.prev AS prev, u.cur AS cur
  FROM (
    SELECT doc_id,
      unnest([{{'prev': CASE WHEN i = 1 THEN NULL ELSE toks[i-1] END,
               'cur': toks[i]}} for i in range(1, len(toks)+1)]) AS u
    FROM tok WHERE len(toks) > 0
  )
),
uni AS (SELECT cur, CAST(count(*) AS BIGINT) AS c_uni FROM ex GROUP BY cur),
bi AS (
  SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_bi
  FROM ex WHERE prev IS NOT NULL GROUP BY prev, cur
),
tot AS (SELECT CAST(sum(c_uni) AS DOUBLE) AS N, CAST(count(*) AS DOUBLE) AS V FROM uni),
sc AS (
  SELECT e.doc_id,
    CASE WHEN e.prev IS NOT NULL THEN
      ln({_BG_LAM!r} * ((coalesce(b.c_bi, 0) + {_BG_K!r}) / (cx.c_uni + {_BG_K!r} * t.V))
         + {1.0 - _BG_LAM!r} * ((u.c_uni + {_BG_K!r}) / (t.N + {_BG_K!r} * t.V)))
    ELSE
      ln((u.c_uni + {_BG_K!r}) / (t.N + {_BG_K!r} * t.V))
    END AS lp
  FROM ex e
  JOIN uni u ON u.cur = e.cur
  LEFT JOIN bi b ON b.prev = e.prev AND b.cur = e.cur
  LEFT JOIN uni cx ON cx.cur = e.prev
  CROSS JOIN tot t
),
pd AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens, avg(lp) AS mlp
  FROM sc GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(pd.n_tokens, 0) AS n_tokens,
  round(pd.mlp, 6) AS mean_logprob,
  round(exp(-pd.mlp), 6) AS ppl
FROM docs d LEFT JOIN pd ON pd.doc_id = d.doc_id
""",
    "Interpolated add-k bigram LM perplexity per document (corpus-"
    "trained; lambda=0.7) — the word-order-aware CCNet-style quality "
    "signal",
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import bigram_logprob

    docs = read_table(spark, sf_dir, "documents")
    out = bigram_logprob(docs, smoothing_k=_BG_K, interpolation=_BG_LAM)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("mean_logprob", 6).alias("mean_logprob"),
        F.round("ppl", 6).alias("ppl"),
    )



# --------------------------------------------------------------------------
# C-ext. Cluster topic keywords (functions/topics.py::cluster_keywords) —
# embeddings x documents cross-table composition.
# --------------------------------------------------------------------------

_CK_K = 5



@register(
    "cluster_keywords",
    f"""
WITH
{_EMB_CTE},
{_DOCS_TOK_CTE},
cent AS (
  SELECT v AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_CELLS})
),
cell_sims AS (
  SELECT c.vec_id, cent.j,
         list_sum([cv[i+1] * v[i+1] for i in range(0, len(v))])
           / (sqrt(list_sum([x * x for x in cv])) * {_NORM_V}) AS csim
  FROM c CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
tk AS (SELECT doc_id, unnest(toks) AS token FROM tok),
joined AS (
  SELECT a.cell, t.token FROM tk t JOIN assigned a ON a.vec_id = t.doc_id
),
cc AS (SELECT cell, token, CAST(count(*) AS BIGINT) AS cell_count
       FROM joined GROUP BY cell, token),
dfq AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
        FROM tk GROUP BY token),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM docs),
scored AS (
  SELECT cc.cell, cc.token, cc.cell_count, dfq.doc_freq,
    cc.cell_count * (ln((nn.N + 1) / (dfq.doc_freq + 1)) + 1) AS score
  FROM cc JOIN dfq USING (token) CROSS JOIN nn
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY cell
            ORDER BY score DESC, token) AS INTEGER) AS rank
  FROM scored
)
SELECT cell, rank, token, cell_count, doc_freq, round(score, 6) AS score
FROM ranked WHERE rank <= {_CK_K}
""",
    f"Top-{_CK_K} TF-IDF keywords per embedding cluster (lowest-id "
    "coarse quantizer; cross-table embeddings x documents composition)",
)
def q_cluster_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.topics import cluster_keywords

    emb = read_table(spark, sf_dir, "embeddings")
    docs = read_table(spark, sf_dir, "documents")
    out = cluster_keywords(emb, docs, n_cells=_N_CELLS, k=_CK_K)
    return out.withColumn("score", F.round("score", 6))



# --------------------------------------------------------------------------
# C-ext. PMI co-occurrence (functions/text.py::pmi_cooccurrence) —
# collocation mining; windowed pair counts replayed by lateral unnest.
# --------------------------------------------------------------------------

_PMI_W, _PMI_MIN, _PMI_K = 3, 5, 50



@register(
    "pmi_cooccurrence",
    f"""
WITH
{_DOCS_TOK_CTE},
p AS (
  SELECT least(toks[i], toks[i+d]) AS tok_a, greatest(toks[i], toks[i+d]) AS tok_b
  FROM tok,
       unnest(generate_series(1, len(toks))) AS gi(i),
       unnest(generate_series(1, {_PMI_W})) AS gd(d)
  WHERE len(toks) >= 2 AND i + d <= len(toks)
),
pairs AS (
  SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS c_ab FROM p GROUP BY tok_a, tok_b
),
m AS (
  SELECT tok, CAST(sum(c_ab) AS BIGINT) AS c_tok FROM (
    SELECT tok_a AS tok, c_ab FROM pairs
    UNION ALL
    SELECT tok_b AS tok, c_ab FROM pairs
  ) GROUP BY tok
),
tot AS (SELECT CAST(sum(c_ab) AS DOUBLE) AS N FROM pairs),
scored AS (
  SELECT pairs.tok_a, pairs.tok_b, pairs.c_ab, ma.c_tok AS c_a, mb.c_tok AS c_b,
    ln(CAST(pairs.c_ab AS DOUBLE) * tot.N
       / (CAST(ma.c_tok AS DOUBLE) * CAST(mb.c_tok AS DOUBLE))) AS pmi
  FROM pairs
  JOIN m ma ON ma.tok = pairs.tok_a
  JOIN m mb ON mb.tok = pairs.tok_b
  CROSS JOIN tot
  WHERE pairs.c_ab >= {_PMI_MIN}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, tok_a, tok_b) AS INTEGER) AS rank
  FROM scored
)
SELECT tok_a, tok_b, c_ab, c_a, c_b, round(pmi, 6) + 0 AS pmi, rank
FROM ranked WHERE rank <= {_PMI_K}
""",
    f"Windowed (±{_PMI_W}) token-pair PMI top-{_PMI_K} (collocation / "
    "phrase mining; bounded explode fan-out, two hash aggregates, "
    "distributed top-k)",
)
def q_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import pmi_cooccurrence

    docs = read_table(spark, sf_dir, "documents")
    out = pmi_cooccurrence(
        docs, window=_PMI_W, min_pair_count=_PMI_MIN, top_k=_PMI_K
    )
    z0 = F.lit(0.0)
    return out.select(
        "tok_a", "tok_b", "c_ab", "c_a", "c_b",
        (F.round("pmi", 6) + z0).alias("pmi"),
        "rank",
    )



# --------------------------------------------------------------------------
# C-ext. Winnowing document fingerprints (functions/winnow.py) — MOSS
# fingerprint selection + df-pruned overlap pair screen, replayed by the
# identical packed-key window algebra in SQL.
# --------------------------------------------------------------------------

_WN_K, _WN_W, _WN_MIN_SHARED, _WN_MAX_DF = 4, 4, 2, 50

_WN_POS_CAP = 1 << 22


_WINNOW_SEL_CTE = f"""
{_DOCS_TOK_CTE},
wg AS (SELECT doc_id, toks, len(toks) AS nt FROM tok WHERE len(toks) >= {_WN_K}),
wgr AS (
  SELECT doc_id, i - 1 AS pos, nt - {_WN_K} + 1 AS ng,
         array_to_string(list_slice(toks, i, i + {_WN_K} - 1), ' ') AS gram
  FROM wg, unnest(generate_series(1, nt - {_WN_K} + 1)) AS gs(i)
),
wkk AS (
  SELECT doc_id, pos, ng,
    CAST(('0x' || substr(md5(gram), 1, 10)) AS BIGINT) * {_WN_POS_CAP}
      + ({_WN_POS_CAP - 1} - pos) AS key
  FROM wgr
),
wm AS (
  SELECT doc_id, pos, ng,
    min(key) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {_WN_W - 1} FOLLOWING) AS wmin
  FROM wkk
),
wsel AS (
  SELECT DISTINCT doc_id, wmin // {_WN_POS_CAP} AS fp,
         CAST({_WN_POS_CAP - 1} - (wmin % {_WN_POS_CAP}) AS INTEGER) AS pos
  FROM wm WHERE pos <= ng - {_WN_W}
)"""



@register(
    "winnow_fingerprints",
    f"""
WITH
{_WINNOW_SEL_CTE}
SELECT doc_id, fp, pos FROM wsel
""",
    f"Winnowing (MOSS) document fingerprints — k={_WN_K} grams, "
    f"window w={_WN_W}, rightmost-min tie via one packed-integer window "
    "min; guaranteed hit for any shared run of w+k-1 tokens; one doc "
    "exchange, bounded frame, zero Python",
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.winnow import winnow_fingerprints

    docs = read_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=_WN_K, w=_WN_W)



@register(
    "winnow_dup_pairs",
    f"""
WITH
{_WINNOW_SEL_CTE},
wdfp AS (SELECT DISTINCT doc_id AS doc, fp FROM wsel),
wnf AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_fp FROM wdfp GROUP BY doc),
wfreq AS (SELECT fp FROM wdfp GROUP BY fp HAVING count(*) <= {_WN_MAX_DF}),
wpr AS (SELECT wdfp.doc, wdfp.fp FROM wdfp JOIN wfreq USING (fp)),
wpairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(count(*) AS BIGINT) AS shared
  FROM wpr a JOIN wpr b ON a.fp = b.fp AND a.doc < b.doc
  GROUP BY 1, 2 HAVING count(*) >= {_WN_MIN_SHARED}
)
SELECT doc_a, doc_b, shared,
  round(CAST(shared AS DOUBLE) / least(na.n_fp, nb.n_fp), 6) + 0 AS overlap
FROM wpairs
JOIN wnf na ON na.doc = doc_a
JOIN wnf nb ON nb.doc = doc_b
""",
    "Fingerprint-overlap duplicate pairs (df-pruned posting-list "
    "equi-join — boilerplate fingerprints dropped before the join, so "
    "no hot bucket; containment-style overlap score)",
)
def q_winnow_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.winnow import winnow_duplicate_pairs

    docs = read_table(spark, sf_dir, "documents")
    out = winnow_duplicate_pairs(
        docs,
        k=_WN_K,
        w=_WN_W,
        min_shared=_WN_MIN_SHARED,
        max_df=_WN_MAX_DF,
    )
    return out.select(
        "doc_a",
        "doc_b",
        "shared",
        (F.round("overlap", 6) + F.lit(0.0)).alias("overlap"),
    )



# --------------------------------------------------------------------------
# C-ext. Zipf-law corpus fit (functions/tfidf.py::zipf_fit) — corpus-level
# quality gate; rank-ordered running-sum OLS replayed exactly.
# --------------------------------------------------------------------------

_ZF_K = 400



@register(
    "zipf_fit",
    f"""
WITH
{_DOCS_TOK_CTE},
ztk AS (SELECT unnest(toks) AS token FROM tok),
zcnt AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM ztk GROUP BY token),
ztot AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab,
                CAST(sum(cnt) AS BIGINT) AS total_tokens FROM zcnt),
ztop AS (SELECT token, cnt FROM zcnt ORDER BY cnt DESC, token ASC LIMIT {_ZF_K}),
zrk AS (SELECT *, CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS INTEGER)
               AS rank FROM ztop),
zst AS (SELECT rank, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
        FROM zrk),
zrun AS (
  SELECT rank,
    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
    sum(x * x) OVER w AS sxx, sum(x * y) OVER w AS sxy, sum(y * y) OVER w AS syy,
    count(*) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS nn
  FROM zst
  WINDOW w AS (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
zlast AS (SELECT * FROM zrun WHERE rank = nn),
zf AS (
  SELECT CAST(nn AS BIGINT) AS n_ranks,
    -((nn * sxy - sx * sy) / (nn * sxx - sx * sx)) AS alpha,
    (sy - ((nn * sxy - sx * sy) / (nn * sxx - sx * sx)) * sx) / nn AS intercept,
    CASE WHEN (nn * syy - sy * sy) > 0
         THEN (nn * sxy - sx * sy) * (nn * sxy - sx * sy)
              / ((nn * sxx - sx * sx) * (nn * syy - sy * sy)) END AS r2
  FROM zlast
)
SELECT n_ranks, n_vocab, total_tokens,
  round(alpha, 6) + 0 AS alpha,
  round(intercept, 6) + 0 AS intercept,
  round(r2, 6) + 0 AS r2
FROM zf CROSS JOIN ztot
""",
    f"Zipf-law OLS fit over the top-{_ZF_K} token frequencies "
    "(corpus-level spam/boilerplate gate; TakeOrdered top-k, "
    "rank-ordered running-sum OLS so the double fold order is "
    "engine-independent, integer full-vocab stats)",
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import zipf_fit

    docs = read_table(spark, sf_dir, "documents")
    out = zipf_fit(docs, top_k=_ZF_K)
    z0 = F.lit(0.0)
    return out.select(
        "n_ranks",
        "n_vocab",
        "total_tokens",
        (F.round("alpha", 6) + z0).alias("alpha"),
        (F.round("intercept", 6) + z0).alias("intercept"),
        (F.round("r2", 6) + z0).alias("r2"),
    )



# --------------------------------------------------------------------------
# C-ext. N-gram novelty (functions/text.py::ngram_novelty) — fraction of
# a doc's distinct n-grams unique to it; integer-exact ratio.
# --------------------------------------------------------------------------

_NV_N = 3



@register(
    "ngram_novelty",
    f"""
WITH
{_DOCS_TOK_CTE},
nv0 AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= {_NV_N}
         THEN list_distinct([array_to_string(list_slice(toks, i, i + {_NV_N} - 1), ' ')
                            for i in generate_series(1, len(toks) - {_NV_N} + 1)])
         ELSE [] END AS grams
  FROM tok
),
nvd AS (SELECT doc_id, unnest(grams) AS g FROM nv0),
nvf AS (SELECT g, CAST(count(*) AS BIGINT) AS df_ FROM nvd GROUP BY g),
nvp AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
    CAST(sum(CASE WHEN f.df_ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM nvd d JOIN nvf f USING (g) GROUP BY d.doc_id
)
SELECT docs.doc_id,
  coalesce(nvp.n_grams, 0) AS n_grams,
  coalesce(nvp.n_novel, 0) AS n_novel,
  round(CASE WHEN nvp.n_grams > 0
        THEN CAST(nvp.n_novel AS DOUBLE) / CAST(nvp.n_grams AS DOUBLE) END, 6) + 0
    AS novelty
FROM docs LEFT JOIN nvp USING (doc_id)
""",
    f"Per-doc {_NV_N}-gram novelty (fraction of distinct n-grams with "
    "corpus document-frequency 1) — boilerplate/template screen and "
    "quality-sampling keep signal; posting-list aggregate + one "
    "equi-join, integer-exact ratio, zero Python",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import ngram_novelty

    docs = read_table(spark, sf_dir, "documents")
    out = ngram_novelty(docs, n=_NV_N)
    return out.select(
        "doc_id",
        "n_grams",
        "n_novel",
        (F.round("novelty", 6) + F.lit(0.0)).alias("novelty"),
    )



# --------------------------------------------------------------------------
# C-ext (round 6). Cross-source vocabulary JS divergence
# (functions/tfidf.py::vocab_divergence).
# --------------------------------------------------------------------------


@register(
    "vocab_divergence",
    f"""
WITH
{_DOCS_TOK_CTE},
tc AS (
  SELECT source AS g, t AS tokn, count(*) AS c
  FROM tok, unnest(toks) AS u(t)
  GROUP BY source, t
),
tot AS (SELECT g, sum(c) AS n FROM tc GROUP BY g),
pairs AS (
  SELECT a.g AS ga, b.g AS gb, a.n AS na, b.n AS nb
  FROM tot a JOIN tot b ON a.g < b.g
),
sa AS (
  SELECT p.ga, p.gb, p.na, p.nb, t.tokn, t.c AS ca
  FROM tc t JOIN pairs p ON t.g = p.ga
),
sb AS (
  SELECT p.ga, p.gb, p.na, p.nb, t.tokn, t.c AS cb
  FROM tc t JOIN pairs p ON t.g = p.gb
),
ab AS (
  SELECT coalesce(sa.ga, sb.ga) AS ga, coalesce(sa.gb, sb.gb) AS gb,
    coalesce(sa.na, sb.na) AS na, coalesce(sa.nb, sb.nb) AS nb,
    coalesce(sa.tokn, sb.tokn) AS tokn, sa.ca, sb.cb
  FROM sa FULL OUTER JOIN sb
    ON sa.ga = sb.ga AND sa.gb = sb.gb AND sa.tokn = sb.tokn
),
terms AS (
  SELECT ga, gb, tokn, ca, cb,
    (CASE WHEN coalesce(ca, 0) > 0
          THEN (CAST(coalesce(ca, 0) AS DOUBLE) / na)
               * ln((CAST(coalesce(ca, 0) AS DOUBLE) / na)
                    / ((CAST(coalesce(ca, 0) AS DOUBLE) / na
                        + CAST(coalesce(cb, 0) AS DOUBLE) / nb) / 2))
          ELSE 0.0 END) * 0.5
    + (CASE WHEN coalesce(cb, 0) > 0
            THEN (CAST(coalesce(cb, 0) AS DOUBLE) / nb)
                 * ln((CAST(coalesce(cb, 0) AS DOUBLE) / nb)
                      / ((CAST(coalesce(ca, 0) AS DOUBLE) / na
                          + CAST(coalesce(cb, 0) AS DOUBLE) / nb) / 2))
            ELSE 0.0 END) * 0.5 AS term
  FROM ab
),
-- token-ordered running fold read at the last row (SCALING rule 24/27)
f AS (
  SELECT ga, gb,
    row_number() OVER word AS rn,
    count(*) OVER wall AS k,
    sum(term) OVER wrun AS js,
    count(ca) OVER wall AS n_vocab_a,
    count(cb) OVER wall AS n_vocab_b,
    count(CASE WHEN ca IS NOT NULL AND cb IS NOT NULL THEN 1 END) OVER wall AS n_shared
  FROM terms
  WINDOW word AS (PARTITION BY ga, gb ORDER BY tokn),
         wrun AS (PARTITION BY ga, gb ORDER BY tokn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY ga, gb)
)
SELECT ga AS group_a, gb AS group_b,
  CAST(n_vocab_a AS BIGINT) AS n_vocab_a,
  CAST(n_vocab_b AS BIGINT) AS n_vocab_b,
  CAST(n_shared AS BIGINT) AS n_shared,
  round(js, 6) + 0 AS js_nats,
  round(js / 0.6931471805599453, 6) + 0 AS js_bits
FROM f WHERE rn = k
""",
    "Jensen-Shannon divergence between every pair of document sources' "
    "unigram distributions — corpus-drift / domain-shift scalar with "
    "shared-vocabulary diagnostics, token-ordered folds",
)
def q_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import vocab_divergence

    docs = read_table(spark, sf_dir, "documents")
    out = vocab_divergence(docs, group_col="source")
    return out.select(
        "group_a",
        "group_b",
        "n_vocab_a",
        "n_vocab_b",
        "n_shared",
        (F.round("js_nats", 6) + F.lit(0.0)).alias("js_nats"),
        (F.round("js_bits", 6) + F.lit(0.0)).alias("js_bits"),
    )



# --------------------------------------------------------------------------
# C-ext. Heaps'-law vocabulary-growth fit (functions/tfidf.py::heaps_law) —
# corpus-level OCR-noise / template-recycling gate.  Cumulative N and V are
# INTEGER running sums; the OLS power sums fold in checkpoint order and are
# read off the last row (SCALING rule 24), so the double fold order is
# engine-independent.
# --------------------------------------------------------------------------

_HL_C = 200



@register(
    "heaps_law",
    f"""
WITH
{_DOCS_TOK_CTE},
htk AS (SELECT doc_id, unnest(toks) AS token FROM tok),
hbd AS (SELECT CAST(min(doc_id) AS BIGINT) AS lo,
               CAST(max(doc_id) AS BIGINT) AS hi FROM docs),
hbk AS (
  SELECT token,
    CAST(floor((doc_id - lo) * {_HL_C} / (hi - lo + 1)) AS INTEGER) AS b
  FROM htk CROSS JOIN hbd
),
hfb AS (SELECT token, min(b) AS fb FROM hbk GROUP BY token),
hnv AS (SELECT fb AS b, CAST(count(*) AS BIGINT) AS nv FROM hfb GROUP BY fb),
hnt AS (SELECT b, CAST(count(*) AS BIGINT) AS nt FROM hbk GROUP BY b),
hpb AS (SELECT hnt.b, nt, COALESCE(nv, 0) AS nv
        FROM hnt LEFT JOIN hnv ON hnt.b = hnv.b),
hcm AS (
  SELECT b,
    CAST(sum(nt) OVER w AS BIGINT) AS cn,
    CAST(sum(nv) OVER w AS BIGINT) AS cv
  FROM hpb
  WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
hst AS (SELECT b, cn, cv, ln(CAST(cn AS DOUBLE)) AS x, ln(CAST(cv AS DOUBLE)) AS y
        FROM hcm WHERE cn > 0 AND cv > 0),
hrn AS (
  SELECT b, cn, cv,
    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
    sum(x * x) OVER w AS sxx, sum(x * y) OVER w AS sxy, sum(y * y) OVER w AS syy,
    count(*) OVER wf AS nn,
    CAST(min(cv) OVER wf AS BIGINT) AS vlo,
    CAST(max(cv) OVER wf AS BIGINT) AS vhi,
    CAST(row_number() OVER (ORDER BY b) AS BIGINT) AS rn
  FROM hst
  WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
hlt AS (SELECT * FROM hrn WHERE rn = nn)
SELECT
  CAST(nn AS BIGINT) AS n_points,
  cv AS n_vocab,
  cn AS total_tokens,
  CASE WHEN (nn * sxx - sx * sx) > 0
       THEN round(exp((sy - ((nn * sxy - sx * sy) / (nn * sxx - sx * sx)) * sx) / nn),
                  6) + 0
  END AS k_coef,
  CASE WHEN (nn * sxx - sx * sx) > 0
       THEN round((nn * sxy - sx * sy) / (nn * sxx - sx * sx), 6) + 0
  END AS beta,
  CASE WHEN (nn * sxx - sx * sx) > 0 AND vhi > vlo
       THEN round((nn * sxy - sx * sy) * (nn * sxy - sx * sy)
                  / ((nn * sxx - sx * sx) * (nn * syy - sy * sy)), 6) + 0
  END AS r2
FROM hlt
""",
    f"Heaps'-law OLS fit of vocabulary growth over {_HL_C} id-range "
    "checkpoints (beta~1 flags OCR noise, beta~0 template recycling); "
    "integer cumulative sums + checkpoint-ordered running-sum OLS so "
    "the double fold order is engine-independent",
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import heaps_law

    docs = read_table(spark, sf_dir, "documents")
    out = heaps_law(docs, n_checkpoints=_HL_C)
    z0 = F.lit(0.0)
    return out.select(
        "n_points",
        "n_vocab",
        "total_tokens",
        (F.round("k_coef", 6) + z0).alias("k_coef"),
        (F.round("beta", 6) + z0).alias("beta"),
        (F.round("r2", 6) + z0).alias("r2"),
    )



# --------------------------------------------------------------------------
# C-ext. Term burstiness (functions/tfidf.py::term_burstiness) — Fano
# factor of per-document counts (Church & Gale 1995).  S1/S2/D are integer
# sums; fano is two exact divisions, bit-identical, so the top-k cut
# (fano desc, token asc) selects the same set on both engines.
# --------------------------------------------------------------------------

_TB_MIN_DF = 5

_TB_K = 100



@register(
    "term_burstiness",
    f"""
WITH
{_DOCS_TOK_CTE},
btk AS (SELECT doc_id, unnest(toks) AS token FROM tok),
bpd AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
        FROM btk GROUP BY doc_id, token),
bst AS (
  SELECT token,
    CAST(count(*) AS BIGINT) AS df,
    CAST(sum(c) AS BIGINT) AS total_count,
    CAST(sum(c * c) AS BIGINT) AS s2
  FROM bpd GROUP BY token
),
btt AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM docs),
bsc AS (
  SELECT token, df, total_count,
    CAST(s2 AS DOUBLE) / CAST(total_count AS DOUBLE)
      - CAST(total_count AS DOUBLE) / CAST(nd AS DOUBLE) AS fano_raw
  FROM bst CROSS JOIN btt
  WHERE df >= {_TB_MIN_DF}
)
SELECT token, df, total_count, round(fano_raw, 6) + 0 AS fano
FROM bsc
ORDER BY fano_raw DESC, token ASC
LIMIT {_TB_K}
""",
    f"Top-{_TB_K} burstiest terms (Fano factor of per-doc counts, "
    f"df >= {_TB_MIN_DF}): boilerplate/stopword detector; integer "
    "aggregates + exact divisions, TakeOrdered top-k never a global sort",
)
def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import term_burstiness

    docs = read_table(spark, sf_dir, "documents")
    out = term_burstiness(docs, min_df=_TB_MIN_DF, top_k=_TB_K)
    z0 = F.lit(0.0)
    return out.select(
        "token",
        "df",
        "total_count",
        (F.round("fano", 6) + z0).alias("fano"),
    )



# --------------------------------------------------------------------------
# C-ext. URL/domain profile (functions/corpus.py::url_profile) — the
# testdata corpus carries no URLs, so the query synthesizes deterministic
# URL-bearing text per doc IDENTICALLY in both engines (precedent: the
# synthesized JPEG/BMP marker streams) and the regex extraction + domain
# rollup is exercised for real.
# --------------------------------------------------------------------------

_UD_K = 40



@register(
    "url_domains",
    f"""
WITH uds AS (
  SELECT doc_id,
    text || ' see http://www.site' || CAST(doc_id % 17 AS VARCHAR)
         || '.example.com/p/' || CAST(doc_id AS VARCHAR)
         || ' and https://cdn' || CAST(doc_id % 5 AS VARCHAR) || '.host.net/x'
      AS text
  FROM documents
),
udx AS (
  SELECT doc_id,
    unnest(regexp_extract_all(lower(text), 'https?://([a-z0-9.-]+)', 1)) AS domain
  FROM uds
),
udp AS (SELECT doc_id, domain, CAST(count(*) AS BIGINT) AS c
        FROM udx GROUP BY doc_id, domain),
udg AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(c) AS BIGINT) AS n_urls
        FROM udp GROUP BY domain)
SELECT domain, n_docs, n_urls FROM udg
ORDER BY n_urls DESC, n_docs DESC, domain ASC
LIMIT {_UD_K}
""",
    f"Top-{_UD_K} cited domains (doc reach + occurrence counts) from "
    "regex URL extraction over deterministic synthesized URL text — "
    "provenance/spam audit; integer-only ordering keys",
)
def q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import url_profile

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" see http://www.site"),
            (F.col("doc_id") % 17).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and https://cdn"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".host.net/x"),
        ),
    )
    return url_profile(docs, top_k=_UD_K).select("domain", "n_docs", "n_urls")



# --------------------------------------------------------------------------
# C-ext. BM25 document ranking (functions/tfidf.py::bm25_topk) — Robertson
# idf, in-array query-term filter so the only explode is |Q|-bounded,
# round-before-rank TakeOrdered selection.
# --------------------------------------------------------------------------

_BM25_TERMS = ("hash", "join", "merge", "stream")

_BM25_K1, _BM25_B, _BM25_K = 1.2, 0.75, 25

_BM25_IN = ", ".join(f"'{t}'" for t in sorted(_BM25_TERMS))



@register(
    "bm25",
    f"""
WITH
{_DOCS_TOK_CTE},
qbase AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         list_filter(toks, x -> x IN ({_BM25_IN})) AS qt
  FROM tok
),
qtot AS (
  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(dl) AS BIGINT) AS sumdl
  FROM qbase
),
qtf AS (
  SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, unnest(qt) AS token FROM qbase)
  GROUP BY doc_id, dl, token
),
qdf AS (SELECT token, CAST(count(*) AS BIGINT) AS df_ FROM qtf GROUP BY token),
qsc AS (
  SELECT doc_id,
    CAST(count(*) AS INTEGER) AS n_terms_hit,
    CAST(max(dl) AS BIGINT) AS dl,
    sum(
      (ln((CAST(nd AS DOUBLE) - CAST(df_ AS DOUBLE) + 0.5)
          / (CAST(df_ AS DOUBLE) + 0.5) + 1.0)
       * (CAST(tf AS DOUBLE) * {_BM25_K1 + 1.0!r}))
      / (CAST(tf AS DOUBLE) + {_BM25_K1!r}
         * ({1.0 - _BM25_B!r} + {_BM25_B!r} * CAST(dl AS DOUBLE)
            / (CAST(sumdl AS DOUBLE) / CAST(nd AS DOUBLE))))
    ) AS score_raw
  FROM qtf JOIN qdf USING (token) CROSS JOIN qtot
  GROUP BY doc_id
)
SELECT doc_id, n_terms_hit, dl, round(score_raw, 6) + 0 AS score
FROM qsc
ORDER BY round(score_raw, 6) + 0 DESC, doc_id ASC
LIMIT {_BM25_K}
""",
    f"BM25 top-{_BM25_K} documents for a {len(_BM25_TERMS)}-term query "
    f"(k1={_BM25_K1}, b={_BM25_B}, Lucene non-negative idf) — doc length "
    "via F.size (no corpus explode), |Q|-bounded token explode, "
    "round-before-rank TakeOrdered selection",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.tfidf import bm25_topk

    docs = read_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, query_terms=_BM25_TERMS, k1=_BM25_K1, b=_BM25_B, top_k=_BM25_K
    )
