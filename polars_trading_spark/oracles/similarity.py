"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark.functions import similarity as sim_ops
from polars_trading_spark.sources.tables import read_table
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from polars_trading_spark.oracles._shared import (  # noqa: F401
    register,
)



# --------------------------------------------------------------------------
# similarity_topk (brute-force exact) and similarity_topk_lsh (SRP-bucketed).
# --------------------------------------------------------------------------

_TOPK, _N_QUERIES, _N_PLANES = 5, 10, 4


_EMB_CTE = """
c AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
)
"""

_DOT = "list_sum([qv[i+1] * v[i+1] for i in range(0, len(v))])"

_NORM_Q = "sqrt(list_sum([x * x for x in qv]))"

_NORM_V = "sqrt(list_sum([x * x for x in v]))"



@register(
    "similarity_topk",
    f"""
WITH
{_EMB_CTE},
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_N_QUERIES}),
sims AS (
  SELECT q.query_id, c.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_TOPK}
""",
    "Exact brute-force cosine top-5 for the first 10 query vectors "
    "(broadcast queries, zip_with/aggregate dot products, no Python)",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    out = sim_ops.cosine_topk(emb, queries, k=_TOPK)
    return out.withColumn("rank", F.col("rank").cast("int"))



@register(
    "similarity_topk_lsh",
    f"""
WITH
{_EMB_CTE},
planes AS (
  SELECT v AS pv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_PLANES})
),
bucketed AS (
  SELECT c.vec_id, c.v,
         CAST(sum(CASE WHEN list_sum([pv[i+1] * v[i+1] for i in range(0, len(v))]) >= 0
                       THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
  FROM c CROSS JOIN planes
  GROUP BY c.vec_id, c.v
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed WHERE vec_id < {_N_QUERIES}),
sims AS (
  SELECT q.query_id, b.vec_id,
         round(list_sum([qv[i+1] * cv[i+1] for i in range(0, len(cv))])
               / ({_NORM_Q} * sqrt(list_sum([x * x for x in cv]))), 6) AS cosine_sim
  FROM (SELECT vec_id, v AS cv, bucket FROM bucketed) b
  JOIN q ON b.bucket = q.bucket
  WHERE b.vec_id <> q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_TOPK}
""",
    "Approximate cosine top-5 via signed-projection LSH buckets (planes = "
    "4 lowest-id corpus vectors; per-query scan limited to its bucket)",
)
def q_similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    out = sim_ops.srp_lsh_topk(emb, queries, k=_TOPK, num_planes=_N_PLANES)
    return out.withColumn("rank", F.col("rank").cast("int"))



# --------------------------------------------------------------------------
# similarity_topk_ivf: inverted-file coarse quantizer — the other canonical
# ANN layout next to SRP-LSH.  Corpus shuffles once on cell id; each query
# scans only its nprobe nearest cells.
# --------------------------------------------------------------------------

_N_CELLS, _NPROBE = 8, 2



@register(
    "similarity_topk_ivf",
    f"""
WITH
{_EMB_CTE},
cent AS (
  SELECT v AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_CELLS})
),
cell_sims AS (
  SELECT c.vec_id, c.v, cent.j,
         list_sum([cv[i+1] * v[i+1] for i in range(0, len(v))])
           / (sqrt(list_sum([x * x for x in cv])) * {_NORM_V}) AS csim
  FROM c CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, v AS qv, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims WHERE vec_id < {_N_QUERIES})
  WHERE rn <= {_NPROBE}
),
sims AS (
  SELECT p.query_id, a.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM (SELECT vec_id, v, cell FROM assigned) a
  JOIN probes p ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_TOPK}
""",
    "Approximate cosine top-5 via an IVF coarse quantizer (8 cells around "
    "the lowest-id corpus vectors, argmax-cosine assignment, nprobe=2)",
)
def q_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    # lowest_id centroids: the deterministic variant any engine can
    # reproduce exactly — this query is the differential-oracle gate for
    # the IVF plan shape (cell assignment, probing, ranking).
    out = sim_ops.ivf_topk(
        emb, queries, k=_TOPK, n_cells=_N_CELLS, nprobe=_NPROBE, centroid_method="lowest_id"
    )
    return out.withColumn("rank", F.col("rank").cast("int"))



# k-means training is deterministic and per-iteration rounded
# (kmeans_centroids), so the oracle replays it as UNROLLED Lloyd SQL:
# sample = 256 lowest-id normalized vectors, init = first 8, three
# iterations of argmax-dot assignment (ties to lowest cell) + mean +
# renormalize + round(6).  The per-iteration rounding is what makes this
# cross-engine exact: float-sum order differences (numpy pairwise vs
# SQL sequential) land below the rounding grid and reset every
# iteration instead of compounding.

_KM_SAMPLE, _KM_ITERS, _KM_RD = 256, 3, 6



def _km_iter_sql(i: int) -> str:
    prev = f"cent{i - 1}"
    return f"""
asg{i} AS (
  SELECT rid, sv, j FROM (
    SELECT s.rid, s.sv, ce.j,
           row_number() OVER (PARTITION BY s.rid ORDER BY
             list_sum([ce.cv[kk+1] * s.sv[kk+1] for kk in range(0, len(s.sv))]) DESC, ce.j) AS rn
    FROM samp s CROSS JOIN {prev} ce
  ) WHERE rn = 1
),
dm{i} AS (
  SELECT j, dim, avg(val) AS mv
  FROM (SELECT j, unnest(sv) AS val, generate_subscripts(sv, 1) AS dim FROM asg{i})
  GROUP BY j, dim
),
cm{i} AS (SELECT j, list(mv ORDER BY dim) AS mvec FROM dm{i} GROUP BY j),
cent{i} AS (
  SELECT ce.j,
         CASE WHEN cm.j IS NULL OR sqrt(list_sum([x * x for x in cm.mvec])) = 0 THEN ce.cv
              ELSE [round(x / sqrt(list_sum([y * y for y in cm.mvec])), {_KM_RD}) for x in cm.mvec] END AS cv
  FROM {prev} ce LEFT JOIN cm{i} cm ON cm.j = ce.j
)"""



@register(
    "similarity_topk_ivf_kmeans",
    f"""
WITH
{_EMB_CTE},
samp0 AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) AS rid
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_KM_SAMPLE})
),
samp AS (
  SELECT rid, CASE WHEN nrm = 0 THEN v ELSE [x / nrm for x in v] END AS sv
  FROM (SELECT rid, v, sqrt(list_sum([x * x for x in v])) AS nrm FROM samp0)
),
cent0 AS (
  SELECT CAST(rid - 1 AS INTEGER) AS j, [round(x, {_KM_RD}) for x in sv] AS cv
  FROM samp WHERE rid <= {_N_CELLS}
),
{','.join(_km_iter_sql(i) for i in range(1, _KM_ITERS + 1))},
cent AS (SELECT cv, j FROM cent{_KM_ITERS}),
cell_sims AS (
  SELECT c.vec_id, c.v, cent.j,
         list_sum([cv[i+1] * v[i+1] for i in range(0, len(v))])
           / (sqrt(list_sum([x * x for x in cv])) * {_NORM_V}) AS csim
  FROM c CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, v AS qv, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims WHERE vec_id < {_N_QUERIES})
  WHERE rn <= {_NPROBE}
),
sims AS (
  SELECT p.query_id, a.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM (SELECT vec_id, v, cell FROM assigned) a
  JOIN probes p ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_TOPK}
""",
    "IVF top-5 with sampled spherical k-means centroids (the production "
    "IVF recipe): deterministic per-iteration-rounded training, replayed "
    "by the oracle as unrolled Lloyd SQL",
)
def q_similarity_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    out = sim_ops.ivf_topk(
        emb, queries, k=_TOPK, n_cells=_N_CELLS, nprobe=_NPROBE, centroid_method="kmeans"
    )
    return out.withColumn("rank", F.col("rank").cast("int"))



# --------------------------------------------------------------------------
# C-ext. IVF-PQ (functions/similarity.py::ivf_pq_topk)
# --------------------------------------------------------------------------

_PQ_M, _PQ_CODES, _PQ_DS, _PQ_ITERS = 4, 8, 16, 2



def _pq_iter_sql(i: int) -> str:
    prev = f"pcent{i - 1}"
    return f"""
pasg{i} AS (
  SELECT rid, m, ssv, j FROM (
    SELECT s.rid, s.m, s.ssv, ce.j,
      row_number() OVER (PARTITION BY s.rid, s.m ORDER BY
        list_sum([(s.ssv[kk+1] - ce.cv[kk+1]) * (s.ssv[kk+1] - ce.cv[kk+1])
                  for kk in range(0, {_PQ_DS})]) ASC, ce.j) AS rn
    FROM psamp s JOIN {prev} ce ON ce.m = s.m
  ) WHERE rn = 1
),
pdm{i} AS (
  SELECT m, j, dim, avg(val) AS mv
  FROM (SELECT m, j, unnest(ssv) AS val, generate_subscripts(ssv, 1) AS dim FROM pasg{i})
  GROUP BY m, j, dim
),
pcm{i} AS (SELECT m, j, list(mv ORDER BY dim) AS mvec FROM pdm{i} GROUP BY m, j),
pcent{i} AS (
  SELECT ce.m, ce.j, CASE WHEN cm.j IS NULL THEN ce.cv
                          ELSE [round(x, {_KM_RD}) for x in cm.mvec] END AS cv
  FROM {prev} ce LEFT JOIN pcm{i} cm ON cm.m = ce.m AND cm.j = ce.j
)"""



@register(
    "similarity_topk_ivf_pq",
    f"""
WITH
{_EMB_CTE},
cn AS (
  SELECT vec_id, v,
    CASE WHEN sqrt(list_sum([x * x for x in v])) = 0 THEN v
         ELSE [x / sqrt(list_sum([y * y for y in v])) for x in v] END AS vn
  FROM c
),
psamp AS (
  SELECT rid, mm.m, vn[mm.m * {_PQ_DS} + 1 : mm.m * {_PQ_DS} + {_PQ_DS}] AS ssv
  FROM (SELECT vn, row_number() OVER (ORDER BY vec_id) AS rid
        FROM (SELECT * FROM cn ORDER BY vec_id LIMIT {_KM_SAMPLE})) s
  CROSS JOIN generate_series(0, {_PQ_M - 1}) AS mm(m)
),
pcent0 AS (
  SELECT m, CAST(rid - 1 AS INTEGER) AS j, [round(x, {_KM_RD}) for x in ssv] AS cv
  FROM psamp WHERE rid <= {_PQ_CODES}
),
{','.join(_pq_iter_sql(i) for i in range(1, _PQ_ITERS + 1))},
pbook AS (SELECT m, j, cv FROM pcent{_PQ_ITERS}),
cent AS (
  SELECT v AS cvv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS jc
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_CELLS})
),
cell_sims AS (
  SELECT c.vec_id, c.v AS v, cn.vn, cent.jc,
    list_sum([cvv[i+1] * c.v[i+1] for i in range(0, len(c.v))])
      / (sqrt(list_sum([x * x for x in cvv])) * sqrt(list_sum([x * x for x in c.v]))) AS csim
  FROM c JOIN cn ON c.vec_id = cn.vec_id CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, vn, jc AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, jc) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
code_d2 AS (
  SELECT a.vec_id, a.cell, b.m, b.j,
    list_sum([(a.vn[b.m * {_PQ_DS} + kk + 1] - b.cv[kk + 1])
              * (a.vn[b.m * {_PQ_DS} + kk + 1] - b.cv[kk + 1])
              for kk in range(0, {_PQ_DS})]) AS d2
  FROM assigned a CROSS JOIN pbook b
),
codes AS (
  SELECT vec_id, cell, m, j AS code
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, j) AS rn
        FROM code_d2)
  WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, vn AS qn, jc AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, jc) AS rn
        FROM cell_sims WHERE vec_id < {_N_QUERIES})
  WHERE rn <= {_NPROBE}
),
contrib AS (
  SELECT p.query_id, co.vec_id, co.m,
    list_sum([p.qn[co.m * {_PQ_DS} + kk + 1] * b.cv[kk + 1]
              for kk in range(0, {_PQ_DS})]) AS part
  FROM probes p
  JOIN codes co ON co.cell = p.cell
  JOIN pbook b ON b.m = co.m AND b.j = co.code
  WHERE co.vec_id <> p.query_id
),
scores AS (
  SELECT query_id, vec_id, round(sum(part), 6) AS pq_score
  FROM contrib GROUP BY query_id, vec_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY pq_score DESC, vec_id) AS INTEGER) AS rank
  FROM scores
)
SELECT query_id, rank, vec_id, pq_score FROM ranked WHERE rank <= {_TOPK}
""",
    f"IVF-PQ approximate top-{_TOPK}: lowest-id coarse cells + "
    f"{_PQ_M}x{_PQ_CODES}-code product quantization (per-iteration-rounded "
    "L2 Lloyd per subspace, LUT scoring) — the byte-payload ANN scale path",
)
def q_similarity_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.similarity import ivf_pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    return ivf_pq_topk(
        emb,
        queries,
        k=_TOPK,
        n_cells=_N_CELLS,
        nprobe=_NPROBE,
        m_sub=_PQ_M,
        n_codes=_PQ_CODES,
    )



# --------------------------------------------------------------------------
# C-ext. SemDeDup (functions/similarity.py::semdedup) — cluster-scoped
# embedding dedup; lowest-id centroids so the oracle replays assignment
# exactly (the kmeans training path is already gated by
# similarity_topk_ivf_kmeans).
# --------------------------------------------------------------------------

_SD_EPS = 0.95



@register(
    "semdedup",
    f"""
WITH
{_EMB_CTE},
cent AS (
  SELECT v AS cv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_CELLS})
),
cell_sims AS (
  SELECT c.vec_id, c.v, cent.j,
         list_sum([cv[i+1] * v[i+1] for i in range(0, len(v))])
           / (sqrt(list_sum([x * x for x in cv])) * {_NORM_V}) AS csim
  FROM c CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, j AS cell
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, j) AS rn
        FROM cell_sims)
  WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS vid, b.vec_id AS bid,
         round(list_sum([a.v[i+1] * b.v[i+1] for i in range(0, len(a.v))])
               / (sqrt(list_sum([x * x for x in a.v]))
                  * sqrt(list_sum([y * y for y in b.v]))), 6) AS sim
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND b.vec_id < a.vec_id
),
best AS (
  SELECT vid, bid, sim
  FROM (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY sim DESC, bid) AS rn
        FROM pairs WHERE sim >= {_SD_EPS!r})
  WHERE rn = 1
)
SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell, b.bid AS dup_of,
       b.sim AS dup_sim, b.bid IS NULL AS keep
FROM assigned a LEFT JOIN best b ON b.vid = a.vec_id
""",
    f"SemDeDup: coarse-quantizer cells (8 lowest-id centroids), within-"
    f"cell cosine >= {_SD_EPS} to a lower id marks a duplicate",
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    out = sim_ops.semdedup(
        emb, n_cells=_N_CELLS, threshold=_SD_EPS, centroid_method="lowest_id"
    )
    return out



# --------------------------------------------------------------------------
# C-ext (round 6). Hard-negative mining band
# (functions/similarity.py::hard_negatives).
# --------------------------------------------------------------------------

_HN_LO, _HN_HI, _HN_K = 0.1, 0.9, 5



@register(
    "hard_negatives",
    f"""
WITH
{_EMB_CTE},
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_N_QUERIES}),
sims AS (
  SELECT q.query_id, c.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
banded AS (
  SELECT * FROM sims WHERE cosine_sim >= {_HN_LO!r} AND cosine_sim < {_HN_HI!r}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, vec_id) AS INTEGER) AS rank
  FROM banded
)
SELECT query_id, rank, vec_id, cosine_sim FROM ranked WHERE rank <= {_HN_K}
""",
    f"Contrastive hard-negative mining: per query the top-{_HN_K} corpus "
    f"vectors with rounded cosine in [{_HN_LO}, {_HN_HI}) — informative "
    "negatives below the near-duplicate ceiling",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    out = sim_ops.hard_negatives(emb, queries, k=_HN_K, lo=_HN_LO, hi=_HN_HI)
    return out.withColumn("rank", F.col("rank").cast("int"))



# --------------------------------------------------------------------------
# C-ext (round 6). Embedding cluster diagnostics
# (functions/similarity.py::embedding_cohesion / centroid_similarity).
# --------------------------------------------------------------------------

_COHESION_CTES = """
ce AS (
  SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
),
d AS (
  SELECT label, vec_id, i, v[i] AS val
  FROM ce, unnest(range(1, len(v) + 1)) AS g(i)
),
-- vec_id-ordered per-dimension folds read at the last row
f AS (
  SELECT label, i,
    row_number() OVER (PARTITION BY label, i ORDER BY vec_id) AS rn,
    count(*) OVER (PARTITION BY label, i) AS n,
    sum(val) OVER (PARTITION BY label, i ORDER BY vec_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM d
),
cent AS (
  SELECT label, list(s / n ORDER BY i) AS cv, CAST(max(n) AS BIGINT) AS nvec
  FROM f WHERE rn = n GROUP BY label
)"""



@register(
    "embedding_cohesion",
    f"""
WITH
{_COHESION_CTES},
cosd AS (
  SELECT ce.label, ce.vec_id,
    sqrt(list_sum([x * x for x in ct.cv])) AS cn,
    CASE WHEN sqrt(list_sum([x * x for x in ct.cv])) > 0 THEN
      list_sum([ce.v[i+1] * ct.cv[i+1] for i in range(0, len(ce.v))])
      / (sqrt(list_sum([x * x for x in ce.v])) * sqrt(list_sum([x * x for x in ct.cv])))
    END AS cs
  FROM ce JOIN cent ct USING (label)
),
m AS (
  SELECT label,
    row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn,
    count(*) OVER (PARTITION BY label) AS n,
    sum(cs) OVER (PARTITION BY label ORDER BY vec_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
    max(cn) OVER (PARTITION BY label) AS cn
  FROM cosd
)
SELECT m.label, ct.nvec AS n_vectors,
  round(m.cn, 6) + 0 AS centroid_norm,
  CASE WHEN m.cn > 0 THEN round(m.s / m.n, 6) + 0 END AS mean_cos_to_centroid
FROM m JOIN cent ct USING (label) WHERE rn = n
""",
    "Per-label embedding cluster tightness: centroid norm + mean member "
    "cosine to centroid (vec_id-ordered per-dimension folds)",
)
def q_embedding_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    out = sim_ops.embedding_cohesion(emb)
    return out.select(
        "label",
        "n_vectors",
        (F.round("centroid_norm", 6) + F.lit(0.0)).alias("centroid_norm"),
        (F.round("mean_cos_to_centroid", 6) + F.lit(0.0)).alias(
            "mean_cos_to_centroid"
        ),
    )



@register(
    "centroid_similarity",
    f"""
WITH
{_COHESION_CTES}
SELECT a.label AS label_a, b.label AS label_b, a.nvec AS n_a, b.nvec AS n_b,
  CASE WHEN sqrt(list_sum([x * x for x in a.cv])) > 0
        AND sqrt(list_sum([x * x for x in b.cv])) > 0 THEN
    round(list_sum([a.cv[i+1] * b.cv[i+1] for i in range(0, len(a.cv))])
          / (sqrt(list_sum([x * x for x in a.cv]))
             * sqrt(list_sum([x * x for x in b.cv]))), 6) + 0
  END AS centroid_cosine
FROM cent a JOIN cent b ON a.label < b.label
""",
    "Pairwise cosine between label centroids — cluster-confusion "
    "report on the tiny centroid aggregate, never on member vectors",
)
def q_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    out = sim_ops.centroid_similarity(emb)
    return out.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        (F.round("centroid_cosine", 6) + F.lit(0.0)).alias("centroid_cosine"),
    )



# --------------------------------------------------------------------------
# C-ext (round 6). ANN recall evaluation: SRP-LSH top-k vs the exact
# brute-force top-k, per query — the harness every approximate index
# ships with.
# --------------------------------------------------------------------------


@register(
    "ann_recall",
    f"""
WITH
{_EMB_CTE},
-- exact branch (the similarity_topk replay)
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_N_QUERIES}),
esims AS (
  SELECT q.query_id, c.vec_id,
         round({_DOT} / ({_NORM_Q} * {_NORM_V}), 6) AS cosine_sim
  FROM c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
),
eranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM esims
),
etop AS (SELECT query_id, vec_id FROM eranked WHERE rank <= {_TOPK}),
-- LSH branch (the similarity_topk_lsh replay)
planes AS (
  SELECT v AS pv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS j
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_N_PLANES})
),
bucketed AS (
  SELECT c.vec_id, c.v,
         CAST(sum(CASE WHEN list_sum([pv[i+1] * v[i+1] for i in range(0, len(v))]) >= 0
                       THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
  FROM c CROSS JOIN planes
  GROUP BY c.vec_id, c.v
),
lq AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed WHERE vec_id < {_N_QUERIES}),
lsims AS (
  SELECT lq.query_id, b.vec_id,
         round(list_sum([qv[i+1] * cv[i+1] for i in range(0, len(cv))])
               / ({_NORM_Q} * sqrt(list_sum([x * x for x in cv]))), 6) AS cosine_sim
  FROM (SELECT vec_id, v AS cv, bucket FROM bucketed) b
  JOIN lq ON b.bucket = lq.bucket
  WHERE b.vec_id <> lq.query_id
),
lranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM lsims
),
ltop AS (SELECT query_id, vec_id FROM lranked WHERE rank <= {_TOPK}),
-- compare
hits AS (
  SELECT e.query_id, count(*) AS n_hit
  FROM etop e JOIN ltop l ON e.query_id = l.query_id AND e.vec_id = l.vec_id
  GROUP BY e.query_id
),
base AS (
  SELECT e.query_id, count(*) AS n_exact FROM etop e GROUP BY e.query_id
),
appr AS (
  SELECT l.query_id, count(*) AS n_approx FROM ltop l GROUP BY l.query_id
)
SELECT b.query_id,
  CAST(b.n_exact AS BIGINT) AS n_exact,
  CAST(coalesce(a.n_approx, 0) AS BIGINT) AS n_approx,
  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
  round(coalesce(h.n_hit, 0) / CAST(b.n_exact AS DOUBLE), 6) + 0 AS recall
FROM base b
LEFT JOIN appr a ON a.query_id = b.query_id
LEFT JOIN hits h ON h.query_id = b.query_id
""",
    f"ANN recall harness: per-query overlap of SRP-LSH top-{_TOPK} with "
    f"the exact brute-force top-{_TOPK} — the recall evaluation every "
    "approximate index ships with",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    exact = sim_ops.cosine_topk(emb, queries, k=_TOPK).select("query_id", "vec_id")
    lsh = sim_ops.srp_lsh_topk(emb, queries, k=_TOPK, num_planes=_N_PLANES).select(
        "query_id", "vec_id"
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    appr = lsh.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_approx"))
    hits = exact.join(lsh, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    out = (
        base.join(appr, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.coalesce("n_approx", F.lit(0)).cast("long").alias("n_approx"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (
                F.round(
                    F.coalesce("n_hit", F.lit(0)) / F.col("n_exact").cast("double"), 6
                )
                + F.lit(0.0)
            ).alias("recall"),
        )
    )
    return out


# --------------------------------------------------------------------------
# C-ext (round 8). Embedding-distribution drift per label
# (functions/similarity.py::embedding_drift) — JS divergence between
# each label's IVF-cell histogram and the global one; the k-means
# quantizer replays as the same unrolled Lloyd SQL the ivf_kmeans
# oracle uses, the JS grid includes zero-count cells, and all ratios
# are exact integer divisions (divergences O(1), rounded to 6).
# --------------------------------------------------------------------------


@register(
    "embedding_drift",
    f"""
WITH
{_EMB_CTE},
samp0 AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) AS rid
  FROM (SELECT * FROM c ORDER BY vec_id LIMIT {_KM_SAMPLE})
),
samp AS (
  SELECT rid, CASE WHEN nrm = 0 THEN v ELSE [x / nrm for x in v] END AS sv
  FROM (SELECT rid, v, sqrt(list_sum([x * x for x in v])) AS nrm FROM samp0)
),
cent0 AS (
  SELECT CAST(rid - 1 AS INTEGER) AS j, [round(x, {_KM_RD}) for x in sv] AS cv
  FROM samp WHERE rid <= {_N_CELLS}
),
{','.join(_km_iter_sql(i) for i in range(1, _KM_ITERS + 1))},
cent AS (SELECT cv, j FROM cent{_KM_ITERS}),
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
lab AS (
  SELECT a.vec_id, e.label, a.cell
  FROM assigned a JOIN embeddings e USING (vec_id)
),
hist AS (
  SELECT label, cell, CAST(count(*) AS BIGINT) AS cnt
  FROM lab GROUP BY label, cell
),
labels AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS nl FROM hist GROUP BY label),
cells AS (SELECT CAST(unnest(range(0, {_N_CELLS})) AS INTEGER) AS cell),
gcell AS (SELECT cell, CAST(sum(cnt) AS BIGINT) AS gc FROM hist GROUP BY cell),
tot AS (SELECT CAST(sum(nl) AS BIGINT) AS nn FROM labels),
grid AS (
  SELECT l.label, ce.cell, l.nl,
    coalesce(h.cnt, 0) AS cnt, coalesce(g.gc, 0) AS gc, t.nn
  FROM labels l CROSS JOIN cells ce
  LEFT JOIN hist h ON h.label = l.label AND h.cell = ce.cell
  LEFT JOIN gcell g ON g.cell = ce.cell
  CROSS JOIN tot t
),
terms AS (
  SELECT label, nl,
    (CASE WHEN cnt > 0
          THEN 0.5 * (cnt / CAST(nl AS DOUBLE))
               * ln((cnt / CAST(nl AS DOUBLE))
                    / ((cnt / CAST(nl AS DOUBLE) + gc / CAST(nn AS DOUBLE)) / 2))
          ELSE 0.0 END)
    + (CASE WHEN gc > 0
            THEN 0.5 * (gc / CAST(nn AS DOUBLE))
                 * ln((gc / CAST(nn AS DOUBLE))
                      / ((cnt / CAST(nl AS DOUBLE) + gc / CAST(nn AS DOUBLE)) / 2))
            ELSE 0.0 END) AS term
  FROM grid
),
js AS (
  SELECT label, max(nl) AS n_vecs, sum(term) AS jsd FROM terms GROUP BY label
),
top AS (
  SELECT label, cell AS top_cell, cnt AS topc
  FROM (SELECT *, row_number() OVER (PARTITION BY label
                                     ORDER BY cnt DESC, cell) AS rk FROM hist)
  WHERE rk = 1
)
SELECT j.label, j.n_vecs,
  round(j.jsd, 6) + 0 AS js_divergence,
  t.top_cell,
  round(t.topc / CAST(j.n_vecs AS DOUBLE), 6) + 0 AS top_cell_share
FROM js j JOIN top t USING (label)
""",
    "Embedding drift per label: JS divergence of IVF-cell histograms "
    "vs the global distribution (deterministic k-means quantizer, "
    "zero-count cells included) — the embedding-space psi_drift",
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    out = sim_ops.embedding_drift(emb, n_cells=_N_CELLS)
    z0 = F.lit(0.0)
    return out.select(
        "label",
        "n_vecs",
        (F.col("js_divergence") + z0).alias("js_divergence"),
        "top_cell",
        (F.col("top_cell_share") + z0).alias("top_cell_share"),
    )


# --------------------------------------------------------------------------
# C-ext (round 10). INT8 embedding quantization audit
# (functions/similarity.py::embedding_quantize_report) — per-dimension
# symmetric scales and reconstruction error; codes use the explicit
# floor-half-up rounding, error moments fold hierarchically (id-ordered
# inside 64 id buckets, then bucket-ordered) so the result is layout-
# and engine-exact.  Floats round to 9 (they sit at 1e-2..1e-5 scales).
# --------------------------------------------------------------------------


@register(
    "embedding_quantize",
    """
WITH c AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
),
qex AS (
  SELECT vec_id, CAST(t.i AS INTEGER) AS dim, v[t.i + 1] AS x
  FROM c, unnest(range(0, len(v))) AS t(i)
),
qsc AS (SELECT dim, max(abs(x)) / 127.0 AS scale FROM qex GROUP BY dim),
qerr AS (
  SELECT e.vec_id, e.dim,
    e.x - (CASE WHEN s.scale > 0
                THEN greatest(-127.0, least(127.0, floor(e.x / s.scale + 0.5)))
                ELSE 0.0 END) * s.scale AS err,
    e.vec_id % 64 AS bkt
  FROM qex e JOIN qsc s USING (dim)
),
qpart AS (
  SELECT dim, bkt, n, s2, me FROM (
    SELECT dim, bkt,
      row_number() OVER wo AS rn,
      count(*) OVER (PARTITION BY dim, bkt) AS n,
      sum(err * err) OVER wr AS s2,
      max(abs(err)) OVER (PARTITION BY dim, bkt) AS me
    FROM qerr
    WINDOW wo AS (PARTITION BY dim, bkt ORDER BY vec_id),
           wr AS (PARTITION BY dim, bkt ORDER BY vec_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  ) WHERE rn = n
),
qfin AS (
  SELECT dim, n, s2, max_abs_err FROM (
    SELECT dim,
      row_number() OVER bo AS brn,
      count(*) OVER (PARTITION BY dim) AS bn,
      sum(n) OVER br AS n,
      sum(s2) OVER br AS s2,
      max(me) OVER (PARTITION BY dim) AS max_abs_err
    FROM qpart
    WINDOW bo AS (PARTITION BY dim ORDER BY bkt),
           br AS (PARTITION BY dim ORDER BY bkt
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
  ) WHERE brn = bn
)
SELECT f.dim, CAST(f.n AS BIGINT) AS n,
  round(s.scale, 9) + 0 AS scale,
  round(f.s2 / CAST(f.n AS DOUBLE), 9) + 0 AS mse,
  round(f.max_abs_err, 9) + 0 AS max_abs_err
FROM qfin f JOIN qsc s USING (dim)
""",
    "Per-dimension INT8 quantization audit of the embedding column: "
    "symmetric max/127 scales, floor-half-up codes, hierarchical "
    "id-bucket error folds — the pre-shipping report for a quantized "
    "ANN index",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    out = sim_ops.embedding_quantize_report(emb)
    z0 = F.lit(0.0)
    return out.select(
        "dim",
        "n",
        (F.round("scale", 9) + z0).alias("scale"),
        (F.round("mse", 9) + z0).alias("mse"),
        (F.round("max_abs_err", 9) + z0).alias("max_abs_err"),
    )
