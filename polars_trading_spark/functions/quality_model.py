"""Hashed-ngram quality classifier trained by closed-form IRLS folds.

The governance stage the cleanse funnel lacked: production pipelines
(CCNet, GPT-3's WebText-vs-CommonCrawl filter) train a CLASSIFIER to
imitate-and-generalize the hand-written quality heuristic, then score
every document with it.  This module trains a logistic regression on
hashed token-bucket frequencies against the heuristic gate's own label
(``quality_score >= min_quality``) and scores the corpus — entirely in
deterministic, engine-replayable arithmetic:

* **Features**: ``x = [1, f_1..f_D]`` where ``f_k`` is the fraction of
  the document's tokens whose portable salted hash lands in bucket
  ``k`` (``portable_hash60(salt || token) % D``).  Integer-derived
  ratios — exact on every engine.
* **Training**: IRLS (Newton-Raphson for the logistic log-likelihood):
  per iteration ``beta += solve(X'WX + ridge*I, X'(y - p))`` with
  ``p = sigmoid(X beta)``, ``W = diag(p(1-p))``.  The moment sums fold
  as HIERARCHICAL DETERMINISTIC SUMS — an ordered running fold inside
  each of ``n_fold_buckets`` doc-id buckets (bucket-parallel), then an
  ordered fold over the bounded bucket partials — so the fold order is
  identical on every engine and every partition layout, without a
  corpus-sized single-partition window.  The (D+1)x(D+1) solve is
  plain Gauss-Jordan elimination WITHOUT pivoting (ridge keeps the
  matrix well-conditioned), implemented in pure Python here and as a
  ``list_reduce`` fold over pivot indices in the DuckDB oracle — the
  same operations in the same order, so the coefficient path is
  reproducible to the last ulp of ``exp``.
* **Driver state**: one bounded collect per iteration (the 1-row
  moment vector — the HRP/IVF bounded-collect pattern); the corpus
  never leaves the cluster.

At 100 TB: the feature pass is one scan + one hash aggregate per
doc-id bucket; each IRLS iteration is one corpus pass (T=3 by
default).  The 64-way bucket fold bounds the sequential tail at
~n_docs/64 per task; raise ``n_fold_buckets`` for wider clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import persist_tracked

__all__ = ["quality_classifier"]


def _sigmoid(dot):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))


def _gauss_jordan(m: list) -> list:
    """In-place Gauss-Jordan WITHOUT row pivoting on an n x (n+1)
    augmented matrix; returns the solution column.  The exact operation
    order (normalize pivot row by division, then ``a - factor * b``
    against the normalized row) is mirrored term-for-term by the SQL
    oracle's list_reduce fold."""
    n = len(m)
    for col in range(n):
        piv = m[col][col]
        m[col] = [v / piv for v in m[col]]
        for r in range(n):
            if r != col:
                factor = m[r][col]
                m[r] = [a - factor * b for a, b in zip(m[r], m[col])]
    return [m[r][n] for r in range(n)]


def quality_classifier(
    documents: DataFrame,
    *,
    n_buckets: int = 6,
    n_iters: int = 3,
    ridge: float = 1e-3,
    min_quality: float = 0.5,
    n_fold_buckets: int = 64,
    salt: str = "qc|",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the IRLS logistic quality model and score every document.

    Returns one row per document: ``doc_id, label`` (the heuristic
    gate's 0/1 target), ``score`` (the model's probability), ``pred``
    (``score >= 0.5``) — the classifier column a ``corpus_filter``
    chain consumes as its learned quality gate.
    """
    from polars_trading_spark.functions.text import (
        _profile_staged,
        portable_hash60,
    )

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    d = int(n_buckets)
    n = d + 1  # + bias

    # Round 15 (guide §2.4/§1.2): the feature pass previously ran TWO
    # corpus branches — text_profile for the label, and a separate
    # tokenize → explode → md5 → hash-aggregate branch for the bucket
    # counts — joined back on the doc id (tokenizer paid twice, plus an
    # aggregate exchange and a join).  The label is now computed in the
    # SAME staged projection that carries the token array (the shared
    # ``_profile_staged`` expressions — bit-identical quality_score),
    # carried through the explode, and folded into the one aggregate
    # with ``first()`` (constant within each doc group).  One scan, one
    # tokenizer pass, zero joins; the aggregate rides the scan's
    # doc-id partitioning where one exists.
    staged, prof_exprs = _profile_staged(
        documents, text_col=text_col, keep=(id_col,)
    )
    label = (prof_exprs["quality_score"] >= float(min_quality)).cast("double")
    bucket = F.pmod(
        portable_hash60(F.concat(F.lit(salt), F.col("__tok"))), F.lit(d)
    )
    # Round 14 (guide §4.1 "prefer built-ins", §1.2 per-task work): the
    # md5-based token hash is STAGED as a column below the aggregate —
    # inlined into the d per-bucket sums it was evaluated d times per
    # token (measured ~2.5× on the feature-materialization stage).
    # The Generate (explode) barrier pins the staging projection, so
    # each token pays exactly one md5.  Values are identical: the same
    # bucket feeds the same comparisons.
    ex = staged.select(
        F.col(id_col),
        label.alias("__y"),
        F.explode_outer(F.col("__toks")).alias("__tok"),
    ).select(id_col, "__y", "__tok", bucket.alias("__bkt"))
    counts = ex.groupBy(id_col).agg(
        F.first("__y").alias("__y"),
        F.count("__tok").cast("double").alias("__nt"),
        *[
            # coalesce: an all-NULL group (empty document kept by the
            # outer explode) must count 0, not NULL
            F.coalesce(F.sum((F.col("__bkt") == k).cast("long")), F.lit(0))
            .cast("double")
            .alias(f"__c{k}")
            for k in range(d)
        ],
    )
    safe_nt = F.when(F.col("__nt") > 0, F.col("__nt")).otherwise(F.lit(1.0))
    feats = counts.select(
        id_col,
        "__y",
        *[(F.col(f"__c{k}") / safe_nt).alias(f"__f{k}") for k in range(d)],
        F.pmod(F.col(id_col), F.lit(int(n_fold_buckets))).alias("__fb"),
    )
    # Round 15 (guide §2.4 "two operations keyed the same way share one
    # exchange"): every IRLS iteration's stage-1 window re-shuffled and
    # re-sorted the cached feats by (__fb, id).  Partition + sort ONCE
    # before the persist — the cached layout then satisfies the window's
    # required distribution and ordering, so iterations 2..T and the
    # final scoring pass run exchange-free off the cache.  Values are
    # unchanged: the window's logical (partition, order) spec — not the
    # physical layout — defines every fold order.
    feats = feats.repartition("__fb").sortWithinPartitions("__fb", id_col)
    feats = persist_tracked(feats)  # consumed n_iters + 1 times

    def xvec():
        return [F.lit(1.0)] + [F.col(f"__f{k}") for k in range(d)]

    def dot_expr(beta: list):
        # fixed left-associated order, mirrored by the oracle
        expr = F.lit(beta[0])
        for k in range(d):
            expr = expr + F.col(f"__f{k}") * F.lit(beta[k + 1])
        return expr

    def folded_moments(beta: list) -> list:
        """One corpus pass: hierarchical ordered folds of the 35 moment
        sums; returns [A_ij upper triangle row-major..., b_i...]."""
        p = _sigmoid(dot_expr(beta))
        w = p * (F.lit(1.0) - p)
        r = F.col("__y") - p
        xs = xvec()
        terms = []
        names = []
        for i in range(n):
            for j in range(i, n):
                terms.append(w * xs[i] * xs[j])
                names.append(f"__a_{i}_{j}")
        for i in range(n):
            terms.append(r * xs[i])
            names.append(f"__b_{i}")
        w1 = Window.partitionBy("__fb").orderBy(id_col)
        run1 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        stage1 = feats.select(
            "__fb",
            F.row_number().over(w1).alias("__rn"),
            F.count(F.lit(1)).over(Window.partitionBy("__fb")).alias("__n"),
            *[F.sum(t).over(run1).alias(nm) for t, nm in zip(terms, names)],
        ).where(F.col("__rn") == F.col("__n"))
        # Stage 2 — the ordered fold over the bounded bucket partials —
        # runs on the DRIVER (round 14): collecting n_fold_buckets rows
        # (64 × 35 doubles) is as bounded as the 1-row collect was, and
        # it removes one shuffle + global-window stage per IRLS
        # iteration (guide §1.2: stage-count overhead dominated the
        # per-iteration cost at bench scale).  The Python left fold in
        # ``__fb`` order performs the IDENTICAL IEEE additions the
        # window's running sum performed, so the coefficient path is
        # unchanged to the last ulp.
        rows = sorted(stage1.collect(), key=lambda r: r["__fb"])
        out = []
        for nm in names:
            acc = 0.0
            for r in rows:
                acc += r[nm]
            out.append(acc)
        return out

    beta = [0.0] * n
    for _ in range(int(n_iters)):
        vals = folded_moments(beta)
        a = [[0.0] * n for _ in range(n)]
        idx = 0
        for i in range(n):
            for j in range(i, n):
                a[i][j] = a[j][i] = vals[idx]
                idx += 1
        b = vals[idx : idx + n]
        for i in range(n):
            a[i][i] += float(ridge)
        aug = [a[i] + [b[i]] for i in range(n)]
        delta = _gauss_jordan(aug)
        beta = [bi + di for bi, di in zip(beta, delta)]

    score = _sigmoid(dot_expr(beta))
    return feats.select(
        F.col(id_col),
        F.col("__y").cast("int").alias("label"),
        score.alias("score"),
        (score >= 0.5).alias("pred"),
    )
