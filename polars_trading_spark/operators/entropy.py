"""Entropy features over return-sign sequences (AFML ch.18).

AFML 18.4 uses the entropy rate of the discretized return series as a
market-efficiency / information feature: encode each return as a symbol
(up / flat / down), slice the symbol stream into words of length ``w``,
and estimate the Shannon entropy of the word distribution over a block
(the **plug-in / maximum-likelihood estimator**, AFML 18.3.1).  Low
entropy = predictable flow (trends, stuck quotes); high entropy =
informationally efficient.

Spark-first shape: the symbol encoding and the word construction are a
``lag`` chain inside one (symbol)-partitioned window pass; block
assignment is closed-form row-number arithmetic; the word histogram and
the entropy reduction are two hash aggregates (map-side partial).  No
UDFs, no Python, two shuffles total — and the second one is over
(symbol, block, word) cardinality, already tiny.

``lz_entropy`` below adds the sequential Kontoyiannis match-length
estimator as an O(n*window) vectorized applyInPandas island — the
plug-in estimator remains the zero-Python default feature at scale.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL, with_seq

__all__ = ["lz_entropy", "permutation_entropy", "return_entropy"]


def return_entropy(
    df: DataFrame,
    *,
    word_len: int = 2,
    block: int = 50,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
) -> DataFrame:
    """Plug-in Shannon entropy of return-sign words over tumbling blocks.

    Each row's return sign (vs the previous price) becomes a symbol in
    ``{d, f, u}``; a *word* is the concatenation of the last
    ``word_len`` symbols; every ``block`` consecutive words per market
    symbol form one tumbling block.  Returns one row per (symbol, block):
    ``symbol, ts_event_start, ts_event_end, n_words, entropy,
    entropy_rate`` with ``entropy`` in bits (rounded 6dp) and
    ``entropy_rate = entropy / word_len`` in bits/symbol.  The final
    partial block per symbol is emitted (its ``n_words < block``).
    """
    if word_len < 1:
        raise ValueError(f"word_len must be >= 1, got {word_len}")
    if block < 1:
        raise ValueError(f"block must be >= 1, got {block}")

    # seq tiebreak: real tick data carries duplicate timestamps per
    # symbol, and an orderBy(ts) alone would make the lag chain (hence
    # the words) nondeterministic — same (ts, seq) ordering as the bar
    # operators and the DuckDB oracle's ORDER BY ts_event, seq.
    df = with_seq(df)
    order = Window.partitionBy(symbol_col).orderBy(ts_col, SEQ_COL)
    p = F.col(price_col)
    ret = p - F.lag(p).over(order)
    sign = F.when(ret > 0, "u").when(ret < 0, "d").when(ret.isNotNull(), "f")

    df = df.withColumn("__s", sign)
    parts = [F.lag("__s", k).over(order) for k in range(word_len - 1, 0, -1)] + [F.col("__s")]
    word = F.concat(*parts)  # null unless all word_len symbols exist
    df = df.withColumn("__word", word).where(F.col("__word").isNotNull())

    rn = F.row_number().over(Window.partitionBy(symbol_col).orderBy(ts_col, SEQ_COL)) - 1
    df = df.withColumn("__block", F.floor(rn / block).cast("long"))

    counts = df.groupBy(symbol_col, "__block", "__word").agg(
        F.count(F.lit(1)).alias("__c"),
        F.min(ts_col).alias("__wmin"),
        F.max(ts_col).alias("__wmax"),
    )
    tot = F.sum("__c")
    plogp = F.sum(F.col("__c") * F.log2("__c"))  # sum c*log2 c; H derived below
    out = counts.groupBy(symbol_col, "__block").agg(
        F.min("__wmin").alias("ts_event_start"),
        F.max("__wmax").alias("ts_event_end"),
        tot.cast("long").alias("n_words"),
        # H = log2(N) - (1/N) * sum(c * log2 c)  — single-pass form
        (F.log2(tot) - plogp / tot).alias("__h"),
    )
    return out.select(
        symbol_col,
        "ts_event_start",
        "ts_event_end",
        "n_words",
        F.round("__h", 6).alias("entropy"),
        F.round(F.col("__h") / word_len, 6).alias("entropy_rate"),
    )


def lz_entropy(
    df: DataFrame,
    *,
    window: int = 50,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
) -> DataFrame:
    """Kontoyiannis sliding-window match-length entropy estimator over
    the binary return-sign sequence (Kontoyiannis et al. 1998; AFML
    18.4) — the sequential counterpart the plug-in ``return_entropy``
    docstring defers to.

    Each return becomes a bit (``1`` if the price rose, else ``0``).
    For every position ``i`` with a full ``window``-bit history, the
    match length ``L_i = 1 + max_j LCP`` is the longest prefix of the
    sequence starting at ``i`` that reappears starting inside the
    trailing window (the *non-overlapping* variant: a candidate match is
    truncated at ``i``, so it lies fully in the past).  The entropy-rate
    estimate at ``t`` is the Kontoyiannis ratio over all scored
    positions so far:

        H_t = log2(window) * N_t / sum(L_i, i <= t)   [bits/symbol]

    Random sequences give ``H ≈ 1``; repetitive (predictable) flow pulls
    ``H`` toward 0.

    Spark-first shape: one slim ``applyInPandas`` island per symbol.
    The kernel is **O(n·window)** vectorized numpy, not the naive
    O(n²) suffix scan: for each offset ``j`` the LCP is a forward run
    length of the elementwise equality ``bits[i] == bits[i-j]``, and all
    run lengths for one offset come from a single reverse scan.  State
    is O(window) per group; the running ratio uses exact integer sums,
    so results are bit-reproducible across engines and chunk orders.

    Returns ``symbol, ts, lz_match_len, lz_entropy`` (null until the
    first scored position; the first row of each symbol carries no
    return and is dropped).
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    w = int(window)
    log2w = math.log2(w)

    slim = with_seq(df).select(symbol_col, ts_col, SEQ_COL, F.col(price_col).cast("double").alias("__p"))
    schema = (
        f"{symbol_col} string, {ts_col} timestamp, "
        "lz_match_len int, lz_entropy double"
    )
    ts_name, sym_name = ts_col, symbol_col

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_name, SEQ_COL], kind="mergesort").reset_index(drop=True)
        p = pdf["__p"].to_numpy(dtype=np.float64)
        if len(p) < 2:
            return pd.DataFrame(columns=[sym_name, ts_name, "lz_match_len", "lz_entropy"])
        bits = (np.diff(p) > 0).astype(np.int8)
        n = len(bits)
        best = np.zeros(n, dtype=np.int64)
        idx = np.arange(n)
        for j in range(1, min(w, n) + 1):
            eq = np.zeros(n, dtype=bool)
            eq[j:] = bits[j:] == bits[:-j]
            # Forward run length of consecutive equality starting at i:
            # distance to the next False at or after i.
            false_pos = np.flatnonzero(~eq)
            nxt = np.full(n, n, dtype=np.int64)
            if len(false_pos):
                ins = np.searchsorted(false_pos, idx, side="left")
                valid = ins < len(false_pos)
                nxt[valid] = false_pos[ins[valid]]
            run = nxt - idx
            # Truncate the candidate at i (non-overlapping): the source
            # starts at i-j, so at most j symbols lie strictly before i.
            np.maximum(best, np.minimum(run, j), out=best)
        L = np.where(idx >= w, 1 + best, 0)
        scored = idx >= w
        cnt = np.cumsum(scored)
        sl = np.cumsum(np.where(scored, L, 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            h = np.where(cnt > 0, log2w * cnt / np.where(sl > 0, sl, 1), np.nan)
        out = pd.DataFrame(
            {
                sym_name: pdf[sym_name].to_numpy()[1:],
                ts_name: pdf[ts_name].to_numpy()[1:],
                "lz_match_len": pd.array(np.where(scored, L, -1), dtype="Int64"),
                "lz_entropy": h,
            }
        )
        out.loc[out["lz_match_len"] < 0, "lz_match_len"] = pd.NA
        out["lz_match_len"] = out["lz_match_len"].astype("Int32")
        return out

    return slim.groupBy(symbol_col).applyInPandas(kernel, schema=schema)


def permutation_entropy(
    df: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
    seq_col: str | None = None,
) -> DataFrame:
    """Normalized permutation entropy (Bandt & Pompe 2002, m=3) of the
    per-symbol price path — a complexity measure on ORDINAL patterns,
    invariant under any monotone transform of price (so price vs
    log-price is irrelevant by construction).

    Each overlapping triple ``(x_t, x_{t+1}, x_{t+2})`` maps to one of
    six ordinal patterns; ties rank the EARLIER index lower (stable
    ranking — the standard convention).  Output per symbol:
    ``n_windows``, ``perm_entropy`` = -sum p ln p / ln 6  in [0, 1]
    (1 = maximally irregular walk, near-0 = strongly trended), and
    ``top_pattern_share`` (concentration of the modal pattern).

    Distributed shape: the pattern label is three strict comparisons
    folded into an integer (pure codegen), counting is one hash
    aggregate on (symbol, pattern), and the entropy reduce folds the
    <=6 per-symbol pattern rows as a PATTERN-ORDERED running sum read
    off the last row — engine-independent fold order, same trick as
    zipf_fit.  One exchange, zero Python.
    """
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(symbol_col).orderBy(*order)
    a = F.col(price_col)
    b = F.lead(price_col, 1).over(w)
    c = F.lead(price_col, 2).over(w)
    # stable ordinal code: 3 strict comparisons (ties keep index order);
    # transitivity leaves 6 of the 8 codes reachable
    code = (
        F.when(b < a, 4).otherwise(0)
        + F.when(c < a, 2).otherwise(0)
        + F.when(c < b, 1).otherwise(0)
    )
    cnt = (
        df.withColumn("__code", F.when(c.isNotNull(), code))
        .where(F.col("__code").isNotNull())
        .groupBy(symbol_col, "__code")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w_code = Window.partitionBy(symbol_col).orderBy("__code")
    run = w_code.rowsBetween(Window.unboundedPreceding, 0)
    full = w_code.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = F.col("__n").cast("double") / F.col("__tot").cast("double")
    staged = (
        cnt.withColumn("__rn", F.row_number().over(w_code))
        .withColumn("__k", F.count(F.lit(1)).over(full))
        .withColumn("__tot", F.sum("__n").over(full))
        .withColumn("__mx", F.max("__n").over(full))
        # staged __tot: a window result cannot nest inside the next
        # window aggregate (same restriction in both engines)
        .withColumn("__h", F.sum(-(p * F.log(p))).over(run))
        .where(F.col("__rn") == F.col("__k"))
    )
    import math

    return staged.select(
        symbol_col,
        F.col("__tot").alias("n_windows"),
        (F.col("__h") / math.log(6.0)).alias("perm_entropy"),
        (F.col("__mx").cast("double") / F.col("__tot").cast("double")).alias(
            "top_pattern_share"
        ),
    )
