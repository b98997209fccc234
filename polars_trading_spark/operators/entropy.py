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

The sequential alternatives (Lempel-Ziv / Kontoyiannis match-length
estimators) are deliberately not here: they need an O(n^2) suffix scan
per block and belong in an applyInPandas island if ever needed; the
plug-in estimator is the standard feature at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL, with_seq

__all__ = ["return_entropy"]


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
