"""Relative Strength Index (Wilder 1978) on an unbounded tape.

RSI compares exponentially-smoothed gains and losses:

    RSI_t = 100 * S_up(t) / (S_up(t) + S_down(t))

where ``S_up``/``S_down`` are exponentially-weighted sums (smoothing
factor ``alpha = 1/period``, Wilder's constant) of the positive /
negative parts of the one-step price change.  Because both sides share
the same weight normalizer, it cancels in the ratio — the operator
needs only the two weighted sums, never the weight total.

Weighting follows the ``adjust=True`` EWM convention (weights
``d^(t-i)``, no seed-average warmup) — the same convention as
``operators/ewm.py`` and pandas' default; Wilder's original SMA-seeded
recursion converges to it geometrically and differs only in the first
few multiples of ``period``.

Distributed shape — the segment-renormalization trick (operators/
ewm.py, operators/hawkes.py): the closed form ``d^t * running_sum(x_i
/ d^i)`` overflows float64 once ``t`` is large, so the per-symbol diff
index ``t`` is cut into chunks of ``L = 32 * period`` rows (local
exponent bounded by ``(1/d)^L ~ e^32``); within-chunk history is a
running window sum, the previous two chunks enter via their totals
damped by ``d^L = e^-32`` and ``d^2L = e^-64``, and older chunks carry
weight below e^-96 — invisible in double, so the truncation is
exact-in-double for any tape length.  One exchange on the symbol key,
every window reuses it, zero joins, zero Python.

Reference scope: the reference repo has no RSI; this extends the
signal family (SURVEY.md §2-ext) with the standard momentum oscillator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rsi"]

_CARRIED = 2  # prior chunks carried; dropped relative weight <= e^-96


def rsi(
    df: DataFrame,
    *,
    period: int = 14,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event",
    price_col: str = "price",
    seq_col: str | None = None,
    output_col: str = "rsi",
) -> DataFrame:
    """Append ``output_col``: Wilder RSI of ``price_col`` per symbol.

    The first row of each symbol (no price change yet) and rows inside
    an all-flat history (every smoothed gain AND loss exactly zero)
    yield null.  Rows are ordered by (``ts_col``[, ``seq_col``]).
    """
    if period < 2:
        # period=1 gives alpha=1, d=0: the decay-weight base 1/d blows
        # up and the memoryless limit is not representable in this form
        raise ValueError(f"period must be >= 2, got {period}")

    alpha = 1.0 / period
    d = 1.0 - alpha
    r = 1.0 / d
    chunk_len = 32 * period

    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w_ord = Window.partitionBy(symbol_col).orderBy(*order)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)

    diff = F.col(price_col) - F.lag(price_col).over(w_ord)
    staged = (
        df.withColumn("__diff", diff)
        .withColumn("__up", F.when(F.col("__diff") > 0, F.col("__diff")).otherwise(F.lit(0.0)))
        .withColumn("__dn", F.when(F.col("__diff") < 0, -F.col("__diff")).otherwise(F.lit(0.0)))
        # diff index over rows that HAVE a diff; first row gets -1
        .withColumn("__t", F.count("__diff").over(w_run) - 1)
        .withColumn("__k", F.floor(F.col("__t") / chunk_len))
        .withColumn("__j", (F.col("__t") - F.col("__k") * chunk_len).cast("double"))
    )

    rj = F.when(
        F.col("__diff").isNotNull(), F.pow(F.lit(r), F.col("__j"))
    )
    w_chunk = (
        Window.partitionBy(symbol_col, "__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_chunk_tot = Window.partitionBy(symbol_col, "__k")
    staged = (
        staged.withColumn("__u_loc", F.sum(rj * F.col("__up")).over(w_chunk))
        .withColumn("__d_loc", F.sum(rj * F.col("__dn")).over(w_chunk))
        .withColumn("__u_tot", F.sum(rj * F.col("__up")).over(w_chunk_tot))
        .withColumn("__d_tot", F.sum(rj * F.col("__dn")).over(w_chunk_tot))
    )

    w_k = Window.partitionBy(symbol_col).orderBy("__k")
    carry_u = sum(
        (
            F.coalesce(F.max("__u_tot").over(w_k.rangeBetween(-l, -l)), F.lit(0.0))
            * (d ** (l * chunk_len))
            for l in range(1, _CARRIED + 1)
        ),
        F.lit(0.0),
    )
    carry_d = sum(
        (
            F.coalesce(F.max("__d_tot").over(w_k.rangeBetween(-l, -l)), F.lit(0.0))
            * (d ** (l * chunk_len))
            for l in range(1, _CARRIED + 1)
        ),
        F.lit(0.0),
    )

    dj = F.pow(F.lit(d), F.col("__j"))
    s_up = dj * (F.col("__u_loc") + carry_u)
    s_dn = dj * (F.col("__d_loc") + carry_d)
    val = F.when(
        F.col("__diff").isNull() | ((s_up + s_dn) <= 0), F.lit(None)
    ).otherwise(F.lit(100.0) * s_up / (s_up + s_dn))
    return staged.withColumn(output_col, val).drop(
        "__diff", "__up", "__dn", "__t", "__k", "__j",
        "__u_loc", "__d_loc", "__u_tot", "__d_tot",
    )
