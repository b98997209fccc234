"""Exponentially-weighted moving statistics.

Spark has no native EWM (reference uses Polars ``ewm_std``,
polars_trading/labels/dynamic_labels.py:64-71).  Two implementations:

* ``method="pandas"`` (default): one ``applyInPandas`` pass per group
  running ``Series.ewm(span).std()`` — bit-compatible with the pandas /
  AFML oracle (adjust=True, bias=False, ignore_na=False), O(n)
  incremental state, any series length.  This is the scale path: state
  is per-symbol and symbols partition the data.
* ``method="native"``: closed-form via cumulative sums, entirely inside
  codegen.  With α = 2/(span+1), r = 1/(1-α) and per-group row index t:

      A_t = Σ x_i r^i      B_t = Σ r^i
      C_t = Σ x_i² r^i     D_t = Σ r^{2i}
      mean_t = A/B
      var_t  = (C/B - mean²) · B²/(B² - D)     (bias-corrected)

  ``r^t`` overflows float64 around t ≈ 35 000·(span/100), so this mode
  is only valid for bounded per-group series (we raise the documented
  limit); it exists because it keeps the whole plan in whole-stage
  codegen and is the formulation the DuckDB oracle uses.

Null handling: null inputs yield null output and do not advance the
weighting (only non-null rows get a row index) — equivalent to pandas
over a leading-null series; interior nulls follow ignore_na=True
semantics in native mode and ignore_na=False in pandas mode (document
at call sites; the engine's daily_vol produces leading nulls only).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ewm_std"]


def ewm_std(
    df: DataFrame,
    value_col: str,
    span: int,
    *,
    by: Sequence[str] = (),
    order_by: Sequence[str] = (),
    output_col: str = "ewm_std",
    method: str = "pandas",
) -> DataFrame:
    """Append bias-corrected exponentially-weighted std of ``value_col``."""
    if method == "native":
        return _ewm_std_native(df, value_col, span, by=by, order_by=order_by, output_col=output_col)
    if method != "pandas":
        raise ValueError(f"unknown method {method!r}")

    drop = []
    if not by:
        df = df.withColumn("__pts_one", F.lit(1))
        by = ["__pts_one"]
        drop = ["__pts_one"]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(output_col, T.DoubleType())]
    )
    order_cols = list(order_by)

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        std = pdf[value_col].ewm(span=span).std()
        pdf[output_col] = std.where(np.isfinite(std), None)
        return pdf

    out = df.groupBy(*by).applyInPandas(compute, schema=out_schema)
    return out.drop(*drop) if drop else out


def _ewm_std_native(
    df: DataFrame,
    value_col: str,
    span: int,
    *,
    by: Sequence[str] = (),
    order_by: Sequence[str] = (),
    output_col: str = "ewm_std",
) -> DataFrame:
    alpha = 2.0 / (span + 1.0)
    r = 1.0 / (1.0 - alpha)
    x = F.col(value_col)
    part = list(by) or [F.lit(1)]
    w_rank = Window.partitionBy(*part).orderBy(*order_by)
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # Row index over non-null values only.
    t = (F.count(F.when(x.isNotNull(), 1)).over(w_cum) - 1).cast("double")
    rt = F.when(x.isNotNull(), F.pow(F.lit(r), t))
    out = (
        df.withColumn("__t", t)
        .withColumn("__A", F.sum(rt * x).over(w_cum))
        .withColumn("__B", F.sum(rt).over(w_cum))
        .withColumn("__C", F.sum(rt * x * x).over(w_cum))
        .withColumn("__D", F.sum(F.when(x.isNotNull(), F.pow(F.lit(r * r), t))).over(w_cum))
    )
    mean = F.col("__A") / F.col("__B")
    b2 = F.col("__B") * F.col("__B")
    var = (F.col("__C") / F.col("__B") - mean * mean) * (b2 / (b2 - F.col("__D")))
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        out.withColumn(
            output_col,
            F.when(x.isNull() | (F.col("__t") < 1), F.lit(None)).otherwise(std),
        )
        .drop("__t", "__A", "__B", "__C", "__D")
    )
