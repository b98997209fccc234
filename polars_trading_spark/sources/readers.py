"""Format readers for trades tables: Parquet, CSV, JSON(L).

The reference delegates all I/O to its host engine (SURVEY §2.B-B1);
these wrappers are ours, enforcing the trades schema up front so every
format lands with identical types and the operators never see
schema-on-read surprises.  Explicit schemas also matter at scale: CSV/
JSON inference requires an extra full pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from polars_trading_spark.config import column_names

__all__ = ["trades_schema", "read_trades", "documents_schema", "read_documents"]


def trades_schema() -> T.StructType:
    """The trades contract under the currently-configured column names."""
    return T.StructType(
        [
            T.StructField(column_names.timestamp, T.TimestampType()),
            T.StructField(column_names.price, T.DoubleType()),
            T.StructField(column_names.size, T.LongType()),
            T.StructField(column_names.symbol, T.StringType()),
        ]
    )


def read_trades(spark: SparkSession, path: str, *, format: str = "parquet", **options) -> DataFrame:
    """Read a trades table with the enforced schema.

    ``format``: parquet | csv | json.  CSV defaults to header=true;
    timestamps must be ISO-8601 (override with ``timestampFormat``).
    """
    fmt = format.lower()
    if fmt == "parquet":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Untagged µs parquet timestamps infer as TIMESTAMP_NTZ on Spark 4;
        # normalize to TIMESTAMP so operators see one timestamp type.
        ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
        if ntz:
            from pyspark.sql import functions as F

            df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
        return df
    if fmt == "csv":
        options.setdefault("header", "true")
        return spark.read.options(**options).schema(trades_schema()).csv(path)
    if fmt in ("json", "jsonl"):
        return spark.read.options(**options).schema(trades_schema()).json(path)
    raise ValueError(f"unsupported format {format!r} (parquet|csv|json)")


def documents_schema() -> T.StructType:
    """The documents-table contract (matches the testdata corpus)."""
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )


def read_documents(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Read a documents corpus: Parquet or JSONL (the LLM-corpus
    interchange format — one JSON object per line, optionally
    ``.gz``/``.zst``-compressed per file, which Spark decodes from the
    extension).

    The schema is always explicit (``documents_schema()`` by default):
    JSON inference costs a full extra pass over the corpus and can
    silently widen types between runs — at 100 TB both are outages, not
    conveniences.  Extra keys in the JSON objects are ignored; missing
    keys land null.  Pass ``multiLine=False`` semantics only (JSONL),
    so files split by line and parallelism follows file count × block
    size rather than one task per file.
    """
    fmt = format.lower()
    sch = schema if schema is not None else documents_schema()
    if fmt == "parquet":
        return spark.read.options(**options).schema(sch).parquet(path)
    if fmt in ("json", "jsonl"):
        return spark.read.options(**options).schema(sch).json(path)
    raise ValueError(f"unsupported format {format!r} (parquet|json)")
