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

__all__ = ["trades_schema", "read_trades"]


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
