"""Differential-compare helpers: Spark result vs DuckDB oracle.

Replicates the driver's t2 gate locally: run the registry's Spark query
and its oracle SQL over the same sf dir, sort columns by name, compare
row multisets (floats to a tolerance, timestamps at µs).
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from polars_trading_spark.sources.tables import TABLES


def duckdb_oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    res = con.sql(sql)
    cols = list(res.columns)
    rows = res.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalars
        return _norm_cell(v.item())
    return v


def _row_sort_key(row):
    return tuple((v is None, str(v)) for v in row)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    return sorted(normed, key=_row_sort_key), [cols[i] for i in order]


def assert_driver_sortable_schema(query, sdf):
    """Registry gate-shape guard: the driver canonicalizer sorts EVERY
    output column through pandas ``sort_values``, which raises
    ``TypeError: unhashable type`` on list/dict cells (round-10's
    ``bpe_encode`` red row).  No registered query may emit a top-level
    Array/Map/Struct column — project arrays to exploded rows or an
    order-sensitive fold checksum before registering.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{query.name}: driver-unsortable top-level columns {bad} — the "
        "correctness gate canonicalizes via pandas sort_values, which "
        "cannot sort complex cells; register a scalar projection "
        "(explode, or an order-sensitive checksum) instead"
    )


def assert_query_matches_oracle(spark, query, sf_dir: str):
    sdf = query.spark(spark, sf_dir)
    assert_driver_sortable_schema(query, sdf)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows = duckdb_oracle(sf_dir, query.oracle)

    assert sorted(s_cols) == sorted(o_cols), (
        f"{query.name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{query.name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_norm, cols = _normalize(s_cols, s_rows)
    o_norm, _ = _normalize(o_cols, o_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, o_norm)) if not _rows_close(a, b)
    ]
    assert not mismatches, (
        f"{query.name}: {len(mismatches)} mismatching rows (cols={cols}); "
        f"first: spark={mismatches[0][1]} oracle={mismatches[0][2]}"
    )


def _rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True
