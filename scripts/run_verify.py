"""Driver-contract replica: run every queries() entry against its
DuckDB oracle the way the grading driver does (vanilla session, sorted
columns, round-9 floats, string-keyed row sort).  Exit 1 on any
mismatch.  Usage: python scripts/run_verify.py [sf_dir]"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as e  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    print("ENTRY rows:", e.entry(spark).count())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    key = lambda row: tuple((v is None, str(v)) for v in row)  # noqa: E731
    qs, osql = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        sdf = fn(spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in osql:
            print(f"{name}: rows-only, {len(srows)} rows")
            continue
        res = con.sql(osql[name])
        ocols, orows = list(res.columns), res.fetchall()
        scols = list(sdf.columns)
        sn = sorted(
            (
                tuple(
                    norm(r[i])
                    for i in sorted(range(len(scols)), key=lambda i: scols[i])
                )
                for r in srows
            ),
            key=key,
        )
        on = sorted(
            (
                tuple(
                    norm(r[i])
                    for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                )
                for r in orows
            ),
            key=key,
        )
        ok = sorted(scols) == sorted(ocols) and sn == on
        if not ok:
            print(
                f"{name}: spark={len(srows)} oracle={len(orows)} "
                f"cols={sorted(scols) == sorted(ocols)} values={sn == on}"
            )
            fails.append(name)
    print("TOTAL", len(qs))
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
