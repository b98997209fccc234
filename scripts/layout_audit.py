"""Layout-invariance audit: replay queries under a different shuffle
layout and hash the full row set — the vwap_slippage lesson (a query
can pass one layout and hash-mismatch under the driver's).

Usage:
    python scripts/layout_audit.py <sf_dir> <query> [query ...]

Runs each query TWICE in separate subprocesses (PTS_SHUFFLE_PARTITIONS
7 vs 32 — session confs are JVM-wide, so each layout gets a fresh JVM)
and compares the md5 of the column-name-sorted, row-sorted, round-9
normalized row set, i.e. the driver's own comparison recipe.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import subprocess
import sys

_CHILD = r"""
import json, hashlib, math, os, sys
sys.path.insert(0, {repo!r})
from datetime import datetime, date
from polars_trading_spark.session import get_spark
from polars_trading_spark.registry import QUERIES
from polars_trading_spark import release_persisted

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

spark = get_spark("layout-audit")
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for name in {names!r}:
    df = QUERIES[name].spark(spark, {sf!r})
    cols = sorted(df.columns)
    rows = sorted(
        tuple(norm(r[c]) for c in cols) for r in df.collect()
    )
    h = hashlib.md5(json.dumps(rows).encode()).hexdigest()
    out[name] = (len(rows), h)
    release_persisted()
print("AUDIT_JSON:" + json.dumps(out))
"""


def run(sf: str, names: list[str], partitions: str) -> dict:
    env = dict(os.environ, PTS_SHUFFLE_PARTITIONS=partitions)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD.format(repo=repo, names=names, sf=sf)
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    for line in res.stdout.splitlines():
        if line.startswith("AUDIT_JSON:"):
            return json.loads(line[len("AUDIT_JSON:"):])
    raise RuntimeError(f"no audit output (stderr tail: {res.stderr[-2000:]})")


def main() -> None:
    sf = sys.argv[1]
    names = sys.argv[2:]
    a = run(sf, names, "7")
    b = run(sf, names, "32")
    bad = []
    for n in names:
        same = a[n] == b[n]
        print(f"{n}: rows={a[n][0]} p7={a[n][1][:12]} p32={b[n][1][:12]} "
              f"{'OK' if same else 'LAYOUT-SENSITIVE'}")
        if not same:
            bad.append(n)
    print("LAYOUT-SENSITIVE:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
