"""Isolated fresh-JVM re-measure of named bench queries.

The full bench run's timings co-move with session/JVM state (SCALING.md
§36/§47): a late-session full run can show a whole query family 2x up
while its own sentinel shows the machine drifted, not the plans.  The
adjudication protocol is therefore: when the full-run bench disagrees
with the drift sentinel, re-measure each flagged query in a FRESH JVM
and judge against the per-query [min, max] spread history — which is
exactly what this script does.

Usage::

    python scripts/remeasure.py dedup_clusters corpus_filter semdedup
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/remeasure.py ...

Each named query runs in its OWN subprocess (one cold SparkSession per
query — no heap/codegen-cache carry-over between measurements), with
``SPARK_GRAFT_BENCH_REPEATS`` timed repeats (default 3) after one
untimed warm-up, materialized through the same ``noop`` sink as
bench.py.  Prints one JSON line per query and a final summary block
ready to paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD_FLAG = "--_child"


def _child(name: str) -> None:
    """Run inside the fresh JVM: time one query, print one JSON line."""
    import statistics
    import time

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from polars_trading_spark.registry import QUERIES
    from polars_trading_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spark = get_spark()
    q = QUERIES[name]
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    print(
        "REMEASURE "
        + json.dumps(
            {
                "query": name,
                "median": round(statistics.median(times), 3),
                "min": round(min(times), 3),
                "max": round(max(times), 3),
                "repeats": repeats,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


def main() -> None:
    if _CHILD_FLAG in sys.argv:
        _child(sys.argv[sys.argv.index(_CHILD_FLAG) + 1])
        return
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print(__doc__)
        sys.exit(2)
    results = []
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), _CHILD_FLAG, name],
            capture_output=True,
            text=True,
            env=os.environ.copy(),
        )
        line = next(
            (
                ln[len("REMEASURE ") :]
                for ln in proc.stdout.splitlines()
                if ln.startswith("REMEASURE ")
            ),
            None,
        )
        if proc.returncode != 0 or line is None:
            print(f"# {name}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            results.append({"query": name, "error": True})
            continue
        rec = json.loads(line)
        results.append(rec)
        print(
            f"# {name}: median {rec['median']}s "
            f"[{rec['min']}, {rec['max']}] (fresh JVM, {rec['repeats']} reps)"
        )
    print(json.dumps({"remeasure": results}))


if __name__ == "__main__":
    main()
