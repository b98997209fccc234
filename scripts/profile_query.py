"""Per-query profiler: wall time + per-stage metrics + formatted plan.

Runs a named registry query with the Spark UI enabled, times warm
repeats through the noop sink, then pulls stage-level metrics (executor
run time, shuffle read/write bytes, python-eval presence) from the UI
REST API so optimization targets the stage that actually costs time
(guide §1.1/§7.1).

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python scripts/profile_query.py sadf_adf1 [more ...] [--plan-dir plans/r14]

Dev tool only — not part of the bench contract.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    plan_dir = None
    if "--plan-dir" in sys.argv:
        plan_dir = sys.argv[sys.argv.index("--plan-dir") + 1]
        names = [n for n in names if n != plan_dir]
        os.makedirs(plan_dir, exist_ok=True)
    suffix = "_before"
    if "--suffix" in sys.argv:
        suffix = sys.argv[sys.argv.index("--suffix") + 1]
        names = [n for n in names if n != suffix]

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

    from pyspark.sql import SparkSession

    from polars_trading_spark import release_persisted
    from polars_trading_spark.registry import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pts-profile")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("PTS_AQE_MIN_PARTITION_SIZE", "256k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("PTS_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4050/api/v1"
    app_id = spark.sparkContext.applicationId

    def api(path: str):
        with urllib.request.urlopen(f"{ui}/applications/{app_id}{path}") as r:
            return json.load(r)

    for name in names:
        q = QUERIES[name]
        # warm-up (codegen, Arrow init, scan caches)
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_persisted()
        # job-windowed timed run
        before_jobs = {j["jobId"] for j in api("/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = q.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        release_persisted()

        jobs = [j for j in api("/jobs") if j["jobId"] not in before_jobs]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        rows = []
        for sid in stage_ids:
            try:
                for att in api(f"/stages/{sid}"):
                    if att["status"] == "SKIPPED":
                        continue
                    rows.append(att)
            except Exception:
                continue
        rows.sort(key=lambda s: -(s.get("executorRunTime", 0)))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, "
              f"{len(rows)} executed stages ===")
        total_exec = sum(s.get("executorRunTime", 0) for s in rows)
        print(f"  total executorRunTime {total_exec/1000:.2f}s (sum over tasks)")
        for s in rows[:12]:
            nm = s.get("name", "?").split("\n")[0][:70]
            print(
                f"  stage {s['stageId']}: run {s.get('executorRunTime',0)/1000:6.2f}s"
                f" tasks {s.get('numCompleteTasks',0):3d}"
                f" in {s.get('inputBytes',0)>>20}M"
                f" sh_r {s.get('shuffleReadBytes',0)>>20}M"
                f" sh_w {s.get('shuffleWriteBytes',0)>>20}M"
                f"  {nm}"
            )
        if plan_dir:
            import contextlib
            import io

            df2 = q.spark(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df2.explain("formatted")
            path = os.path.join(plan_dir, f"{name}{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            release_persisted()
            print(f"  plan -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
