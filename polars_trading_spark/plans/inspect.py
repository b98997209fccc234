"""Physical-plan inspection: the engine's performance contracts as code.

These helpers read the executed/physical plan so tests can assert the
properties that matter at 100 TB — how many shuffles a pipeline incurs,
whether Python stages crept into a native path, whether column pruning
reached the parquet scan, and that no window uses the O(n²)
unbounded-following frame (see operators/asof.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "plan_string",
    "count_exchanges",
    "count_python_stages",
    "has_unbounded_following_frame",
    "scan_columns",
]


def plan_string(df: DataFrame, mode: str = "physical") -> str:
    qe = df._jdf.queryExecution()
    if mode == "executed":
        return qe.executedPlan().toString()
    if mode == "physical":
        return qe.sparkPlan().toString()
    if mode == "optimized":
        return qe.optimizedPlan().toString()
    raise ValueError(mode)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges)."""
    plan = plan_string(df)
    return len(re.findall(r"\bExchange (?:hash|range|SinglePartition|RoundRobin)", plan))


def count_python_stages(df: DataFrame) -> int:
    """Python-execution islands (pandas UDFs / grouped-map / mapInPandas)."""
    plan = plan_string(df)
    return sum(
        plan.count(op)
        for op in ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython", "BatchEvalPython")
    )


def has_unbounded_following_frame(df: DataFrame) -> bool:
    """True if any window frame extends to unbounded FOLLOWING — the
    frame shape Spark evaluates quadratically per partition."""
    plan = plan_string(df)
    return bool(re.search(r"specifiedwindowframe\([^)]*unboundedfollowing\$\(\)\)", plan))


def scan_columns(df: DataFrame) -> dict[str, list[str]]:
    """Parquet scan → ReadSchema column list, for pruning assertions."""
    plan = plan_string(df, "executed")
    out: dict[str, list[str]] = {}
    for m in re.finditer(r"FileScan parquet.*?\[(.*?)\].*?ReadSchema: struct<(.*?)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(2).split(",") if c.strip()]
        out[m.group(1)[:60]] = cols
    return out
