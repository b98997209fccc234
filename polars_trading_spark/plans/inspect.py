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
    "unbounded_global_windows",
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


_BOUNDING_NODES = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"TakeOrderedAndProject|GlobalLimit|CollectLimit"
)


def _top_level_bracket_groups(s: str) -> int:
    depth = groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]" and depth > 0:
            depth -= 1
    return groups


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec whose input subtree has
    no cardinality-bounding operator (aggregate or limit).

    A global window funnels every row through one task; it is only
    scale-safe when something upstream already collapsed cardinality
    (one row per bucket/shard/top-k).  Plan text encodes the partition
    spec as the middle bracket group — ``Window [exprs], [part], [ord]``
    — so a Window line with only two groups is global.  The subtree is
    taken as the more-indented lines that follow (Spark prints children
    below their parent)."""
    lines = plan_string(df).splitlines()

    def indent(s: str) -> int:
        return len(re.match(r"^[\s:+|-]*", s).group(0))

    offenders = []
    for i, ln in enumerate(lines):
        m = re.match(r"^[\s:+|-]*(?:\*\(\d+\)\s*)?Window\s+(.*)", ln)
        if m is None or _top_level_bracket_groups(m.group(1)) >= 3:
            continue
        d = indent(ln)
        sub = []
        for nxt in lines[i + 1 :]:
            if nxt.strip() and indent(nxt) <= d:
                break
            sub.append(nxt)
        if not _BOUNDING_NODES.search("\n".join(sub)):
            offenders.append(ln.strip()[:160])
    return offenders


def scan_columns(df: DataFrame) -> dict[str, list[str]]:
    """Parquet scan → ReadSchema column list, for pruning assertions."""
    plan = plan_string(df, "executed")
    out: dict[str, list[str]] = {}
    for m in re.finditer(r"FileScan parquet.*?\[(.*?)\].*?ReadSchema: struct<(.*?)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(2).split(",") if c.strip()]
        out[m.group(1)[:60]] = cols
    return out
