"""Property-based check of the closed-form split math against a direct
Python port of the kernel's sequential semantics (src/bars.rs:10-71).

One Spark job evaluates many random cases at once (each case is a
partition key), so hypothesis shrinking stays cheap.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from polars_trading_spark.operators.bars import BAR_AMOUNT, BAR_ID, bar_groups


def sequential_split(values: list[int], bar_size: int) -> list[tuple[int, int, int]]:
    """The kernel's split-mode scan, transcribed from its documented
    semantics: fill bars to exactly bar_size, splitting rows across
    boundaries; rows <= 0 emit nothing."""
    out = []
    current, gid = 0, 0
    for tid, val in enumerate(values):
        remaining = val
        while remaining > 0:
            room = bar_size - current
            if remaining >= room:
                out.append((tid, gid, room))
                gid += 1
                current = 0
                remaining -= room
            else:
                out.append((tid, gid, remaining))
                current += remaining
                remaining = 0
    return out


case_strategy = st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=12)


@settings(max_examples=12, deadline=None)
@given(st.lists(case_strategy, min_size=1, max_size=8), st.integers(min_value=1, max_value=40))
def test_split_mode_matches_sequential_semantics(spark, cases, bar_size):
    rows = [
        (case_id, seq, int(v))
        for case_id, values in enumerate(cases)
        for seq, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "case_id int, seq int, val long")
    out = bar_groups(
        df, "val", bar_size, allow_splits=True, partition_by=["case_id"], order_by=["seq"]
    )
    got = sorted(
        (r["case_id"], r["seq"], r[BAR_ID], r[BAR_AMOUNT]) for r in out.collect()
    )
    expected = sorted(
        (case_id, tid, gid, amt)
        for case_id, values in enumerate(cases)
        for tid, gid, amt in sequential_split(values, bar_size)
    )
    assert got == expected
