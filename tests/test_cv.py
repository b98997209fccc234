"""Semantic invariants for purged K-fold CV assignment (operators/cv.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from polars_trading_spark.operators.cv import purged_kfold

N_FOLDS = 4
EMBARGO = "10m"


@pytest.fixture(scope="module")
def events_pdf():
    rng = np.random.default_rng(3)
    rows = []
    for sym in ("A", "B"):
        t = pd.Timestamp("2024-01-01")
        for _ in range(60):
            t = t + pd.Timedelta(minutes=int(rng.integers(1, 10)))
            rows.append(
                {
                    "symbol": sym,
                    "ts_event": t,
                    # label horizon 5-30 minutes; leave a couple open (null)
                    "vertical_barrier": t + pd.Timedelta(minutes=int(rng.integers(5, 30))),
                }
            )
    pdf = pd.DataFrame(rows)
    pdf.loc[pdf.index[-1], "vertical_barrier"] = pd.NaT
    return pdf


@pytest.fixture(scope="module")
def assignment(spark, events_pdf):
    out = purged_kfold(
        spark.createDataFrame(events_pdf), n_folds=N_FOLDS, embargo=EMBARGO
    ).toPandas()
    return out


def test_every_event_tests_in_its_own_fold_once(assignment, events_pdf):
    tests = assignment[assignment.role == "test"]
    assert len(tests) == len(events_pdf)
    per_event = assignment.groupby(["symbol", "ts_event"]).size()
    assert (per_event == N_FOLDS).all()


def test_folds_are_time_contiguous(assignment):
    tests = assignment[assignment.role == "test"]
    for sym, grp in tests.groupby("symbol"):
        grp = grp.sort_values("ts_event")
        # fold index must be non-decreasing in time
        assert grp["fold"].is_monotonic_increasing


def test_no_train_event_overlaps_test_hull(assignment, events_pdf, spark):
    ev = events_pdf.copy()
    # mirror the operator's open-span handling
    ev["t1"] = ev.groupby("symbol")["vertical_barrier"].transform(
        lambda s: s.fillna(s.max())
    )
    merged = assignment.merge(
        ev[["symbol", "ts_event", "t1"]], on=["symbol", "ts_event"], how="left"
    )
    tests = merged[merged.role == "test"]
    hulls = (
        tests.groupby(["symbol", "fold"])
        .agg(test_start=("ts_event", "min"), test_end=("t1", "max"))
        .reset_index()
    )
    trains = merged[merged.role == "train"].merge(hulls, on=["symbol", "fold"])
    overlap = (trains["ts_event"] <= trains["test_end"]) & (
        trains["test_start"] <= trains["t1"]
    )
    assert not overlap.any()


def test_embargo_rows_sit_just_after_test_end(assignment, events_pdf):
    ev = events_pdf.copy()
    ev["t1"] = ev.groupby("symbol")["vertical_barrier"].transform(
        lambda s: s.fillna(s.max())
    )
    merged = assignment.merge(
        ev[["symbol", "ts_event", "t1"]], on=["symbol", "ts_event"], how="left"
    )
    tests = merged[merged.role == "test"]
    hulls = (
        tests.groupby(["symbol", "fold"])
        .agg(test_end=("t1", "max"))
        .reset_index()
    )
    emb = merged[merged.role == "embargo"].merge(hulls, on=["symbol", "fold"])
    assert (emb["ts_event"] > emb["test_end"]).all()
    assert (emb["ts_event"] <= emb["test_end"] + pd.Timedelta(minutes=10)).all()


def test_train_fraction_reasonable(assignment):
    """Purging must not wipe out training data on well-spaced events."""
    frac = (assignment.role == "train").mean()
    assert frac > 0.4


def test_broadcast_join_plan(spark, events_pdf):
    plan = (
        purged_kfold(spark.createDataFrame(events_pdf), n_folds=N_FOLDS, embargo=EMBARGO)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_validation(spark, events_pdf):
    with pytest.raises(ValueError):
        purged_kfold(spark.createDataFrame(events_pdf), n_folds=1)


# ---------------------------------------------------------------------------
# Combinatorial purged CV (cpcv_assign)
# ---------------------------------------------------------------------------

from itertools import combinations

from polars_trading_spark.operators.cv import cpcv_assign

N_GROUPS, K_TEST = 4, 2


@pytest.fixture(scope="module")
def cpcv(spark, events_pdf):
    return cpcv_assign(
        spark.createDataFrame(events_pdf),
        n_groups=N_GROUPS,
        k_test=K_TEST,
        embargo=EMBARGO,
    ).toPandas()


def test_cpcv_split_count_and_coverage(cpcv, events_pdf):
    n_splits = len(list(combinations(range(N_GROUPS), K_TEST)))
    assert sorted(cpcv["split_id"].unique()) == list(range(1, n_splits + 1))
    # every event appears exactly once per split
    counts = cpcv.groupby(["symbol", "ts_event"])["split_id"].count()
    assert (counts == n_splits).all()
    assert len(cpcv) == len(events_pdf) * n_splits


def test_cpcv_each_group_tested_equally(cpcv, spark, events_pdf):
    """Every event is in the test set of exactly C(n-1, k-1) splits —
    the property that gives CPCV its backtest-path multiplicity."""
    per_event_tests = (
        cpcv[cpcv.role == "test"].groupby(["symbol", "ts_event"])["split_id"].count()
    )
    expected = len(list(combinations(range(N_GROUPS - 1), K_TEST - 1)))
    assert (per_event_tests == expected).all()


def test_cpcv_purge_only_on_overlap(cpcv, spark, events_pdf):
    """Train events never overlap any of their split's test hulls; the
    events marked purged always do."""
    ev = events_pdf.copy()
    # replicate group assignment: per-symbol ntile over t0 order
    ev = ev.sort_values(["symbol", "ts_event"]).reset_index(drop=True)
    parts = []
    for sym, grp in ev.groupby("symbol"):
        n = len(grp)
        base, rem = divmod(n, N_GROUPS)
        sizes = [base + (1 if i < rem else 0) for i in range(N_GROUPS)]
        gids = np.repeat(np.arange(1, N_GROUPS + 1), sizes)
        g = grp.copy()
        g["grp"] = gids
        end = g["vertical_barrier"].fillna(g["ts_event"]).max()
        g["t1"] = g["vertical_barrier"].fillna(max(end, g["ts_event"].max()))
        parts.append(g)
    ev = pd.concat(parts)
    hulls = ev.groupby(["symbol", "grp"]).agg(
        h_start=("ts_event", "min"), h_end=("t1", "max")
    )
    combos = {
        sid: combo
        for sid, combo in enumerate(combinations(range(1, N_GROUPS + 1), K_TEST), 1)
    }
    merged = cpcv.merge(ev[["symbol", "ts_event", "grp", "t1"]], on=["symbol", "ts_event"])
    emb = pd.Timedelta(minutes=10)
    for _, r in merged.iterrows():
        test_groups = combos[r["split_id"]]
        overlap = any(
            r["ts_event"] <= hulls.loc[(r["symbol"], g), "h_end"]
            and hulls.loc[(r["symbol"], g), "h_start"] <= r["t1"]
            for g in test_groups
        )
        if r["role"] == "test":
            assert r["grp"] in test_groups
        elif r["role"] == "purged":
            assert overlap and r["grp"] not in test_groups
        elif r["role"] == "train":
            assert not overlap and r["grp"] not in test_groups
        elif r["role"] == "embargo":
            assert not overlap
            assert any(
                hulls.loc[(r["symbol"], g), "h_end"]
                < r["ts_event"]
                <= hulls.loc[(r["symbol"], g), "h_end"] + emb
                for g in test_groups
            )


def test_cpcv_validation(spark, events_pdf):
    sdf = spark.createDataFrame(events_pdf)
    with pytest.raises(ValueError):
        cpcv_assign(sdf, n_groups=1)
    with pytest.raises(ValueError):
        cpcv_assign(sdf, n_groups=4, k_test=4)


# ----------------------------------------------------------------------
# walk_forward (round 9): the train-on-the-past sibling of purged_kfold
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def wf_anchored(spark, events_pdf):
    from polars_trading_spark.operators.cv import walk_forward

    return walk_forward(
        spark.createDataFrame(events_pdf), n_splits=3, embargo=EMBARGO
    ).toPandas()


@pytest.fixture(scope="module")
def wf_rolling(spark, events_pdf):
    from polars_trading_spark.operators.cv import walk_forward

    return walk_forward(
        spark.createDataFrame(events_pdf),
        n_splits=3,
        mode="rolling",
        embargo=EMBARGO,
    ).toPandas()


def test_walk_forward_shape_and_role_domain(wf_anchored, events_pdf):
    assert len(wf_anchored) == 3 * len(events_pdf)
    assert set(wf_anchored.role) <= {
        "train", "test", "purged", "embargo", "future",
    }
    # every (event, split) appears exactly once
    per = wf_anchored.groupby(["symbol", "ts_event"]).size()
    assert (per == 3).all()


def test_walk_forward_trains_only_on_the_past(wf_anchored):
    # in every split, every non-future role starts strictly before every
    # test event of the same symbol (train/purged/embargo precede test)
    for (sym, split), g in wf_anchored.groupby(["symbol", "split"]):
        test_start = g.loc[g.role == "test", "ts_event"].min()
        past = g[g.role.isin(["train", "purged", "embargo"])]
        assert (past.ts_event < test_start).all(), (sym, split)
        fut = g[g.role == "future"]
        if len(fut):
            test_end = g.loc[g.role == "test", "ts_event"].max()
            assert (fut.ts_event > test_end).all(), (sym, split)


def test_walk_forward_purge_and_embargo_guard_the_boundary(
    wf_anchored, events_pdf, spark
):
    # reconstruct spans; any train row must END before the embargo gap
    ev = events_pdf.copy()
    end = ev.groupby("symbol")["vertical_barrier"].transform(
        lambda s: s.fillna(s.max())
    )
    ev = ev.assign(t1=ev.vertical_barrier.fillna(end))
    spans = ev.set_index(["symbol", "ts_event"]).t1
    for (sym, split), g in wf_anchored.groupby(["symbol", "split"]):
        test_start = g.loc[g.role == "test", "ts_event"].min()
        gap = test_start - pd.Timedelta(EMBARGO.replace("m", "min"))
        for _, row in g[g.role == "train"].iterrows():
            assert spans[(sym, row.ts_event)] < gap, (sym, split, row.ts_event)
        for _, row in g[g.role == "purged"].iterrows():
            assert spans[(sym, row.ts_event)] >= test_start
        for _, row in g[g.role == "embargo"].iterrows():
            t1 = spans[(sym, row.ts_event)]
            assert gap <= t1 < test_start


def test_walk_forward_rolling_unused_blocks(wf_rolling, wf_anchored):
    assert "unused" in set(wf_rolling.role)
    # rolling demotes SOME anchored train rows to unused, never the
    # reverse, and the per-(event, split) role otherwise agrees
    key = ["symbol", "ts_event", "split"]
    m = wf_anchored.merge(wf_rolling, on=key, suffixes=("_a", "_r"))
    assert len(m) == len(wf_anchored)
    changed = m[m.role_a != m.role_r]
    assert (changed.role_r == "unused").all()
    # only past-of-train-window rows are demoted (train, or purged/
    # embargo spans that originated in those early blocks)
    assert changed.role_a.isin(["train", "purged", "embargo"]).all()


def test_walk_forward_validation(spark, events_pdf):
    from polars_trading_spark.operators.cv import walk_forward

    df = spark.createDataFrame(events_pdf)
    with pytest.raises(ValueError):
        walk_forward(df, n_splits=0)
    with pytest.raises(ValueError):
        walk_forward(df, mode="sliding")
