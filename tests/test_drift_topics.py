"""PSI drift (operators/drift.py) and cluster keywords (functions/topics.py)."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest

from polars_trading_spark.operators.drift import psi_drift


def _trades(spark, rows):
    return spark.createDataFrame(rows, "symbol string, ts_event timestamp, price double")


SPLIT = datetime(2024, 1, 10)


def test_psi_zero_for_identical_distributions(spark):
    rows = []
    for half, day in ((0, 1), (1, 15)):
        for i in range(100):
            rows.append(("A", datetime(2024, 1, day, i // 60, i % 60), 100.0 + i % 10))
    out = psi_drift(_trades(spark, rows), "price", split_ts=SPLIT).collect()[0]
    assert out["n_ref"] == out["n_cur"] == 100
    assert out["psi"] == pytest.approx(0.0, abs=1e-12)
    assert out["drifted"] is False


def test_psi_matches_numpy(spark):
    rng = np.random.default_rng(2)
    ref = rng.normal(100, 5, 400)
    cur = rng.normal(108, 9, 300)  # shifted + widened
    rows = [("A", datetime(2024, 1, 1 + i // 300, (i % 300) // 60, i % 60), float(v)) for i, v in enumerate(ref)]
    rows += [("A", datetime(2024, 1, 20 + i // 300, (i % 300) // 60, i % 60), float(v)) for i, v in enumerate(cur)]
    out = psi_drift(_trades(spark, rows), "price", split_ts=SPLIT, bins=10).collect()[0]

    mn, mx = ref.min(), ref.max()
    def binify(v):
        return np.clip(np.floor((v - mn) / (mx - mn) * 10).astype(int), 0, 9)
    e = 1e-4
    psi = 0.0
    br, bc = binify(ref), binify(cur)
    for b in range(10):
        pr = (br == b).sum() / len(ref) + e
        pc = (bc == b).sum() / len(cur) + e
        psi += (pc - pr) * np.log(pc / pr)
    assert out["psi"] == pytest.approx(psi, rel=1e-9)
    assert out["drifted"] == bool(psi > 0.2)


def test_psi_symbol_without_reference_omitted(spark):
    rows = [("NEW", datetime(2024, 1, 20), 5.0), ("OLD", datetime(2024, 1, 1), 5.0)]
    out = {r["symbol"]: r for r in psi_drift(_trades(spark, rows), "price", split_ts=SPLIT).collect()}
    assert "NEW" not in out          # no reference rows -> no range
    assert out["OLD"]["psi"] is None  # no current rows -> null psi


def test_psi_validation(spark):
    df = _trades(spark, [("A", datetime(2024, 1, 1), 1.0)])
    with pytest.raises(ValueError, match="bins"):
        psi_drift(df, "price", split_ts=SPLIT, bins=1)


def test_cluster_keywords_separates_topics(spark):
    from polars_trading_spark.functions.topics import cluster_keywords

    # Two orthogonal embedding clusters with distinct vocabularies.
    emb_rows, doc_rows = [], []
    for i in range(10):
        if i % 2 == 0:
            emb_rows.append((i, [1.0, 0.0]))
            doc_rows.append((i, "finance markets trading alpha finance markets"))
        else:
            emb_rows.append((i, [0.0, 1.0]))
            doc_rows.append((i, "biology cells protein genome biology cells"))
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    out = cluster_keywords(emb, docs, n_cells=2, k=3).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r["token"])
    # centroids = vec 0 ([1,0]) and vec 1 ([0,1])
    assert "finance" in by_cell[0] and "biology" not in by_cell[0]
    assert "biology" in by_cell[1] and "finance" not in by_cell[1]
    ranks = sorted(r["rank"] for r in out if r["cell"] == 0)
    assert ranks == [1, 2, 3]


class TestKsDrift:
    def test_zero_for_identical_samples(self, spark):
        from polars_trading_spark.operators.drift import ks_drift

        rows = []
        for day in (1, 15):
            for i in range(60):
                rows.append(("A", datetime(2024, 1, day, i // 60, i % 60), 100.0 + i % 12))
        out = ks_drift(_trades(spark, rows), "price", split_ts=SPLIT).collect()[0]
        assert out["ks"] == 0.0
        assert out["drifted"] is False

    def test_matches_scipy_formula(self, spark):
        import numpy as np

        from polars_trading_spark.operators.drift import ks_drift

        rng = np.random.RandomState(11)
        ref = rng.normal(100, 1, 200)
        cur = rng.normal(100.8, 1.3, 150)  # shifted + widened
        rows = [("A", datetime(2024, 1, 2, i // 60 % 24, i % 60), float(v)) for i, v in enumerate(ref)]
        rows += [("A", datetime(2024, 1, 20, i // 60 % 24, i % 60), float(v)) for i, v in enumerate(cur)]
        out = ks_drift(_trades(spark, rows), "price", split_ts=SPLIT).collect()[0]

        # exact two-sample KS by brute force over pooled values
        pooled = np.unique(np.concatenate([ref, cur]))
        f_ref = np.searchsorted(np.sort(ref), pooled, side="right") / len(ref)
        f_cur = np.searchsorted(np.sort(cur), pooled, side="right") / len(cur)
        expect = float(np.abs(f_ref - f_cur).max())
        assert out["ks"] == pytest.approx(expect, abs=1e-12)
        crit = 1.358 * np.sqrt((200 + 150) / (200.0 * 150))
        assert out["ks_critical"] == pytest.approx(crit, rel=1e-9)
        assert out["drifted"] == (expect > crit)

    def test_empty_side_yields_nulls(self, spark):
        from polars_trading_spark.operators.drift import ks_drift

        rows = [("A", datetime(2024, 1, 2), 100.0), ("A", datetime(2024, 1, 3), 101.0)]
        out = ks_drift(_trades(spark, rows), "price", split_ts=SPLIT).collect()[0]
        assert out["ks"] is None and out["drifted"] is None
        assert out["n_ref"] == 2 and out["n_cur"] == 0
