"""Golden tests for trend-scanning labels (operators/trend_scan.py)
against a direct numpy per-row forward OLS implementation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from polars_trading_spark.operators.trend_scan import trend_scanning_labels

MIN_SPAN, MAX_SPAN = 4, 9


def _numpy_trend_scan(prices: np.ndarray):
    """Per-row argmax-|t| forward OLS — the textbook O(n*spans*len) loop."""
    n = len(prices)
    out = []
    for i in range(n):
        best = None
        for l in range(MIN_SPAN, MAX_SPAN + 1):
            if i + l > n:
                break
            y = prices[i : i + l]
            x = np.arange(l, dtype=float)
            xm, ym = x.mean(), y.mean()
            sxx = ((x - xm) ** 2).sum()
            slope = ((x - xm) * (y - ym)).sum() / sxx
            resid = y - (ym + slope * (x - xm))
            sse = (resid**2).sum()
            se2 = sse / (l - 2) / sxx
            if se2 <= 0:
                continue
            t = slope / np.sqrt(se2)
            key = (abs(t), -l)
            if best is None or key > best[0]:
                best = (key, l, t)
        out.append((best[1], best[2]) if best else (None, None))
    return out


@pytest.fixture(scope="module")
def series_pdf():
    rng = np.random.default_rng(11)
    rows = []
    for sym in ("A", "B"):
        # trending segments + noise so both labels appear
        steps = np.concatenate([rng.normal(0.3, 1.0, 40), rng.normal(-0.4, 1.0, 40)])
        prices = 100 + np.cumsum(steps)
        for i, p in enumerate(prices):
            rows.append(
                {
                    "symbol": sym,
                    "ts_event": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    "price": float(p),
                }
            )
    return pd.DataFrame(rows)


def test_trend_scan_matches_numpy(spark, series_pdf):
    out = (
        trend_scanning_labels(
            spark.createDataFrame(series_pdf), min_span=MIN_SPAN, max_span=MAX_SPAN
        )
        .toPandas()
        .sort_values(["symbol", "ts_event"])
        .reset_index(drop=True)
    )
    for sym, grp in series_pdf.groupby("symbol"):
        grp = grp.sort_values("ts_event").reset_index(drop=True)
        expected = _numpy_trend_scan(grp["price"].to_numpy())
        got = out[out.symbol == sym].reset_index(drop=True)
        for i, (span, tval) in enumerate(expected):
            if span is None:
                assert pd.isna(got.loc[i, "span"])
                assert pd.isna(got.loc[i, "tval"])
            else:
                assert got.loc[i, "span"] == span, f"row {i}"
                assert got.loc[i, "tval"] == pytest.approx(tval, abs=2e-6), f"row {i}"
                assert got.loc[i, "label"] == np.sign(tval)
                # t1 is the winning span's end timestamp
                assert got.loc[i, "t1"] == grp.loc[i + span - 1, "ts_event"]


def test_trend_scan_labels_both_directions(spark, series_pdf):
    out = trend_scanning_labels(
        spark.createDataFrame(series_pdf), min_span=MIN_SPAN, max_span=MAX_SPAN
    ).toPandas()
    labels = set(out["label"].dropna().unique())
    assert 1.0 in labels and -1.0 in labels


def test_trend_scan_single_window_pass(spark, series_pdf):
    """The whole scan must be one window pass: no joins, one exchange."""
    plan = trend_scanning_labels(
        spark.createDataFrame(series_pdf), min_span=MIN_SPAN, max_span=MAX_SPAN
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_trend_scan_validation(spark, series_pdf):
    sdf = spark.createDataFrame(series_pdf)
    with pytest.raises(ValueError):
        trend_scanning_labels(sdf, min_span=2)
    with pytest.raises(ValueError):
        trend_scanning_labels(sdf, min_span=5, max_span=4)
