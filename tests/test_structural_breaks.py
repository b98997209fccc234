"""Golden and property tests for the SADF statistic
(operators/structural_breaks.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from polars_trading_spark.operators.structural_breaks import sadf

MIN_SPAN, MAX_SPAN = 5, 12


def _numpy_sadf(prices: np.ndarray):
    """Textbook per-row backward sup-DF loop."""
    out = []
    n = len(prices)
    for t in range(n):
        best = None
        for l in range(MIN_SPAN, MAX_SPAN + 1):
            if t - l < 0:
                break
            y = prices[t - l : t + 1]  # l+1 points -> l pairs
            x, d = y[:-1], np.diff(y)
            nn = float(l)
            sx, sxx = x.sum(), (x * x).sum()
            sd, sxd, sdd = d.sum(), (x * d).sum(), (d * d).sum()
            denom = nn * sxx - sx * sx
            if denom == 0:
                continue
            beta = (nn * sxd - sx * sd) / denom
            alpha = (sd - beta * sx) / nn
            sse = max(sdd - alpha * sd - beta * sxd, 0.0)
            se2 = (sse / (nn - 2.0)) / (sxx - sx * sx / nn)
            if not se2 > 0:
                continue
            stat = beta / np.sqrt(se2)
            key = (stat, -l)
            if best is None or key > best[0]:
                best = (key, l, stat)
        out.append((best[1], best[2]) if best else (None, None))
    return out


@pytest.fixture(scope="module")
def series_pdf():
    rng = np.random.default_rng(29)
    rows = []
    for sym in ("RW", "BUBBLE"):
        prices = [50.0]
        for i in range(99):
            if sym == "BUBBLE" and i >= 60:
                prices.append(prices[-1] * 1.05 + rng.normal(0, 0.05))
            else:
                prices.append(max(1.0, prices[-1] + rng.normal(0, 1.0)))
        for i, p in enumerate(prices):
            rows.append(
                {
                    "symbol": sym,
                    "ts_event": pd.Timestamp("2024-06-01") + pd.Timedelta(minutes=i),
                    "price": float(p),
                }
            )
    return pd.DataFrame(rows)


def test_sadf_matches_numpy(spark, series_pdf):
    out = (
        sadf(spark.createDataFrame(series_pdf), min_span=MIN_SPAN, max_span=MAX_SPAN)
        .toPandas()
        .sort_values(["symbol", "ts_event"])
        .reset_index(drop=True)
    )
    for sym, grp in series_pdf.groupby("symbol"):
        grp = grp.sort_values("ts_event").reset_index(drop=True)
        expected = _numpy_sadf(grp["price"].to_numpy())
        got = out[out.symbol == sym].reset_index(drop=True)
        for i, (span, stat) in enumerate(expected):
            if span is None:
                assert pd.isna(got.loc[i, "sadf_span"]), f"row {i}"
            else:
                assert got.loc[i, "sadf_span"] == span, f"row {i}"
                assert got.loc[i, "sadf_stat"] == pytest.approx(stat, abs=2e-6), f"row {i}"


def test_sadf_flags_explosive_regime(spark, series_pdf):
    out = sadf(
        spark.createDataFrame(series_pdf), min_span=MIN_SPAN, max_span=MAX_SPAN
    ).toPandas()
    bubble_tail = out[(out.symbol == "BUBBLE")].sort_values("ts_event").tail(20)
    rw = out[out.symbol == "RW"]["sadf_stat"].dropna()
    # the explosive segment's sup-DF must sit far above the random walk's
    assert bubble_tail["sadf_stat"].max() > rw.quantile(0.99)


def test_sadf_validation(spark, series_pdf):
    sdf = spark.createDataFrame(series_pdf)
    with pytest.raises(ValueError):
        sadf(sdf, min_span=2)
    with pytest.raises(ValueError):
        sadf(sdf, min_span=10, max_span=9)


def _direct_adf_t(c_newest_first: np.ndarray, l: int, p: int):
    """Direct per-window ADF(p) OLS t-stat (newest-first history)."""
    c = c_newest_first
    d = c[0:l] - c[1 : l + 1]
    X = [np.ones(l), c[1 : l + 1]]
    for j in range(1, p + 1):
        X.append(c[j : l + j] - c[j + 1 : l + j + 1])
    X = np.stack(X, axis=1)
    k = X.shape[1]
    XtX, Xtd = X.T @ X, X.T @ d
    try:
        sol = np.linalg.solve(XtX, Xtd)
        inv = np.linalg.inv(XtX)
    except np.linalg.LinAlgError:
        return None
    resid = d - X @ sol
    se2 = (resid @ resid) / (l - k) * inv[1, 1]
    if not se2 > 0:
        return None
    return sol[1] / np.sqrt(se2)


@pytest.mark.parametrize("lags", [1, 2])
def test_sadf_lags_match_direct_ols(spark, series_pdf, lags):
    min_span = MIN_SPAN + lags
    out = (
        sadf(
            spark.createDataFrame(series_pdf),
            min_span=min_span,
            max_span=MAX_SPAN,
            lags=lags,
        )
        .toPandas()
        .sort_values(["symbol", "ts_event"])
        .reset_index(drop=True)
    )
    for sym, grp in series_pdf.groupby("symbol"):
        prices = grp.sort_values("ts_event")["price"].to_numpy()
        got = out[out.symbol == sym].reset_index(drop=True)
        for t in range(len(prices)):
            best = None
            for l in range(min_span, MAX_SPAN + 1):
                if t - l - lags < 0:
                    break
                hist = prices[max(0, t - MAX_SPAN - lags) : t + 1][::-1]
                stat = _direct_adf_t(hist, l, lags)
                if stat is None:
                    continue
                key = (stat, -l)
                if best is None or key > best[0]:
                    best = (key, l, stat)
            if best is None:
                assert pd.isna(got.loc[t, "sadf_span"]), f"{sym} row {t}"
            else:
                assert got.loc[t, "sadf_span"] == best[1], f"{sym} row {t}"
                # rel tolerance: Cramer vs lstsq differ more on the
                # ill-conditioned exponential bubble segment
                assert got.loc[t, "sadf_stat"] == pytest.approx(
                    best[2], rel=1e-4, abs=2e-5
                ), f"{sym} row {t}"


@pytest.mark.parametrize("lags", [1, 2])
def test_sadf_lags_flag_explosive_regime(spark, series_pdf, lags):
    out = sadf(
        spark.createDataFrame(series_pdf),
        min_span=MIN_SPAN + lags,
        max_span=MAX_SPAN,
        lags=lags,
    ).toPandas()
    bubble_tail = out[(out.symbol == "BUBBLE")].sort_values("ts_event").tail(20)
    rw = out[out.symbol == "RW"]["sadf_stat"].dropna()
    assert bubble_tail["sadf_stat"].max() > rw.quantile(0.99)


def test_sadf_lags_validation(spark, series_pdf):
    sdf = spark.createDataFrame(series_pdf)
    with pytest.raises(ValueError):
        sadf(sdf, min_span=3, lags=1)  # needs >= 3 + lags
    with pytest.raises(ValueError):
        sadf(sdf, lags=-1)


# ---------------------------------------------------------------------------
# Chu-Stinchcombe-White explosiveness (csw_explosiveness)
# ---------------------------------------------------------------------------

from polars_trading_spark.operators.structural_breaks import csw_explosiveness

CSW_LAG = 8


def _numpy_csw(prices: np.ndarray, max_lag: int):
    y = np.log(prices)
    out = []
    for t in range(len(y)):
        dy2 = np.diff(y[: t + 1]) ** 2
        s2 = dy2.mean() if dy2.size else np.nan
        best = None
        if s2 > 0:
            for k in range(1, max_lag + 1):
                if t - k < 0:
                    break
                stat = (y[t] - y[t - k]) / np.sqrt(s2 * float(k))
                key = (stat, -k)
                if best is None or key > best[0]:
                    best = (key, k, stat)
        out.append((best[1], best[2]) if best else (None, None))
    return out


def test_csw_matches_numpy(spark, series_pdf):
    out = (
        csw_explosiveness(spark.createDataFrame(series_pdf), max_lag=CSW_LAG)
        .toPandas()
        .sort_values(["symbol", "ts_event"])
        .reset_index(drop=True)
    )
    for sym, grp in series_pdf.groupby("symbol"):
        prices = grp.sort_values("ts_event")["price"].to_numpy()
        expected = _numpy_csw(prices, CSW_LAG)
        got = out[out.symbol == sym].reset_index(drop=True)
        for i, (lag, stat) in enumerate(expected):
            if lag is None:
                assert pd.isna(got.loc[i, "csw_lag"]), f"{sym} row {i}"
            else:
                assert got.loc[i, "csw_lag"] == lag, f"{sym} row {i}"
                assert got.loc[i, "csw_stat"] == pytest.approx(stat, rel=1e-9), f"{sym} row {i}"
                assert got.loc[i, "csw_crit"] == pytest.approx(
                    np.sqrt(4.6 + np.log(lag)), rel=1e-9
                )


def test_csw_flags_explosive_regime(spark, series_pdf):
    out = csw_explosiveness(spark.createDataFrame(series_pdf), max_lag=CSW_LAG).toPandas()
    bubble_tail = out[out.symbol == "BUBBLE"].sort_values("ts_event").tail(20)
    # the explosive segment must breach the one-sided critical boundary
    breached = (bubble_tail["csw_stat"] > bubble_tail["csw_crit"]).mean()
    assert breached > 0.8
    rw = out[out.symbol == "RW"].dropna(subset=["csw_stat"])
    # a random walk should breach only rarely
    assert (rw["csw_stat"] > rw["csw_crit"]).mean() < 0.2


def test_csw_validation(spark, series_pdf):
    with pytest.raises(ValueError):
        csw_explosiveness(spark.createDataFrame(series_pdf), max_lag=0)


# ---------------------------------------------------------------------------
# Brown-Durbin-Evans CUSUM (operators/structural_breaks.py::bde_cusum)
# ---------------------------------------------------------------------------


def _numpy_bde(prices: np.ndarray):
    """Textbook sequential recursive-residual loop on y ~ [1, t]."""
    y = np.log(prices)
    n = len(y)
    w = np.full(n, np.nan)
    for t in range(n):  # 0-based; regressors j = 1..t over prior rows
        i = t + 1.0
        js = np.arange(1.0, t + 1.0)
        if len(js) < 2:
            continue
        X = np.column_stack([np.ones_like(js), js])
        xtx = X.T @ X
        if np.linalg.det(xtx) <= 0:
            continue
        b = np.linalg.solve(xtx, X.T @ y[:t])
        x_t = np.array([1.0, i])
        lev = x_t @ np.linalg.solve(xtx, x_t)
        w[t] = (y[t] - x_t @ b) / np.sqrt(1 + lev)
    stat = np.full(n, np.nan)
    cum = 0.0
    ws = []
    for t in range(n):
        if np.isnan(w[t]):
            continue
        ws.append(w[t])
        cum += w[t]
        if len(ws) > 1 and np.std(ws, ddof=1) > 0:
            stat[t] = cum / np.std(ws, ddof=1)
    return w, stat


def test_bde_matches_numpy(spark, series_pdf):
    from polars_trading_spark.operators.structural_breaks import bde_cusum

    out = (
        bde_cusum(spark.createDataFrame(series_pdf))
        .toPandas()
        .sort_values(["symbol", "ts_event"])
        .reset_index(drop=True)
    )
    for sym, grp in series_pdf.groupby("symbol"):
        prices = grp.sort_values("ts_event")["price"].to_numpy()
        w, stat = _numpy_bde(prices)
        sub = out[out.symbol == sym]
        np.testing.assert_allclose(sub["bde_w"].to_numpy(), w, rtol=1e-8, equal_nan=True)
        np.testing.assert_allclose(sub["bde_stat"].to_numpy(), stat, rtol=1e-6, equal_nan=True)


def test_bde_flags_trend_break(spark):
    """Under the null (log price = linear trend + iid noise) the CUSUM
    stays inside the 5% boundary almost everywhere; a mid-sample slope
    break pushes it far outside."""
    from polars_trading_spark.operators.structural_breaks import bde_cusum

    rng = np.random.default_rng(5)
    rows = []
    for sym, break_at in (("STABLE", None), ("BREAK", 100)):
        for i in range(200):
            slope = 0.001 if break_at is None or i < break_at else 0.02
            base = 0.001 * min(i, break_at or i)
            if break_at is not None and i >= break_at:
                base = 0.001 * break_at + slope * (i - break_at)
            logp = 4.0 + base + rng.normal(0, 0.003)
            rows.append(
                {
                    "symbol": sym,
                    "ts_event": pd.Timestamp("2024-06-01") + pd.Timedelta(minutes=i),
                    "price": float(np.exp(logp)),
                }
            )
    out = bde_cusum(spark.createDataFrame(pd.DataFrame(rows))).toPandas()
    out = out.dropna(subset=["bde_stat", "bde_crit"])
    breach = out.assign(b=lambda d: d.bde_stat.abs() > d.bde_crit).groupby("symbol").b.mean()
    assert breach["BREAK"] > 0.3
    assert breach.get("STABLE", 0.0) < 0.1


def test_bde_boundary_shape(spark, series_pdf):
    """Boundary grows linearly in t: crit at the last row equals
    0.948 * 3 * sqrt(T - 2) within fp tolerance."""
    from polars_trading_spark.operators.structural_breaks import bde_cusum

    out = bde_cusum(spark.createDataFrame(series_pdf)).toPandas()
    for sym, grp in out.groupby("symbol"):
        grp = grp.sort_values("ts_event")
        T = len(grp)
        expect = 0.948 * (np.sqrt(T - 2) + 2 * (T - 2) / np.sqrt(T - 2))
        assert grp["bde_crit"].iloc[-1] == pytest.approx(expect, rel=1e-12)
