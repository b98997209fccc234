"""ATR / Bollinger / MACD (operators/indicators.py) vs pandas references.

pandas ``ewm(alpha, adjust=True).mean()`` is the exact convention the
segment-renormalized folds implement, so it is the golden reference;
small periods force chunk lengths under the series length so every test
crosses segment boundaries.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from polars_trading_spark.operators.indicators import atr, bollinger, macd

BASE = dt.datetime(2024, 1, 2, 9, 30, 0)


def _bars_pdf(n=300, symbols=("A", "B"), seed=11):
    rng = np.random.RandomState(seed)
    rows = []
    for s, sym in enumerate(symbols):
        close = 100.0 + 10 * s + np.cumsum(rng.normal(0, 1, size=n))
        close = np.maximum(close, 5.0)
        spread = np.abs(rng.normal(0, 0.5, size=n)) + 0.01
        open_ = close + rng.normal(0, 0.3, size=n)
        high = np.maximum(open_, close) + spread
        low = np.minimum(open_, close) - spread
        for i in range(n):
            rows.append(
                (
                    sym,
                    BASE + dt.timedelta(minutes=15 * i),
                    float(open_[i]),
                    float(high[i]),
                    float(low[i]),
                    float(close[i]),
                )
            )
    return pd.DataFrame(
        rows, columns=["symbol", "ts_event", "open", "high", "low", "close"]
    )


def _bars(spark, pdf):
    return spark.createDataFrame(
        pdf,
        "symbol string, ts_event timestamp, open double, high double, "
        "low double, close double",
    )


def _ref_tr(g: pd.DataFrame) -> pd.Series:
    pc = g["close"].shift(1)
    tr = pd.concat(
        [g["high"] - g["low"], (g["high"] - pc).abs(), (g["low"] - pc).abs()],
        axis=1,
    ).max(axis=1)
    tr.iloc[0] = g["high"].iloc[0] - g["low"].iloc[0]
    return tr


@pytest.mark.parametrize("period", [2, 14])
def test_atr_matches_pandas(spark, period):
    pdf = _bars_pdf()
    out = atr(_bars(spark, pdf), period=period).toPandas()
    for sym, g in pdf.groupby("symbol"):
        tr = _ref_tr(g)
        ref = tr.ewm(alpha=1.0 / period, adjust=True).mean()
        got = (
            out[out["symbol"] == sym]
            .sort_values("ts_event")
            .reset_index(drop=True)
        )
        np.testing.assert_allclose(got["tr"], tr.to_numpy(), rtol=1e-9)
        np.testing.assert_allclose(got["atr"], ref.to_numpy(), rtol=1e-9)
        np.testing.assert_allclose(
            got["natr"],
            100.0 * ref.to_numpy() / g["close"].to_numpy(),
            rtol=1e-9,
        )


def test_bollinger_matches_pandas(spark):
    pdf = _bars_pdf(n=120)
    w, k = 20, 2.0
    out = bollinger(_bars(spark, pdf), window=w, num_std=k).toPandas()
    for sym, g in pdf.groupby("symbol"):
        mid = g["close"].rolling(w).mean()
        sd = g["close"].rolling(w).std(ddof=1)
        got = (
            out[out["symbol"] == sym]
            .sort_values("ts_event")
            .reset_index(drop=True)
        )
        assert got["bb_mid"].iloc[: w - 1].isna().all()
        m = mid.notna().to_numpy()
        np.testing.assert_allclose(got["bb_mid"][m], mid[m], rtol=1e-9)
        np.testing.assert_allclose(
            got["bb_upper"][m], (mid + k * sd)[m], rtol=1e-9
        )
        np.testing.assert_allclose(
            got["bb_lower"][m], (mid - k * sd)[m], rtol=1e-9
        )
        width = (mid + k * sd) - (mid - k * sd)
        pb = (g["close"] - (mid - k * sd)) / width
        np.testing.assert_allclose(got["pct_b"][m], pb[m], rtol=1e-8)
        np.testing.assert_allclose(
            got["bb_bandwidth"][m], (width / mid)[m], rtol=1e-8
        )


@pytest.mark.parametrize("fast,slow,signal", [(3, 5, 2), (12, 26, 9)])
def test_macd_matches_pandas(spark, fast, slow, signal):
    pdf = _bars_pdf()
    out = macd(_bars(spark, pdf), fast=fast, slow=slow, signal=signal).toPandas()
    for sym, g in pdf.groupby("symbol"):
        ef = g["close"].ewm(alpha=2.0 / (fast + 1), adjust=True).mean()
        es = g["close"].ewm(alpha=2.0 / (slow + 1), adjust=True).mean()
        line = ef - es
        sig = line.ewm(alpha=2.0 / (signal + 1), adjust=True).mean()
        got = (
            out[out["symbol"] == sym]
            .sort_values("ts_event")
            .reset_index(drop=True)
        )
        # the MACD line is a difference of two ~price-magnitude EMAs, so
        # absolute error floor ~1e-12 from cancellation is expected
        np.testing.assert_allclose(
            got["macd"], line.to_numpy(), rtol=1e-9, atol=1e-10
        )
        np.testing.assert_allclose(
            got["macd_signal"], sig.to_numpy(), rtol=1e-9, atol=1e-10
        )
        np.testing.assert_allclose(
            got["macd_hist"], (line - sig).to_numpy(), rtol=1e-9, atol=1e-10
        )


def test_validation_and_plan(spark):
    from polars_trading_spark.plans import (
        count_python_stages,
        has_unbounded_following_frame,
        unbounded_global_windows,
    )

    bars = _bars(spark, _bars_pdf(n=30, symbols=("A",)))
    with pytest.raises(ValueError):
        atr(bars, period=1)
    with pytest.raises(ValueError):
        bollinger(bars, window=1)
    with pytest.raises(ValueError):
        macd(bars, fast=26, slow=12)
    with pytest.raises(ValueError):
        macd(bars, signal=0)
    for out in (
        atr(bars),
        bollinger(bars),
        macd(bars),
    ):
        assert count_python_stages(out) == 0
        assert unbounded_global_windows(out) == []
        assert not has_unbounded_following_frame(out)


def test_stochastic_matches_pandas(spark):
    pdf = _bars_pdf(n=120)
    kw, dw = 14, 3
    from polars_trading_spark.operators.indicators import stochastic

    out = stochastic(_bars(spark, pdf), k_window=kw, d_window=dw).toPandas()
    for sym, g in pdf.groupby("symbol"):
        ll = g["low"].rolling(kw).min()
        hh = g["high"].rolling(kw).max()
        k = 100.0 * (g["close"] - ll) / (hh - ll)
        d = k.rolling(dw).mean()
        got = (
            out[out["symbol"] == sym]
            .sort_values("ts_event")
            .reset_index(drop=True)
        )
        assert got["pct_k"].iloc[: kw - 1].isna().all()
        m = k.notna().to_numpy()
        np.testing.assert_allclose(got["pct_k"][m], k[m], rtol=1e-9)
        md = d.notna().to_numpy()
        np.testing.assert_allclose(got["pct_d"][md], d[md], rtol=1e-9)


def test_stochastic_degenerate_range_null(spark):
    import pandas as pd

    from polars_trading_spark.operators.indicators import stochastic

    # flat tape: HH == LL for every window -> %K null everywhere
    rows = [
        ("A", BASE + dt.timedelta(minutes=15 * i), 10.0, 10.0, 10.0, 10.0)
        for i in range(10)
    ]
    pdf = pd.DataFrame(
        rows, columns=["symbol", "ts_event", "open", "high", "low", "close"]
    )
    out = stochastic(_bars(spark, pdf), k_window=3, d_window=2).toPandas()
    assert out["pct_k"].isna().all() and out["pct_d"].isna().all()


def test_obv_matches_reference_and_is_integer_exact(spark):
    import pandas as pd

    from polars_trading_spark.operators.indicators import obv

    pdf = _bars_pdf(n=80)
    rng = np.random.RandomState(5)
    pdf["volume"] = rng.randint(1, 10_000, size=len(pdf)).astype("int64")
    bars = spark.createDataFrame(
        pdf,
        "symbol string, ts_event timestamp, open double, high double, "
        "low double, close double, volume long",
    )
    out = obv(bars).toPandas()
    for sym, g in pdf.groupby("symbol"):
        d = g["close"].diff()
        sv = np.where(d > 0, g["volume"], np.where(d < 0, -g["volume"], 0))
        ref = np.cumsum(sv)
        got = (
            out[out["symbol"] == sym]
            .sort_values("ts_event")
            .reset_index(drop=True)
        )
        assert got["obv"].tolist() == ref.tolist()  # exact integers
    assert str(out["obv"].dtype) == "int64"


def test_stochastic_obv_validation_and_plan(spark):
    from polars_trading_spark.operators.indicators import obv, stochastic
    from polars_trading_spark.plans import (
        count_python_stages,
        has_unbounded_following_frame,
        unbounded_global_windows,
    )

    from pyspark.sql import functions as F

    bars = _bars(spark, _bars_pdf(n=30, symbols=("A",)))
    with pytest.raises(ValueError):
        stochastic(bars, k_window=1)
    with pytest.raises(ValueError):
        stochastic(bars, d_window=0)
    with_vol = bars.withColumn("volume", F.lit(100).cast("long"))
    for out in (stochastic(bars), obv(with_vol)):
        assert count_python_stages(out) == 0
        assert unbounded_global_windows(out) == []
        assert not has_unbounded_following_frame(out)


def test_donchian_matches_pandas(spark):
    from polars_trading_spark.operators.indicators import donchian

    pdf = _bars_pdf(n=120)
    w = 20
    out = donchian(_bars(spark, pdf), window=w).toPandas()
    for sym, g in pdf.groupby("symbol"):
        hh = g["high"].rolling(w).max()
        ll = g["low"].rolling(w).min()
        got = (
            out[out["symbol"] == sym]
            .sort_values("ts_event")
            .reset_index(drop=True)
        )
        assert got["dc_upper"].iloc[: w - 1].isna().all()
        m = hh.notna().to_numpy()
        np.testing.assert_allclose(got["dc_upper"][m], hh[m], rtol=0)
        np.testing.assert_allclose(got["dc_lower"][m], ll[m], rtol=0)
        np.testing.assert_allclose(
            got["dc_mid"][m], ((hh + ll) / 2.0)[m], rtol=1e-12
        )
        ref_up = (g["close"] > hh.shift(1)).fillna(False).to_numpy()
        ref_dn = (g["close"] < ll.shift(1)).fillna(False).to_numpy()
        assert got["breakout_up"].tolist() == ref_up.tolist()
        assert got["breakout_down"].tolist() == ref_dn.tolist()


def test_donchian_breakout_golden_and_plan(spark):
    import pandas as pd

    from polars_trading_spark.operators.indicators import donchian
    from polars_trading_spark.plans import (
        count_python_stages,
        has_unbounded_following_frame,
        unbounded_global_windows,
    )

    # closes 1..5; window 3: channel defined from bar 3; bar 4 close 40
    # breaks above bar-3 upper (30); bar 5 close 1 breaks below lower (20)
    rows = [
        ("A", BASE + dt.timedelta(minutes=15 * i), o, h, l, c)
        for i, (o, h, l, c) in enumerate(
            [
                (10.0, 10.0, 10.0, 10.0),
                (20.0, 20.0, 20.0, 20.0),
                (30.0, 30.0, 20.0, 25.0),
                (40.0, 40.0, 39.0, 40.0),
                (1.0, 2.0, 1.0, 1.0),
            ]
        )
    ]
    pdf = pd.DataFrame(
        rows, columns=["symbol", "ts_event", "open", "high", "low", "close"]
    )
    out = donchian(_bars(spark, pdf), window=3).toPandas().sort_values("ts_event")
    assert out["breakout_up"].tolist() == [False, False, False, True, False]
    assert out["breakout_down"].tolist() == [False, False, False, False, True]

    with pytest.raises(ValueError):
        donchian(_bars(spark, pdf), window=1)
    plan = donchian(_bars(spark, pdf))
    assert count_python_stages(plan) == 0
    assert unbounded_global_windows(plan) == []
    assert not has_unbounded_following_frame(plan)
