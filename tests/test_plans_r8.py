"""Plan contracts for the round-8 additions (PNG pixel decode,
portfolio capacity, token-budget curves, BPE training/application,
rank_portfolio persist fix) — pinning the shapes that decide 100x
scale survival: Python stages only where the work IS Python (codecs),
no quadratic frames, no corpus-side sorts on lookup joins, bounded
exchange counts."""

from __future__ import annotations

import pytest

from polars_trading_spark.plans import (
    count_exchanges,
    count_python_stages,
    has_unbounded_following_frame,
    plan_string,
    unbounded_global_windows,
)
from polars_trading_spark.sources.tables import read_table, trades_from_events


@pytest.fixture
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


@pytest.fixture
def bars(spark, sf_dir):
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.bars import time_bars

    with Config(timestamp_column="ts_event"):
        return time_bars(trades_from_events(spark, sf_dir), bar_size="15m")


def test_png_decode_is_two_python_islands_no_shuffle(spark, docs):
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_png,
    )

    out = png_pixel_stats(synthesize_png(docs))
    # synthesis + decode are the two Arrow islands; the ONE exchange is
    # _media_base's slim id repartition to default parallelism (round
    # 12) — the payloads and pixel work themselves never shuffle
    assert count_python_stages(out) == 2
    assert count_exchanges(out) == 1


def test_portfolio_capacity_contract(spark, bars):
    from polars_trading_spark.operators.cross_section import portfolio_capacity

    out = portfolio_capacity(bars, ts_col="ts_event")
    assert count_python_stages(out) == 0
    assert not has_unbounded_following_frame(out)
    # the only global window is the one-row-per-bucket lag (bucket-
    # count-sized, never row-sized)
    assert len(unbounded_global_windows(out)) <= 1


def test_token_budget_curves_contract(spark, docs):
    from polars_trading_spark.functions.corpus import token_budget_curves

    out = token_budget_curves(docs)
    assert count_python_stages(out) == 0
    assert not has_unbounded_following_frame(out)
    assert unbounded_global_windows(out) == []
    # one projection + ONE per-source window family + boundary explode;
    # +1 for the payload-scan parallelism guard on small inputs
    assert count_exchanges(out) <= 2
    # token/quality expressions stay in the scan projection — no joins
    assert "Join" not in plan_string(out)


def test_bpe_token_budget_no_corpus_sort(spark, docs):
    from polars_trading_spark.functions.bpe import bpe_token_budget, bpe_train

    _, words = bpe_train(docs, n_merges=4)
    out = bpe_token_budget(docs, words)
    assert count_python_stages(out) == 0
    plan = plan_string(out)
    # the vocabulary lookup must hash-join, never sort the corpus-sized
    # exploded probe side (SortMergeJoin = T log T on the corpus)
    assert "SortMergeJoin" not in plan
    assert ("ShuffledHashJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_rank_portfolio_members_persisted_single_scan(spark, bars):
    from polars_trading_spark.operators.cross_section import (
        rank_portfolio_backtest,
    )

    out = rank_portfolio_backtest(bars, ts_col="ts_event")
    plan = plan_string(out)
    # the members frame is persisted: downstream consumers read the
    # InMemoryRelation instead of re-executing the scan+window pipeline
    assert "InMemoryTableScan" in plan
    from polars_trading_spark import release_persisted

    out.write.format("noop").mode("overwrite").save()
    assert release_persisted() >= 1


def test_hrp_output_shape_and_invariants(spark):
    # sf0.001's 15m bars have no timestamp covering every symbol
    # (complete-case alignment leaves nothing) — use a dense synthetic
    # tape; the sf0.01 registry query exercises the real path
    import datetime as dt

    import numpy as np

    from polars_trading_spark.operators.hrp import hrp_weights

    rng = np.random.RandomState(5)
    base = dt.datetime(2024, 1, 2)
    rows = []
    for s in range(4):
        p = 100.0
        for i in range(40):
            p *= float(np.exp(rng.normal(0, 0.01 * (s + 1))))
            rows.append((f"S{s}", base + dt.timedelta(minutes=15 * i), p))
    bars = spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, close double"
    )
    out = hrp_weights(bars, ts_col="ts_event").collect()
    ws = [r["weight"] for r in out]
    assert len(out) >= 2
    assert all(w > 0 for w in ws)
    assert sum(ws) == pytest.approx(1.0, rel=1e-9)
    assert sorted(r["seriation_rank"] for r in out) == list(range(len(out)))


def test_risk_contributions_contract(spark, bars):
    from polars_trading_spark.operators.covariance import risk_contributions

    out = risk_contributions(bars, ts_col="ts_event")
    assert count_python_stages(out) == 0
    assert not has_unbounded_following_frame(out)


def test_pcm_band_power_single_python_island(spark, docs):
    from polars_trading_spark.functions.multimodal import (
        pcm_band_power,
        synthesize_pcm,
    )

    out = pcm_band_power(synthesize_pcm(docs))
    assert count_python_stages(out) == 2  # synth + decode islands
    # one slim id exchange from _media_base; no payload shuffle
    assert count_exchanges(out) == 1
