"""Plan contracts for the round-7 additions (text governance, corpus
profiles, rank IC, technical indicators) — pinning the shapes that
decide 100x scale survival: zero-shuffle per-doc profiles, top-k via
TakeOrdered (never a global sort), bounded exchange counts, zero
Python stages, no quadratic window frames."""

from __future__ import annotations

import pytest

from polars_trading_spark.plans import (
    count_exchanges,
    count_keyed_exchanges,
    count_python_stages,
    has_unbounded_following_frame,
    plan_string,
    unbounded_global_windows,
)
from polars_trading_spark.sources.tables import read_table, trades_from_events


@pytest.fixture
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_encoding_quality_zero_shuffle(spark, docs):
    from polars_trading_spark.functions.text import encoding_quality

    out = encoding_quality(docs)
    assert count_python_stages(out) == 0
    # pure per-row Columns over the scan: zero data-dependent shuffles,
    # ≤1 total for the payload-scan parallelism guard (small inputs)
    assert count_keyed_exchanges(out) == 0
    assert count_exchanges(out) <= 1


def test_code_detection_zero_shuffle(spark, docs):
    from polars_trading_spark.functions.text import code_detection

    out = code_detection(docs)
    assert count_python_stages(out) == 0
    assert count_keyed_exchanges(out) == 0
    assert count_exchanges(out) <= 1  # payload-scan parallelism guard


def test_lexical_diversity_contract(spark, docs):
    from polars_trading_spark.functions.text import lexical_diversity

    out = lexical_diversity(docs)
    assert count_python_stages(out) == 0
    assert not has_unbounded_following_frame(out)
    assert unbounded_global_windows(out) == []
    # exactly (doc,type) agg + doc reduce — explode_outer removed the
    # join-back (and its corpus-id shuffle + second scan); +1 for the
    # payload-scan parallelism guard on small inputs
    assert count_exchanges(out) <= 3


def test_heaps_law_contract(spark, docs):
    from polars_trading_spark.functions.tfidf import heaps_law

    out = heaps_law(docs, n_checkpoints=50)
    assert count_python_stages(out) == 0
    assert not has_unbounded_following_frame(out)
    # the ordered OLS windows are global but sit above checkpoint-sized
    # aggregates — the detector must see them as bounded
    assert unbounded_global_windows(out) == []


def test_term_burstiness_topk_never_global_sort(spark, docs):
    from polars_trading_spark.functions.tfidf import term_burstiness

    out = term_burstiness(docs, min_df=2, top_k=20)
    assert count_python_stages(out) == 0
    assert unbounded_global_windows(out) == []
    assert "TakeOrderedAndProject" in plan_string(out, "executed")


def test_url_profile_and_lang_mix_contract(spark, docs):
    from polars_trading_spark.functions.corpus import lang_mix, url_profile

    u = url_profile(docs.limit(50), top_k=10)
    assert count_python_stages(u) == 0
    assert unbounded_global_windows(u) == []
    assert "TakeOrderedAndProject" in plan_string(u, "executed")

    m = lang_mix(docs)
    assert count_python_stages(m) == 0
    assert unbounded_global_windows(m) == []
    assert not has_unbounded_following_frame(m)


def test_rank_ic_contract(spark, sf_dir):
    from polars_trading_spark.operators.cross_section import rank_ic
    from polars_trading_spark import Config
    from polars_trading_spark.operators import bars as bars_ops

    with Config(timestamp_column="ts_event"):
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size="15m")
    out = rank_ic(bars, ts_col="ts_event")
    assert count_python_stages(out) == 0
    assert not has_unbounded_following_frame(out)
    assert unbounded_global_windows(out) == []


def test_indicator_single_symbol_exchange(spark, sf_dir):
    from polars_trading_spark.operators.indicators import atr, bollinger, macd
    from polars_trading_spark import Config
    from polars_trading_spark.operators import bars as bars_ops

    with Config(timestamp_column="ts_event"):
        bars = bars_ops.time_bars(trades_from_events(spark, sf_dir), bar_size="15m")
    # bar construction = 1 exchange; every EWM fold and rolling window
    # reuses the symbol hash (hash(symbol) satisfies clustering on
    # (symbol, chunk)) — MACD's three cascaded folds add ZERO exchanges
    base = count_exchanges(bars)
    for op in (atr, bollinger, macd):
        out = op(bars, ts_col="ts_event")
        assert count_python_stages(out) == 0
        assert not has_unbounded_following_frame(out)
        assert count_exchanges(out) <= base + 1, op.__name__


def test_bm25_and_heaps_single_corpus_pass(spark, docs):
    """SCALING §40/§41: the only corpus-sized pipeline (tokenize +
    explode + hash agg) must execute ONCE — its multi-consumer
    aggregate is staged, visible as an InMemoryTableScan."""
    from polars_trading_spark.functions.tfidf import bm25_topk, heaps_law

    # Note: "Generate explode" can PRINT multiple times (each
    # InMemoryRelation re-prints its cached child plan), so the staging
    # proof is that BOTH consumers read InMemoryTableScans — the
    # runtime single-pass wins are measured in SCALING §40/§41.
    out = bm25_topk(docs, query_terms=("hash", "join"), top_k=5)
    plan = plan_string(out, "executed")
    assert plan.count("InMemoryTableScan") >= 2

    out2 = heaps_law(docs, n_checkpoints=20)
    plan2 = plan_string(out2, "executed")
    assert plan2.count("InMemoryTableScan") >= 2
