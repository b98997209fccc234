"""Plan contracts for the round-10 additions (BPE encode/packing, the
execution shortfall family, the IRLS quality classifier, 4:2:2 JPEG) —
pinning the shapes that decide 100x scale survival: vocabulary lookups
hash-join without sorting the corpus-sized probe, Python only where the
work IS Python, no corpus-sized global windows."""

from __future__ import annotations

import pytest

from polars_trading_spark.plans import (
    count_exchanges,
    count_python_stages,
    plan_string,
    unbounded_global_windows,
)
from polars_trading_spark.sources.tables import read_table, trades_from_events


@pytest.fixture
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


@pytest.fixture
def trades(spark, sf_dir):
    return trades_from_events(spark, sf_dir)


def test_bpe_encode_no_corpus_sort_two_lookup_joins(spark, docs):
    from polars_trading_spark.functions.bpe import bpe_encode, bpe_train

    merges, words = bpe_train(docs, n_merges=4)
    out = bpe_encode(docs, merges, words)
    assert count_python_stages(out) == 0
    plan = plan_string(out)
    # both vocabulary lookups (word segmentation, token ids) must
    # hash-join; a SortMergeJoin would sort the corpus-sized exploded
    # probe twice
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # the only global window ranks the bounded char alphabet
    assert len(unbounded_global_windows(out)) <= 1


def test_bpe_pack_sequences_contract(spark, docs):
    from polars_trading_spark.functions.bpe import bpe_train
    from polars_trading_spark.functions.corpus import bpe_pack_sequences

    _, words = bpe_train(docs, n_merges=4)
    out = bpe_pack_sequences(docs, words, budget_tokens=512, n_shards=8)
    plan = plan_string(out)
    assert "SortMergeJoin" not in plan
    # exactly one Python stage: the shard-parallel packing island
    assert count_python_stages(out) == 1
    assert len(unbounded_global_windows(out)) == 0


def test_implementation_shortfall_contract(spark, trades):
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.execution import (
        execution_tearsheet,
        implementation_shortfall,
    )

    with Config(timestamp_column="ts_event"):
        par = implementation_shortfall(trades)
        ts = execution_tearsheet(trades)
    for out in (par, ts):
        assert count_python_stages(out) == 0
        # every window is symbol- or (symbol, parent)-partitioned
        assert len(unbounded_global_windows(out)) == 0
        assert "CartesianProduct" not in plan_string(out)


def test_quality_classifier_scoring_contract(spark, docs):
    from polars_trading_spark.functions.quality_model import quality_classifier

    out = quality_classifier(docs, n_iters=1, n_fold_buckets=8)
    try:
        assert count_python_stages(out) == 0
        plan = plan_string(out)
        assert "CartesianProduct" not in plan
        # the scoring pass reads the persisted feature frame, not a
        # recomputation of the profile + counts pipeline
        assert "InMemoryTableScan" in plan
    finally:
        from polars_trading_spark import release_persisted

        out.write.format("noop").mode("overwrite").save()
        assert release_persisted() >= 1


def test_jpeg_422_two_python_islands_no_shuffle(spark, docs):
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_color_422,
    )

    out = png_pixel_stats(synthesize_jpeg_color_422(docs))
    assert count_python_stages(out) == 2
    # one slim id exchange from _media_base; no payload shuffle
    assert count_exchanges(out) == 1


def test_market_impact_fit_contract(spark, trades):
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators.execution import market_impact_fit

    with Config(timestamp_column="ts_event"):
        out = market_impact_fit(trades)
    assert count_python_stages(out) == 0
    assert len(unbounded_global_windows(out)) == 0
    plan = plan_string(out)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # pure window algebra over the parent frame


def test_pbo_cscv_contract(spark, trades):
    from polars_trading_spark.config import Config
    from polars_trading_spark.operators import bars as bars_ops
    from polars_trading_spark.operators.pbo import pbo_cscv

    with Config(timestamp_column="ts_event"):
        bars = bars_ops.time_bars(trades, bar_size="15m")
    out = pbo_cscv(bars, n_blocks=4, lookbacks=(1, 2))
    assert count_python_stages(out) == 0
    # every global window runs over an aggregate-bounded frame (the
    # distinct-ts block index, the combos summary) — none over the bars
    assert len(unbounded_global_windows(out)) == 0


def test_tokenizer_fertility_contract(spark, docs):
    from polars_trading_spark.functions.bpe import bpe_train, tokenizer_fertility

    _, words = bpe_train(docs, n_merges=4)
    out = tokenizer_fertility(docs, words)
    assert count_python_stages(out) == 0
    plan = plan_string(out)
    # the vocabulary lookup must never sort the corpus-sized probe
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert len(unbounded_global_windows(out)) == 0


def test_embedding_quantize_contract(spark, sf_dir):
    from polars_trading_spark.functions.similarity import (
        embedding_quantize_report,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    out = embedding_quantize_report(emb)
    assert count_python_stages(out) == 0
    plan = plan_string(out)
    # scales join back as a dims-sized broadcast
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert len(unbounded_global_windows(out)) == 0


def test_dedup_incremental_contract(spark, docs):
    from polars_trading_spark._utils import release_persisted
    from polars_trading_spark.functions.dedup import (
        incremental_dedup,
        minhash_index,
    )

    base = docs.where("doc_id % 5 != 0")
    new = docs.where("doc_id % 5 = 0")
    out = incremental_dedup(new, minhash_index(base))
    try:
        assert count_python_stages(out) == 0
        plan = plan_string(out)
        # the band join is an equi-join on (band, key) — never a
        # cartesian / nested loop over the corpus
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert len(unbounded_global_windows(out)) == 0
    finally:
        release_persisted()
