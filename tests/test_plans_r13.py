"""Plan contracts for the round-13 registrations: the media families
keep the round-12 shape (exactly TWO Arrow islands — synthesize +
decode — over ONE slim 8-byte-id exchange from ``_media_base``; the
binary payloads themselves never shuffle), and the cleaned-text exact
substring dedup stays entirely native (zero Python stages, no
cartesian product anywhere — the span merge is window + hash-aggregate
algebra, the reassembly a higher-order function)."""

from __future__ import annotations

import pytest

from polars_trading_spark.plans import (
    count_exchanges,
    count_python_stages,
    plan_string,
)
from polars_trading_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF_DIR, "documents")


def _assert_media_shape(out):
    assert count_python_stages(out) == 2  # synth + decode islands
    # one slim id exchange from _media_base; no payload shuffle
    assert count_exchanges(out) == 1


def test_avi_metadata_two_islands_one_slim_exchange(spark, docs):
    from polars_trading_spark.functions.video import (
        avi_metadata_table,
        synthesize_avi_mjpeg,
    )

    _assert_media_shape(avi_metadata_table(synthesize_avi_mjpeg(docs)))


def test_avi_frame_stats_two_islands_one_slim_exchange(spark, docs):
    from polars_trading_spark.functions.video import (
        avi_frame_stats,
        synthesize_avi_mjpeg,
    )

    _assert_media_shape(avi_frame_stats(synthesize_avi_mjpeg(docs), stride=2))


def test_jpeg_extended_two_islands_one_slim_exchange(spark, docs):
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_extended,
    )

    _assert_media_shape(png_pixel_stats(synthesize_jpeg_extended(docs)))


def test_webp_predictor_two_islands_one_slim_exchange(spark, docs):
    from polars_trading_spark.functions.webp import (
        synthesize_webp_predictor,
        webp_pixel_stats,
    )

    _assert_media_shape(webp_pixel_stats(synthesize_webp_predictor(docs)))


def test_media_partitions_conf_overrides_island_width(spark, docs):
    """Round-13 verdict item 7: `spark.polars_trading.media.partitions`
    overrides the default-parallelism island width."""
    from polars_trading_spark.functions.multimodal import _media_base

    try:
        spark.conf.set("spark.polars_trading.media.partitions", "3")
        assert _media_base(docs).rdd.getNumPartitions() == 3
    finally:
        spark.conf.unset("spark.polars_trading.media.partitions")
    default = spark.sparkContext.defaultParallelism
    assert _media_base(docs).rdd.getNumPartitions() == default


def test_exact_substring_clean_native_no_cartesian(spark, docs):
    from polars_trading_spark.functions.dedup import (
        exact_substring_dedup_clean,
    )

    out = exact_substring_dedup_clean(docs, k=8)
    assert count_python_stages(out) == 0
    plan = plan_string(out, "executed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
