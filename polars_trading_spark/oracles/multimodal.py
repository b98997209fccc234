"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark.functions import multimodal as mm_ops
from polars_trading_spark.sources.tables import read_table
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from polars_trading_spark.oracles._shared import (  # noqa: F401
    register,
)



# --------------------------------------------------------------------------
# multimodal_metadata: binary payload plumbing via mapInPandas; the fake
# decoder is deterministic, so it has an exact SQL oracle even though the
# engine path exercises the real Arrow-batched UDF machinery.
# --------------------------------------------------------------------------


@register(
    "multimodal_metadata",
    """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         text,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT media_id, media_type, n_bytes,
       CAST(CASE WHEN media_type IN ('image', 'video') THEN n_bytes % 640 + 16 ELSE 0 END AS INTEGER) AS width,
       CAST(CASE WHEN media_type IN ('image', 'video') THEN n_bytes % 480 + 16 ELSE 0 END AS INTEGER) AS height,
       CAST(CASE WHEN media_type <> 'image' THEN n_bytes * 40 ELSE 0 END AS BIGINT) AS duration_ms,
       md5(text) AS checksum
FROM media
""",
    "Opaque-binary media plumbing: payload synthesis + Arrow-batched "
    "mapInPandas metadata extraction (decode kernels stubbed — no codec "
    "libs in the container; schema/batch plumbing is real)",
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = mm_ops.synthesize_media(docs)
    return mm_ops.extract_media_metadata(media)



@register(
    "multimodal_frame_sample",
    """
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) * 40 AS duration_ms
  FROM documents
)
SELECT media_id,
       CAST(unnest(generate_series(0, greatest(duration_ms // 1000 - 1, 0))) AS BIGINT) AS frame_idx,
       CAST(unnest(generate_series(0, greatest(duration_ms // 1000 - 1, 0))) * 1000 AS BIGINT) AS offset_ms
FROM media WHERE media_type = 'video'
""",
    "Video frame-sampling plumbing: per-video frame rows at 1s spacing "
    "(explode over native sequence; the frame decode itself is the "
    "stubbed mapInPandas stage downstream)",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = mm_ops.synthesize_media(docs)
    out = mm_ops.sample_frames(media, every_ms=1000)
    return out.select(
        "media_id",
        F.col("frame_idx").cast("long"),
        F.col("offset_ms").cast("long"),
    )



# --------------------------------------------------------------------------
# C-ext. PCM waveform features (functions/multimodal.py::pcm_features) —
# real byte-level decode (np.frombuffer) with an exact arithmetic oracle.
# --------------------------------------------------------------------------

_PCM_SR = 16_000



@register(
    "pcm_features",
    f"""
WITH m AS (SELECT doc_id AS media_id FROM documents),
s AS (
  SELECT media_id, i,
    ((media_id * 7919 + i * 104729) % 65536) - 32768 AS v
  FROM m, unnest(range(0, 400 + CAST(media_id % 800 AS INTEGER))) AS t(i)
),
lagged AS (
  SELECT media_id, v,
    lead(v) OVER (PARTITION BY media_id ORDER BY i) AS nxt
  FROM s
),
g AS (
  SELECT media_id,
    CAST(count(*) AS BIGINT) AS n_samples,
    sum(v * v) AS ss,
    max(abs(v)) AS peak,
    CAST(count(CASE WHEN v * nxt < 0 THEN 1 END) AS BIGINT) AS zero_crossings
  FROM lagged GROUP BY media_id
)
SELECT media_id, n_samples,
  round(n_samples * 1000.0 / {_PCM_SR}, 6) AS duration_ms,
  round(sqrt(ss / n_samples), 6) AS rms,
  CAST(peak AS INTEGER) AS peak,
  zero_crossings
FROM g
""",
    "Waveform features (RMS, peak, zero crossings) decoded from raw "
    "s16le PCM bytes via Arrow mapInPandas — the oracle regenerates the "
    "samples arithmetically",
)
def q_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import pcm_features, synthesize_pcm

    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_pcm(docs, sample_rate=_PCM_SR)
    out = pcm_features(media)
    return out.select(
        "media_id",
        "n_samples",
        F.round("duration_ms", 6).alias("duration_ms"),
        F.round("rms", 6).alias("rms"),
        "peak",
        "zero_crossings",
    )



# --------------------------------------------------------------------------
# C-ext. Real BMP header metadata (functions/multimodal.py::
# parse_image_header) — spec-valid 24-bit BMP files synthesized per doc,
# dimensions parsed from the REAL binary header (no codec library), byte
# count replayed closed-form by the oracle.
# --------------------------------------------------------------------------


@register(
    "multimodal_bmp_metadata",
    """
SELECT
  doc_id AS media_id,
  CAST(4 + doc_id % 29 AS INTEGER) AS width,
  CAST(3 + doc_id % 17 AS INTEGER) AS height,
  CAST(54 + ((3 * (4 + doc_id % 29) + 3) // 4) * 4 * (3 + doc_id % 17)
       AS BIGINT) AS n_bytes
FROM documents
""",
    "Real binary-format metadata: synthesized spec-valid BMPs, width/"
    "height parsed from the actual BITMAPINFOHEADER bytes (pure-Python "
    "parser, no codec lib), file size replayed arithmetically",
)
def q_multimodal_bmp_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        extract_media_metadata,
        synthesize_bmp,
    )

    media = synthesize_bmp(read_table(spark, sf_dir, "documents")).withColumn(
        "media_type", F.lit("image")
    )
    out = extract_media_metadata(media)
    return out.select("media_id", "width", "height", "n_bytes")



# --------------------------------------------------------------------------
# C-ext. Real JPEG header metadata (functions/multimodal.py::
# _parse_jpeg_sof) — deterministic JFIF marker streams synthesized per
# doc; dimensions read by walking APP0/DQT to the SOF0 segment (a real
# variable-length parser, not a fixed-offset peek).  110-byte streams.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_metadata",
    """
SELECT
  doc_id AS media_id,
  CAST(16 + doc_id % 613 AS INTEGER) AS width,
  CAST(16 + doc_id % 377 AS INTEGER) AS height,
  CAST(110 AS BIGINT) AS n_bytes
FROM documents
""",
    "Real JPEG metadata: synthesized JFIF marker streams (SOI/APP0/DQT/"
    "SOF0/EOI, correct segment lengths), dimensions parsed by walking "
    "the variable-length marker stream to SOF0 — pure Python, no codec "
    "lib; byte count replayed arithmetically",
)
def q_multimodal_jpeg_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        extract_media_metadata,
        synthesize_jpeg,
    )

    media = synthesize_jpeg(read_table(spark, sf_dir, "documents")).withColumn(
        "media_type", F.lit("image")
    )
    out = extract_media_metadata(media)
    return out.select("media_id", "width", "height", "n_bytes")


# --------------------------------------------------------------------------
# C-ext. REAL PNG pixel decode (functions/multimodal.py::png_decode) —
# spec-valid PNGs synthesized per doc (zlib-deflate IDAT, rows cycling
# all five filter types, correct CRCs), decoded back by the pure-stdlib
# inflate + unfilter kernel; the oracle regenerates the pixel aggregates
# closed-form, so ONE corrupted byte anywhere in the compress/filter/
# inflate/unfilter round-trip flips the order-sensitive px_dot hash.
# --------------------------------------------------------------------------


@register(
    "multimodal_png_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 + doc_id % 29 AS INTEGER) AS width,
         CAST(3 + doc_id % 17 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height,
         (media_id * 31 + j * 7) % 256 AS b,
         j
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height * 3)) AS t(j)
)
SELECT media_id,
  'png' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(b) AS BIGINT) AS px_sum,
  CAST(sum(b * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib PNG pixel decode: synthesized spec-valid PNGs (deflate "
    "IDAT, all five row filters, CRC-checked) decoded via zlib inflate + "
    "unfilter in Arrow mapInPandas; exact integer pixel aggregates "
    "replayed arithmetically by the oracle",
)
def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_png,
    )

    media = synthesize_png(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 8). PCM dyadic-bin DFT amplitudes (functions/
# multimodal.py::pcm_band_power) — at periods 8/4/2 every cos/sin
# coefficient is in {0, +-1, +-sqrt(1/2)} over the t mod 8 phase
# classes, so the bins reduce to INTEGER phase sums combined in one
# fixed-order float expression with a single injected irrational —
# bit-identical cross-engine, no float-fold ambiguity.
# --------------------------------------------------------------------------

_BAND_R = 0.7071067811865476  # = functions/multimodal.py::SQRT_HALF


@register(
    "pcm_band_power",
    f"""
WITH m AS (SELECT doc_id AS media_id FROM documents),
s AS (
  SELECT media_id, i % 8 AS p,
    ((media_id * 7919 + i * 104729) % 65536) - 32768 AS v
  FROM m, unnest(range(0, 400 + CAST(media_id % 800 AS INTEGER))) AS t(i)
),
ph AS (
  SELECT media_id,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN p = 0 THEN v ELSE 0 END) AS BIGINT) AS s0,
    CAST(sum(CASE WHEN p = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
    CAST(sum(CASE WHEN p = 2 THEN v ELSE 0 END) AS BIGINT) AS s2,
    CAST(sum(CASE WHEN p = 3 THEN v ELSE 0 END) AS BIGINT) AS s3,
    CAST(sum(CASE WHEN p = 4 THEN v ELSE 0 END) AS BIGINT) AS s4,
    CAST(sum(CASE WHEN p = 5 THEN v ELSE 0 END) AS BIGINT) AS s5,
    CAST(sum(CASE WHEN p = 6 THEN v ELSE 0 END) AS BIGINT) AS s6,
    CAST(sum(CASE WHEN p = 7 THEN v ELSE 0 END) AS BIGINT) AS s7
  FROM s GROUP BY media_id
),
amp AS (
  SELECT media_id, n,
    (s0 - s4) + CAST({_BAND_R!r} AS DOUBLE) * ((s1 + s7) - (s3 + s5)) AS c8,
    (s2 - s6) + CAST({_BAND_R!r} AS DOUBLE) * ((s1 + s3) - (s5 + s7)) AS s8,
    (s0 + s4) - (s2 + s6) AS c4,
    (s1 + s5) - (s3 + s7) AS s4x,
    (s0 + s2 + s4 + s6) - (s1 + s3 + s5 + s7) AS c2,
    s0 + s1 + s2 + s3 + s4 + s5 + s6 + s7 AS tot
  FROM ph
)
SELECT media_id, n AS n_samples,
  round(tot / n, 6) + 0 AS dc_mean,
  round(2.0 * sqrt(c8 * c8 + s8 * s8) / n, 6) + 0 AS amp_sr8,
  round(2.0 * sqrt(c4 * c4 + s4x * s4x) / n, 6) + 0 AS amp_sr4,
  round(abs(c2) / n, 6) + 0 AS amp_sr2
FROM amp
""",
    "Dyadic-bin DFT amplitudes (sr/8, sr/4, sr/2) + DC over raw s16le "
    "PCM — integer phase sums, fixed-order float combination, one "
    "injected sqrt(1/2) literal: exact cross-engine audio features",
)
def q_pcm_band_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        pcm_band_power,
        synthesize_pcm,
    )

    docs = read_table(spark, sf_dir, "documents")
    media = synthesize_pcm(docs, sample_rate=16_000)
    out = pcm_band_power(media)
    z0 = F.lit(0.0)
    return out.select(
        "media_id",
        "n_samples",
        (F.round("dc_mean", 6) + z0).alias("dc_mean"),
        (F.round("amp_sr8", 6) + z0).alias("amp_sr8"),
        (F.round("amp_sr4", 6) + z0).alias("amp_sr4"),
        (F.round("amp_sr2", 6) + z0).alias("amp_sr2"),
    )


# --------------------------------------------------------------------------
# C-ext (round 8). REAL GIF LZW pixel decode (functions/multimodal.py::
# gif_decode) — spec-valid GIF89a files synthesized per doc (16-color
# deterministic palette, variable-width LZW with CLEAR resets), decoded
# by the pure-stdlib LZW kernel; the oracle regenerates the decoded RGB
# aggregates closed-form through the palette map, so one wrong index
# anywhere in the compress/decompress round-trip flips px_dot.
# --------------------------------------------------------------------------


@register(
    "multimodal_gif_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 + doc_id % 29 AS INTEGER) AS width,
         CAST(3 + doc_id % 17 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, j,
         (media_id * 31 + j * 7) % 16 AS idx
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(j)
),
rgb AS (
  SELECT media_id, width, height, j,
    (idx * 37) % 256 AS r,
    (idx * 59 + 11) % 256 AS g,
    (idx * 83 + 29) % 256 AS b
  FROM px
)
SELECT media_id,
  'gif' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(r + g + b) AS BIGINT) AS px_sum,
  CAST(sum(r * ((3 * j) % 251 + 1)
         + g * ((3 * j + 1) % 251 + 1)
         + b * ((3 * j + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb
GROUP BY media_id
""",
    "REAL stdlib GIF pixel decode: synthesized spec-valid GIF89a "
    "(deterministic 16-color palette, variable-width LZW incl. CLEAR "
    "resets) decoded via the pure-Python LZW kernel in Arrow "
    "mapInPandas; exact integer RGB aggregates replayed arithmetically",
)
def q_multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_gif,
    )

    media = synthesize_gif(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 8). REAL JPEG entropy decode (functions/multimodal.py::
# jpeg_decode_gray) — decodable baseline grayscale JPEGs synthesized per
# doc (standard Annex-K Huffman tables, differential DC, byte stuffing),
# decoded by the pure-stdlib Huffman+IDCT kernel.  DC-only blocks make
# every decoded pixel an exact closed-form integer, so the oracle
# replays the aggregates arithmetically: one wrong bit anywhere in the
# Huffman stream flips px_dot.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(8 * (1 + doc_id % 6) AS INTEGER) AS width,
         CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, j,
    2 * ((media_id + 13 * ((j // width // 8) * (width // 8) + (j % width) // 8)) % 64) + 64 AS v
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(j)
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib JPEG entropy decode: synthesized decodable baseline "
    "grayscale JPEGs (standard Annex-K Huffman tables, differential DC, "
    "byte stuffing) decoded via canonical-Huffman + IDCT in Arrow "
    "mapInPandas; DC-only spectra make every pixel an exact integer the "
    "oracle replays closed-form",
)
def q_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_decodable,
    )

    media = synthesize_jpeg_decodable(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 9). Baseline COLOR JPEG decode (functions/multimodal.py::
# jpeg_decode, 3-component YCbCr 4:4:4 through the same generic
# Huffman/dequant/IDCT path + BT.601 color transform).  DC-only spectra
# per component make each plane an exact integer; the floor(x+0.5)
# color transform is replayed in double on both engines, so px_dot is
# bit-exact over the full RGB byte stream.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_color_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(8 * (1 + doc_id % 6) AS INTEGER) AS width,
         CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
  FROM documents
),
blk AS (
  SELECT media_id, width, height, k,
    CAST(2 * ((media_id + 13 * k) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM m, unnest(range(0, CAST(width // 8 AS BIGINT) * (height // 8))) AS t(k)
),
rgb AS (
  SELECT media_id, width, height, k,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM blk
),
px AS (
  SELECT media_id, width, height,
    3 * (((k // (width // 8)) * 8 + p // 8) * width
         + ((k % (width // 8)) * 8 + p % 8)) + c AS j,
    CAST(CASE c WHEN 0 THEN r WHEN 1 THEN g ELSE b END AS BIGINT) AS v
  FROM rgb, unnest(range(0, 64)) AS tp(p), unnest(range(0, 3)) AS tc(c)
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib COLOR JPEG decode: synthesized baseline YCbCr 4:4:4 "
    "JPEGs (interleaved scan, per-component differential DC) decoded "
    "via the generic canonical-Huffman + IDCT path and the BT.601 "
    "floor(x+0.5) color transform in Arrow mapInPandas; the oracle "
    "replays every RGB byte closed-form, so one wrong bit anywhere in "
    "the 3-component entropy decode or the color math breaks px_dot",
)
def q_multimodal_jpeg_color_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_color,
    )

    media = synthesize_jpeg_color(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 9). Indexed-color (PLTE) PNG decode — the former
# NotImplementedError: palette indices flow through the full
# inflate/unfilter path (all five filters), then map through the PLTE
# table; the oracle replays every RGB byte arithmetically.
# --------------------------------------------------------------------------


@register(
    "multimodal_png_palette_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 + doc_id % 29 AS INTEGER) AS width,
         CAST(3 + doc_id % 17 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, j,
         (media_id * 7 + j * 13) % 16 AS idx
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(j)
),
rgb AS (
  SELECT media_id, width, height, j,
    (idx * 37 + 11) % 256 AS r,
    (idx * 59 + 23) % 256 AS g,
    (idx * 83 + 47) % 256 AS b
  FROM px
)
SELECT media_id,
  'png' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(r + g + b) AS BIGINT) AS px_sum,
  CAST(sum(r * ((3 * j) % 251 + 1)
         + g * ((3 * j + 1) % 251 + 1)
         + b * ((3 * j + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb
GROUP BY media_id
""",
    "REAL stdlib PALETTE PNG decode: indexed-color PNGs (16-entry PLTE, "
    "rows cycling all five filter types) decoded via inflate + unfilter "
    "+ palette map in Arrow mapInPandas; exact RGB aggregates replayed "
    "arithmetically — closes the palette NotImplementedError",
)
def q_multimodal_png_palette_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_png_palette,
    )

    media = synthesize_png_palette(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 9). INTERLACED GIF decode — the former
# NotImplementedError: rows stored in the 4-pass spec order must be
# de-interlaced back to row-major, so the oracle's order-sensitive
# px_dot breaks on any pass-mapping slip.
# --------------------------------------------------------------------------


@register(
    "multimodal_gif_interlaced_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 + doc_id % 29 AS INTEGER) AS width,
         CAST(3 + doc_id % 17 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, j,
         (media_id * 13 + j * 5) % 16 AS idx
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(j)
),
rgb AS (
  SELECT media_id, width, height, j,
    (idx * 37) % 256 AS r,
    (idx * 59 + 11) % 256 AS g,
    (idx * 83 + 29) % 256 AS b
  FROM px
)
SELECT media_id,
  'gif' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(r + g + b) AS BIGINT) AS px_sum,
  CAST(sum(r * ((3 * j) % 251 + 1)
         + g * ((3 * j + 1) % 251 + 1)
         + b * ((3 * j + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb
GROUP BY media_id
""",
    "REAL stdlib INTERLACED GIF decode: 4-pass row order de-interlaced "
    "back to row-major through the LZW kernel; the row-major closed "
    "form only matches if the pass mapping is exactly right",
)
def q_multimodal_gif_interlaced_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_gif_interlaced,
    )

    media = synthesize_gif_interlaced(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 9). Adam7-INTERLACED PNG decode — the last PNG scope gap:
# seven independently filtered passes scattered back onto the pixel
# grid; the order-sensitive px_dot only matches if every pass's
# unfilter AND its grid placement are exactly right.
# --------------------------------------------------------------------------


@register(
    "multimodal_png_interlaced_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 + doc_id % 29 AS INTEGER) AS width,
         CAST(3 + doc_id % 17 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, j, (media_id * 31 + j * 7) % 256 AS v
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height * 3)) AS t(j)
)
SELECT media_id,
  'png' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib Adam7-interlaced PNG decode: seven independently "
    "filtered passes unfiltered and scattered back to the row-major "
    "grid; the closed-form byte stream only matches if every pass "
    "boundary, sub-image unfilter, and grid placement is exact",
)
def q_multimodal_png_interlaced_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_png_interlaced,
    )

    media = synthesize_png_interlaced(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 9). 4:2:0 CHROMA-SUBSAMPLED color JPEG decode — the
# former "subsampled" NotImplementedError: four Y blocks + half-res
# Cb/Cr per 16x16 MCU through the sampling-factor-aware scan decoder,
# chroma upsampled by 2x2 pixel replication (spec-legal, exact in
# integers), then the BT.601 floor(x+0.5) transform.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_420_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(16 * (1 + doc_id % 3) AS INTEGER) AS width,
         CAST(16 * (1 + doc_id % 2) AS INTEGER) AS height
  FROM documents
),
px0 AS (
  SELECT media_id, width, height,
    p % width AS x, p // width AS y
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(p)
),
px AS (
  SELECT media_id, width, height, x, y,
    (y // 16) * (width // 16) + (x // 16) AS k,
    ((y % 16) // 8) * 2 + (x % 16) // 8 AS s
  FROM px0
),
ycc AS (
  SELECT media_id, width, height, x, y,
    CAST(2 * ((media_id + 13 * (4 * k + s)) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM px
),
rgb AS (
  SELECT media_id, width, height, 3 * (y * width + x) AS j0,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM ycc
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(CAST(r AS BIGINT) + CAST(g AS BIGINT) + CAST(b AS BIGINT)) AS BIGINT) AS px_sum,
  CAST(sum(CAST(r AS BIGINT) * (j0 % 251 + 1)
         + CAST(g AS BIGINT) * ((j0 + 1) % 251 + 1)
         + CAST(b AS BIGINT) * ((j0 + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb
GROUP BY media_id
""",
    "REAL stdlib 4:2:0 SUBSAMPLED color JPEG decode: four Y blocks + "
    "half-res chroma per MCU through the sampling-aware scan decoder, "
    "2x2-replicated chroma, BT.601 floor transform — every RGB byte "
    "replayed closed-form",
)
def q_multimodal_jpeg_420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_color_420,
    )

    media = synthesize_jpeg_color_420(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 10). 4:2:2 CHROMA-SUBSAMPLED color JPEG decode — the
# last subsampled layout: two Y blocks + half-HORIZONTAL-res Cb/Cr per
# 16x8 MCU through the same sampling-factor-aware scan decoder
# (functions/multimodal.py::_jpeg_decode_scan is generic over (hs,vs)),
# chroma upsampled by 1x2 pixel replication, BT.601 floor(x+0.5)
# transform.  JPEG scope now pins progressive / 4-component only.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_422_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(16 * (1 + doc_id % 3) AS INTEGER) AS width,
         CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height
  FROM documents
),
px0 AS (
  SELECT media_id, width, height,
    p % width AS x, p // width AS y
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(p)
),
px AS (
  SELECT media_id, width, height, x, y,
    (y // 8) * (width // 16) + (x // 16) AS k,
    (x % 16) // 8 AS s
  FROM px0
),
ycc AS (
  SELECT media_id, width, height, x, y,
    CAST(2 * ((media_id + 13 * (2 * k + s)) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM px
),
rgb AS (
  SELECT media_id, width, height, 3 * (y * width + x) AS j0,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM ycc
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(CAST(r AS BIGINT) + CAST(g AS BIGINT) + CAST(b AS BIGINT)) AS BIGINT) AS px_sum,
  CAST(sum(CAST(r AS BIGINT) * (j0 % 251 + 1)
         + CAST(g AS BIGINT) * ((j0 + 1) % 251 + 1)
         + CAST(b AS BIGINT) * ((j0 + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb
GROUP BY media_id
""",
    "REAL stdlib 4:2:2 SUBSAMPLED color JPEG decode: two Y blocks + "
    "half-horizontal-res chroma per 16x8 MCU through the sampling-aware "
    "scan decoder, 1x2-replicated chroma, BT.601 floor transform — "
    "every RGB byte replayed closed-form; the JPEG scope pin now names "
    "progressive / 4-component only",
)
def q_multimodal_jpeg_422_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_color_422,
    )

    media = synthesize_jpeg_color_422(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 10). PROGRESSIVE (SOF2) color JPEG decode — the last
# JPEG scope pin: spectral selection + successive approximation
# (interleaved DC first scan at Al=1, DC refinement bits, per-component
# AC first/refinement scans with cross-block EOB runs), decoded by the
# multi-scan coefficient-accumulation path in functions/multimodal.py.
# The synthesizer reuses synthesize_jpeg_color's DC-only spectra, so
# the oracle is the SAME closed form — any error in the six-scan
# entropy decode breaks px_dot.  JPEG scope now pins 4-component and
# subsampled-progressive only.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_progressive_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(8 * (1 + doc_id % 6) AS INTEGER) AS width,
         CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
  FROM documents
),
blk AS (
  SELECT media_id, width, height, k,
    CAST(2 * ((media_id + 13 * k) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM m, unnest(range(0, CAST(width // 8 AS BIGINT) * (height // 8))) AS t(k)
),
rgb AS (
  SELECT media_id, width, height, k,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM blk
),
px AS (
  SELECT media_id, width, height,
    3 * (((k // (width // 8)) * 8 + p // 8) * width
         + ((k % (width // 8)) * 8 + p % 8)) + c AS j,
    CAST(CASE c WHEN 0 THEN r WHEN 1 THEN g ELSE b END AS BIGINT) AS v
  FROM rgb, unnest(range(0, 64)) AS tp(p), unnest(range(0, 3)) AS tc(c)
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib PROGRESSIVE color JPEG decode: SOF2 successive-"
    "approximation streams (interleaved DC first + refinement scans, "
    "per-component AC scans with cross-block EOB runs) decoded by "
    "multi-scan coefficient accumulation then the shared IDCT/BT.601 "
    "path; the oracle replays every RGB byte closed-form",
)
def q_multimodal_jpeg_progressive_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_progressive,
    )

    media = synthesize_jpeg_progressive(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 10). 16-BIT PNG decode — the former non-depth-8
# NotImplementedError (16-bit arm): depth-16 RGB streams unfilter on a
# 2-bytes-per-sample byte grid (bpp = 6) and recombine big-endian
# sample pairs; the order-sensitive px_dot over 16-bit SAMPLES breaks
# on any byte-pairing or filter slip.
# --------------------------------------------------------------------------


@register(
    "multimodal_png16_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 + doc_id % 23 AS INTEGER) AS width,
         CAST(3 + doc_id % 13 AS INTEGER) AS height
  FROM documents
),
smp AS (
  SELECT media_id, width, height, j,
         (media_id * 97 + j * 641) % 65536 AS v
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height * 3)) AS t(j)
)
SELECT media_id,
  'png' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM smp
GROUP BY media_id
""",
    "REAL stdlib 16-BIT PNG decode: depth-16 RGB streams (rows cycling "
    "all five filter types) unfiltered on the 2-bytes-per-sample byte "
    "grid and recombined big-endian in Arrow mapInPandas; exact 16-bit "
    "sample aggregates replayed arithmetically — closes the 16-bit arm "
    "of the non-depth-8 NotImplementedError",
)
def q_multimodal_png16_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_png16,
    )

    media = synthesize_png16(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 10). 4-COMPONENT (CMYK) JPEG decode — the former
# 4-component NotImplementedError: Adobe transform=0 streams decode
# through the generic nc-component scan path with the sample planes
# returned AS STORED (T.81 defines no color semantics); DC-only
# spectra make every sample an exact closed-form integer.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_cmyk_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(8 * (1 + doc_id % 6) AS INTEGER) AS width,
         CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
  FROM documents
),
blk AS (
  SELECT media_id, width, height, k,
    2 * ((media_id + 13 * k) % 64) + 64 AS c0,
    2 * ((2 * media_id + 7 * k) % 64) + 64 AS c1,
    2 * ((3 * media_id + 5 * k) % 64) + 64 AS c2,
    2 * ((4 * media_id + 11 * k) % 64) + 64 AS c3
  FROM m, unnest(range(0, CAST(width // 8 AS BIGINT) * (height // 8))) AS t(k)
),
px AS (
  SELECT media_id, width, height,
    4 * (((k // (width // 8)) * 8 + p // 8) * width
         + ((k % (width // 8)) * 8 + p % 8)) + c AS j,
    CAST(CASE c WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END
         AS BIGINT) AS v
  FROM blk, unnest(range(0, 64)) AS tp(p), unnest(range(0, 4)) AS tc(c)
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib 4-COMPONENT (CMYK) JPEG decode: Adobe transform=0 "
    "baseline streams (interleaved 4-plane scan, per-component "
    "differential DC) decoded via the generic canonical-Huffman + IDCT "
    "path, sample planes returned as stored; the oracle replays every "
    "sample byte closed-form — closes the 4-component scope pin",
)
def q_multimodal_jpeg_cmyk_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_cmyk,
    )

    media = synthesize_jpeg_cmyk(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 11). YCCK + SUBSAMPLED 4-component JPEG decode — the
# print/scan Adobe variant (transform=2) that stores (Y, Cb, Cr, K)
# with Y and K at 2x1 sampling: the generic sampling-factor scan
# decoder handles the six-block 16x8 MCU, chroma replicates 1x2, the
# BT.601 inverse + libjpeg complement (C,M,Ye) = 255-(R,G,B) recovers
# CMYK with K as stored.  Closes BOTH remaining sequential-JPEG pins
# (YCCK and subsampled 4-component) in one stream; with the
# progressive-YCCK registration below, the JPEG scope pin now names
# SUBSAMPLED progressive only.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_ycck_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(16 * (1 + doc_id % 3) AS INTEGER) AS width,
         CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height
  FROM documents
),
px0 AS (
  SELECT media_id, width, height,
    p % width AS x, p // width AS y
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(p)
),
px AS (
  SELECT media_id, width, height, x, y,
    (y // 8) * (width // 16) + (x // 16) AS k,
    (x % 16) // 8 AS s
  FROM px0
),
ycc AS (
  SELECT media_id, width, height, x, y,
    CAST(2 * ((media_id + 13 * (2 * k + s)) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr,
    CAST(2 * ((4 * media_id + 11 * (2 * k + s)) % 64) + 64 AS BIGINT) AS kv
  FROM px
),
cmyk AS (
  SELECT media_id, width, height, y * width + x AS pix,
    255 - CAST(least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS BIGINT) AS c0,
    255 - CAST(least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS BIGINT) AS c1,
    255 - CAST(least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS BIGINT) AS c2,
    kv AS c3
  FROM ycc
),
byt AS (
  SELECT media_id, width, height, 4 * pix + c AS j,
    CASE c WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END AS v
  FROM cmyk, unnest(range(0, 4)) AS tc(c)
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM byt
GROUP BY media_id
""",
    "REAL stdlib YCCK (Adobe transform=2) SUBSAMPLED 4-component JPEG "
    "decode: Y and K at 2x1 / chroma at 1x1 through the "
    "sampling-factor-generic scan decoder, 1x2-replicated chroma, "
    "BT.601 inverse + libjpeg complement to CMYK with K as stored — "
    "every sample byte replayed closed-form; closes the YCCK and "
    "subsampled-4-component pins (progressive 4-component closes below)",
)
def q_multimodal_jpeg_ycck_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_ycck,
    )

    media = synthesize_jpeg_ycck(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 10). SUB-8-BIT PNG decode — the LAST PNG scope pin:
# depth-4 indexed-color streams unfilter on the PACKED scanline bytes
# (bpp = 1) and unpack MSB-first nibbles before the palette map; same
# arithmetic pixel formulas as the depth-8 palette oracle, so any
# bit-unpacking or filter slip breaks the order-sensitive px_dot.
# --------------------------------------------------------------------------


@register(
    "multimodal_png_sub8_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 + doc_id % 29 AS INTEGER) AS width,
         CAST(3 + doc_id % 17 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height, j,
         (media_id * 7 + j * 13) % 16 AS idx
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(j)
),
rgb AS (
  SELECT media_id, width, height, j,
    (idx * 37 + 11) % 256 AS r,
    (idx * 59 + 23) % 256 AS g,
    (idx * 83 + 47) % 256 AS b
  FROM px
)
SELECT media_id,
  'png' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(r + g + b) AS BIGINT) AS px_sum,
  CAST(sum(r * ((3 * j) % 251 + 1)
         + g * ((3 * j + 1) % 251 + 1)
         + b * ((3 * j + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb
GROUP BY media_id
""",
    "REAL stdlib SUB-8-BIT PNG decode: depth-4 indexed-color streams "
    "(16-entry PLTE, rows cycling all five filters on the PACKED "
    "scanline bytes) unfiltered at bpp=1, MSB-first nibbles unpacked, "
    "palette-mapped in Arrow mapInPandas; exact RGB aggregates "
    "replayed arithmetically — PNG scope is now COMPLETE",
)
def q_multimodal_png_sub8_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_png_sub8,
    )

    media = synthesize_png_sub8(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 11). ANIMATED GIF decode — the former multi-frame scope
# gap: frame loop over image descriptors + graphic-control extensions,
# disposal-method compositing onto the logical screen (the synthesized
# streams use disposal 1 / leave-in-place overlays; the decoder also
# handles 2 restore-to-background, 3 restore-to-previous, transparency
# and local palettes, unit-tested in tests/test_multimodal_animated.py).
# The oracle replays EVERY composited byte of EVERY frame closed-form:
# composited frame f shows the latest overlay g <= f covering each
# pixel, else the full-screen base frame.
# --------------------------------------------------------------------------


@register(
    "multimodal_gif_animated_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
    CAST(4 + doc_id % 13 AS INTEGER) AS w,
    CAST(3 + doc_id % 11 AS INTEGER) AS h,
    CAST(2 + doc_id % 3 AS INTEGER) AS nf
  FROM documents
),
geom AS (
  SELECT media_id, w, h, nf, (w + 1) // 2 AS fw, (h + 1) // 2 AS fh FROM m
),
ovl AS (
  SELECT media_id, g,
    (media_id + 5 * g) % (w - fw + 1) AS ox,
    (3 * media_id + 7 * g) % (h - fh + 1) AS oy
  FROM geom, unnest(range(1, CAST(nf AS BIGINT))) AS t(g)
),
px AS (
  SELECT media_id, w, h, nf, fw, fh, f, p % w AS x, p // w AS y
  FROM geom, unnest(range(0, CAST(nf AS BIGINT))) AS tf(f),
       unnest(range(0, CAST(w AS BIGINT) * h)) AS tp(p)
),
winner AS (
  SELECT p.media_id, p.w, p.h, p.nf, p.fw, p.f, p.x, p.y,
    max(o.g) AS g,
    arg_max(o.ox, o.g) AS ox,
    arg_max(o.oy, o.g) AS oy
  FROM px p LEFT JOIN ovl o
    ON o.media_id = p.media_id AND o.g <= p.f
   AND p.x >= o.ox AND p.x < o.ox + p.fw
   AND p.y >= o.oy AND p.y < o.oy + p.fh
  GROUP BY ALL
),
idx AS (
  SELECT media_id, w, h, nf, f, x, y,
    CASE WHEN g IS NULL
      THEN (media_id * 31 + (y * w + x) * 7) % 16
      ELSE (media_id * 31 + g * 11 + ((y - oy) * fw + (x - ox)) * 7) % 16
    END AS k
  FROM winner
),
rgb AS (
  SELECT media_id, w, h, nf, 3 * ((f * h + y) * w + x) AS j0,
    (k * 37) % 256 AS r,
    (k * 59 + 11) % 256 AS g2,
    (k * 83 + 29) % 256 AS b
  FROM idx
),
dur AS (
  SELECT media_id,
    CAST(10 * sum((media_id + f) % 7 + 1) AS BIGINT) AS total_ms
  FROM geom, unnest(range(0, CAST(nf AS BIGINT))) AS tf(f)
  GROUP BY media_id
)
SELECT r.media_id,
  'gif' AS format,
  any_value(r.w) AS width,
  any_value(r.h) AS height,
  any_value(r.nf) AS n_frames,
  any_value(d.total_ms) AS total_duration_ms,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(r + g2 + b) AS BIGINT) AS px_sum,
  CAST(sum(r * (j0 % 251 + 1)
         + g2 * ((j0 + 1) % 251 + 1)
         + b * ((j0 + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb r JOIN dur d USING (media_id)
GROUP BY r.media_id
""",
    "REAL stdlib ANIMATED GIF decode: graphic-control extensions + "
    "disposal-method compositing onto the logical screen (NETSCAPE "
    "loop block skipped, per-frame delays summed to total_duration_ms), "
    "order-sensitive px_dot over EVERY composited byte of EVERY frame "
    "replayed closed-form — closes the animated-GIF scope gap",
)
def q_multimodal_gif_animated_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        gif_animated_stats,
        synthesize_gif_animated,
    )

    media = synthesize_gif_animated(read_table(spark, sf_dir, "documents"))
    return gif_animated_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 11). PROGRESSIVE 4-component YCCK decode — the last
# 4-component JPEG pin: SOF2 successive-approximation streams with
# FOUR interleaved planes (DC first/refinement scans, per-component AC
# scans) accumulated by the multi-scan path, then the YCCK transform
# (BT.601 inverse + libjpeg complement, K as stored).  Same DC-only
# spectra as the sequential CMYK oracle; the only remaining JPEG pin
# is SUBSAMPLED progressive.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_prog_ycck_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(8 * (1 + doc_id % 6) AS INTEGER) AS width,
         CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
  FROM documents
),
blk AS (
  SELECT media_id, width, height, k,
    CAST(2 * ((media_id + 13 * k) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr,
    CAST(2 * ((4 * media_id + 11 * k) % 64) + 64 AS BIGINT) AS kv
  FROM m, unnest(range(0, CAST(width // 8 AS BIGINT) * (height // 8))) AS t(k)
),
cmyk AS (
  SELECT media_id, width, height, k,
    255 - CAST(least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS BIGINT) AS c0,
    255 - CAST(least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS BIGINT) AS c1,
    255 - CAST(least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS BIGINT) AS c2,
    kv AS c3
  FROM blk
),
px AS (
  SELECT media_id, width, height,
    4 * (((k // (width // 8)) * 8 + p // 8) * width
         + ((k % (width // 8)) * 8 + p % 8)) + c AS j,
    CASE c WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END AS v
  FROM cmyk, unnest(range(0, 64)) AS tp(p), unnest(range(0, 4)) AS tc(c)
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib PROGRESSIVE 4-component YCCK JPEG decode: SOF2 "
    "multi-scan coefficient accumulation over four interleaved planes, "
    "then the BT.601 inverse + libjpeg complement with K as stored — "
    "every CMYK byte replayed closed-form; the JPEG scope pin now "
    "names subsampled progressive only",
)
def q_multimodal_jpeg_prog_ycck_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_prog_ycck,
    )

    media = synthesize_jpeg_prog_ycck(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 11). SUBSAMPLED PROGRESSIVE JPEG decode — the LAST JPEG
# scope pin closed: progressive is now sampling-generic (interleaved
# DC scans walk MCU block order per A.2.3, AC scans stay per-component
# raster; per-component block grids, replicated upsampling).  The
# synthesizer carries the sequential 4:2:0 DC spectra, so the oracle is
# the SAME closed form as multimodal_jpeg_420_decode — only the stream
# differs (six-scan successive approximation at 2x2 luma sampling).
# JPEG scope: baseline AND progressive, 1/3/4 components, any
# integer-ratio sampling.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_prog420_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(16 * (1 + doc_id % 3) AS INTEGER) AS width,
         CAST(16 * (1 + doc_id % 2) AS INTEGER) AS height
  FROM documents
),
px0 AS (
  SELECT media_id, width, height,
    p % width AS x, p // width AS y
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(p)
),
px AS (
  SELECT media_id, width, height, x, y,
    (y // 16) * (width // 16) + (x // 16) AS k,
    ((y % 16) // 8) * 2 + (x % 16) // 8 AS s
  FROM px0
),
ycc AS (
  SELECT media_id, width, height, x, y,
    CAST(2 * ((media_id + 13 * (4 * k + s)) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM px
),
rgb AS (
  SELECT media_id, width, height, 3 * (y * width + x) AS j0,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM ycc
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(CAST(r AS BIGINT) + CAST(g AS BIGINT) + CAST(b AS BIGINT)) AS BIGINT) AS px_sum,
  CAST(sum(CAST(r AS BIGINT) * (j0 % 251 + 1)
         + CAST(g AS BIGINT) * ((j0 + 1) % 251 + 1)
         + CAST(b AS BIGINT) * ((j0 + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb
GROUP BY media_id
""",
    "REAL stdlib SUBSAMPLED PROGRESSIVE JPEG decode: SOF2 "
    "successive-approximation streams at 2x2 luma sampling — "
    "MCU-interleaved DC scans, per-component AC scans, per-component "
    "block grids, replicated chroma — decoding to the EXACT bytes of "
    "the sequential 4:2:0 oracle; closes the last JPEG scope pin "
    "(JPEG is now baseline AND progressive, 1/3/4 components, any "
    "integer-ratio sampling)",
)
def q_multimodal_jpeg_prog420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_prog420,
    )

    media = synthesize_jpeg_prog420(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 11). RESTART-MARKER JPEG decode — the camera/scanner
# resilience layout: a DRI segment + cycling RST0-7 markers every 2
# MCUs (byte alignment, DC-predictor resets, sequence checking).  Same
# spectra as the 4:4:4 color oracle, so the SQL is the same closed
# form — a predictor-reset slip or marker-sequence bug breaks px_dot.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_restart_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(8 * (1 + doc_id % 6) AS INTEGER) AS width,
         CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
  FROM documents
),
blk AS (
  SELECT media_id, width, height, k,
    CAST(2 * ((media_id + 13 * k) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM m, unnest(range(0, CAST(width // 8 AS BIGINT) * (height // 8))) AS t(k)
),
rgb AS (
  SELECT media_id, width, height, k,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM blk
),
px AS (
  SELECT media_id, width, height,
    3 * (((k // (width // 8)) * 8 + p // 8) * width
         + ((k % (width // 8)) * 8 + p % 8)) + c AS j,
    CAST(CASE c WHEN 0 THEN r WHEN 1 THEN g ELSE b END AS BIGINT) AS v
  FROM rgb, unnest(range(0, 64)) AS tp(p), unnest(range(0, 3)) AS tc(c)
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib RESTART-MARKER JPEG decode: DRI + cycling RST0-7 "
    "every 2 MCUs (byte alignment, DC-predictor resets, marker "
    "sequence verified) through the sequential scan decoder — same "
    "closed-form oracle as the 4:4:4 color query, different stream "
    "layout; closes the silent real-world gap where valid "
    "restart-interval files failed as malformed",
)
def q_multimodal_jpeg_restart_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_restart,
    )

    media = synthesize_jpeg_restart(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 11). NON-INTERLEAVED sequential JPEG decode — one SOS
# per component (fresh DC predictor each scan, planes accumulated
# across scans) over 4:2:0-subsampled planes: the multi-scan sequential
# layout some encoders emit.  Same spectra as the sequential 4:2:0
# oracle, so the SQL is the same closed form.  (Round 12 also closed
# partially-interleaved subsets — every sequential scan layout now
# decodes; unit-gated in tests/test_codecs_r12.py.)
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_noninterleaved_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(16 * (1 + doc_id % 3) AS INTEGER) AS width,
         CAST(16 * (1 + doc_id % 2) AS INTEGER) AS height
  FROM documents
),
px0 AS (
  SELECT media_id, width, height,
    p % width AS x, p // width AS y
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(p)
),
px AS (
  SELECT media_id, width, height, x, y,
    (y // 16) * (width // 16) + (x // 16) AS k,
    ((y % 16) // 8) * 2 + (x % 16) // 8 AS s
  FROM px0
),
ycc AS (
  SELECT media_id, width, height, x, y,
    CAST(2 * ((media_id + 13 * (4 * k + s)) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM px
),
rgb AS (
  SELECT media_id, width, height, 3 * (y * width + x) AS j0,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM ycc
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(CAST(r AS BIGINT) + CAST(g AS BIGINT) + CAST(b AS BIGINT)) AS BIGINT) AS px_sum,
  CAST(sum(CAST(r AS BIGINT) * (j0 % 251 + 1)
         + CAST(g AS BIGINT) * ((j0 + 1) % 251 + 1)
         + CAST(b AS BIGINT) * ((j0 + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb
GROUP BY media_id
""",
    "REAL stdlib NON-INTERLEAVED sequential JPEG decode: one SOS per "
    "component over 4:2:0-subsampled planes, fresh DC predictors per "
    "scan, planes accumulated across scans — decoding to the EXACT "
    "bytes of the sequential 4:2:0 oracle; closes the multi-scan "
    "sequential layout gap",
)
def q_multimodal_jpeg_noninterleaved_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_noninterleaved,
    )

    media = synthesize_jpeg_noninterleaved(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 12). PARTIAL-MCU JPEG decode — the single most common
# real-world image shape: dimensions that are NOT multiples of 8x the
# sampling factor (virtually every crawled photo).  4:2:0 subsampling at
# 17..31 x 13..23 dims; EVEN ids sequential interleaved, ODD ids the
# progressive successive-approximation layout — same DC-only spectra on
# the ceil-padded MCU grid, so ONE closed form covers both decode paths
# (a wrong edge-block crop or pad-block slip anywhere breaks px_dot).
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_partialmcu_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(17 + doc_id % 15 AS INTEGER) AS width,
         CAST(13 + doc_id % 11 AS INTEGER) AS height
  FROM documents
),
px0 AS (
  SELECT media_id, width, height,
    p % width AS x, p // width AS y
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(p)
),
px AS (
  SELECT media_id, width, height, x, y,
    (y // 16) * ((width + 15) // 16) + (x // 16) AS k,
    ((y % 16) // 8) * 2 + (x % 16) // 8 AS s
  FROM px0
),
ycc AS (
  SELECT media_id, width, height, x, y,
    CAST(2 * ((media_id + 13 * (4 * k + s)) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM px
),
rgb AS (
  SELECT media_id, width, height, 3 * (y * width + x) AS j0,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM ycc
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 3 AS BIGINT) AS n_px_bytes,
  CAST(sum(CAST(r AS BIGINT) + CAST(g AS BIGINT) + CAST(b AS BIGINT)) AS BIGINT) AS px_sum,
  CAST(sum(CAST(r AS BIGINT) * (j0 % 251 + 1)
         + CAST(g AS BIGINT) * ((j0 + 1) % 251 + 1)
         + CAST(b AS BIGINT) * ((j0 + 2) % 251 + 1)) AS BIGINT) AS px_dot
FROM rgb
GROUP BY media_id
""",
    "REAL stdlib PARTIAL-MCU JPEG decode: 4:2:0 frames whose dims are "
    "NOT multiples of the 16x16 MCU (the dominant real-crawl shape) — "
    "edge blocks decode in full on the ceil-padded grid and crop to "
    "the stored T.81 size; even ids sequential, odd ids progressive, "
    "one closed-form oracle gates both paths; closes the biggest "
    "real-world JPEG gap (round-11 scope held only for aligned dims)",
)
def q_multimodal_jpeg_partialmcu_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_partialmcu,
    )

    media = synthesize_jpeg_partialmcu(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 12). PROGRESSIVE restart-marker JPEG decode: DRI + cycling
# RST0-7 inside EVERY scan of the successive-approximation stream (byte
# alignment, DC-predictor resets, EOB runs flushed per segment) — same
# spectra as the 4:4:4 progressive oracle, so the SQL is the same closed
# form; a predictor/EOB reset slip in any of the six scans breaks px_dot.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_prog_restart_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(8 * (1 + doc_id % 6) AS INTEGER) AS width,
         CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
  FROM documents
),
blk AS (
  SELECT media_id, width, height, k,
    CAST(2 * ((media_id + 13 * k) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM m, unnest(range(0, CAST(width // 8 AS BIGINT) * (height // 8))) AS t(k)
),
rgb AS (
  SELECT media_id, width, height, k,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM blk
),
px AS (
  SELECT media_id, width, height,
    3 * (((k // (width // 8)) * 8 + p // 8) * width
         + ((k % (width // 8)) * 8 + p % 8)) + c AS j,
    CAST(CASE c WHEN 0 THEN r WHEN 1 THEN g ELSE b END AS BIGINT) AS v
  FROM rgb, unnest(range(0, 64)) AS tp(p), unnest(range(0, 3)) AS tc(c)
)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib PROGRESSIVE RESTART-MARKER JPEG decode: DRI + cycling "
    "RST0-7 inside every successive-approximation scan (byte "
    "alignment, DC-predictor and EOB-run resets, sequence verified) — "
    "same closed form as the progressive color oracle, different "
    "stream layout; removes the round-11 progressive-DRI pin",
)
def q_multimodal_jpeg_prog_restart_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_prog_restart,
    )

    media = synthesize_jpeg_prog_restart(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 12). WebP container metadata — the second-most-common web
# crawl image format gains first-class profiling: variant mix (lossy
# stub header / real VP8L lossless / VP8X extended), dims from the
# correct header per variant, alpha/animation flags, chunk census.
# --------------------------------------------------------------------------


@register(
    "multimodal_webp_metadata",
    """
SELECT doc_id AS media_id,
  CASE CAST(doc_id % 3 AS INTEGER)
    WHEN 0 THEN 'lossy' WHEN 1 THEN 'lossless' ELSE 'extended' END AS variant,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 13
            ELSE 5 + doc_id % 12 END AS INTEGER) AS width,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 7
            ELSE 4 + doc_id % 9 END AS INTEGER) AS height,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 0
            WHEN doc_id % 3 = 1 THEN 1
            ELSE doc_id % 2 END AS INTEGER) AS has_alpha,
  CAST(CASE WHEN doc_id % 6 = 2 THEN 1 ELSE 0 END AS INTEGER) AS has_anim,
  CAST(CASE WHEN doc_id % 3 < 2 THEN 1
            WHEN doc_id % 6 = 2 THEN 3 ELSE 2 END AS INTEGER) AS n_chunks
FROM documents
""",
    "REAL WebP container metadata: RIFF chunk walk over a deterministic "
    "variant mix — simple-lossy VP8 frame-tag header, simple-lossless "
    "VP8L 14-bit header (alpha hint), VP8X extended canvas dims + "
    "alpha/anim flags + ANIM chunk census — the crawl-profiling layer "
    "that makes WebP payloads visible instead of invisible bytes",
)
def q_multimodal_webp_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.webp import (
        synthesize_webp,
        webp_metadata_table,
    )

    media = synthesize_webp(read_table(spark, sf_dir, "documents"))
    return webp_metadata_table(media)


# --------------------------------------------------------------------------
# C-ext (round 12). VP8L lossless WebP pixel decode — REAL canonical
# prefix codes (code-length codes with 17/18 zero runs, simple codes),
# LZ77 plain-distance backrefs (every image's tail is backref-coded),
# SUBTRACT_GREEN transform on odd ids.  The RGBA pattern is periodic
# modular arithmetic, so the oracle regenerates the exact bytes; a
# one-bit slip anywhere in the entropy stack breaks px_dot.
# --------------------------------------------------------------------------


@register(
    "multimodal_webp_lossless_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(5 + doc_id % 12 AS INTEGER) AS width,
         CAST(4 + doc_id % 9 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height,
    4 * p AS j0, p % 11 AS q
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(p)
),
ch AS (
  SELECT media_id, width, height,
    CAST((7 * media_id + 13 * q) % 256 AS BIGINT) AS r,
    CAST((11 * media_id + 5 * q) % 256 AS BIGINT) AS g,
    CAST((3 * media_id + 17 * q) % 256 AS BIGINT) AS b,
    CAST((media_id + 9 * q) % 256 AS BIGINT) AS a,
    j0
  FROM px
)
SELECT media_id,
  'webp' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 4 AS BIGINT) AS n_px_bytes,
  CAST(sum(r + g + b + a) AS BIGINT) AS px_sum,
  CAST(sum(r * (j0 % 251 + 1)
         + g * ((j0 + 1) % 251 + 1)
         + b * ((j0 + 2) % 251 + 1)
         + a * ((j0 + 3) % 251 + 1)) AS BIGINT) AS px_dot
FROM ch
GROUP BY media_id
""",
    "REAL stdlib VP8L lossless WebP decode: canonical prefix codes "
    "(normal code-length-coded trees with zero-run 17/18, simple "
    "codes), LZ77 plain-distance backward references, COLOR-CACHE "
    "streams on every third id (round 12 — hit symbols + rolling-hash "
    "updates incl. copied pixels), SUBTRACT_GREEN on odd ids — "
    "per-pixel RGBA checksum oracle; named pins (2D distance codes, "
    "meta prefix, predictor/color/indexing transforms, lossy VP8) "
    "raise with the feature",
)
def q_multimodal_webp_lossless_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.webp import (
        synthesize_webp_lossless,
        webp_pixel_stats,
    )

    media = synthesize_webp_lossless(read_table(spark, sf_dir, "documents"))
    return webp_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 13). AVI/MJPEG VIDEO — the container arm of the
# multimodal pipeline (functions/video.py, unit-gated since round 12).
# The synthesizer emits a REAL single-stream RIFF/AVI per document id
# (canonical hdrl/movi/idx1 layout) whose 2-4 frames are decodable
# 4:4:4 color JPEGs; metadata parse walks the real headers, frame
# stats stride-sample the '00dc' chunks through the full JPEG stack.
# --------------------------------------------------------------------------


@register(
    "multimodal_avi_metadata",
    """
SELECT doc_id AS media_id,
  'MJPG' AS codec,
  CAST(8 * (1 + doc_id % 3) AS INTEGER) AS width,
  CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height,
  CAST(2 + doc_id % 3 AS INTEGER) AS n_frames,
  CAST(100000 AS BIGINT) AS us_per_frame,
  CAST(1 AS INTEGER) AS n_streams
FROM documents
""",
    "REAL AVI container metadata: synthesized single-stream MJPEG AVIs "
    "(RIFF avih/strh/strf headers, LIST movi, idx1 index) parsed by a "
    "resilient chunk walk in one Arrow island; the oracle replays the "
    "synthesizer's dims/frame-count/rate closed-form, so any header "
    "mis-parse (offset, endianness, LIST recursion) surfaces",
)
def q_multimodal_avi_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.video import (
        avi_metadata_table,
        synthesize_avi_mjpeg,
    )

    media = synthesize_avi_mjpeg(read_table(spark, sf_dir, "documents"))
    return avi_metadata_table(media)


# --------------------------------------------------------------------------
# C-ext (round 13). Stride-sampled MJPEG frame decode — the
# VLM-training frame-extraction shape: every 2nd '00dc' frame decodes
# through the real JPEG stack; px_dot is order-sensitive across frames
# AND bytes, so a frame slip, stride bug, or one wrong entropy bit in
# any sampled frame moves it.  The oracle replays every RGB byte of
# every SAMPLED frame closed-form (frame index folded into the luma
# DC term exactly as the synthesizer does).
# --------------------------------------------------------------------------


@register(
    "multimodal_avi_frame_stats",
    """
WITH m AS (
  SELECT doc_id AS media_id,
    CAST(8 * (1 + doc_id % 3) AS INTEGER) AS width,
    CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height,
    CAST(2 + doc_id % 3 AS BIGINT) AS n_frames
  FROM documents
),
fr AS (
  SELECT media_id, width, height, n_frames, fi, fi // 2 AS si
  FROM m, unnest(range(0, n_frames, 2)) AS tf(fi)
),
blk AS (
  SELECT media_id, width, height, n_frames, si, k,
    CAST(2 * ((media_id + 17 * fi + 13 * k) % 64) + 64 AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id + 7 * k) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id + 5 * k) % 64) + 64 AS DOUBLE) AS cr
  FROM fr, unnest(range(0, CAST(width // 8 AS BIGINT) * (height // 8))) AS t(k)
),
rgb AS (
  SELECT media_id, width, height, n_frames, si, k,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM blk
),
px AS (
  SELECT media_id, width, height, n_frames,
    si * (width * height * 3)
      + 3 * (((k // (width // 8)) * 8 + p // 8) * width
             + ((k % (width // 8)) * 8 + p % 8)) + c AS j,
    CAST(CASE c WHEN 0 THEN r WHEN 1 THEN g ELSE b END AS BIGINT) AS v
  FROM rgb, unnest(range(0, 64)) AS tp(p), unnest(range(0, 3)) AS tc(c)
)
SELECT media_id,
  'avi' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  any_value(n_frames) AS n_frames,
  CAST((any_value(n_frames) + 1) // 2 AS BIGINT) AS n_sampled,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stride-sampled MJPEG-in-AVI frame decode (stride 2): movi "
    "chunk walk -> every 2nd frame through the full stdlib JPEG stack "
    "-> exact integer pixel checksums in one Arrow island; the oracle "
    "replays every sampled RGB byte closed-form with the frame index "
    "in the luma term, so a frame slip or stride bug breaks px_dot",
)
def q_multimodal_avi_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.video import (
        avi_frame_stats,
        synthesize_avi_mjpeg,
    )

    media = synthesize_avi_mjpeg(read_table(spark, sf_dir, "documents"))
    return avi_frame_stats(media, stride=2)


# --------------------------------------------------------------------------
# C-ext (round 13). The two round-12 unit-gated JPEG modes, driver-
# gated under one registration: 12-BIT sample precision (extended
# sequential SOF1 + progressive SOF2, level shift 2048, uint16 planes,
# partial-MCU dims) on even ids, and PARTIALLY-INTERLEAVED sequential
# scan SUBSETS (T.81 A.2.2/A.2.3 — components split across scan
# groups, fresh DC predictors per scan) on odd ids.  With these, JPEG
# scope is complete for Huffman DCT at both T.81 precisions, any
# dimensions, every scan layout — all under the correctness gate.
# --------------------------------------------------------------------------


@register(
    "multimodal_jpeg_extended_decode",
    """
WITH m12 AS (
  SELECT doc_id AS media_id,
    CAST(9 + doc_id % 13 AS INTEGER) AS width,
    CAST(11 + doc_id % 7 AS INTEGER) AS height
  FROM documents WHERE doc_id % 2 = 0
),
px12 AS (
  SELECT media_id, width, height,
    yy * width + xx AS j,
    2 * (((37 * media_id
           + 91 * ((yy // 8) * ((width + 7) // 8) + xx // 8)) % 2048)
         - 1024) + 2048 AS v
  FROM m12,
       unnest(range(0, CAST(height AS BIGINT))) AS ty(yy),
       unnest(range(0, CAST(width AS BIGINT))) AS tx(xx)
),
ms AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 2 = 1),
ycc AS (
  SELECT media_id, yy, xx,
    CAST(2 * ((media_id + 13 * ((yy // 8) * 2 + xx // 8)) % 64) + 64
         AS DOUBLE) AS yv,
    CAST(2 * ((2 * media_id) % 64) + 64 AS DOUBLE) AS cb,
    CAST(2 * ((3 * media_id) % 64) + 64 AS DOUBLE) AS cr
  FROM ms,
       unnest(range(0, 16)) AS ty(yy),
       unnest(range(0, 16)) AS tx(xx)
),
rgbs AS (
  SELECT media_id, yy, xx,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r,
    least(255.0, greatest(0.0,
      floor(yv - CAST(0.344136 AS DOUBLE) * (cb - 128)
               - CAST(0.714136 AS DOUBLE) * (cr - 128) + 0.5))) AS g,
    least(255.0, greatest(0.0,
      floor(yv + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b
  FROM ycc
),
pxs AS (
  SELECT media_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
    3 * (yy * 16 + xx) + c AS j,
    CAST(CASE c WHEN 0 THEN r WHEN 1 THEN g ELSE b END AS BIGINT) AS v
  FROM rgbs, unnest(range(0, 3)) AS tc(c)
),
px AS (SELECT * FROM px12 UNION ALL SELECT * FROM pxs)
SELECT media_id,
  'jpeg' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) AS BIGINT) AS n_px_bytes,
  CAST(sum(v) AS BIGINT) AS px_sum,
  CAST(sum(v * (j % 251 + 1)) AS BIGINT) AS px_dot
FROM px
GROUP BY media_id
""",
    "REAL stdlib decode of the last two JPEG scope gaps under one "
    "gate: 12-bit samples (SOF1 extended sequential + SOF2 progressive "
    "with successive approximation, level shift 2048, uint16 planes, "
    "partial-MCU dims) and partially-interleaved sequential scan "
    "subsets (component groups per scan, fresh DC predictors); the "
    "oracle replays every sample closed-form on both arms",
)
def q_multimodal_jpeg_extended_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.multimodal import (
        png_pixel_stats,
        synthesize_jpeg_extended,
    )

    media = synthesize_jpeg_extended(read_table(spark, sf_dir, "documents"))
    return png_pixel_stats(media)


# --------------------------------------------------------------------------
# C-ext (round 13). VP8L PREDICTOR transform — the transform virtually
# every real libwebp lossless file enables (the round-12 "dominant
# real-world shape" argument): all 14 spatial predictor modes (L/T/
# TR/TL, five Average2 combinations, Select, ClampAddSubtractFull/
# Half), per-block mode image carried in a real entropy-coded
# subresolution stream, stacked over SUBTRACT-GREEN and COLOR-CACHE
# variants.  The RGBA pattern round-trips exactly, so the same
# closed-form checksum gates every predictor/border-rule path.
# --------------------------------------------------------------------------


@register(
    "multimodal_webp_predictor_decode",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(5 + doc_id % 12 AS INTEGER) AS width,
         CAST(4 + doc_id % 9 AS INTEGER) AS height
  FROM documents
),
px AS (
  SELECT media_id, width, height,
    4 * p AS j0, p % 13 AS q
  FROM m, unnest(range(0, CAST(width AS BIGINT) * height)) AS t(p)
),
ch AS (
  SELECT media_id, width, height,
    CAST((5 * media_id + 19 * q) % 256 AS BIGINT) AS r,
    CAST((13 * media_id + 7 * q) % 256 AS BIGINT) AS g,
    CAST((media_id + 23 * q) % 256 AS BIGINT) AS b,
    CAST((9 * media_id + 3 * q) % 256 AS BIGINT) AS a,
    j0
  FROM px
)
SELECT media_id,
  'webp' AS format,
  any_value(width) AS width,
  any_value(height) AS height,
  CAST(count(*) * 4 AS BIGINT) AS n_px_bytes,
  CAST(sum(r + g + b + a) AS BIGINT) AS px_sum,
  CAST(sum(r * (j0 % 251 + 1)
         + g * ((j0 + 1) % 251 + 1)
         + b * ((j0 + 2) % 251 + 1)
         + a * ((j0 + 3) % 251 + 1)) AS BIGINT) AS px_dot
FROM ch
GROUP BY media_id
""",
    "REAL stdlib VP8L PREDICTOR-transform decode (round 13): all 14 "
    "RFC 9649 §4.1 modes cycling per block (4/8/16-px blocks), border "
    "rules (black top-left, L top row, T left column, TR wrap), mode "
    "image decoded from a real entropy-coded subresolution stream, "
    "stacked under SUBTRACT-GREEN and 6-bit COLOR-CACHE variants — "
    "per-pixel RGBA checksum oracle; one wrong neighbor or clamp "
    "anywhere moves px_dot",
)
def q_multimodal_webp_predictor_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.webp import (
        synthesize_webp_predictor,
        webp_pixel_stats,
    )

    media = synthesize_webp_predictor(read_table(spark, sf_dir, "documents"))
    return webp_pixel_stats(media)
