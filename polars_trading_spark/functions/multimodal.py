"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a reference to object storage), decode/feature
steps are Arrow-batched ``mapInPandas`` stages, and everything around
them (schema, partitioning, metadata pushdown) is ordinary columnar
Spark.  The decode kernels themselves need codec libraries that are not
in this container, so they are STUBBED — ``decode_image`` raises
``NotImplementedError`` unless PIL is importable — while the Spark-side
plumbing (UDF signatures, batch iteration, schema contracts, frame
explosion) is real and tested via the deterministic fake decoder.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "synthesize_media",
    "synthesize_bmp",
    "synthesize_jpeg",
    "parse_image_header",
    "extract_media_metadata",
    "sample_frames",
    "decode_image",
    "synthesize_pcm",
    "pcm_features",
]

_MEDIA_TYPES = ["image", "audio", "video"]


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents table: payload
    bytes are the utf-8 text, media_type cycles by doc_id.  Stands in
    for a real (id, media_type, payload binary) table."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def parse_image_header(payload: bytes):
    """REAL header parse — pure Python, no codec library.

    Recognizes the container formats whose dimensions live at fixed
    header offsets: PNG (IHDR, big-endian u32 at bytes 16..24), BMP
    (BITMAPINFOHEADER, little-endian i32 at 18/22), GIF87a/89a
    (little-endian u16 at 6/8).  Returns ``(format, width, height)``
    or ``None`` for anything unrecognized — compressed pixel DECODE
    still needs a codec library (see ``decode_image``), but metadata
    extraction is fully real for these formats.
    """
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", int(w), int(h))
    if (
        len(payload) >= 26
        and payload[:2] == b"BM"
        # DIB header size gates out text that merely starts with "BM":
        # 40/108/124 little-endian all contain NUL bytes.
        # (the 12-byte BITMAPCOREHEADER packs u16 dims at a different
        # offset — not produced since the early 90s, deliberately not
        # handled rather than mis-parsed)
        and struct.unpack("<I", payload[14:18])[0] in (40, 108, 124)
    ):
        w, h = struct.unpack("<ii", payload[18:26])
        return ("bmp", int(w), abs(int(h)))  # negative h = top-down rows
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", int(w), int(h))
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        return _parse_jpeg_sof(payload)
    return None


# Start-of-frame markers carrying dimensions: C0-CF minus DHT (C4),
# JPG-extension (C8) and DAC (CC).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _parse_jpeg_sof(payload: bytes):
    """Walk the JPEG marker stream to the first SOF segment and read
    height/width (big-endian u16 at offsets 3/5 past the length word).
    Unlike PNG/BMP/GIF the dimensions have no fixed offset — every
    variable-length segment before the SOF must be skipped by its own
    declared length, which is what makes this a real parser rather than
    a struct peek."""
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None  # desynchronized marker stream
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = (payload[i + 2] << 8) | payload[i + 3]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            h = (payload[i + 5] << 8) | payload[i + 6]
            w = (payload[i + 7] << 8) | payload[i + 8]
            return ("jpeg", int(w), int(h))
        if marker == 0xDA:  # SOS: entropy-coded data follows, give up
            return None
        i += 2 + seg_len
    return None


def synthesize_bmp(documents: DataFrame) -> DataFrame:
    """Deterministic REAL 24-bit BMP per document id — a complete,
    spec-valid file (14-byte BITMAPFILEHEADER + 40-byte
    BITMAPINFOHEADER + 4-byte-aligned BGR rows), so downstream header
    parsing exercises real binary layout, not a fake.

    ``width = 4 + doc_id % 29``, ``height = 3 + doc_id % 17``, pixel
    byte ``j`` of media ``m`` is ``(m * 31 + j * 7) % 256`` — all
    regenerable arithmetically by any engine (the differential oracle
    recomputes the byte count closed-form).
    """

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            rows = []
            for m in pdf["media_id"]:
                m = int(m)
                w, h = 4 + m % 29, 3 + m % 17
                row_sz = (3 * w + 3) // 4 * 4
                px_sz = row_sz * h
                header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + px_sz, 0, 0, 14 + 40
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, px_sz, 2835, 2835, 0, 0
                )
                j = np.arange(px_sz, dtype=np.int64)
                rows.append(header + ((m * 31 + j * 7) % 256).astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": rows})

    base = documents.select(F.col("doc_id").alias("media_id"))
    return base.mapInPandas(
        pack,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def synthesize_jpeg(documents: DataFrame) -> DataFrame:
    """Deterministic JPEG header stream per document id: SOI, the
    standard 16-byte JFIF APP0, a DQT (65-byte deterministic table), a
    3-component SOF0 carrying the dimensions, EOI.  Structurally valid
    marker segments with correct lengths — the parser must walk three
    variable-length segments to reach the SOF — but NOT a decodable
    bitstream (no DHT/SOS/entropy scan), which is exactly the honest
    scope: header metadata is real, pixel decode stays behind
    ``decode_image``'s codec-library gate.

    ``width = 16 + doc_id % 613``, ``height = 16 + doc_id % 377``; DQT
    byte ``j`` of media ``m`` is ``(m * 7 + j * 13) % 255 + 1`` — all
    replayable arithmetically by the differential oracle.
    """

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = []
            for m in pdf["media_id"]:
                m = int(m)
                w, h = 16 + m % 613, 16 + m % 377
                app0 = b"\xff\xe0" + struct.pack(
                    ">H5sHBHHBB", 16, b"JFIF\x00", 0x0102, 0, 72, 72, 0, 0
                )
                dqt = (
                    b"\xff\xdb"
                    + struct.pack(">HB", 67, 0)
                    + bytes((m * 7 + j * 13) % 255 + 1 for j in range(64))
                )
                sof0 = (
                    b"\xff\xc0"
                    + struct.pack(">HBHHB", 17, 8, h, w, 3)
                    + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
                )
                rows.append(b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9")
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": rows})

    base = documents.select(F.col("doc_id").alias("media_id"))
    return base.mapInPandas(
        pack,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def decode_image(payload: bytes):
    """Real pixel-decode kernel — requires an image codec library.

    STUB (narrowed in round 5): header metadata for PNG/BMP/GIF is now
    parsed for real by ``parse_image_header``; only compressed PIXEL
    decoding still needs PIL/opencv, which this container lacks — the
    import-try keeps the call site honest.
    """
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL/opencv; not available in this environment"
        ) from exc


_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata per payload via Arrow-batched ``mapInPandas``.

    Image payloads in a parseable container format (PNG/BMP/GIF) get
    REAL dimensions via ``parse_image_header``; anything unrecognized
    falls back to the deterministic fake so the plumbing stays testable
    on synthetic payloads (a real deployment swaps the fallback for
    ``decode_image``/ffprobe per media_type — same signature, same
    schema contract).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            n = pdf["payload"].map(len)
            is_image = pdf["media_type"] == "image"
            is_video = pdf["media_type"] == "video"
            width = (n % 640 + 16).where(is_image | is_video, 0).astype("int32")
            height = (n % 480 + 16).where(is_image | is_video, 0).astype("int32")
            parsed = [
                parse_image_header(bytes(p)) if img else None
                for img, p in zip(is_image, pdf["payload"])
            ]
            for i, hdr in enumerate(parsed):
                if hdr is not None and 0 < hdr[1] < 65536 and 0 < hdr[2] < 65536:
                    width.iat[i], height.iat[i] = hdr[1], hdr[2]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n.astype("int64"),
                    "width": width,
                    "height": height,
                    "duration_ms": (n * 40).where(~is_image, 0).astype("int64"),
                    "checksum": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return media.mapInPandas(decode, schema=_META_SCHEMA)


def sample_frames(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode each video into
    per-frame rows (frame_idx, offset_ms) at ``every_ms`` spacing.
    Native explode — the per-frame decode would be another mapInPandas
    stage downstream."""
    meta = extract_media_metadata(media)
    frames = meta.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)))
        ).alias("frame_idx"),
        "duration_ms",
    )
    return frames.select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("offset_ms"),
    )


_PCM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synthesize_pcm(documents: DataFrame, *, sample_rate: int = 16_000) -> DataFrame:
    """Deterministic fake s16le PCM audio per document id.

    Sample ``i`` of media ``m`` is the integer
    ``((m * 7919 + i * 104729) % 65536) − 32768`` — pure modular
    arithmetic any engine can regenerate, packed little-endian int16.
    ``n_samples = 400 + m % 800``.  Stands in for a real (id, rate,
    payload binary) audio table; the packing runs in an Arrow-batched
    ``mapInPandas`` exactly like a real ingest would.
    """

    def pack(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for m in pdf["media_id"]:
                n = 400 + int(m) % 800
                i = np.arange(n, dtype=np.int64)
                s = ((int(m) * 7919 + i * 104729) % 65536) - 32768
                rows.append(s.astype("<i2").tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": sample_rate,
                    "payload": rows,
                }
            )

    base = documents.select(F.col("doc_id").alias("media_id"))
    return base.mapInPandas(pack, schema=_PCM_SCHEMA)


_PCM_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def pcm_features(media: DataFrame) -> DataFrame:
    """Waveform features from raw s16le PCM payload bytes — REAL binary
    decoding (``np.frombuffer`` on the Arrow batch), no codec library
    needed, so unlike the image/video kernels this path is exact and
    fully testable in this container:

    * ``rms``            — sqrt(mean(sample²))
    * ``peak``           — max |sample|
    * ``zero_crossings`` — count of strict sign flips (s_i·s_{i+1} < 0)

    Shape: one Arrow-batched ``mapInPandas`` stage (the canonical decode
    step), everything before/after ordinary columnar Spark.  Integer
    moments are exact, so the differential oracle regenerates the same
    samples arithmetically and matches bit-for-bit.
    """

    def feats(batches):
        import numpy as np

        for pdf in batches:
            out = {
                "media_id": [], "n_samples": [], "duration_ms": [],
                "rms": [], "peak": [], "zero_crossings": [],
            }
            for m, sr, payload in zip(
                pdf["media_id"], pdf["sample_rate"], pdf["payload"]
            ):
                s = np.frombuffer(payload, dtype="<i2").astype(np.int64)
                n = s.size
                out["media_id"].append(m)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000.0 / sr)
                out["rms"].append(float(np.sqrt((s * s).sum() / n)) if n else None)
                out["peak"].append(int(np.abs(s).max()) if n else 0)
                out["zero_crossings"].append(
                    int(((s[:-1] * s[1:]) < 0).sum()) if n > 1 else 0
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(feats, schema=_PCM_FEAT_SCHEMA)
