"""AVI video container + MJPEG frame extraction — pure stdlib, no
codec library, following the PUBLIC format documentation (the
RIFF/AVI layout from Microsoft's Video for Windows docs; MJPEG frames
are plain JFIF streams decoded by ``functions.multimodal.jpeg_decode``).

Round-12 groundwork for the video arm of the multimodal pipeline (the
round-11 verdict's "no video container" note): a vision-language
training pipeline's video stage is (1) container parse, (2) frame
extraction at a sampling stride, (3) per-frame image decode + feature
extraction — and with the JPEG stack complete, MJPEG-in-AVI gives all
three with REAL bytes end-to-end.

Scope: AVI with a single 'vids' stream; fourcc 'MJPG' frames decode to
pixels, any other codec parses to metadata only (named pin).  The
writer emits the canonical structure — RIFF('AVI ') { LIST hdrl
{ avih, LIST strl { strh, strf } }, LIST movi { 00dc... }, idx1 } —
and the reader walks it resiliently (unknown chunks skipped).

Spark surface: synthesizer + metadata + stride-sampled frame pixel
stats, one file-parallel Arrow island each over the ``_media_base``
partitioning — scheduled for registration in the round-13 gate window
(round 12's five-registration cap is already spent; the kernels are
unit-gated in tests/test_video.py now).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_trading_spark.functions.multimodal import _media_base, jpeg_decode

__all__ = [
    "avi_encode_mjpeg",
    "avi_metadata",
    "avi_extract_frames",
    "avi_extract_audio",
    "synthesize_avi_mjpeg",
    "synthesize_avi_av",
    "avi_metadata_table",
    "avi_frame_stats",
    "avi_audio_stats",
]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def avi_encode_mjpeg(
    frames,
    width: int,
    height: int,
    *,
    fps: int = 10,
    audio: bytes | None = None,
    audio_rate: int = 16_000,
) -> bytes:
    """Build a complete MJPEG AVI from a list of JPEG payloads:
    avih/strh/strf headers with real dims/rates/counts, one '00dc'
    chunk per frame inside LIST movi, and a classic idx1 index
    (offsets relative to the 'movi' fourcc, per the VfW convention).

    ``audio`` (round 13): mono s16le PCM bytes — adds a second stream
    (strl with 'auds' strh + WAVEFORMATEX strf, wFormatTag=1) and
    interleaves '01wb' chunks between the video frames, one slice per
    frame period, the canonical A/V layout a VLM ingest sees.  With
    ``audio=None`` the output is byte-identical to the single-stream
    form."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    us_per_frame = 1_000_000 // fps
    n = len(frames)
    n_streams = 1 if audio is None else 2
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        n_streams,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength (frames)
            0,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize (0: variable-size frames)
            0,  # rcFrame packed (0,0,0,0) — simplified
        )
        + struct.pack("<HH", width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    strls = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    if audio is not None:
        if len(audio) % 2:
            raise ValueError("s16le PCM audio needs an even byte count")
        a_samples = len(audio) // 2
        a_strh = (
            b"auds"
            + b"\x00\x00\x00\x00"  # fccHandler
            + struct.pack(
                "<IHHIIIIIIIII",
                0, 0, 0, 0,
                1,  # dwScale
                audio_rate,  # dwRate (samples/s)
                0,  # dwStart
                a_samples,  # dwLength (samples)
                0,
                0xFFFFFFFF,
                2,  # dwSampleSize (bytes per sample, mono s16)
                0,
            )
            + struct.pack("<HH", 0, 0)
        )
        a_strf = struct.pack(
            "<HHIIHH",
            1,  # wFormatTag = WAVE_FORMAT_PCM
            1,  # nChannels
            audio_rate,  # nSamplesPerSec
            audio_rate * 2,  # nAvgBytesPerSec
            2,  # nBlockAlign
            16,  # wBitsPerSample
        )
        strls += _list(
            b"strl", _chunk(b"strh", a_strh) + _chunk(b"strf", a_strf)
        )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)

    movi_payload = bytearray()
    entries = []  # (chunk id, offset, size) for idx1
    # audio slice per frame period, remainder after the last frame
    a_per = (len(audio) // n) & ~1 if audio is not None else 0
    a_pos = 0
    for fi, f in enumerate(frames):
        entries.append((b"00dc", 4 + len(movi_payload), len(f)))
        movi_payload += _chunk(b"00dc", bytes(f))
        if audio is not None:
            end = a_pos + a_per if fi < n - 1 else len(audio)
            sl = audio[a_pos:end]
            a_pos = end
            if sl:
                entries.append((b"01wb", 4 + len(movi_payload), len(sl)))
                movi_payload += _chunk(b"01wb", sl)
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = bytearray()
    for cid, off, size in entries:
        idx1 += cid + struct.pack("<III", 0x10, off, size)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx1))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        yield fourcc, i + 8, size
        i += 8 + size + (size % 2)


def avi_metadata(payload: bytes):
    """Parse an AVI's headers: ``(codec, width, height, n_frames,
    us_per_frame, n_streams)``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    codec = None
    width = height = n_frames = uspf = n_streams = 0

    def walk(start, end):
        nonlocal codec, width, height, n_frames, uspf, n_streams
        for fourcc, off, size in _walk_chunks(payload, start, end):
            if fourcc == b"LIST":
                walk(off + 4, off + size)
            elif fourcc == b"avih":
                vals = struct.unpack("<IIIIIIIIII", payload[off : off + 40])
                uspf, n_frames, n_streams = vals[0], vals[4], vals[6]
                width, height = vals[8], vals[9]
            elif fourcc == b"strh" and payload[off : off + 4] == b"vids":
                codec = payload[off + 4 : off + 8].decode("ascii", "replace")

    walk(12, len(payload))
    if codec is None:
        raise ValueError("AVI has no video stream header")
    return (codec, width, height, n_frames, uspf, n_streams)


def avi_extract_frames(payload: bytes):
    """The '00dc' video chunks inside LIST movi, in stream order —
    for MJPG each is a complete JPEG interchange stream."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    frames = []

    def walk(start, end, in_movi):
        for fourcc, off, size in _walk_chunks(payload, start, end):
            if fourcc == b"LIST":
                walk(off + 4, off + size, payload[off : off + 4] == b"movi")
            elif in_movi and fourcc == b"00dc":
                frames.append(payload[off : off + size])

    walk(12, len(payload), False)
    return frames


def avi_extract_audio(payload: bytes):
    """The audio stream of an A/V AVI: ``(sample_rate, bits, channels,
    pcm_bytes)`` — WAVEFORMATEX parsed from the 'auds' strl, data
    chunks concatenated in stream order.  The data chunk id is derived
    from the audio stream's index within hdrl (the nth strl ->
    ``{n:02d}wb``), so audio-first or multi-video layouts resolve to
    the right stream instead of silently matching nothing.  Raises
    when the container has no audio stream, a non-PCM format tag
    (named pin), or an audio strl with no matching data chunks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    fmt = None
    chunks = []
    strl_idx = [-1]  # index of the strl currently being walked
    aud_idx = [None]  # hdrl index of the 'auds' stream, once found
    aud_cid = [None]  # derived movi chunk id, e.g. b'01wb'
    in_auds_strl = [False]

    def walk(start, end, in_movi):
        nonlocal fmt
        for fourcc, off, size in _walk_chunks(payload, start, end):
            if fourcc == b"LIST":
                ltype = payload[off : off + 4]
                if ltype == b"strl":
                    strl_idx[0] += 1
                    in_auds_strl[0] = False
                walk(off + 4, off + size, ltype == b"movi")
            elif fourcc == b"strh":
                in_auds_strl[0] = payload[off : off + 4] == b"auds"
                if in_auds_strl[0] and aud_idx[0] is None:
                    aud_idx[0] = strl_idx[0]
                    aud_cid[0] = b"%02dwb" % strl_idx[0]
            elif fourcc == b"strf" and in_auds_strl[0] and fmt is None:
                (tag, ch, rate, _avg, _align, bits) = struct.unpack(
                    "<HHIIHH", payload[off : off + 16]
                )
                if tag != 1:
                    raise NotImplementedError(
                        f"AVI audio format tag {tag} not supported — "
                        "PCM (1) only"
                    )
                fmt = (rate, bits, ch)
            elif in_movi and aud_cid[0] is not None and fourcc == aud_cid[0]:
                chunks.append(payload[off : off + size])

    walk(12, len(payload), False)
    if fmt is None:
        raise ValueError("AVI has no PCM audio stream")
    if not chunks:
        raise ValueError(
            f"AVI audio stream {aud_idx[0]} ('{aud_cid[0].decode()}') "
            "has no data chunks in movi"
        )
    return (*fmt, b"".join(chunks))


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------


def _mjpeg_frames(m: int):
    """Deterministic per-video MJPEG frames: ``2 + m % 3`` frames of an
    ``8*(1 + m%3) x 8*(1 + m%2)`` 4:4:4 color JPEG whose DC-only
    spectra vary by (video id, frame index, block) — the same modular
    closed form as the color-JPEG oracles, with the frame index folded
    into the luma term."""
    from polars_trading_spark.functions.multimodal import jpeg_encode_ycbcr

    w, h = 8 * (1 + m % 3), 8 * (1 + m % 2)
    nf = 2 + m % 3
    frames = []
    for fi in range(nf):
        mcus = []
        for k in range((w // 8) * (h // 8)):
            y = [0] * 64
            y[0] = ((m + 17 * fi + 13 * k) % 64) - 32
            cb = [0] * 64
            cb[0] = ((2 * m + 7 * k) % 64) - 32
            cr = [0] * 64
            cr[0] = ((3 * m + 5 * k) % 64) - 32
            mcus.append((y, cb, cr))
        frames.append(jpeg_encode_ycbcr(mcus, w, h))
    return frames, w, h, nf


def synthesize_avi_mjpeg(documents: DataFrame) -> DataFrame:
    """Deterministic REAL MJPEG AVI per document id — 2-4 decodable
    color-JPEG frames in a canonical RIFF/AVI container."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["media_id"]:
                m = int(m)
                frames, w, h, _ = _mjpeg_frames(m)
                rows.append(avi_encode_mjpeg(frames, w, h, fps=10))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": rows})

    return _media_base(documents).mapInPandas(
        pack,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


_AVI_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("us_per_frame", T.LongType()),
        T.StructField("n_streams", T.IntegerType()),
    ]
)


def avi_metadata_table(media: DataFrame) -> DataFrame:
    """Container-metadata extraction over (media_id, payload) — one
    file-parallel Arrow island, zero shuffle."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in _AVI_META_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                codec, w_, h, nf, uspf, ns = avi_metadata(bytes(payload))
                out["media_id"].append(int(mid))
                out["codec"].append(codec)
                out["width"].append(w_)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["us_per_frame"].append(uspf)
                out["n_streams"].append(ns)
            yield pd.DataFrame(out)

    return media.mapInPandas(meta, schema=_AVI_META_SCHEMA)


_AVI_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("n_px_bytes", T.LongType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_dot", T.LongType()),
    ]
)


def avi_frame_stats(media: DataFrame, *, stride: int = 2) -> DataFrame:
    """Stride-sampled frame decode — the VLM-training frame-extraction
    shape: every ``stride``-th '00dc' frame is decoded with the real
    JPEG stack and aggregated into exact integer pixel checksums
    (``px_dot`` is order-sensitive across frames AND bytes, so a frame
    slip or stride bug moves it).  One Arrow island; only MJPG streams
    decode (other codecs raise the named pin)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in _AVI_STATS_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                codec, w_, h, nf, _, _ = avi_metadata(payload)
                if codec != "MJPG":
                    raise NotImplementedError(
                        f"AVI codec {codec!r} pixel decode not supported — "
                        "MJPG only"
                    )
                frames = avi_extract_frames(payload)
                px_sum = 0
                px_dot = 0
                n_bytes = 0
                n_sampled = 0
                for fi in range(0, len(frames), stride):
                    px = jpeg_decode(frames[fi])
                    flat = px.reshape(-1).astype(np.int64)
                    j = np.arange(flat.shape[0], dtype=np.int64) + n_bytes
                    px_sum += int(flat.sum())
                    px_dot += int((flat * (j % 251 + 1)).sum())
                    n_bytes += int(flat.shape[0])
                    n_sampled += 1
                out["media_id"].append(int(mid))
                out["format"].append("avi")
                out["width"].append(w_)
                out["height"].append(h)
                out["n_frames"].append(int(nf))
                out["n_sampled"].append(n_sampled)
                out["n_px_bytes"].append(n_bytes)
                out["px_sum"].append(px_sum)
                out["px_dot"].append(px_dot)
            yield pd.DataFrame(out)

    return media.mapInPandas(stats, schema=_AVI_STATS_SCHEMA)
def _av_audio(m: int) -> bytes:
    """Deterministic per-video mono s16le PCM: the synthesize_pcm
    closed form (sample i of media m = ((m*7919 + i*104729) % 65536) -
    32768), n_samples = 200 + m % 300."""
    import numpy as np

    n = 200 + m % 300
    i = np.arange(n, dtype=np.int64)
    s = ((m * 7919 + i * 104729) % 65536) - 32768
    return s.astype("<i2").tobytes()


def synthesize_avi_av(documents: DataFrame) -> DataFrame:
    """Deterministic REAL A/V AVI per document id (round 13): the MJPEG
    frames of ``synthesize_avi_mjpeg`` interleaved with a mono s16le
    PCM audio stream ('01wb' chunks, one slice per frame period) — the
    canonical container shape a video-language ingest sees."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["media_id"]:
                m = int(m)
                frames, w, h, _ = _mjpeg_frames(m)
                rows.append(
                    avi_encode_mjpeg(
                        frames, w, h, fps=10, audio=_av_audio(m)
                    )
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": rows})

    return _media_base(documents).mapInPandas(
        pack,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


_AVI_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("s_sum", T.LongType()),
        T.StructField("s_dot", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def avi_audio_stats(media: DataFrame) -> DataFrame:
    """Audio-track extraction + exact integer aggregates over the
    demuxed PCM ('01wb' chunks concatenated across the movi list —
    a chunking/interleave bug moves the order-sensitive ``s_dot``).
    One Arrow island, zero shuffle."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in _AVI_AUDIO_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, bits, ch, pcm = avi_extract_audio(bytes(payload))
                s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                j = np.arange(s.shape[0], dtype=np.int64)
                sgn = np.sign(s)
                zc = int(((sgn[1:] * sgn[:-1]) < 0).sum()) if s.size > 1 else 0
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["bits"].append(bits)
                out["channels"].append(ch)
                out["n_samples"].append(int(s.shape[0]))
                out["s_sum"].append(int(s.sum()))
                out["s_dot"].append(int((s * (j % 251 + 1)).sum()))
                out["zero_crossings"].append(zc)
            yield pd.DataFrame(out)

    return media.mapInPandas(stats, schema=_AVI_AUDIO_SCHEMA)
