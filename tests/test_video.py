"""Round-12 AVI/MJPEG container units — pure Python: the video arm's
groundwork (container parse, frame extraction, stride sampling) ahead
of its round-13 registration (the round-12 gate window's 5-new cap is
spent)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from polars_trading_spark.functions.multimodal import jpeg_decode
from polars_trading_spark.functions.video import (
    _mjpeg_frames,
    avi_encode_mjpeg,
    avi_extract_frames,
    avi_metadata,
)


@pytest.mark.parametrize("m", [0, 1, 2, 5, 7, 11, 100])
def test_avi_roundtrip_metadata_and_frames(m):
    frames, w, h, nf = _mjpeg_frames(m)
    payload = avi_encode_mjpeg(frames, w, h, fps=10)
    assert avi_metadata(payload) == ("MJPG", w, h, nf, 100_000, 1)
    got = avi_extract_frames(payload)
    assert got == frames  # byte-exact chunk extraction


def _rgb_from(yv, cb, cr):
    r = min(255, max(0, math.floor(yv + 1.402 * (cr - 128) + 0.5)))
    g = min(255, max(0, math.floor(
        yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
    b = min(255, max(0, math.floor(yv + 1.772 * (cb - 128) + 0.5)))
    return r, g, b


@pytest.mark.parametrize("m", [0, 3, 8])
def test_avi_frames_decode_to_closed_form(m):
    frames, w, h, nf = _mjpeg_frames(m)
    payload = avi_encode_mjpeg(frames, w, h)
    for fi, f in enumerate(avi_extract_frames(payload)):
        px = jpeg_decode(f)
        assert px.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                k = (y // 8) * (w // 8) + x // 8
                yv = 2 * ((m + 17 * fi + 13 * k) % 64) + 64
                cb = 2 * ((2 * m + 7 * k) % 64) + 64
                cr = 2 * ((3 * m + 5 * k) % 64) + 64
                assert tuple(px[y, x]) == _rgb_from(yv, cb, cr), (fi, x, y)


def test_avi_validation():
    with pytest.raises(ValueError, match="at least one frame"):
        avi_encode_mjpeg([], 8, 8)
    with pytest.raises(ValueError, match="not an AVI"):
        avi_metadata(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="not an AVI"):
        avi_extract_frames(b"garbage")
    # a WebP RIFF is not an AVI
    from polars_trading_spark.functions.webp import webp_encode_lossy_stub

    with pytest.raises(ValueError, match="not an AVI"):
        avi_metadata(webp_encode_lossy_stub(16, 16))


def test_avi_frame_stats_stride_math():
    """The stride-sampling checksum is replayable: n_sampled =
    ceil(nf / stride) and px accounting matches a direct decode of the
    sampled frames — the invariant the round-13 SQL oracle will rest
    on."""
    m = 5
    frames, w, h, nf = _mjpeg_frames(m)
    payload = avi_encode_mjpeg(frames, w, h)
    stride = 2
    sampled = list(range(0, nf, stride))
    px_sum = 0
    px_dot = 0
    base = 0
    for fi in sampled:
        px = jpeg_decode(frames[fi]).reshape(-1).astype(np.int64)
        j = np.arange(px.shape[0], dtype=np.int64) + base
        px_sum += int(px.sum())
        px_dot += int((px * (j % 251 + 1)).sum())
        base += int(px.shape[0])
    # replicate the kernel's walk over the container
    got_frames = avi_extract_frames(payload)
    g_sum = g_dot = g_base = 0
    for fi in range(0, len(got_frames), stride):
        px = jpeg_decode(got_frames[fi]).reshape(-1).astype(np.int64)
        j = np.arange(px.shape[0], dtype=np.int64) + g_base
        g_sum += int(px.sum())
        g_dot += int((px * (j % 251 + 1)).sum())
        g_base += int(px.shape[0])
    assert (g_sum, g_dot, g_base) == (px_sum, px_dot, base)
    assert len(sampled) == -(-nf // stride)


# ------------------- round-13: interleaved A/V containers -------------------


def test_av_single_stream_byte_identical():
    """audio=None must not change the single-stream bytes (the
    registered metadata/frame oracles pin that layout)."""
    from polars_trading_spark.functions.video import (
        _mjpeg_frames,
        avi_encode_mjpeg,
    )

    frames, w, h, _ = _mjpeg_frames(5)
    assert avi_encode_mjpeg(frames, w, h, fps=10) == avi_encode_mjpeg(
        frames, w, h, fps=10, audio=None
    )


@pytest.mark.parametrize("m", [0, 1, 2, 7, 11, 23])
def test_av_roundtrip_exact(m):
    from polars_trading_spark.functions.video import (
        _av_audio,
        _mjpeg_frames,
        avi_encode_mjpeg,
        avi_extract_audio,
        avi_extract_frames,
        avi_metadata,
    )

    frames, w, h, nf = _mjpeg_frames(m)
    audio = _av_audio(m)
    payload = avi_encode_mjpeg(frames, w, h, fps=10, audio=audio)
    codec, ww, hh, n, uspf, ns = avi_metadata(payload)
    assert (codec, ww, hh, n, ns) == ("MJPG", w, h, nf, 2)
    # demux recovers BOTH streams byte-exactly despite interleaving
    assert avi_extract_frames(payload) == [bytes(f) for f in frames]
    rate, bits, ch, pcm = avi_extract_audio(payload)
    assert (rate, bits, ch) == (16_000, 16, 1)
    assert pcm == audio


def test_av_audio_validation():
    from polars_trading_spark.functions.video import (
        _mjpeg_frames,
        avi_encode_mjpeg,
        avi_extract_audio,
    )

    frames, w, h, _ = _mjpeg_frames(3)
    with pytest.raises(ValueError, match="even byte count"):
        avi_encode_mjpeg(frames, w, h, audio=b"\x01\x02\x03")
    video_only = avi_encode_mjpeg(frames, w, h)
    with pytest.raises(ValueError, match="no PCM audio"):
        avi_extract_audio(video_only)
    # a non-PCM format tag is a named pin
    av = bytearray(avi_encode_mjpeg(frames, w, h, audio=b"\x00\x00" * 8))
    i = av.index(b"auds")
    strf_off = av.index(b"strf", i) + 8
    av[strf_off] = 2  # WAVE_FORMAT_ADPCM
    with pytest.raises(NotImplementedError, match="format tag"):
        avi_extract_audio(bytes(av))


def test_avi_audio_stats_spark(spark):
    from polars_trading_spark.functions.video import (
        _av_audio,
        avi_audio_stats,
        synthesize_avi_av,
    )
    import numpy as np

    docs = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    rows = {r["media_id"]: r for r in avi_audio_stats(synthesize_avi_av(docs)).collect()}
    assert len(rows) == 12
    for m in range(12):
        s = np.frombuffer(_av_audio(m), dtype="<i2").astype(np.int64)
        j = np.arange(s.shape[0], dtype=np.int64)
        r = rows[m]
        assert r["n_samples"] == 200 + m % 300
        assert r["s_sum"] == int(s.sum())
        assert r["s_dot"] == int((s * (j % 251 + 1)).sum())
        sgn = np.sign(s)
        assert r["zero_crossings"] == int(((sgn[1:] * sgn[:-1]) < 0).sum())
