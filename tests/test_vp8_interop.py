"""Lossy VP8 decode vs the system libwebp (third-party interop oracle).

RFC 6386 decoding is bit-exact, so the pure-Python decoder
(functions/vp8_decode.py) must reproduce libwebp's own YUV output
EXACTLY on libwebp-encoded streams.  This is the validation layer for
the §13/§14 tables carried in via scripts/vp8_table_extract.py — a
single wrong probability, quantizer entry, predictor formula, or
filter limit diverges here immediately (it caught the libwebp-vs-spec
B-mode enum permutation and a transposed B_HU predictor during
bring-up).  Skips cleanly when libwebp is not installed.
"""

from __future__ import annotations

import numpy as np
import pytest

import libwebp_ref as lw
from polars_trading_spark.functions.vp8_decode import decode_frame, vp8_decode_yuv

pytestmark = pytest.mark.skipif(
    not lw.available, reason="system libwebp not available"
)


def _image(kind: str, h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    if kind == "noise":
        return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "grad":
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack(
            [(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256], -1
        ).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(yy / 9.0) + 50 * np.cos(xx / 7.0)).clip(0, 255)
    img = np.stack([base, base * 0.8 + 20, base * 0.6 + 40], -1).astype(np.uint8)
    return (
        (img.astype(int) + rng.randint(-8, 9, img.shape)).clip(0, 255)
    ).astype(np.uint8)


CASES = [
    ("grad", 16, 16, 100, 1),   # single MB, minimal quantizer
    ("grad", 16, 16, 75, 1),
    ("noise", 16, 32, 75, 2),   # one MB row
    ("noise", 32, 16, 75, 2),   # one MB column
    ("noise", 32, 48, 75, 2),
    ("grad", 40, 56, 50, 3),    # non-MB-aligned, mid quality
    ("noise", 48, 48, 30, 4),   # strong filter levels
    ("noise", 64, 64, 85, 5),
    ("noise", 33, 49, 60, 6),   # odd dimensions (crop path)
    ("photo", 80, 96, 40, 8),   # smooth content -> 16x16 modes + skips
    ("photo", 31, 47, 20, 9),   # heavy quantization
    ("grad", 64, 48, 10, 10),   # max-ish quantizer indices
]


@pytest.mark.parametrize("kind,h,w,q,seed", CASES)
def test_decode_matches_libwebp_exactly(kind, h, w, q, seed):
    img = _image(kind, h, w, seed)
    payload = lw.encode_rgb(img, float(q))
    ref_y, ref_u, ref_v = lw.decode_yuv(payload)
    my_y, my_u, my_v = vp8_decode_yuv(payload)
    assert my_y.shape == ref_y.shape
    assert my_u.shape == ref_u.shape
    assert my_v.shape == ref_v.shape
    np.testing.assert_array_equal(my_y, ref_y)
    np.testing.assert_array_equal(my_u, ref_u)
    np.testing.assert_array_equal(my_v, ref_v)


def test_interframe_raises():
    img = _image("grad", 16, 16, 1)
    payload = lw.encode_rgb(img, 75.0)
    from polars_trading_spark.functions.webp import _webp_chunks

    body = next(b for f, b in _webp_chunks(payload) if f == b"VP8 ")
    # flip the keyframe bit in the tag
    bad = bytes([body[0] | 1]) + body[1:]
    with pytest.raises(ValueError, match="keyframe"):
        decode_frame(bad)


def test_truncated_stream_raises():
    img = _image("grad", 16, 16, 1)
    payload = lw.encode_rgb(img, 75.0)
    from polars_trading_spark.functions.webp import _webp_chunks

    body = next(b for f, b in _webp_chunks(payload) if f == b"VP8 ")
    with pytest.raises(ValueError):
        decode_frame(body[:8])
