"""Round-13 codec kernels: the VP8L PREDICTOR transform (RFC 9649
§4.1 — all 14 modes, border rules, entropy-coded mode sub-image) and
the round-13 encoder hardening (single-symbol simple codes >= 255 fall
through to the normal path; cache-hit guard; trailing-0xFF JPEG scan
truncation).  Pure kernel tests — the driver gate covers the Spark
surface via multimodal_webp_predictor_decode."""

from __future__ import annotations

import numpy as np
import pytest

from polars_trading_spark.functions.webp import (
    _vp8l_predict,
    vp8l_decode,
    vp8l_encode,
)


def _rand(m, w, h):
    rng = np.random.RandomState(1000 + m)
    return rng.randint(0, 256, size=(h, w, 4)).astype(np.uint8)


@pytest.mark.parametrize("m", [0, 1, 2, 5, 9, 14])
@pytest.mark.parametrize("pb", [2, 3, 4])
def test_predictor_roundtrip_random(m, pb):
    px = _rand(m, 3 + m % 23, 2 + m % 17)
    for kw in (
        {},
        {"subtract_green": True},
        {"cache_bits": 5},
        {"subtract_green": True, "cache_bits": 4},
    ):
        enc = vp8l_encode(px, predictor_bits=pb, predictor_seed=m, **kw)
        assert np.array_equal(vp8l_decode(enc), px), (m, pb, kw)


def test_predictor_all_modes_exercised():
    # 60x60 at 4-px blocks = 15x15 mode cells, modes cycle 0..13 — every
    # mode appears many times, including against all border neighbors
    px = _rand(42, 60, 60)
    assert np.array_equal(vp8l_decode(vp8l_encode(px, predictor_bits=2)), px)


def test_predictor_single_block_and_tiny_images():
    # whole image inside one block (pb larger than dims) and 1-pixel /
    # 1-row / 1-column degenerate shapes
    for shape in ((1, 1), (1, 7), (7, 1), (2, 2), (3, 9)):
        h, w = shape
        px = _rand(h * 31 + w, w, h)
        for seed in range(14):  # every mode as the single block's mode
            enc = vp8l_encode(px, predictor_bits=9, predictor_seed=seed)
            assert np.array_equal(vp8l_decode(enc), px), (shape, seed)


def test_predict_border_rules_hand_computed():
    # spec: (0,0) predicts opaque black; top row predicts L; left
    # column predicts T — regardless of the block's mode
    img = {0: (10, 20, 30, 40), 1: (50, 60, 70, 80), 2: (5, 6, 7, 8)}
    get = lambda i: img[i]
    for mode in range(14):
        assert _vp8l_predict(mode, 0, 0, 2, get) == (0, 0, 0, 255)
        assert _vp8l_predict(mode, 1, 0, 2, get) == img[0]  # L
        assert _vp8l_predict(mode, 0, 1, 2, get) == img[0]  # T


def test_predict_modes_hand_computed():
    # 2x2 image, predicting pixel (1,1): L=idx2, T=idx1, TL=idx0,
    # TR=idx... (y-1)*w + x + 1 = 2 -> wraps to CURRENT row x=0 (= L
    # here) per the contiguous-memory addressing rule
    L, T, TL = (100, 10, 200, 30), (20, 110, 40, 50), (60, 70, 80, 90)
    img = {0: TL, 1: T, 2: L}
    get = lambda i: img[i]
    p = lambda mode: _vp8l_predict(mode, 1, 1, 2, get)
    assert p(0) == (0, 0, 0, 255)
    assert p(1) == L
    assert p(2) == T
    assert p(3) == L  # TR wraps to current row's leftmost = L
    assert p(4) == TL
    avg2 = lambda a, b: tuple((x + y) >> 1 for x, y in zip(a, b))
    assert p(5) == avg2(avg2(L, L), T)
    assert p(6) == avg2(L, TL)
    assert p(7) == avg2(L, T)
    assert p(8) == avg2(TL, T)
    assert p(9) == avg2(T, L)
    assert p(10) == avg2(avg2(L, TL), avg2(T, L))
    # Select: pL = sum|T-TL| = 40+40+40+40=160, pT = sum|L-TL| =
    # 40+60+120+60=280 -> pL < pT -> L
    assert p(11) == L
    # ClampAddSubtractFull: clamp(L+T-TL) = (60, 50, 160, -10->0)
    assert p(12) == (60, 50, 160, 0)
    # ClampAddSubtractHalf: a=avg2(L,T)=(60,60,120,40);
    # a + trunc((a-TL)/2) = (60+0, 60-5, 120+20, 40-25) = (60,55,140,15)
    assert p(13) == (60, 55, 140, 15)


def test_clamp_half_truncates_toward_zero():
    # (a - b) / 2 is C-style truncation: a=1, TL=4 -> d=-3 ->
    # trunc(-1.5) = -1 (floor would give -2)
    L, T, TL = (1, 1, 1, 1), (1, 1, 1, 1), (4, 4, 4, 4)
    img = {0: TL, 1: T, 2: L}
    assert _vp8l_predict(13, 1, 1, 2, lambda i: img[i]) == (0, 0, 0, 0)


def test_allzero_image_with_cache_roundtrip():
    # round-13 ADVICE fix: a lone green symbol >= 256 (the zero pixel's
    # immediate cache hit) must not take the 8-bit simple-code path
    for shape in ((1, 1), (3, 5), (8, 2)):
        px = np.zeros((*shape, 4), np.uint8)
        for cb in (1, 6, 11):
            dec = vp8l_decode(vp8l_encode(px, cache_bits=cb))
            assert np.array_equal(dec, px), (shape, cb)


def test_predictor_validation():
    px = np.zeros((2, 2, 4), np.uint8)
    with pytest.raises(ValueError, match="predictor_bits"):
        vp8l_encode(px, predictor_bits=1)
    with pytest.raises(ValueError, match="incompatible"):
        vp8l_encode(px, predictor_bits=2, backref_period=4)


def test_jpeg_trailing_lone_ff_truncated_scan():
    # round-13 ADVICE fix: a payload ending in a bare 0xFF (truncated
    # marker) must not be consumed as entropy data
    from polars_trading_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_encode_gray,
    )

    blocks = [[0] * 64]
    blocks[0][0] = 17
    payload = jpeg_encode_gray(blocks, 8, 8)
    assert payload.endswith(b"\xff\xd9")
    # chop the EOI and everything after the scan's first byte, leaving
    # a lone 0xFF as the final byte
    i = payload.index(b"\xff\xda")
    scan_start = i + 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
    truncated = payload[: scan_start + 1] + b"\xff"
    with pytest.raises(ValueError):
        jpeg_decode(truncated)
