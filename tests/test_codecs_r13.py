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


# ------------------- round-13b: VP8L scope completion -------------------


def test_2d_distance_table_matches_rfc():
    """The packed LUT decodes to the RFC 9649 §4.2.2 (x, y) listing —
    independently transcribed head + structural invariants."""
    from polars_trading_spark.functions.webp import (
        _CODE_TO_PLANE,
        _plane_to_dist,
    )

    xs = [8 - (b & 0xF) for b in _CODE_TO_PLANE]
    ys = [b >> 4 for b in _CODE_TO_PLANE]
    assert len(_CODE_TO_PLANE) == 120
    assert len(set(zip(xs, ys))) == 120
    assert all(-8 <= x <= 8 for x in xs)
    assert all(0 <= y <= 7 for y in ys)
    assert list(zip(xs, ys))[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    ]
    # distances are monotone-ish in code index at fixed width and
    # clamped to >= 1 ((1,0) at any width -> 1)
    assert _plane_to_dist(2, 100) == 1
    assert _plane_to_dist(1, 10) == 10  # (0,1)
    assert _plane_to_dist(4, 10) == 9  # (-1,1)


@pytest.mark.parametrize("m", [0, 1, 2, 5, 9, 11])
def test_2d_distance_roundtrip(m):
    from polars_trading_spark.functions.webp import _webp_pixels

    w, h = 5 + m % 12, 4 + m % 9
    px = _webp_pixels(m, w, h)
    for kw in ({}, {"subtract_green": True}):
        enc = vp8l_encode(px, backref_period=11, use_2d_distances=True, **kw)
        assert np.array_equal(vp8l_decode(enc), px), (m, kw)
    # overlapping copy through a 2D dist-1 code replicates the pixel
    solid = np.tile(np.array([[10, 20, 30, 40]], np.uint8), (60, 1)).reshape(
        4, 15, 4
    )
    enc = vp8l_encode(solid, backref_period=1, use_2d_distances=True)
    assert np.array_equal(vp8l_decode(enc), solid)


def test_color_transform_delta_is_signed_shift():
    from polars_trading_spark.functions.webp import _cdelta

    # (int8)t * (int8)c >> 5, arithmetic shift: t=0xFF -> -1, c=64
    assert _cdelta(0xFF, 64) == (-1 * 64) >> 5  # == -2
    assert _cdelta(64, 0xFF) == (64 * -1) >> 5
    assert _cdelta(32, 32) == 32
    assert _cdelta(0, 200) == 0


@pytest.mark.parametrize("m", [0, 3, 7, 12])
@pytest.mark.parametrize("cb", [2, 3])
def test_color_transform_roundtrip_stacked(m, cb):
    px = _rand(100 + m, 3 + m % 21, 2 + m % 15)
    for kw in (
        {},
        {"subtract_green": True},
        {"predictor_bits": 3},
        {"subtract_green": True, "predictor_bits": 2, "cache_bits": 4},
    ):
        enc = vp8l_encode(px, color_bits=cb, color_seed=m, **kw)
        assert np.array_equal(vp8l_decode(enc), px), (m, cb, kw)


@pytest.mark.parametrize("psz", [1, 2, 3, 4, 5, 16, 17, 200])
def test_color_indexing_every_bundling(psz):
    """Palette sizes across all four packings: 8/4/2/1 px per green
    byte (width_bits 3/2/1/0)."""
    w, h = 23, 9
    base = np.array(
        [[(i * 37) % 256, (i * 11) % 256, (i * 5) % 256, 255] for i in range(psz)],
        np.uint8,
    )
    px = base[(np.arange(w * h) * 7) % psz].reshape(h, w, 4)
    assert np.array_equal(vp8l_decode(vp8l_encode(px, color_indexing=True)), px)


def test_color_indexing_with_cache_and_validation():
    base = np.array(
        [[(i * 37) % 256, (i * 11) % 256, (i * 5) % 256, (i * 3) % 256] for i in range(16)],
        np.uint8,
    )
    px = base[np.arange(16 * 8) % 16].reshape(8, 16, 4)
    enc = vp8l_encode(px, color_indexing=True, cache_bits=4)
    assert np.array_equal(vp8l_decode(enc), px)
    with pytest.raises(ValueError, match="256 unique colors"):
        vp8l_encode(_rand(0, 40, 40), color_indexing=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        vp8l_encode(px, color_indexing=True, subtract_green=True)


@pytest.mark.parametrize("ng", [1, 2, 3, 5])
def test_meta_prefix_roundtrip(ng):
    px = _rand(7, 33, 22)
    for kw in (
        {},
        {"cache_bits": 4},
        {"predictor_bits": 3},
        {"color_bits": 3, "predictor_bits": 2},
    ):
        enc = vp8l_encode(px, meta_prefix_bits=2, meta_groups=ng, **kw)
        assert np.array_equal(vp8l_decode(enc), px), (ng, kw)


def test_meta_prefix_with_backrefs_and_palette():
    from polars_trading_spark.functions.webp import _webp_pixels

    px = _webp_pixels(3, 11, 8)
    enc = vp8l_encode(
        px, backref_period=11, meta_prefix_bits=2, meta_groups=3,
        use_2d_distances=True,
    )
    assert np.array_equal(vp8l_decode(enc), px)
    # palette packing shrinks the coded width; the entropy image must
    # tile the PACKED width
    base = np.array(
        [[(i * 37) % 256, (i * 11) % 256, (i * 5) % 256, 255] for i in range(7)],
        np.uint8,
    )
    px = base[(np.arange(33 * 9) * 5) % 7].reshape(9, 33, 4)
    enc = vp8l_encode(px, color_indexing=True, meta_prefix_bits=2, meta_groups=2)
    assert np.array_equal(vp8l_decode(enc), px)


# ------------------ round-13c: LOSSLESS JPEG (SOF3, T.81 Annex H) ------------------


@pytest.mark.parametrize("P", [2, 4, 8, 12, 16])
@pytest.mark.parametrize("pred", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_jpeg_roundtrip(P, pred):
    from polars_trading_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_encode_lossless,
    )

    rng = np.random.RandomState(P * 31 + pred)
    for shape in ((1, 1), (1, 9), (9, 1), (7, 13)):
        h, w = shape
        s = rng.randint(0, 1 << P, size=(h, w)).astype(np.int64)
        dec = jpeg_decode(jpeg_encode_lossless(s, w, h, predictor=pred, precision=P))
        assert dec.dtype == (np.uint8 if P <= 8 else np.uint16)
        assert dec.shape == (h, w, 1)
        assert np.array_equal(dec[:, :, 0].astype(np.int64), s), (P, pred, shape)


def test_lossless_jpeg_extremes_and_pt():
    from polars_trading_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_encode_lossless,
    )

    # alternating 0 / max forces the top SSSS categories; at P=16 the
    # +32768 difference hits the no-extra-bits SSSS=16 code
    for P in (8, 16):
        s = np.zeros((4, 8), np.int64)
        s[:, 1::2] = (1 << P) - 1
        dec = jpeg_decode(jpeg_encode_lossless(s, 8, 4, predictor=1, precision=P))
        assert np.array_equal(dec[:, :, 0].astype(np.int64), s)
    s = np.array([[0, 32768]], np.int64)
    dec = jpeg_decode(jpeg_encode_lossless(s, 2, 1, predictor=1, precision=16))
    assert np.array_equal(dec[:, :, 0].astype(np.int64), s)
    # point transform: decoder multiplies back by 2^pt
    s = (np.arange(30).reshape(5, 6) % 64) * 4
    dec = jpeg_decode(jpeg_encode_lossless(s, 6, 5, precision=8, pt=2))
    assert np.array_equal(dec[:, :, 0].astype(np.int64), s)


def test_lossless_jpeg_validation():
    from polars_trading_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_encode_lossless,
    )

    s = np.zeros((2, 2), np.int64)
    with pytest.raises(ValueError, match="predictor"):
        jpeg_encode_lossless(s, 2, 2, predictor=0)
    with pytest.raises(ValueError, match="precision"):
        jpeg_encode_lossless(s, 2, 2, precision=17)
    with pytest.raises(ValueError, match="out of range"):
        jpeg_encode_lossless(s + 300, 2, 2, precision=8)
    # SUBSAMPLED multi-component lossless stays a named pin (1x1
    # interleaved multi-component decodes as of round 13)
    s3 = np.zeros((2, 2, 2), np.int64)
    payload = bytearray(jpeg_encode_lossless(s3, 2, 2))
    i = payload.index(b"\xff\xc3")
    payload[i + 11] = 0x22  # component 0 sampling
    with pytest.raises(NotImplementedError, match="subsampled multi"):
        jpeg_decode(bytes(payload))


def test_sampled_grayscale_normalizes():
    """Single-component frames: sampling factors are a spec no-op
    (stored size = frame dims when hmax is the component's own factor)
    — round 13 closes the former pin by normalizing to 1x1."""
    from polars_trading_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_encode_gray,
        jpeg_encode_progressive,
    )

    blocks = []
    for k in range(4):
        b = [0] * 64
        b[0] = 7 * k - 10
        blocks.append(b)
    payload = jpeg_encode_gray(blocks, 16, 16)
    base = jpeg_decode(payload)
    pb = bytearray(payload)
    i = pb.index(b"\xff\xc0")
    assert pb[i + 11] == 0x11
    for samp in (0x22, 0x21, 0x12):
        pb[i + 11] = samp
        assert np.array_equal(jpeg_decode(bytes(pb)), base), hex(samp)
    prog = jpeg_encode_progressive(blocks, 16, 16, al=1)
    pp = bytearray(prog)
    j = pp.index(b"\xff\xc2")
    pp[j + 11] = 0x22
    assert np.array_equal(jpeg_decode(bytes(pp)), jpeg_decode(prog))


# ------------------- round-13d: the classic BMP matrix -------------------


def _bmp_pal(n):
    return np.array(
        [[(17 * i) % 256, (29 * i) % 256, (41 * i) % 256] for i in range(n)],
        np.uint8,
    )


@pytest.mark.parametrize("td", [False, True])
def test_bmp_truecolor_roundtrip(td):
    from polars_trading_spark.functions.multimodal import bmp_decode, bmp_encode

    rng = np.random.RandomState(td)
    px = rng.randint(0, 256, size=(7, 13, 3)).astype(np.uint8)
    assert np.array_equal(bmp_decode(bmp_encode(px, bits=24, top_down=td)), px)
    px4 = rng.randint(0, 256, size=(5, 9, 4)).astype(np.uint8)
    assert np.array_equal(bmp_decode(bmp_encode(px4, bits=32, top_down=td)), px4)


@pytest.mark.parametrize("bits", [1, 4, 8])
@pytest.mark.parametrize("td", [False, True])
def test_bmp_palette_roundtrip(bits, td):
    from polars_trading_spark.functions.multimodal import bmp_decode, bmp_encode

    rng = np.random.RandomState(bits * 7 + td)
    idx = rng.randint(0, 1 << bits, size=(6, 11)).astype(np.uint8)
    dec = bmp_decode(bmp_encode(idx, bits=bits, top_down=td))
    assert np.array_equal(dec, _bmp_pal(1 << bits)[idx])


@pytest.mark.parametrize("bits", [4, 8])
def test_bmp_rle_roundtrip(bits):
    from polars_trading_spark.functions.multimodal import bmp_decode, bmp_encode

    rng = np.random.RandomState(bits)
    idx = np.repeat(rng.randint(0, 1 << bits, size=(6, 4)), 3, axis=1).astype(
        np.uint8
    )
    dec = bmp_decode(bmp_encode(idx, bits=bits, rle=True))
    assert np.array_equal(dec, _bmp_pal(1 << bits)[idx])


def test_bmp_rle8_absolute_and_delta_hand_built():
    from polars_trading_spark.functions.multimodal import bmp_decode

    # absolute blocks + delta escape, hand-built RLE8 stream
    import struct

    pal = b"".join(
        bytes([(17 * i) % 256, (29 * i) % 256, (41 * i) % 256, 0])
        for i in range(256)
    )
    # 4x4: abs block [1,2,3], EOL, delta(1,1), run 2x5, EOB
    stream = (
        b"\x00\x03" + bytes([1, 2, 3]) + b"\x00"  # absolute, word pad
        + b"\x00\x00"  # end of line
        + b"\x00\x02" + bytes([1, 1])  # delta dx=1 dy=1
        + bytes([2, 5])  # run of two 5s
        + b"\x00\x01"  # end of bitmap
    )
    px_off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", px_off + len(stream), 0, 0, px_off)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, 4, 4, 1, 8, 1, len(stream), 0, 0, 256, 0
    )
    dec = bmp_decode(hdr + pal + stream)
    want_idx = np.zeros((4, 4), np.uint8)
    want_idx[0, :3] = [1, 2, 3]  # stored row 0 (bottom row after flip)
    # EOL -> (x=0, y=1); delta(+1, +1) -> (x=1, y=2); run lands there
    want_idx[2, 1:3] = 5
    assert np.array_equal(dec, _bmp_pal(256)[want_idx][::-1])


def test_bmp_pins_still_named():
    from polars_trading_spark.functions.multimodal import (
        bmp_decode,
        bmp_encode16,
    )

    # nonstandard 16-bit bitfield masks stay a pin (round 13 closed
    # RGB555/RGB565)
    payload = bytearray(bmp_encode16(np.zeros((2, 2), np.uint16), variant="565"))
    import struct

    payload[54:66] = struct.pack("<III", 0xF00, 0xF0, 0xF)  # 4:4:4
    with pytest.raises(NotImplementedError, match="masks"):
        bmp_decode(bytes(payload))


@pytest.mark.parametrize("variant", ["555", "565"])
@pytest.mark.parametrize("td", [False, True])
def test_bmp_16bit_roundtrip(variant, td):
    from polars_trading_spark.functions.multimodal import (
        bmp_decode,
        bmp_encode16,
    )

    rng = np.random.RandomState(td * 2 + (variant == "565"))
    raw = rng.randint(0, 1 << 16, size=(5, 7)).astype(np.uint16)
    if variant == "555":
        raw &= 0x7FFF
    dec = bmp_decode(bmp_encode16(raw, variant=variant, top_down=td))

    def expand(x, n):
        return (x << (8 - n)) | (x >> (2 * n - 8))

    r64 = raw.astype(np.int64)
    if variant == "555":
        bgr = [expand(r64 & 31, 5), expand((r64 >> 5) & 31, 5), expand((r64 >> 10) & 31, 5)]
    else:
        bgr = [expand(r64 & 31, 5), expand((r64 >> 5) & 63, 6), expand((r64 >> 11) & 31, 5)]
    assert np.array_equal(dec, np.stack(bgr, axis=-1).astype(np.uint8))


@pytest.mark.parametrize("P", [8, 12, 16])
@pytest.mark.parametrize("nc", [2, 3, 4])
def test_lossless_jpeg_multicomponent(P, nc):
    from polars_trading_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_encode_lossless,
    )

    rng = np.random.RandomState(P + nc)
    for pred in (1, 4, 7):
        s = rng.randint(0, 1 << P, size=(6, 9, nc)).astype(np.int64)
        dec = jpeg_decode(jpeg_encode_lossless(s, 9, 6, predictor=pred, precision=P))
        assert dec.shape == (6, 9, nc)
        assert np.array_equal(dec.astype(np.int64), s), (P, nc, pred)


# ---------------- round-13e: staged round-14 Spark surfaces ----------------


def test_bmp_matrix_synthesizer_spark(spark):
    from polars_trading_spark.functions.multimodal import (
        bmp_decode,
        pixel_stats,
        synthesize_bmp_matrix,
    )

    docs = spark.createDataFrame([(i,) for i in range(15)], ["doc_id"])
    rows = {
        r["media_id"]: r
        for r in pixel_stats(synthesize_bmp_matrix(docs)).collect()
    }
    assert len(rows) == 15
    pal = _bmp_pal(256)

    def expand(x, n):
        return (x << (8 - n)) | (x >> (2 * n - 8))

    for m in range(15):
        w, h = 4 + m % 13, 3 + m % 9
        v = m % 6
        if v == 0:
            px = ((m * 31 + np.arange(h * w * 3) * 7) % 256).reshape(h, w, 3)
        elif v == 1:
            px = ((m * 13 + np.arange(h * w * 4) * 11) % 256).reshape(h, w, 4)
        elif v == 5:
            raw = (m * 257 + np.arange(h * w) * 97) % 65536
            if m % 2 == 0:
                raw = raw & 0x7FFF
                bgr = [expand(raw & 31, 5), expand((raw >> 5) & 31, 5), expand((raw >> 10) & 31, 5)]
            else:
                bgr = [expand(raw & 31, 5), expand((raw >> 5) & 63, 6), expand((raw >> 11) & 31, 5)]
            px = np.stack(bgr, axis=-1).reshape(h, w, 3)
        else:
            mod, mul = {2: (256, 7), 3: (16, 3), 4: (2, 1)}[v]
            idx = ((m + np.arange(h * w) * mul) % mod).reshape(h, w)
            px = pal[idx]
        flat = px.reshape(-1).astype(np.int64)
        j = np.arange(flat.shape[0], dtype=np.int64)
        r = rows[m]
        assert r["n_px_bytes"] == flat.shape[0], m
        assert r["px_sum"] == int(flat.sum()), m
        assert r["px_dot"] == int((flat * (j % 251 + 1)).sum()), m


def test_jpeg_lossless_synthesizer_spark(spark):
    from polars_trading_spark.functions.multimodal import (
        pixel_stats,
        synthesize_jpeg_lossless,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    rows = {
        r["media_id"]: r
        for r in pixel_stats(synthesize_jpeg_lossless(docs)).collect()
    }
    for m in range(12):
        w, h = 5 + m % 12, 4 + m % 9
        p = (8, 12, 16)[m % 3]
        nc = 1 + m % 3
        y, x, c = np.mgrid[0:h, 0:w, 0:nc]
        s = ((m * 37 + y * 17 + x * 7 + c * 53) % (1 << p)).reshape(-1).astype(np.int64)
        j = np.arange(s.shape[0], dtype=np.int64)
        r = rows[m]
        assert r["n_px_bytes"] == w * h * nc, m
        assert r["px_sum"] == int(s.sum()), m
        assert r["px_dot"] == int((s * (j % 251 + 1)).sum()), m


def test_webp_lossy_header_table_spark(spark):
    from polars_trading_spark.functions.webp import (
        synthesize_webp_lossy,
        webp_lossy_header_table,
    )

    docs = spark.createDataFrame([(i,) for i in range(10)], ["doc_id"])
    rows = {
        r["media_id"]: r
        for r in webp_lossy_header_table(synthesize_webp_lossy(docs)).collect()
    }
    for m in range(10):
        r = rows[m]
        assert (r["width"], r["height"]) == (16 + m % 101, 16 + m % 63)
        assert r["y_ac_qi"] == m % 128
        assert r["y_dc_delta"] == (m % 31) - 15
        assert r["uv_ac_delta"] == (m % 29) - 14
        assert r["filter_level"] == (3 * m) % 64
        assert r["sharpness"] == m % 8
        assert r["n_partitions"] == 1 << (m % 4)
        assert r["seg_enabled"] == int(m % 3 == 0)
        if m % 3 == 0:
            assert r["seg_q0"] == (m % 15) - 7


def test_noninteger_sampling_ratio_decodes():
    """Round 13 closes the non-integer sampling pin: a 3:2:1
    horizontally-sampled interleaved frame decodes via the exact
    nearest index map (T.81 leaves the filter unspecified)."""
    import math

    from polars_trading_spark.functions.multimodal import (
        jpeg_decode,
        jpeg_encode_scan_groups,
    )

    ceil = lambda a, b: -(-a // b)
    w_, h_, m = 24, 8, 5
    samp = [(3, 1), (2, 1), (1, 1)]
    comps = []
    for ci, (hs, vs) in enumerate(samp):
        mcw, mch = ceil(w_, 24), ceil(h_, 8)
        blocks = []
        for k in range(mcw * hs * mch * vs):
            b = [0] * 64
            b[0] = ((m * (ci + 2) + 13 * k) % 64) - 32
            blocks.append(b)
        comps.append(blocks)
    dec = jpeg_decode(jpeg_encode_scan_groups(comps, w_, h_, samp, [(0, 1, 2)]))
    assert dec.shape == (h_, w_, 3)

    def rgb(yv, cb, cr):
        r = min(255, max(0, math.floor(yv + 1.402 * (cr - 128) + 0.5)))
        g = min(255, max(0, math.floor(
            yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
        b = min(255, max(0, math.floor(yv + 1.772 * (cb - 128) + 0.5)))
        return r, g, b

    for y in range(h_):
        for x in range(w_):
            vals = []
            for ci, (hs, vs) in enumerate(samp):
                cw = ceil(w_ * hs, 3)
                nbw = ceil(w_, 24) * hs
                sx = x * cw // w_
                k = (y // 8) * nbw + (sx // 8)
                vals.append(2 * ((m * (ci + 2) + 13 * k) % 64) + 64)
            assert tuple(int(v) for v in dec[y, x]) == rgb(*vals), (y, x)


def test_jpeg_noninteger_synthesizer_spark(spark):
    import math

    from polars_trading_spark.functions.multimodal import (
        pixel_stats,
        synthesize_jpeg_noninteger,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    rows = {
        r["media_id"]: r
        for r in pixel_stats(synthesize_jpeg_noninteger(docs)).collect()
    }
    ceil = lambda a, b: -(-a // b)

    def rgb(yv, cb, cr):
        r = min(255, max(0, math.floor(yv + 1.402 * (cr - 128) + 0.5)))
        g = min(255, max(0, math.floor(
            yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
        b = min(255, max(0, math.floor(yv + 1.772 * (cb - 128) + 0.5)))
        return r, g, b

    for m in range(6):
        w, h = 24 + 24 * (m % 2), 8 + 8 * (m % 3)
        samp = [(3, 1), (2, 1), (1, 1)]
        vals = []
        for y in range(h):
            for x in range(w):
                trip = []
                for ci, (hs, vs) in enumerate(samp):
                    cw = ceil(w * hs, 3)
                    nbw = ceil(w, 24) * hs
                    sx = x * cw // w
                    k = (y // 8) * nbw + (sx // 8)
                    trip.append(2 * ((m * (ci + 2) + 13 * k) % 64) + 64)
                vals.extend(rgb(*trip))
        flat = np.array(vals, dtype=np.int64)
        j = np.arange(flat.shape[0], dtype=np.int64)
        r = rows[m]
        assert r["n_px_bytes"] == flat.shape[0], m
        assert r["px_sum"] == int(flat.sum()), m
        assert r["px_dot"] == int((flat * (j % 251 + 1)).sum()), m


# ----------------- round-13f: PNG tRNS transparency -----------------


def test_png_trns_palette_and_keys():
    from polars_trading_spark.functions.multimodal import (
        png_decode,
        png_encode,
    )

    rng = np.random.RandomState(6)
    pal = [tuple(int(v) for v in row) for row in rng.randint(0, 256, size=(10, 3))]
    idx = rng.randint(0, 10, size=(7, 9, 1)).astype(np.uint8)
    alphas = [10, 200, 0, 255, 77]  # shorter than the palette
    for interlace in (False, True):
        dec = png_decode(
            png_encode(idx, color_type=3, palette=pal, trns=alphas,
                       interlace=interlace)
        )
        assert dec.shape == (7, 9, 4)
        for y in range(7):
            for x in range(9):
                i = int(idx[y, x, 0])
                assert tuple(dec[y, x, :3]) == pal[i]
                assert dec[y, x, 3] == (alphas[i] if i < 5 else 255)
    # no tRNS -> RGB, byte-identical back-compat
    assert png_decode(png_encode(idx, color_type=3, palette=pal)).shape == (7, 9, 3)
    # sub-8-bit palette carries tRNS too
    idx4 = rng.randint(0, 4, size=(5, 11)).astype(np.uint8)
    dec = png_decode(
        png_encode(idx4, color_type=3, palette=pal[:4], depth=2, trns=[9, 255, 0])
    )
    assert dec.shape == (5, 11, 4)
    # grayscale sample key -> gray+alpha
    g = rng.randint(0, 256, size=(6, 6, 1)).astype(np.uint8)
    g[2, 3, 0] = 123
    dec = png_decode(png_encode(g, color_type=0, trns=123))
    assert dec.shape == (6, 6, 2)
    assert (dec[:, :, 1] == np.where(g[:, :, 0] == 123, 0, 255)).all()
    # 16-bit RGB key -> RGBA uint16
    px = rng.randint(0, 65536, size=(4, 5, 3)).astype(np.uint16)
    px[1, 1] = (7, 8, 9)
    dec = png_decode(png_encode(px, color_type=2, depth=16, trns=(7, 8, 9)))
    assert dec.shape == (4, 5, 4) and dec.dtype == np.uint16
    assert dec[1, 1, 3] == 0 and dec[0, 0, 3] == 65535


def test_gif_gce_transparency():
    """Round 13: a static GIF whose graphic-control extension sets the
    transparent-color flag decodes to RGBA with alpha 0 at the
    transparent index; GIFs without the flag stay RGB (back-compat)."""
    import struct

    from polars_trading_spark.functions.multimodal import (
        _gif_interlace_rows,
        _lzw_encode_gif,
        gif_decode,
    )

    def build(idx, palette, transparent=None, interlace=False):
        h, w = idx.shape
        n = len(palette)
        size_field = max(0, (n - 1).bit_length() - 1)
        out = bytearray(b"GIF89a") + struct.pack(
            "<HHBBB", w, h, 0x80 | size_field, 0, 0
        )
        for k in range(2 << size_field):
            out += bytes(palette[k]) if k < n else b"\x00\x00\x00"
        if transparent is not None:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        rows = idx[_gif_interlace_rows(h)] if interlace else idx
        mcs = max(2, size_field + 1)
        out += bytes([mcs])
        out += _lzw_encode_gif(rows.reshape(-1).tolist(), mcs)
        out += b"\x00\x3b"
        return bytes(out)

    rng = np.random.RandomState(8)
    pal = [tuple(int(v) for v in r) for r in rng.randint(0, 256, size=(8, 3))]
    idx = rng.randint(0, 8, size=(6, 9)).astype(np.uint8)
    for il in (False, True):
        dec = gif_decode(build(idx, pal, transparent=3, interlace=il))
        assert dec.shape == (6, 9, 4)
        assert (dec[:, :, 3] == np.where(idx == 3, 0, 255)).all()
        assert (dec[:, :, :3] == np.array(pal, np.uint8)[idx]).all()
        assert gif_decode(build(idx, pal, interlace=il)).shape == (6, 9, 3)
