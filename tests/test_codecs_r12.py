"""Round-12 codec units — pure Python (no Spark session): partial-MCU
JPEG (sequential + progressive, any sampling), restart intervals in
progressive scans, and the WebP container + VP8L lossless codec.  The
Spark-side plumbing is gated end-to-end by the registry oracles
(``multimodal_jpeg_partialmcu_decode`` /
``multimodal_jpeg_prog_restart_decode`` / ``multimodal_webp_metadata``
/ ``multimodal_webp_lossless_decode``)."""

from __future__ import annotations

import numpy as np
import pytest

from polars_trading_spark.functions.multimodal import (
    jpeg_decode,
    jpeg_encode_gray,
    jpeg_encode_noninterleaved,
    jpeg_encode_progressive,
    jpeg_encode_ycbcr,
    jpeg_encode_ycbcr_420,
)
from polars_trading_spark.functions.webp import (
    _WEBP_PERIOD,
    _webp_pixels,
    vp8l_decode,
    vp8l_encode,
    webp_encode_extended,
    webp_encode_lossy_stub,
    webp_metadata,
)


def _ceil(a, b):
    return -(-a // b)


def _expected_420(m, w, h):
    mcw = _ceil(w, 16)
    y = np.empty((h, w))
    cb = np.empty((h, w))
    cr = np.empty((h, w))
    for yy in range(h):
        for xx in range(w):
            k = (yy // 16) * mcw + (xx // 16)
            s = ((yy % 16) // 8) * 2 + (xx % 16) // 8
            y[yy, xx] = 2 * ((m + 13 * (4 * k + s)) % 64) + 64
            cb[yy, xx] = 2 * ((2 * m + 7 * k) % 64) + 64
            cr[yy, xx] = 2 * ((3 * m + 5 * k) % 64) + 64
    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5)
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _coeffs_420_mcus(m, w, h):
    mcw, mch = _ceil(w, 16), _ceil(h, 16)
    mcus = []
    for k in range(mcw * mch):
        yb = []
        for s in range(4):
            blk = [0] * 64
            blk[0] = ((m + 13 * (4 * k + s)) % 64) - 32
            yb.append(blk)
        cbb = [0] * 64
        cbb[0] = ((2 * m + 7 * k) % 64) - 32
        crb = [0] * 64
        crb[0] = ((3 * m + 5 * k) % 64) - 32
        mcus.append((tuple(yb), cbb, crb))
    return mcus


def _coeffs_420_planes(m, w, h):
    mcw, mch = _ceil(w, 16), _ceil(h, 16)
    yb = []
    for byy in range(2 * mch):
        for bxx in range(2 * mcw):
            k = (byy // 2) * mcw + bxx // 2
            s = (byy % 2) * 2 + (bxx % 2)
            blk = [0] * 64
            blk[0] = ((m + 13 * (4 * k + s)) % 64) - 32
            yb.append(blk)
    cbs, crs = [], []
    for k in range(mcw * mch):
        b1 = [0] * 64
        b1[0] = ((2 * m + 7 * k) % 64) - 32
        cbs.append(b1)
        b2 = [0] * 64
        b2[0] = ((3 * m + 5 * k) % 64) - 32
        crs.append(b2)
    return yb, cbs, crs


@pytest.mark.parametrize("m", [0, 1, 2, 5, 7, 11, 23, 100, 12345])
def test_partial_mcu_420_sequential_and_progressive_exact(m):
    """Odd (non-MCU-aligned) 4:2:0 dims decode to exactly the cropped
    closed form through BOTH scan layouts."""
    w, h = 17 + m % 15, 13 + m % 11
    exp = _expected_420(m, w, h)
    seq = jpeg_decode(jpeg_encode_ycbcr_420(_coeffs_420_mcus(m, w, h), w, h))
    assert seq.shape == (h, w, 3)
    assert np.array_equal(seq, exp)
    yb, cbs, crs = _coeffs_420_planes(m, w, h)
    prog = jpeg_decode(
        jpeg_encode_progressive(
            [yb, cbs, crs], w, h, al=1, samplings=[(2, 2), (1, 1), (1, 1)]
        )
    )
    assert np.array_equal(prog, exp)


@pytest.mark.parametrize("m", [0, 3, 8, 19])
def test_partial_mcu_gray_and_444(m):
    w, h = 9 + m % 13, 11 + m % 7
    nbw, nbh = _ceil(w, 8), _ceil(h, 8)
    blocks = []
    for k in range(nbw * nbh):
        blk = [0] * 64
        blk[0] = ((m + 13 * k) % 64) - 32
        blocks.append(blk)
    expg = np.empty((h, w))
    for yy in range(h):
        for xx in range(w):
            expg[yy, xx] = 2 * ((m + 13 * ((yy // 8) * nbw + xx // 8)) % 64) + 64
    dec = jpeg_decode(jpeg_encode_gray(blocks, w, h))
    assert np.array_equal(dec[:, :, 0], expg.astype(np.uint8))
    decp = jpeg_decode(jpeg_encode_progressive(blocks, w, h, al=1))
    assert np.array_equal(decp[:, :, 0], expg.astype(np.uint8))
    mcus = [(blocks[k], blocks[k], blocks[k]) for k in range(nbw * nbh)]
    dc = jpeg_decode(jpeg_encode_ycbcr(mcus, w, h))
    assert dc.shape == (h, w, 3)


@pytest.mark.parametrize("m", [1, 4, 9, 16])
def test_partial_mcu_noninterleaved_restricted_raster(m):
    """Non-interleaved sequential scans code only the ceil(size/8) REAL
    block raster (A.2.2) — NOT the MCU-padded grid — and still decode
    to the interleaved closed form."""
    w, h = 17 + m % 15, 13 + m % 11
    mcw = _ceil(w, 16)
    yb = []
    for byy in range(_ceil(h, 8)):
        for bxx in range(_ceil(w, 8)):
            k = (byy // 2) * mcw + bxx // 2
            s = (byy % 2) * 2 + (bxx % 2)
            blk = [0] * 64
            blk[0] = ((m + 13 * (4 * k + s)) % 64) - 32
            yb.append(blk)
    cbs, crs = [], []
    cbw_c, cbh_c = _ceil(_ceil(w, 2), 8), _ceil(_ceil(h, 2), 8)
    for coefs, a, b in ((cbs, 2, 7), (crs, 3, 5)):
        for byy in range(cbh_c):
            for bxx in range(cbw_c):
                k = byy * mcw + bxx
                blk = [0] * 64
                blk[0] = ((a * m + b * k) % 64) - 32
                coefs.append(blk)
    dec = jpeg_decode(
        jpeg_encode_noninterleaved(
            [yb, cbs, crs], w, h, samplings=[(2, 2), (1, 1), (1, 1)]
        )
    )
    assert np.array_equal(dec, _expected_420(m, w, h))


@pytest.mark.parametrize("m", [0, 2, 7, 31])
def test_progressive_restart_equals_unrestarted(m):
    w, h = 8 * (1 + m % 6), 8 * (1 + m % 4)
    mcus = []
    for k in range((w // 8) * (h // 8)):
        y = [0] * 64
        y[0] = ((m + 13 * k) % 64) - 32
        cb = [0] * 64
        cb[0] = ((2 * m + 7 * k) % 64) - 32
        cr = [0] * 64
        cr[0] = ((3 * m + 5 * k) % 64) - 32
        mcus.append((y, cb, cr))
    base = jpeg_decode(jpeg_encode_progressive(mcus, w, h, al=1))
    for ri in (1, 2, 5):
        pay = jpeg_encode_progressive(mcus, w, h, al=1, restart_interval=ri)
        assert b"\xff\xdd" in pay
        assert np.array_equal(jpeg_decode(pay), base), ri


def test_progressive_restart_with_partial_mcu_and_sampling():
    m, w, h = 9, 23, 19
    yb, cbs, crs = _coeffs_420_planes(m, w, h)
    plain = jpeg_decode(
        jpeg_encode_progressive(
            [yb, cbs, crs], w, h, al=1, samplings=[(2, 2), (1, 1), (1, 1)]
        )
    )
    wrst = jpeg_decode(
        jpeg_encode_progressive(
            [yb, cbs, crs],
            w,
            h,
            al=1,
            samplings=[(2, 2), (1, 1), (1, 1)],
            restart_interval=2,
        )
    )
    assert np.array_equal(plain, wrst)
    assert np.array_equal(plain, _expected_420(m, w, h))


# ---------------------------- WebP / VP8L ----------------------------


@pytest.mark.parametrize("m", [0, 1, 2, 5, 10, 21, 99, 12345])
def test_vp8l_roundtrip_pixel_exact(m):
    w, h = 5 + m % 12, 4 + m % 9
    px = _webp_pixels(m, w, h)
    payload = vp8l_encode(
        px, subtract_green=bool(m % 2), backref_period=_WEBP_PERIOD
    )
    assert np.array_equal(vp8l_decode(payload), px)
    assert webp_metadata(payload) == ("lossless", w, h, True, False, 1)


def test_vp8l_edge_shapes_and_constant_color():
    px1 = _webp_pixels(5, 1, 1)
    assert np.array_equal(vp8l_decode(vp8l_encode(px1)), px1)
    pxc = np.full((4, 6, 4), 77, dtype=np.uint8)
    assert np.array_equal(vp8l_decode(vp8l_encode(pxc, backref_period=1)), pxc)
    rng = np.random.RandomState(7)
    pxr = rng.randint(0, 256, (40, 60, 4)).astype(np.uint8)
    assert np.array_equal(vp8l_decode(vp8l_encode(pxr)), pxr)
    assert np.array_equal(
        vp8l_decode(vp8l_encode(pxr, subtract_green=True)), pxr
    )


@pytest.mark.parametrize("m", list(range(12)))
def test_webp_variant_metadata(m):
    lossy = webp_encode_lossy_stub(16 + m % 13, 16 + m % 7, seed=m)
    assert webp_metadata(lossy) == (
        "lossy", 16 + m % 13, 16 + m % 7, False, False, 1,
    )
    w, h = 5 + m % 12, 4 + m % 9
    ll = vp8l_encode(_webp_pixels(m, w, h), backref_period=_WEBP_PERIOD)
    ext = webp_encode_extended(ll, has_alpha=bool(m % 2), has_anim=(m % 6 == 2))
    assert webp_metadata(ext) == (
        "extended", w, h, bool(m % 2), m % 6 == 2,
        3 if m % 6 == 2 else 2,
    )


def test_webp_named_pins():
    # round 13 completed every VP8L feature (all four transforms, both
    # distance-code forms, meta prefix codes, color cache) — the one
    # remaining pin is lossy VP8 pixel decode
    lossy = webp_encode_lossy_stub(32, 24)
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        vp8l_decode(lossy)
    # a meta-prefix bit with nothing after it is now a TRUNCATED stream
    # (meta prefix codes are in scope since round 13), not a pin
    from polars_trading_spark.functions.webp import (
        _BitWriterLSB,
        _riff_container,
    )

    w = _BitWriterLSB()
    w.write(3, 14)
    w.write(3, 14)
    w.write(0, 1)
    w.write(0, 3)
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(1, 1)  # meta prefix codes present
    payload = _riff_container([(b"VP8L", b"\x2f" + w.flush())])
    with pytest.raises(ValueError, match="truncated"):
        vp8l_decode(payload)
    with pytest.raises(ValueError, match="not a WebP"):
        webp_metadata(b"RIFF\x00\x00\x00\x00WAVE")


@pytest.mark.parametrize("m", [0, 3, 6, 9, 21, 99])
def test_vp8l_color_cache_roundtrip(m):
    """Round 12: color-cache streams (hit symbols beyond the
    literal/length alphabet, rolling 0x1E35A7BD hash, copied pixels
    update the cache too) decode to the same pixels as every other
    coding of the same image."""
    w, h = 5 + m % 12, 4 + m % 9
    px = _webp_pixels(m, w, h)
    for cb in (4, 6):
        pay = vp8l_encode(px, subtract_green=bool(m % 2), cache_bits=cb)
        assert np.array_equal(vp8l_decode(pay), px), cb
    # cache + LZ77 together
    pay = vp8l_encode(px, backref_period=_WEBP_PERIOD, cache_bits=5)
    assert np.array_equal(vp8l_decode(pay), px)
    # hits actually occur: the cached stream is strictly smaller
    assert len(vp8l_encode(px, cache_bits=6)) < len(vp8l_encode(px))
    with pytest.raises(ValueError, match="cache_bits"):
        vp8l_encode(px, cache_bits=12)


@pytest.mark.parametrize(
    "groups",
    [[(0,), (1, 2)], [(0, 1), (2,)], [(1, 2), (0,)], [(0,), (1,), (2,)]],
)
def test_partially_interleaved_scan_groups_equal_full_interleave(groups):
    """Round 12 closes the last sequential scan-layout pin: ANY split of
    the frame's components across scans — including partially-
    interleaved subsets walking the frame's MCU grid per A.2.3 —
    decodes byte-identically to the one-scan interleaved stream, at
    partial-MCU dims."""
    from polars_trading_spark.functions.multimodal import (
        jpeg_encode_scan_groups,
    )

    m, w, h = 7, 23, 19
    yb, cbs, crs = _coeffs_420_planes(m, w, h)
    samp = [(2, 2), (1, 1), (1, 1)]
    base = jpeg_decode(
        jpeg_encode_scan_groups([yb, cbs, crs], w, h, samp, [(0, 1, 2)])
    )
    assert np.array_equal(base, _expected_420(m, w, h))
    got = jpeg_decode(
        jpeg_encode_scan_groups([yb, cbs, crs], w, h, samp, groups)
    )
    assert np.array_equal(got, base)


def test_scan_groups_random_spectra_and_validation():
    import random

    from polars_trading_spark.functions.multimodal import (
        jpeg_encode_scan_groups,
    )

    rnd = random.Random(7)

    def rand_blocks(n):
        out = []
        for _ in range(n):
            blk = [0] * 64
            blk[0] = rnd.randint(-80, 80)
            for pos in rnd.sample(range(1, 64), 4):
                blk[pos] = rnd.randint(-30, 30)
            out.append(blk)
        return out

    w, h = 32, 32
    yb = rand_blocks(16)
    cbs = rand_blocks(4)
    crs = rand_blocks(4)
    samp = [(2, 2), (1, 1), (1, 1)]
    base = jpeg_decode(
        jpeg_encode_scan_groups([yb, cbs, crs], w, h, samp, [(0, 1, 2)])
    )
    for groups in ([(0,), (1, 2)], [(0, 2), (1,)]):
        got = jpeg_decode(
            jpeg_encode_scan_groups([yb, cbs, crs], w, h, samp, groups)
        )
        assert np.array_equal(got, base), groups
    with pytest.raises(ValueError, match="cover every component"):
        jpeg_encode_scan_groups([yb, cbs, crs], w, h, samp, [(0, 1)])
    with pytest.raises(ValueError, match="padded-grid blocks"):
        jpeg_encode_scan_groups([yb[:3], cbs, crs], w, h, samp, [(0, 1, 2)])


# ------------------------- 12-bit precision -------------------------


@pytest.mark.parametrize("m", [0, 2, 5, 9, 14])
def test_12bit_extended_sequential_and_progressive_gray(m):
    """Round 12: 12-bit samples decode via extended sequential SOF1 and
    progressive SOF2 — level shift 2048, clamp 0..4095, uint16 planes —
    at partial-MCU dims too."""
    w, h = 9 + m % 13, 11 + m % 7
    nbw, nbh = _ceil(w, 8), _ceil(h, 8)
    blocks = []
    for k in range(nbw * nbh):
        blk = [0] * 64
        blk[0] = ((m * 37 + 91 * k) % 2048) - 1024
        blocks.append(blk)
    exp = np.empty((h, w), dtype=np.int64)
    for yy in range(h):
        for xx in range(w):
            k = (yy // 8) * nbw + (xx // 8)
            exp[yy, xx] = 2 * (((m * 37 + 91 * k) % 2048) - 1024) + 2048
    dec = jpeg_decode(jpeg_encode_gray(blocks, w, h, precision=12))
    assert dec.dtype == np.uint16
    assert np.array_equal(dec[:, :, 0].astype(np.int64), exp)
    decp = jpeg_decode(
        jpeg_encode_progressive(blocks, w, h, al=1, precision=12)
    )
    assert decp.dtype == np.uint16
    assert np.array_equal(decp[:, :, 0].astype(np.int64), exp)


def test_12bit_color_bt601_at_scaled_center():
    import math

    def rgb12(yv, cb, cr):
        r = min(4095, max(0, math.floor(yv + 1.402 * (cr - 2048) + 0.5)))
        g = min(4095, max(0, math.floor(
            yv - 0.344136 * (cb - 2048) - 0.714136 * (cr - 2048) + 0.5)))
        b = min(4095, max(0, math.floor(yv + 1.772 * (cb - 2048) + 0.5)))
        return r, g, b

    m, w, h = 5, 16, 16
    nb = (w // 8) * (h // 8)
    mcus = []
    for k in range(nb):
        blks = []
        for a, b in ((37, 91), (53, 71), (29, 61)):
            blk = [0] * 64
            blk[0] = ((a * m + b * k) % 2048) - 1024
            blks.append(blk)
        mcus.append(tuple(blks))
    dec = jpeg_decode(jpeg_encode_ycbcr(mcus, w, h, precision=12))
    assert dec.dtype == np.uint16
    for yy in range(h):
        for xx in range(w):
            k = (yy // 8) * (w // 8) + xx // 8
            yv = 2 * (((37 * m + 91 * k) % 2048) - 1024) + 2048
            cb = 2 * (((53 * m + 71 * k) % 2048) - 1024) + 2048
            cr = 2 * (((29 * m + 61 * k) % 2048) - 1024) + 2048
            assert tuple(int(v) for v in dec[yy, xx]) == rgb12(yv, cb, cr)


def test_12bit_validation():
    with pytest.raises(ValueError, match="precision"):
        jpeg_encode_gray([[0] * 64], 8, 8, precision=10)
    # 12-bit inside a baseline SOF0 frame is illegal (T.81), not a pin
    bad = bytearray(jpeg_encode_gray([[0] * 64], 8, 8))
    i = bad.index(b"\xff\xc0")
    bad[i + 4] = 12
    with pytest.raises(ValueError, match="illegal in baseline"):
        jpeg_decode(bytes(bad))
    # precision values T.81 does not define for DCT stay pinned
    bad[i + 4] = 16
    with pytest.raises(NotImplementedError, match="precision 16"):
        jpeg_decode(bytes(bad))
