"""Round-11 codec units: YCCK / subsampled 4-component JPEG decode and
ANIMATED GIF compositing — pure-Python (no Spark session), mirroring
the reference's kernel-level test strategy (SURVEY.md §5).  The
Spark-side plumbing is gated end-to-end by the registry oracles
(``multimodal_jpeg_ycck_decode`` / ``multimodal_gif_animated_decode``).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from polars_trading_spark.functions.multimodal import (
    GIF_PALETTE_SIZE,
    gif_decode_animated,
    gif_encode_animated,
    gif_palette,
    jpeg_decode,
    jpeg_encode_ycck,
)

PAL = np.array([gif_palette(k) for k in range(GIF_PALETTE_SIZE)], dtype=np.uint8)


def _ycck_mcus(m: int, w: int, h: int):
    mcus = []
    for k in range((w // 16) * (h // 8)):
        blks = []
        for s in range(2):
            blk = [0] * 64
            blk[0] = ((m + 13 * (2 * k + s)) % 64) - 32
            blks.append(blk)
        cb = [0] * 64
        cb[0] = ((2 * m + 7 * k) % 64) - 32
        cr = [0] * 64
        cr[0] = ((3 * m + 5 * k) % 64) - 32
        blks += [cb, cr]
        for s in range(2):
            blk = [0] * 64
            blk[0] = ((4 * m + 11 * (2 * k + s)) % 64) - 32
            blks.append(blk)
        mcus.append(tuple(blks))
    return mcus


def _ycck_expected(m: int, w: int, h: int) -> np.ndarray:
    out = np.zeros((h, w, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            k = (y // 8) * (w // 16) + x // 16
            s = (x % 16) // 8
            yv = 2 * ((m + 13 * (2 * k + s)) % 64) + 64
            cb = 2 * ((2 * m + 7 * k) % 64) + 64
            cr = 2 * ((3 * m + 5 * k) % 64) + 64
            kv = 2 * ((4 * m + 11 * (2 * k + s)) % 64) + 64
            r = min(255, max(0, math.floor(yv + 1.402 * (cr - 128) + 0.5)))
            g = min(
                255,
                max(
                    0,
                    math.floor(
                        yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5
                    ),
                ),
            )
            b = min(255, max(0, math.floor(yv + 1.772 * (cb - 128) + 0.5)))
            out[y, x] = (255 - r, 255 - g, 255 - b, kv)
    return out


@pytest.mark.parametrize("m", [0, 1, 2, 5, 7, 11, 100, 12345])
def test_ycck_roundtrip_pixel_exact(m):
    w, h = 16 * (1 + m % 3), 8 * (1 + m % 2)
    payload = jpeg_encode_ycck(_ycck_mcus(m, w, h), w, h)
    dec = jpeg_decode(payload)
    assert dec.shape == (h, w, 4)
    assert np.array_equal(dec, _ycck_expected(m, w, h))


def test_ycck_rejects_bad_geometry():
    # partial-MCU dims are LEGAL since round 12 (the grid is the
    # ceiling); the geometry contract is now the padded-MCU block count
    with pytest.raises(ValueError, match="MCU"):
        jpeg_encode_ycck([], 8, 8)  # 8x8 still needs one 16x8 MCU
    with pytest.raises(ValueError, match="MCU"):
        jpeg_encode_ycck([], 16, 8)


def test_non_integer_ratio_progressive_in_scope():
    # subsampled progressive is IN scope since round 11 and
    # NON-INTEGER ratios (3:2 mixes) since round 13 — a header-only
    # stream is now malformed (no quant tables), not unsupported
    import struct

    payload = bytearray(b"\xff\xd8")
    payload += b"\xff\xc2" + struct.pack(">HBHHB", 20, 8, 48, 48, 4)
    payload += bytes([1, 0x31, 0])
    payload += bytes([2, 0x21, 0])
    for cid in (3, 4):
        payload += bytes([cid, 0x11, 0])
    payload += b"\xff\xd9"
    with pytest.raises(ValueError, match="undeclared quant table"):
        jpeg_decode(bytes(payload))


def _rgb_from(yv, cb, cr):
    r = min(255, max(0, math.floor(yv + 1.402 * (cr - 128) + 0.5)))
    g = min(255, max(0, math.floor(
        yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
    b = min(255, max(0, math.floor(yv + 1.772 * (cb - 128) + 0.5)))
    return r, g, b


@pytest.mark.parametrize("m", [0, 1, 2, 5, 7, 11, 100])
def test_progressive_420_roundtrip_pixel_exact(m):
    from polars_trading_spark.functions.multimodal import jpeg_encode_progressive

    w, h = 16 * (1 + m % 3), 16 * (1 + m % 2)
    mcw, mch = w // 16, h // 16
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
    dec = jpeg_decode(
        jpeg_encode_progressive(
            [yb, cbs, crs], w, h, samplings=[(2, 2), (1, 1), (1, 1)]
        )
    )
    assert dec.shape == (h, w, 3)
    for y in range(h):
        for x in range(w):
            k = (y // 16) * mcw + x // 16
            s = ((y % 16) // 8) * 2 + (x % 16) // 8
            yv = 2 * ((m + 13 * (4 * k + s)) % 64) + 64
            cb = 2 * ((2 * m + 7 * k) % 64) + 64
            cr = 2 * ((3 * m + 5 * k) % 64) + 64
            assert tuple(dec[y, x]) == _rgb_from(yv, cb, cr), (m, x, y)


def test_progressive_subsampled_ycck_roundtrip():
    from polars_trading_spark.functions.multimodal import jpeg_encode_progressive

    m, w, h = 11, 32, 8
    mcw, mch = w // 16, h // 8
    yb, kb = [], []
    for byy in range(mch):
        for bxx in range(2 * mcw):
            k = byy * mcw + bxx // 2
            s = bxx % 2
            b1 = [0] * 64
            b1[0] = ((m + 13 * (2 * k + s)) % 64) - 32
            yb.append(b1)
            b2 = [0] * 64
            b2[0] = ((4 * m + 11 * (2 * k + s)) % 64) - 32
            kb.append(b2)
    cbs, crs = [], []
    for k in range(mcw * mch):
        b1 = [0] * 64
        b1[0] = ((2 * m + 7 * k) % 64) - 32
        cbs.append(b1)
        b2 = [0] * 64
        b2[0] = ((3 * m + 5 * k) % 64) - 32
        crs.append(b2)
    dec = jpeg_decode(
        jpeg_encode_progressive(
            [yb, cbs, crs, kb],
            w,
            h,
            samplings=[(2, 1), (1, 1), (1, 1), (2, 1)],
            adobe_transform=2,
        )
    )
    assert dec.shape == (h, w, 4)
    for y in range(h):
        for x in range(w):
            k = (y // 8) * mcw + x // 16
            s = (x % 16) // 8
            yv = 2 * ((m + 13 * (2 * k + s)) % 64) + 64
            cb = 2 * ((2 * m + 7 * k) % 64) + 64
            cr = 2 * ((3 * m + 5 * k) % 64) + 64
            kv = 2 * ((4 * m + 11 * (2 * k + s)) % 64) + 64
            r, g, b = _rgb_from(yv, cb, cr)
            assert tuple(dec[y, x]) == (255 - r, 255 - g, 255 - b, kv)


def test_progressive_sampled_encoder_validation():
    from polars_trading_spark.functions.multimodal import jpeg_encode_progressive

    # 8x8 at 2x2 luma sampling is a partial-MCU frame since round 12:
    # it needs one padded 16x16 MCU (4 Y + 1 Cb + 1 Cr blocks)
    with pytest.raises(ValueError, match="needs"):
        jpeg_encode_progressive([[], [], []], 8, 8,
                                samplings=[(2, 2), (1, 1), (1, 1)])
    with pytest.raises(ValueError, match="needs"):
        jpeg_encode_progressive([[[0] * 64], [], []], 16, 16,
                                samplings=[(2, 2), (1, 1), (1, 1)])
    with pytest.raises(ValueError, match="samplings length"):
        jpeg_encode_progressive([[], []], 16, 16, samplings=[(1, 1)])


def _synth_frames(m: int):
    w, h = 4 + m % 13, 3 + m % 11
    nf = 2 + m % 3
    fw, fh = (w + 1) // 2, (h + 1) // 2
    frames = [
        {
            "ox": 0,
            "oy": 0,
            "fw": w,
            "fh": h,
            "indices": [(m * 31 + j * 7) % 16 for j in range(w * h)],
            "delay_cs": m % 7 + 1,
            "disposal": 1,
        }
    ]
    for f in range(1, nf):
        frames.append(
            {
                "ox": (m + 5 * f) % (w - fw + 1),
                "oy": (3 * m + 7 * f) % (h - fh + 1),
                "fw": fw,
                "fh": fh,
                "indices": [(m * 31 + f * 11 + j * 7) % 16 for j in range(fw * fh)],
                "delay_cs": (m + f) % 7 + 1,
                "disposal": 1,
            }
        )
    return frames, w, h


@pytest.mark.parametrize("m", [0, 1, 2, 5, 7, 11, 100, 12345])
def test_animated_gif_disposal1_composites_latest_overlay(m):
    frames, w, h = _synth_frames(m)
    dec, delays = gif_decode_animated(gif_encode_animated(frames, w, h))
    assert delays == [fr["delay_cs"] for fr in frames]
    screen = np.zeros((h, w), dtype=np.int64)
    for f, fr in enumerate(frames):
        idx = np.array(fr["indices"]).reshape(fr["fh"], fr["fw"])
        screen[fr["oy"] : fr["oy"] + fr["fh"], fr["ox"] : fr["ox"] + fr["fw"]] = idx
        assert np.array_equal(dec[f], PAL[screen]), f"frame {f} of media {m}"


def test_animated_gif_disposal_2_3_and_transparency():
    frames = [
        # disposal 3: after display, restore the pre-frame screen (bg)
        {"ox": 0, "oy": 0, "fw": 4, "fh": 4, "indices": [1] * 16,
         "delay_cs": 5, "disposal": 3},
        # disposal 2: after display, fill the rect with the background
        {"ox": 1, "oy": 1, "fw": 2, "fh": 2, "indices": [2] * 4,
         "delay_cs": 6, "disposal": 2},
        # transparent index 0: leaves the underlying screen visible
        {"ox": 0, "oy": 0, "fw": 4, "fh": 4, "indices": [3, 0] * 8,
         "delay_cs": 7, "disposal": 1, "transparent": 0},
    ]
    dec, delays = gif_decode_animated(gif_encode_animated(frames, 4, 4, bg_index=7))
    assert delays == [5, 6, 7]
    assert (dec[0] == PAL[1]).all()
    # frame 0's disposal=3 restored the background before frame 1 drew
    exp1 = np.broadcast_to(PAL[7], (4, 4, 3)).copy()
    exp1[1:3, 1:3] = PAL[2]
    assert np.array_equal(dec[1], exp1)
    # frame 1's disposal=2 re-filled its rect with background, then
    # frame 2's transparent-0 stripes show background through the holes
    exp2 = np.empty((4, 4, 3), dtype=np.uint8)
    for y in range(4):
        for x in range(4):
            exp2[y, x] = PAL[3] if (y * 4 + x) % 2 == 0 else PAL[7]
    assert np.array_equal(dec[2], exp2)


def test_animated_gif_trailer_and_netscape_skipped():
    frames, w, h = _synth_frames(3)
    payload = gif_encode_animated(frames, w, h)
    assert b"NETSCAPE2.0" in payload and payload.endswith(b"\x3b")
    dec, _ = gif_decode_animated(payload)
    assert dec.shape[0] == len(frames)


def test_animated_gif_rejects_out_of_screen_frame():
    with pytest.raises(ValueError, match="exceeds"):
        gif_encode_animated(
            [{"ox": 3, "oy": 0, "fw": 2, "fh": 1, "indices": [1, 2],
              "delay_cs": 1}],
            4,
            4,
        )


def _prog4_mcus(m: int, w: int, h: int):
    mcus = []
    for k in range((w // 8) * (h // 8)):
        blks = []
        for a, b in ((1, 13), (2, 7), (3, 5), (4, 11)):
            blk = [0] * 64
            blk[0] = ((a * m + b * k) % 64) - 32
            blks.append(blk)
        mcus.append(tuple(blks))
    return mcus


@pytest.mark.parametrize("m", [0, 1, 5, 7, 100, 12345])
def test_progressive_ycck_roundtrip_pixel_exact(m):
    from polars_trading_spark.functions.multimodal import jpeg_encode_progressive

    w, h = 8 * (1 + m % 6), 8 * (1 + m % 4)
    dec = jpeg_decode(jpeg_encode_progressive(_prog4_mcus(m, w, h), w, h,
                                              adobe_transform=2))
    assert dec.shape == (h, w, 4)
    exp = np.zeros((h, w, 4), dtype=np.uint8)
    for yy in range(h):
        for x in range(w):
            k = (yy // 8) * (w // 8) + x // 8
            yv = 2 * ((m + 13 * k) % 64) + 64
            cb = 2 * ((2 * m + 7 * k) % 64) + 64
            cr = 2 * ((3 * m + 5 * k) % 64) + 64
            kv = 2 * ((4 * m + 11 * k) % 64) + 64
            r = min(255, max(0, math.floor(yv + 1.402 * (cr - 128) + 0.5)))
            g = min(255, max(0, math.floor(
                yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
            b = min(255, max(0, math.floor(yv + 1.772 * (cb - 128) + 0.5)))
            exp[yy, x] = (255 - r, 255 - g, 255 - b, kv)
    assert np.array_equal(dec, exp)


def test_progressive_cmyk_as_stored():
    from polars_trading_spark.functions.multimodal import jpeg_encode_progressive

    m, w, h = 9, 16, 8
    dec = jpeg_decode(jpeg_encode_progressive(_prog4_mcus(m, w, h), w, h,
                                              adobe_transform=0))
    for yy in range(h):
        for x in range(w):
            k = (yy // 8) * (w // 8) + x // 8
            for c, (a, b) in enumerate(((1, 13), (2, 7), (3, 5), (4, 11))):
                assert dec[yy, x, c] == 2 * ((a * m + b * k) % 64) + 64


def test_restart_interval_roundtrip_and_validation():
    """DRI + RSTn streams must decode byte-identically to the
    unrestarted stream of the same spectra; sequence violations and
    progressive DRI raise."""
    import random
    import struct

    from polars_trading_spark.functions.multimodal import jpeg_encode_ycbcr

    rnd = random.Random(42)
    w, h = 32, 24
    mcus = []
    for _ in range((w // 8) * (h // 8)):
        blks = []
        for _c in range(3):
            blk = [0] * 64
            blk[0] = rnd.randint(-100, 100)
            for pos in rnd.sample(range(1, 64), 5):
                blk[pos] = rnd.randint(-40, 40)
            blks.append(blk)
        mcus.append(tuple(blks))
    base = jpeg_decode(jpeg_encode_ycbcr(mcus, w, h))
    for ri in (1, 2, 3, 5, 7, 11):
        pay = jpeg_encode_ycbcr(mcus, w, h, restart_interval=ri)
        assert b"\xff\xdd" in pay
        assert np.array_equal(jpeg_decode(pay), base), ri
    # corrupt the FIRST restart marker's index: sequence check fires
    pay = bytearray(jpeg_encode_ycbcr(mcus, w, h, restart_interval=2))
    sos_at = pay.index(b"\xff\xda")
    for j in range(sos_at, len(pay) - 1):
        if pay[j] == 0xFF and 0xD0 <= pay[j + 1] <= 0xD7:
            pay[j + 1] = 0xD0 + ((pay[j + 1] - 0xD0 + 3) % 8)
            break
    with pytest.raises(ValueError, match="out of sequence"):
        jpeg_decode(bytes(pay))
    # progressive DRI is IN scope since round 12: the same spectra
    # with restart markers inside every scan decode byte-identically
    from polars_trading_spark.functions.multimodal import (
        jpeg_encode_progressive,
    )

    prog_base = jpeg_decode(jpeg_encode_progressive(mcus, w, h, al=1))
    for ri in (1, 2, 5):
        pay2 = jpeg_encode_progressive(mcus, w, h, al=1, restart_interval=ri)
        assert b"\xff\xdd" in pay2
        assert np.array_equal(jpeg_decode(pay2), prog_base), ri
    # progressive restart sequence violations fire too
    pay2 = bytearray(jpeg_encode_progressive(mcus, w, h, al=1, restart_interval=2))
    sos_at2 = pay2.index(b"\xff\xda")
    for j in range(sos_at2, len(pay2) - 1):
        if pay2[j] == 0xFF and 0xD0 <= pay2[j + 1] <= 0xD7:
            pay2[j + 1] = 0xD0 + ((pay2[j + 1] - 0xD0 + 3) % 8)
            break
    with pytest.raises(ValueError, match="out of sequence"):
        jpeg_decode(bytes(pay2))


def test_16bit_quant_tables():
    """DQT precision 1 (16-bit big-endian entries, round 11): a
    re-encoded DQT with the same values must decode byte-identically,
    and values above 255 — unrepresentable in an 8-bit table — must
    scale the dequantization exactly."""
    import struct

    from polars_trading_spark.functions import multimodal as mm

    w, h = 16, 8
    blocks = []
    for k in range(2):
        blk = [0] * 64
        blk[0] = 5 + k
        blk[1] = -3
        blocks.append(blk)
    pay = mm.jpeg_encode_gray(blocks, w, h)
    base = mm.jpeg_decode(pay)
    # rewrite the 8-bit DQT (Pq=0, 64 entries of 16) as Pq=1 16-bit
    dqt_at = pay.index(b"\xff\xdb")
    old_seg = pay[dqt_at : dqt_at + 4 + 65]
    q8 = list(old_seg[5:69])
    new_seg = b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 128, 0x10) + b"".join(
        struct.pack(">H", v) for v in q8
    )
    pay16 = pay[:dqt_at] + new_seg + pay[dqt_at + len(old_seg) :]
    assert np.array_equal(mm.jpeg_decode(pay16), base)
    # a quant value only a 16-bit table can hold (300)
    q300 = [300] * 64
    seg300 = b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 128, 0x10) + b"".join(
        struct.pack(">H", v) for v in q300
    )
    pay300 = pay[:dqt_at] + seg300 + pay[dqt_at + len(old_seg) :]
    dec300 = mm.jpeg_decode(pay300)
    exp = mm._jpeg_coeffs_to_plane(blocks, q300, w // 8, h // 8)
    assert np.array_equal(dec300[:, :, 0], exp)
    # invalid precision field -> malformed
    bad = pay[:dqt_at] + b"\xff\xdb" + struct.pack(">HB", 67, 0x20) + bytes(
        q8
    ) + pay[dqt_at + len(old_seg) :]
    with pytest.raises(ValueError, match="DQT precision"):
        mm.jpeg_decode(bad)


def _rand_blk(rnd):
    blk = [0] * 64
    blk[0] = rnd.randint(-100, 100)
    for pos in rnd.sample(range(1, 64), 4):
        blk[pos] = rnd.randint(-40, 40)
    return blk


def test_noninterleaved_equals_interleaved():
    """One-SOS-per-component sequential streams must decode
    byte-identically to the interleaved stream of the same spectra —
    4:4:4, subsampled 4:2:0 and subsampled YCCK."""
    import random

    from polars_trading_spark.functions.multimodal import (
        jpeg_encode_noninterleaved,
        jpeg_encode_ycbcr,
        jpeg_encode_ycbcr_420,
        jpeg_encode_ycck,
    )

    rnd = random.Random(7)
    w, h = 24, 16
    nb = (w // 8) * (h // 8)
    comp = [[_rand_blk(rnd) for _ in range(nb)] for _ in range(3)]
    ni = jpeg_decode(jpeg_encode_noninterleaved(comp, w, h))
    il = jpeg_decode(
        jpeg_encode_ycbcr(
            [(comp[0][b], comp[1][b], comp[2][b]) for b in range(nb)], w, h
        )
    )
    assert np.array_equal(ni, il)

    w, h = 32, 16
    mcw, mch = w // 16, h // 16
    yb = [_rand_blk(rnd) for _ in range(4 * mcw * mch)]
    cbs = [_rand_blk(rnd) for _ in range(mcw * mch)]
    crs = [_rand_blk(rnd) for _ in range(mcw * mch)]
    ni = jpeg_decode(
        jpeg_encode_noninterleaved(
            [yb, cbs, crs], w, h, samplings=[(2, 2), (1, 1), (1, 1)]
        )
    )
    mcus = []
    ybw = 2 * mcw
    for my in range(mch):
        for mx in range(mcw):
            ys = tuple(
                yb[(my * 2 + by) * ybw + (mx * 2 + bx)]
                for by in range(2)
                for bx in range(2)
            )
            k = my * mcw + mx
            mcus.append((ys, cbs[k], crs[k]))
    assert np.array_equal(ni, jpeg_decode(jpeg_encode_ycbcr_420(mcus, w, h)))

    w, h = 32, 8
    mcw, mch = w // 16, h // 8
    yb = [_rand_blk(rnd) for _ in range(2 * mcw * mch)]
    kb = [_rand_blk(rnd) for _ in range(2 * mcw * mch)]
    cbs = [_rand_blk(rnd) for _ in range(mcw * mch)]
    crs = [_rand_blk(rnd) for _ in range(mcw * mch)]
    ni = jpeg_decode(
        jpeg_encode_noninterleaved(
            [yb, cbs, crs, kb],
            w,
            h,
            samplings=[(2, 1), (1, 1), (1, 1), (2, 1)],
            adobe_transform=2,
        )
    )
    mcus = []
    for my in range(mch):
        for mx in range(mcw):
            k = my * mcw + mx
            mcus.append(
                (
                    yb[my * 2 * mcw + mx * 2],
                    yb[my * 2 * mcw + mx * 2 + 1],
                    cbs[k],
                    crs[k],
                    kb[my * 2 * mcw + mx * 2],
                    kb[my * 2 * mcw + mx * 2 + 1],
                )
            )
    assert np.array_equal(ni, jpeg_decode(jpeg_encode_ycck(mcus, w, h)))


def test_partially_interleaved_subset_is_in_scope_header_check():
    # round 12: a sequential scan interleaving 2 of 3 components is IN
    # scope — a header-only stream referencing undeclared Huffman
    # tables is now malformed (ValueError), not unsupported
    import struct

    dqt = b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([16] * 64)
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 8, 8, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos2 = b"\xff\xda" + struct.pack(">HB", 10, 2) + bytes(
        [1, 0x00, 2, 0x00, 0, 63, 0]
    )
    with pytest.raises(ValueError, match="undeclared table"):
        jpeg_decode(b"\xff\xd8" + dqt + sof + sos2 + b"\xff\xd9")


def test_noninterleaved_incomplete_stream_is_malformed():
    # only 1 of 3 component scans present -> "no scan" ValueError
    import random

    from polars_trading_spark.functions.multimodal import (
        jpeg_encode_noninterleaved,
    )

    rnd = random.Random(3)
    comp = [[_rand_blk(rnd) for _ in range(4)] for _ in range(3)]
    pay = jpeg_encode_noninterleaved(comp, 16, 16)
    # truncate after the FIRST scan: find the second SOS and cut there
    first_sos = pay.index(b"\xff\xda")
    second_sos = pay.index(b"\xff\xda", first_sos + 2)
    with pytest.raises(ValueError, match="no scan"):
        jpeg_decode(pay[:second_sos] + b"\xff\xd9")
