"""Property-based differential tests for the round-11 codec surface
(hypothesis; no Spark session) — the same strategy as the bar_groups
property suite: generate random inputs, compare INDEPENDENT paths.

1. Progressive JPEG: the six-scan successive-approximation entropy
   stream must reconstruct the EXACT coefficient arrays, so decoding a
   random-spectra progressive stream must equal a direct
   dequantize+IDCT of those spectra (a reference computed WITHOUT the
   entropy/scan machinery) — for 1/3/4 components and subsampled
   layouts.  For the layouts with a sequential encoder, the sequential
   stream of the same spectra must decode byte-identically too.
2. Animated GIF: disposal-method compositing must equal a plain numpy
   simulator over random frame rectangles, disposals and transparency.
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings
from hypothesis import strategies as st

from polars_trading_spark.functions import multimodal as mm

_Q = [16] * 64


def _rand_block(rnd, density: float):
    blk = [0] * 64
    blk[0] = rnd.randint(-120, 120)
    for k in range(1, 64):
        if rnd.random() < density:
            blk[k] = rnd.randint(-60, 60)
    return blk


def _expected_from_coeffs(comp_blocks, samplings, w, h, adobe_transform):
    """Reference reconstruction straight from coefficient arrays —
    dequantize + IDCT + replication + color transform, with NO entropy
    decode or scan ordering involved."""
    hmx = max(hs for hs, _ in samplings)
    vmx = max(vs for _, vs in samplings)
    mcw, mch = w // (8 * hmx), h // (8 * vmx)
    planes = []
    for ci, (hs, vs) in enumerate(samplings):
        bw, bh = mcw * hs, mch * vs
        p = mm._jpeg_coeffs_to_plane(comp_blocks[ci], _Q, bw, bh)
        if p.shape != (h, w):
            p = p.repeat(h // p.shape[0], axis=0).repeat(w // p.shape[1], axis=1)
        planes.append(p)
    nc = len(planes)
    if nc == 1:
        return planes[0][:, :, None]
    y, cb, cr = (planes[i].astype(np.float64) for i in range(3))
    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5)
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    if nc == 3:
        return rgb.astype(np.uint8)
    if adobe_transform == 2:
        return np.concatenate(
            [255.0 - rgb, planes[3][:, :, None].astype(np.float64)], axis=-1
        ).astype(np.uint8)
    return np.stack(planes, axis=-1)


_LAYOUTS = [
    # (nc, samplings, adobe_transform)
    (1, [(1, 1)], None),
    (3, [(1, 1)] * 3, None),
    (3, [(2, 1), (1, 1), (1, 1)], None),
    (3, [(2, 2), (1, 1), (1, 1)], None),
    (4, [(1, 1)] * 4, 0),
    (4, [(1, 1)] * 4, 2),
    (4, [(2, 1), (1, 1), (1, 1), (2, 1)], 2),
    (4, [(2, 2), (1, 1), (1, 1), (2, 2)], 0),
]


@settings(max_examples=30, deadline=None)
@given(
    layout=st.sampled_from(_LAYOUTS),
    mcw=st.integers(1, 2),
    mch=st.integers(1, 2),
    al=st.integers(1, 2),
    density=st.floats(0.0, 0.25),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_decode_equals_coefficient_reference(
    layout, mcw, mch, al, density, seed
):
    import random

    nc, samplings, transform = layout
    rnd = random.Random(seed)
    hmx = max(hs for hs, _ in samplings)
    vmx = max(vs for _, vs in samplings)
    w, h = 8 * hmx * mcw, 8 * vmx * mch
    comp_blocks = [
        [_rand_block(rnd, density) for _ in range(mcw * hs * mch * vs)]
        for hs, vs in samplings
    ]
    if nc == 1:
        payload = mm.jpeg_encode_progressive(comp_blocks[0], w, h, al=al)
    else:
        payload = mm.jpeg_encode_progressive(
            comp_blocks, w, h, al=al, samplings=samplings,
            adobe_transform=transform,
        )
    dec = mm.jpeg_decode(payload)
    exp = _expected_from_coeffs(comp_blocks, samplings, w, h, transform)
    assert dec.shape == exp.shape
    assert np.array_equal(dec, exp)


@settings(max_examples=20, deadline=None)
@given(
    layout=st.sampled_from(
        [
            (3, [(1, 1)] * 3),
            (3, [(2, 1), (1, 1), (1, 1)]),
            (3, [(2, 2), (1, 1), (1, 1)]),
        ]
    ),
    mcw=st.integers(1, 2),
    mch=st.integers(1, 2),
    density=st.floats(0.0, 0.2),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_equals_sequential_same_spectra(
    layout, mcw, mch, density, seed
):
    """Two INDEPENDENT entropy codings of the same spectra must decode
    byte-identically: the sequential interleaved scan vs the six-scan
    progressive stream."""
    import random

    nc, samplings = layout
    rnd = random.Random(seed)
    hmx = max(hs for hs, _ in samplings)
    vmx = max(vs for _, vs in samplings)
    w, h = 8 * hmx * mcw, 8 * vmx * mch
    comp_blocks = [
        [_rand_block(rnd, density) for _ in range(mcw * hs * mch * vs)]
        for hs, vs in samplings
    ]
    prog = mm.jpeg_decode(
        mm.jpeg_encode_progressive(comp_blocks, w, h, samplings=samplings)
    )
    # build the matching sequential stream from the same spectra
    ybw = mcw * samplings[0][0]
    if samplings == [(1, 1)] * 3:
        mcus = [
            (comp_blocks[0][b], comp_blocks[1][b], comp_blocks[2][b])
            for b in range(mcw * mch)
        ]
        seq_pay = mm.jpeg_encode_ycbcr(mcus, w, h)
    elif samplings == [(2, 1), (1, 1), (1, 1)]:
        mcus = []
        for my in range(mch):
            for mx in range(mcw):
                ys = tuple(
                    comp_blocks[0][my * ybw + (mx * 2 + bx)] for bx in range(2)
                )
                k = my * mcw + mx
                mcus.append((ys, comp_blocks[1][k], comp_blocks[2][k]))
        seq_pay = mm.jpeg_encode_ycbcr_422(mcus, w, h)
    else:  # 4:2:0
        mcus = []
        for my in range(mch):
            for mx in range(mcw):
                ys = tuple(
                    comp_blocks[0][(my * 2 + by) * ybw + (mx * 2 + bx)]
                    for by in range(2)
                    for bx in range(2)
                )
                k = my * mcw + mx
                mcus.append((ys, comp_blocks[1][k], comp_blocks[2][k]))
        seq_pay = mm.jpeg_encode_ycbcr_420(mcus, w, h)
    seq = mm.jpeg_decode(seq_pay)
    assert np.array_equal(prog, seq)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(4, 14),
    h=st.integers(3, 12),
    n_frames=st.integers(1, 4),
    bg=st.integers(0, 15),
    seed=st.integers(0, 2**31 - 1),
)
def test_animated_gif_compositing_matches_simulator(w, h, n_frames, bg, seed):
    import random

    rnd = random.Random(seed)
    pal = np.array(
        [mm.gif_palette(k) for k in range(mm.GIF_PALETTE_SIZE)], dtype=np.uint8
    )
    frames = []
    for _ in range(n_frames):
        fw = rnd.randint(1, w)
        fh = rnd.randint(1, h)
        frames.append(
            {
                "ox": rnd.randint(0, w - fw),
                "oy": rnd.randint(0, h - fh),
                "fw": fw,
                "fh": fh,
                "indices": [rnd.randint(0, 15) for _ in range(fw * fh)],
                "delay_cs": rnd.randint(0, 400),
                "disposal": rnd.choice([0, 1, 2, 3]),
                "transparent": rnd.choice([None, rnd.randint(0, 15)]),
            }
        )
    dec, delays = mm.gif_decode_animated(
        mm.gif_encode_animated(frames, w, h, bg_index=bg)
    )
    assert delays == [fr["delay_cs"] for fr in frames]
    # numpy simulator
    screen = np.broadcast_to(pal[bg], (h, w, 3)).copy()
    for f, fr in enumerate(frames):
        ys = slice(fr["oy"], fr["oy"] + fr["fh"])
        xs = slice(fr["ox"], fr["ox"] + fr["fw"])
        idx = np.array(fr["indices"]).reshape(fr["fh"], fr["fw"])
        saved = screen[ys, xs].copy() if fr["disposal"] == 3 else None
        rgb = pal[idx]
        if fr["transparent"] is not None:
            mask = idx != fr["transparent"]
            region = screen[ys, xs]
            region[mask] = rgb[mask]
        else:
            screen[ys, xs] = rgb
        assert np.array_equal(dec[f], screen), f"frame {f}"
        if fr["disposal"] == 2:
            screen[ys, xs] = pal[bg]
        elif fr["disposal"] == 3:
            screen[ys, xs] = saved
