"""Lossy VP8 groundwork (RFC 6386): the boolean arithmetic coder and
the keyframe header parse — round-13 kernels, staged for the round-14
gate window (the same pattern AVI followed in rounds 12→13).
Macroblock/coefficient decode stays a named pin until the spec's
probability tables are carried in verbatim."""

from __future__ import annotations

import random

import pytest

from polars_trading_spark.functions.vp8 import (
    VP8BoolDecoder,
    VP8BoolEncoder,
    vp8_decode_pixels,
    vp8_keyframe_header,
    webp_encode_lossy_real,
)
from polars_trading_spark.functions.webp import _webp_chunks, webp_metadata


@pytest.mark.parametrize("seed", [0, 1, 7, 42, 99])
def test_bool_coder_random_roundtrip(seed):
    rng = random.Random(seed)
    for _ in range(40):
        n = rng.randint(1, 400)
        seq = [(rng.randint(0, 1), rng.randint(1, 254)) for _ in range(n)]
        e = VP8BoolEncoder()
        for bit, prob in seq:
            e.put(bit, prob)
        d = VP8BoolDecoder(e.flush())
        assert [d.get(p) for _, p in seq] == [b for b, _ in seq]


def test_bool_coder_extreme_probs_and_carry():
    # long runs at prob 1/254 stress renormalization; alternating bits
    # at prob 128 stress the carry-propagation path
    e = VP8BoolEncoder()
    seq = [(1, 1)] * 100 + [(0, 254)] * 100 + [(i & 1, 128) for i in range(64)]
    for bit, prob in seq:
        e.put(bit, prob)
    d = VP8BoolDecoder(e.flush())
    assert [d.get(p) for _, p in seq] == [b for b, _ in seq]


def test_literals_and_signed_fields():
    e = VP8BoolEncoder()
    e.put_literal(0x5A, 7)
    e.put_flag_with_value(None, 6)
    e.put_flag_with_value(-17, 6)
    e.put_flag_with_value(63, 6)
    e.put_flag_with_value(0, 7)  # present, zero, positive
    d = VP8BoolDecoder(e.flush())
    assert d.literal(7) == 0x5A
    assert d.flag_with_value(6) == 0
    assert d.flag_with_value(6) == -17
    assert d.flag_with_value(6) == 63
    assert d.flag_with_value(7) == 0


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"y_ac_qi": 100, "filter_level": 40, "sharpness": 7},
        {"partitions_log2": 3, "y_dc_delta": -7, "uv_ac_delta": 9},
        {"segmentation": True},
        {"segmentation": True, "seg_quantizer": (None, -64, 63, 0)},
        {"version": 3, "y_ac_qi": 0, "filter_level": 0},
    ],
)
def test_keyframe_header_roundtrip(kw):
    payload = webp_encode_lossy_real(320, 241, **kw)
    body = _webp_chunks(payload)[0][1]
    hdr = vp8_keyframe_header(body)
    assert (hdr["width"], hdr["height"]) == (320, 241)
    assert hdr["version"] == kw.get("version", 0)
    q = hdr["quant"]
    assert q["y_ac_qi"] == kw.get("y_ac_qi", 32)
    assert q["y_dc_delta"] == kw.get("y_dc_delta", 0)
    assert q["uv_ac_delta"] == kw.get("uv_ac_delta", 0)
    assert q["y2_dc_delta"] == 0 and q["y2_ac_delta"] == 0
    assert hdr["filter_level"] == kw.get("filter_level", 12)
    assert hdr["sharpness_level"] == kw.get("sharpness", 2)
    assert hdr["nbr_partitions"] == 1 << kw.get("partitions_log2", 0)
    seg = hdr["segmentation"]
    assert seg["enabled"] == kw.get("segmentation", False)
    if seg["enabled"]:
        want = [
            0 if v is None else v
            for v in kw.get("seg_quantizer", (-8, 0, 4, 12))
        ]
        assert seg["quantizer"] == want
        assert seg["loop_filter"] == [0, 0, 0, 0]
    assert hdr["refresh_entropy_probs"] == 1
    # the container metadata path reads the same tag
    assert webp_metadata(payload) == ("lossy", 320, 241, False, False, 1)


def test_header_validation_and_pin():
    with pytest.raises(ValueError, match="start code"):
        vp8_keyframe_header(b"\x00\x00\x00BAD!!!....")
    with pytest.raises(ValueError, match="too short"):
        vp8_keyframe_header(b"\x00\x00")
    # an interframe tag (key_frame bit = 1) is rejected
    payload = bytearray(_webp_chunks(webp_encode_lossy_real(16, 16))[0][1])
    payload[0] |= 1
    with pytest.raises(ValueError, match="keyframe"):
        vp8_keyframe_header(bytes(payload))
    # round 14: the former NotImplementedError pin is now a real decode
    # path — garbage input fails parse validation instead
    with pytest.raises(ValueError, match="start code"):
        vp8_decode_pixels(b"\x00" * 32)
