"""Lossy VP8 (RFC 6386) groundwork — pure stdlib, public spec only.

Round-13 scope (the same staged pattern as AVI in round 12: kernels +
unit gates now, Spark registration when the gate window allows):

* **Boolean arithmetic coder** (RFC 6386 §7): the exact range decoder
  every VP8 layer rides on, plus an encoder twin so every read path is
  exercised by byte-exact round-trips.
* **Keyframe header parse** (§9): the uncompressed frame tag (already
  served to `webp_metadata`) AND the bool-coded compressed header —
  color space / clamping, the full segmentation block (map update,
  feature mode, per-segment quantizer + loop-filter deltas, tree
  probs), loop filter (type, level, sharpness, per-ref/per-mode
  adjustments), DCT partition count, the quantizer block (y_ac index +
  the five optional deltas), refresh-entropy flag — everything in the
  header that is literal- or explicit-prob-coded.
* **Header-real lossy WebP encoder** (`webp_encode_lossy_real`):
  emits a tag + genuinely bool-coded compressed header for any
  parameter mix, replacing the round-12 filler-byte stub when a test
  or synthesizer needs parseable lossy payloads.

Round 14 closed the former pin: ``vp8_decode_pixels`` now performs
full keyframe macroblock/coefficient decode and reconstruction
(functions/vp8_decode.py).  The §13/§14 probability/quantizer tables
were NOT written from memory — they were extracted byte-for-byte from
the system libwebp binary (scripts/vp8_table_extract.py, provenance
note in functions/vp8_tables.py) and the whole path is gated on EXACT
plane equality with libwebp's own decoder on libwebp-encoded streams
(tests/test_vp8_interop.py).  Interframes remain out of scope — the
single-image WebP path never carries them.
"""

from __future__ import annotations

__all__ = [
    "VP8BoolEncoder",
    "VP8BoolDecoder",
    "vp8_keyframe_header",
    "webp_encode_lossy_real",
    "vp8_decode_pixels",
]


class VP8BoolEncoder:
    """RFC 6386 §7 boolean arithmetic encoder (the spec's reference
    algorithm: 8-bit probability of a zero, carry-propagating byte
    output)."""

    def __init__(self):
        self.out = bytearray()
        self.range_ = 255
        self.bottom = 0
        self.bit_count = 24

    def _add_one_to_output(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range_ - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range_ -= split
        else:
            self.range_ = split
        while self.range_ < 128:
            self.range_ <<= 1
            if self.bottom & (1 << 31):
                self._add_one_to_output()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def put_literal(self, value: int, nbits: int) -> None:
        """``L(n)``: n bits MSB-first, each at probability 128."""
        for i in range(nbits - 1, -1, -1):
            self.put((value >> i) & 1, 128)

    def put_flag_with_value(self, value: int | None, nbits: int) -> None:
        """The header's optional-field idiom: presence flag, then the
        magnitude as ``L(nbits)`` plus a sign bit (1 = negative)."""
        if value is None:
            self.put(0, 128)
            return
        self.put(1, 128)
        self.put_literal(abs(value), nbits)
        self.put(1 if value < 0 else 0, 128)

    def flush(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._add_one_to_output()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8
        return bytes(self.out)


class VP8BoolDecoder:
    """RFC 6386 §7.3 boolean arithmetic decoder (value/range form)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = (data[0] << 8 | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0
        )
        self.range_ = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range_ - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            bit = 1
            self.range_ -= split
            self.value -= big_split
        else:
            bit = 0
            self.range_ = split
        while self.range_ < 128:
            self.value = (self.value << 1) & 0xFFFFFF
            self.range_ <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos] << 0
                    self.pos += 1
        return bit

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.get(128)
        return v

    def flag_with_value(self, nbits: int) -> int:
        """Optional signed field: 0 when absent."""
        if not self.get(128):
            return 0
        v = self.literal(nbits)
        if self.get(128):
            v = -v
        return v


def vp8_keyframe_header(vp8_body: bytes) -> dict:
    """Parse a VP8 keyframe's uncompressed tag + bool-coded compressed
    header (RFC 6386 §9) into a dict of real fields.  Raises on
    non-keyframes, bad start codes, or truncated headers."""
    import struct

    if len(vp8_body) < 10:
        raise ValueError("VP8 payload too short for a frame header")
    tag = vp8_body[0] | (vp8_body[1] << 8) | (vp8_body[2] << 16)
    key_frame = tag & 1  # 0 = keyframe in VP8's inverted convention
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    first_part_size = tag >> 5
    if key_frame != 0:
        raise ValueError("not a VP8 keyframe (interframes need state)")
    if vp8_body[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    (w_raw, h_raw) = struct.unpack("<HH", vp8_body[6:10])
    width, width_scale = w_raw & 0x3FFF, w_raw >> 14
    height, height_scale = h_raw & 0x3FFF, h_raw >> 14

    d = VP8BoolDecoder(vp8_body[10 : 10 + first_part_size])
    hdr = {
        "version": version,
        "show_frame": show_frame,
        "first_part_size": first_part_size,
        "width": width,
        "width_scale": width_scale,
        "height": height,
        "height_scale": height_scale,
        "color_space": d.get(128),
        "clamping_type": d.get(128),
    }
    seg = {"enabled": bool(d.get(128))}
    if seg["enabled"]:
        seg["update_map"] = bool(d.get(128))
        seg["update_data"] = bool(d.get(128))
        if seg["update_data"]:
            seg["abs_values"] = bool(d.get(128))
            seg["quantizer"] = [d.flag_with_value(7) for _ in range(4)]
            seg["loop_filter"] = [d.flag_with_value(6) for _ in range(4)]
        if seg["update_map"]:
            seg["tree_probs"] = [
                d.literal(8) if d.get(128) else 255 for _ in range(3)
            ]
    hdr["segmentation"] = seg
    hdr["filter_type"] = d.get(128)
    hdr["filter_level"] = d.literal(6)
    hdr["sharpness_level"] = d.literal(3)
    lf = {"delta_enabled": bool(d.get(128))}
    if lf["delta_enabled"]:
        lf["delta_update"] = bool(d.get(128))
        if lf["delta_update"]:
            lf["ref_frame_delta"] = [d.flag_with_value(6) for _ in range(4)]
            lf["mb_mode_delta"] = [d.flag_with_value(6) for _ in range(4)]
    hdr["lf_deltas"] = lf
    hdr["nbr_partitions"] = 1 << d.literal(2)
    hdr["quant"] = {
        "y_ac_qi": d.literal(7),
        "y_dc_delta": d.flag_with_value(4),
        "y2_dc_delta": d.flag_with_value(4),
        "y2_ac_delta": d.flag_with_value(4),
        "uv_dc_delta": d.flag_with_value(4),
        "uv_ac_delta": d.flag_with_value(4),
    }
    hdr["refresh_entropy_probs"] = d.get(128)
    return hdr


def webp_encode_lossy_real(
    width: int,
    height: int,
    *,
    y_ac_qi: int = 32,
    filter_level: int = 12,
    sharpness: int = 2,
    partitions_log2: int = 0,
    segmentation: bool = False,
    seg_quantizer=(-8, 0, 4, 12),
    y_dc_delta: int = 0,
    uv_ac_delta: int = 0,
    version: int = 0,
) -> bytes:
    """A lossy WebP whose VP8 keyframe header is GENUINELY bool-coded
    (parseable by ``vp8_keyframe_header`` field for field); the
    macroblock/coefficient data after the header remains a stub (the
    named pin).  Replaces the round-12 filler-byte stub wherever a
    test needs real header semantics."""
    import struct

    from polars_trading_spark.functions.webp import _riff_container

    e = VP8BoolEncoder()
    e.put(0, 128)  # color_space
    e.put(0, 128)  # clamping_type
    e.put(1 if segmentation else 0, 128)
    if segmentation:
        e.put(0, 128)  # update_mb_segmentation_map
        e.put(1, 128)  # update_segment_feature_data
        e.put(1, 128)  # abs_values
        for q in seg_quantizer:
            e.put_flag_with_value(q, 7)
        for _ in range(4):
            e.put_flag_with_value(None, 6)  # no loop-filter deltas
    e.put(0, 128)  # filter_type
    e.put_literal(filter_level, 6)
    e.put_literal(sharpness, 3)
    e.put(0, 128)  # loop_filter_adj_enable
    e.put_literal(partitions_log2, 2)
    e.put_literal(y_ac_qi, 7)
    e.put_flag_with_value(y_dc_delta if y_dc_delta else None, 4)
    e.put_flag_with_value(None, 4)  # y2_dc
    e.put_flag_with_value(None, 4)  # y2_ac
    e.put_flag_with_value(None, 4)  # uv_dc
    e.put_flag_with_value(uv_ac_delta if uv_ac_delta else None, 4)
    e.put(1, 128)  # refresh_entropy_probs
    part = e.flush()

    tag = (0 << 0) | (version << 1) | (1 << 4) | (len(part) << 5)
    body = (
        bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        + part
    )
    return _riff_container([(b"VP8 ", body)])


def vp8_decode_pixels(vp8_body: bytes):
    """Full keyframe pixel decode (round 14 — the former named pin).

    Returns ``(y, u, v)`` uint8 numpy planes.  The §13/§14 tables were
    carried in verbatim via scripts/vp8_table_extract.py and the whole
    path is validated by EXACT plane equality against the system
    libwebp on libwebp-encoded streams (tests/test_vp8_interop.py).
    Interframes still raise — they need reference-frame state the
    single-image WebP path never has."""
    from polars_trading_spark.functions.vp8_decode import decode_frame

    return decode_frame(vp8_body)
