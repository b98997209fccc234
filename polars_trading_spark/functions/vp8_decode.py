"""Lossy VP8 keyframe pixel decode (RFC 6386), pure Python + numpy.

Round 14: the round-13 groundwork (boolean coder + compressed-header
parse, functions/vp8.py) plus the §13/§14 tables carried in verbatim
(functions/vp8_tables.py, extracted from the system libwebp binary —
see that module's provenance note) complete the keyframe intra path:

* mode decode — segment ids, keyframe 16x16/4x4/chroma mode trees
  with contextual ``KF_B_MODE_PROB``,
* coefficient token decode — the §13.2 token tree with bands, zigzag,
  category extra bits, per-frame probability updates, multi-partition
  token streams,
* reconstruction — §14 dequantization (segment quantizers + the five
  header deltas), 4x4 IDCT and the Y2 Walsh-Hadamard transform with
  the spec's exact integer rounding, all §12 intra predictors
  (including the stale above-right quirk for right-column subblocks),
* the §15 loop filter, both normal and simple, with per-segment /
  per-mode level adjustments.

Interframes stay out of scope (they need reference-frame state the
single-image WebP path never has) — ``decode_frame`` raises on them.

Correctness bar: tests/test_vp8_interop.py requires EXACT plane
equality with libwebp's own decoder on libwebp-encoded streams across
sizes and qualities (RFC 6386 decoding is bit-exact), plus byte-exact
round-trips of our encoder twin (functions/vp8.py).
"""

from __future__ import annotations

import struct

import numpy as np

from polars_trading_spark.functions.vp8 import VP8BoolDecoder
from polars_trading_spark.functions.vp8_tables import (
    AC_QLOOKUP,
    B_DC_PRED,
    B_HE_PRED,
    B_PRED,
    B_TM_PRED,
    B_VE_PRED,
    BMODE_TREE,
    CAT_BASES,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_UPDATE_PROBS,
    DC_PRED,
    DC_QLOOKUP,
    DEFAULT_COEFF_PROBS,
    H_PRED,
    KF_B_MODE_PROB,
    KF_UV_MODE_PROB,
    KF_YMODE_TREE,
    KF_YMODE_PROB,
    MB_SEGMENT_TREE,
    TM_PRED,
    UV_MODE_TREE,
    V_PRED,
    ZIGZAG,
)

__all__ = ["decode_frame", "vp8_decode_yuv"]


def _tree_read(d: VP8BoolDecoder, tree, probs, start: int = 0) -> int:
    i = start
    while True:
        i = tree[i + d.get(probs[i >> 1])]
        if i <= 0:
            return -i


def _clamp_q(q: int, hi: int = 127) -> int:
    return 0 if q < 0 else hi if q > hi else q


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


# ---------------------------------------------------------------------------
# Transforms (§14.3)
# ---------------------------------------------------------------------------


def _idct4x4(block):
    """§14.3 inverse DCT: 20091/35468 multiplier form, (x + 4) >> 3."""
    tmp = [0] * 16
    for i in range(4):
        a = block[i] + block[8 + i]
        b = block[i] - block[8 + i]
        c = ((block[4 + i] * 35468) >> 16) - (
            ((block[12 + i] * 20091) >> 16) + block[12 + i]
        )
        d = (((block[4 + i] * 20091) >> 16) + block[4 + i]) + (
            (block[12 + i] * 35468) >> 16
        )
        tmp[i] = a + d
        tmp[4 + i] = b + c
        tmp[8 + i] = b - c
        tmp[12 + i] = a - d
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        dc = tmp[r] + 4
        a = dc + tmp[r + 2]
        b = dc - tmp[r + 2]
        c = ((tmp[r + 1] * 35468) >> 16) - (
            ((tmp[r + 3] * 20091) >> 16) + tmp[r + 3]
        )
        d = (((tmp[r + 1] * 20091) >> 16) + tmp[r + 1]) + (
            (tmp[r + 3] * 35468) >> 16
        )
        out[r] = (a + d) >> 3
        out[r + 1] = (b + c) >> 3
        out[r + 2] = (b - c) >> 3
        out[r + 3] = (a - d) >> 3
    return out


def _iwht4x4(block):
    """§14.3 inverse Walsh-Hadamard for the Y2 block, (x + 3) >> 3."""
    tmp = [0] * 16
    for i in range(4):
        a0 = block[i] + block[12 + i]
        a1 = block[4 + i] + block[8 + i]
        a2 = block[4 + i] - block[8 + i]
        a3 = block[i] - block[12 + i]
        tmp[i] = a0 + a1
        tmp[8 + i] = a0 - a1
        tmp[4 + i] = a3 + a2
        tmp[12 + i] = a3 - a2
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        dc = tmp[r] + 3
        a0 = dc + tmp[r + 3]
        a1 = tmp[r + 1] + tmp[r + 2]
        a2 = tmp[r + 1] - tmp[r + 2]
        a3 = dc - tmp[r + 3]
        out[r] = (a0 + a1) >> 3
        out[r + 1] = (a3 + a2) >> 3
        out[r + 2] = (a0 - a1) >> 3
        out[r + 3] = (a3 - a2) >> 3
    return out


# ---------------------------------------------------------------------------
# Coefficient token decode (§13)
# ---------------------------------------------------------------------------


def _decode_coeffs(d, probs_type, ctx, first, dq_dc, dq_ac):
    """One 4x4 block's tokens -> (dequantized block[16], nonzero flag).

    ``probs_type`` is token_probs[block_type] ([band][ctx][11]);
    ``first`` is 0, or 1 for Y blocks whose DC lives in Y2.  Returns
    the dequantized coefficients in RASTER order and the entropy-
    context flag (eob > first, §13.3's surrounding-context rule).
    """
    block = [0] * 16
    i = first
    prev_zero = False
    while i < 16:
        p = probs_type[COEFF_BANDS[i]][ctx]
        if not prev_zero:
            if not d.get(p[0]):
                break
        if not d.get(p[1]):
            ctx = 0
            prev_zero = True
            i += 1
            continue
        if not d.get(p[2]):
            v = 1
            ctx = 1
        else:
            if not d.get(p[3]):
                if not d.get(p[4]):
                    v = 2
                else:
                    v = 3 + d.get(p[5])
            else:
                if not d.get(p[6]):
                    cat = 0 if not d.get(p[7]) else 1
                elif not d.get(p[8]):
                    cat = 2 if not d.get(p[9]) else 3
                else:
                    cat = 4 if not d.get(p[10]) else 5
                extra = 0
                for cp in CAT_PROBS[cat]:
                    extra = (extra << 1) | d.get(cp)
                v = CAT_BASES[cat] + extra
            ctx = 2
        if d.get(128):
            v = -v
        block[ZIGZAG[i]] = v * (dq_dc if i == 0 else dq_ac)
        prev_zero = False
        i += 1
    return block, 1 if i > first else 0


# ---------------------------------------------------------------------------
# Intra predictors (§12)
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred4(mode, A, L, C, AR):
    """4x4 predictor: A=above[4], L=left[4], C=corner, AR=above-right[4].
    Returns a 4x4 list of rows."""
    t = [A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3]]
    I, J, K, Lp = L
    X = C
    A0, B0, C0, D0, E0, F0, G0, H0 = t
    o = [[0] * 4 for _ in range(4)]
    if mode == B_DC_PRED:
        s = (sum(A) + sum(L) + 4) >> 3
        for y in range(4):
            for x in range(4):
                o[y][x] = s
    elif mode == B_TM_PRED:
        for y in range(4):
            for x in range(4):
                o[y][x] = _clip255(L[y] + A[x] - C)
    elif mode == B_VE_PRED:
        vals = [
            _avg3(X, A0, B0),
            _avg3(A0, B0, C0),
            _avg3(B0, C0, D0),
            _avg3(C0, D0, E0),
        ]
        for y in range(4):
            o[y] = list(vals)
    elif mode == B_HE_PRED:
        vals = [
            _avg3(X, I, J),
            _avg3(I, J, K),
            _avg3(J, K, Lp),
            _avg3(K, Lp, Lp),
        ]
        for y in range(4):
            o[y] = [vals[y]] * 4
    elif mode == 4:  # B_LD_PRED
        o[0][0] = _avg3(A0, B0, C0)
        o[0][1] = o[1][0] = _avg3(B0, C0, D0)
        o[0][2] = o[1][1] = o[2][0] = _avg3(C0, D0, E0)
        o[0][3] = o[1][2] = o[2][1] = o[3][0] = _avg3(D0, E0, F0)
        o[1][3] = o[2][2] = o[3][1] = _avg3(E0, F0, G0)
        o[2][3] = o[3][2] = _avg3(F0, G0, H0)
        o[3][3] = _avg3(G0, H0, H0)
    elif mode == 5:  # B_RD_PRED
        o[3][0] = _avg3(J, K, Lp)
        o[2][0] = o[3][1] = _avg3(I, J, K)
        o[1][0] = o[2][1] = o[3][2] = _avg3(X, I, J)
        o[0][0] = o[1][1] = o[2][2] = o[3][3] = _avg3(A0, X, I)
        o[0][1] = o[1][2] = o[2][3] = _avg3(B0, A0, X)
        o[0][2] = o[1][3] = _avg3(C0, B0, A0)
        o[0][3] = _avg3(D0, C0, B0)
    elif mode == 6:  # B_VR_PRED
        o[0][0] = o[2][1] = _avg2(X, A0)
        o[0][1] = o[2][2] = _avg2(A0, B0)
        o[0][2] = o[2][3] = _avg2(B0, C0)
        o[0][3] = _avg2(C0, D0)
        o[3][0] = _avg3(K, J, I)
        o[2][0] = _avg3(J, I, X)
        o[1][0] = o[3][1] = _avg3(I, X, A0)
        o[1][1] = o[3][2] = _avg3(X, A0, B0)
        o[1][2] = o[3][3] = _avg3(A0, B0, C0)
        o[1][3] = _avg3(B0, C0, D0)
    elif mode == 7:  # B_VL_PRED
        o[0][0] = _avg2(A0, B0)
        o[0][1] = o[2][0] = _avg2(B0, C0)
        o[0][2] = o[2][1] = _avg2(C0, D0)
        o[0][3] = o[2][2] = _avg2(D0, E0)
        o[1][0] = _avg3(A0, B0, C0)
        o[1][1] = o[3][0] = _avg3(B0, C0, D0)
        o[1][2] = o[3][1] = _avg3(C0, D0, E0)
        o[1][3] = o[3][2] = _avg3(D0, E0, F0)
        o[2][3] = _avg3(E0, F0, G0)
        o[3][3] = _avg3(F0, G0, H0)
    elif mode == 8:  # B_HD_PRED
        o[0][0] = o[1][2] = _avg2(I, X)
        o[1][0] = o[2][2] = _avg2(J, I)
        o[2][0] = o[3][2] = _avg2(K, J)
        o[3][0] = _avg2(Lp, K)
        o[0][3] = _avg3(A0, B0, C0)
        o[0][2] = _avg3(X, A0, B0)
        o[0][1] = o[1][3] = _avg3(I, X, A0)
        o[1][1] = o[2][3] = _avg3(X, I, J)
        o[2][1] = o[3][3] = _avg3(I, J, K)
        o[3][1] = _avg3(J, K, Lp)
    else:  # B_HU_PRED
        o[0][0] = _avg2(I, J)
        o[0][1] = _avg3(I, J, K)
        o[0][2] = o[1][0] = _avg2(J, K)
        o[0][3] = o[1][1] = _avg3(J, K, Lp)
        o[1][2] = o[2][0] = _avg2(K, Lp)
        o[1][3] = o[2][1] = _avg3(K, Lp, Lp)
        o[2][2] = o[2][3] = Lp
        o[3][0] = o[3][1] = o[3][2] = o[3][3] = Lp
    return o


def _pred_block(plane, x0, y0, n, mode, mb_x, mb_y, frame_right):
    """n×n whole-plane predictor (16x16 luma / 8x8 chroma) writing the
    prediction directly into ``plane[y0:y0+n, x0:x0+n]``."""
    have_above = y0 > 0
    have_left = x0 > 0
    if mode == DC_PRED:
        if have_above and have_left:
            s = int(plane[y0 - 1, x0 : x0 + n].sum()) + int(
                plane[y0 : y0 + n, x0 - 1].sum()
            )
            dc = (s + n) >> (n.bit_length())
        elif have_above:
            s = int(plane[y0 - 1, x0 : x0 + n].sum())
            dc = (s + (n >> 1)) >> (n.bit_length() - 1)
        elif have_left:
            s = int(plane[y0 : y0 + n, x0 - 1].sum())
            dc = (s + (n >> 1)) >> (n.bit_length() - 1)
        else:
            dc = 128
        plane[y0 : y0 + n, x0 : x0 + n] = dc
    elif mode == V_PRED:
        row = plane[y0 - 1, x0 : x0 + n] if have_above else np.full(n, 127, np.uint8)
        plane[y0 : y0 + n, x0 : x0 + n] = row[None, :]
    elif mode == H_PRED:
        col = plane[y0 : y0 + n, x0 - 1] if have_left else np.full(n, 129, np.uint8)
        plane[y0 : y0 + n, x0 : x0 + n] = col[:, None]
    else:  # TM_PRED
        above = (
            plane[y0 - 1, x0 : x0 + n].astype(np.int32)
            if have_above
            else np.full(n, 127, np.int32)
        )
        left = (
            plane[y0 : y0 + n, x0 - 1].astype(np.int32)
            if have_left
            else np.full(n, 129, np.int32)
        )
        # §12.2 border rules: the 127 top border covers the corner on
        # the first row; the 129 left border covers it below that.
        if have_above and have_left:
            c = int(plane[y0 - 1, x0 - 1])
        elif not have_above:
            c = 127
        else:
            c = 129
        blk = left[:, None] + above[None, :] - c
        plane[y0 : y0 + n, x0 : x0 + n] = np.clip(blk, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Loop filter (§15)
# ---------------------------------------------------------------------------


def _c127(v):
    return -128 if v < -128 else 127 if v > 127 else v


def _u2s(v):
    return v - 128


def _s2u(v):
    return _clip255(v + 128)


def _filter_common(p, idx, stride, use_outer_taps):
    """§15.3 common 4-tap adjustment on p1 p0 | q0 q1 at idx (q0)."""
    p1 = _u2s(int(p[idx - 2 * stride]))
    p0 = _u2s(int(p[idx - stride]))
    q0 = _u2s(int(p[idx]))
    q1 = _u2s(int(p[idx + stride]))
    a = _c127((p1 - q1 if use_outer_taps else 0) + 3 * (q0 - p0))
    f1 = _c127(a + 4) >> 3
    f2 = _c127(a + 3) >> 3
    p[idx] = _s2u(q0 - f1)
    p[idx - stride] = _s2u(p0 + f2)
    if not use_outer_taps:
        a = (f1 + 1) >> 1
        p[idx + stride] = _s2u(q1 - a)
        p[idx - 2 * stride] = _s2u(p1 + a)


def _hev(p, idx, stride, thresh):
    p1, p0 = int(p[idx - 2 * stride]), int(p[idx - stride])
    q0, q1 = int(p[idx]), int(p[idx + stride])
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _simple_mask(p, idx, stride, limit):
    p1, p0 = int(p[idx - 2 * stride]), int(p[idx - stride])
    q0, q1 = int(p[idx]), int(p[idx + stride])
    return abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= limit


def _normal_mask(p, idx, stride, interior, edge):
    p3, p2, p1, p0 = (int(p[idx - k * stride]) for k in (4, 3, 2, 1))
    q0, q1, q2, q3 = (int(p[idx + k * stride]) for k in (0, 1, 2, 3))
    return (
        abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= edge
        and abs(p3 - p2) <= interior
        and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior
        and abs(q1 - q0) <= interior
        and abs(q2 - q1) <= interior
        and abs(q3 - q2) <= interior
    )


def _mb_filter(p, idx, stride):
    """§15.3 macroblock-edge filter (6-pixel adjustment)."""
    p2, p1, p0 = (_u2s(int(p[idx - k * stride])) for k in (3, 2, 1))
    q0, q1, q2 = (_u2s(int(p[idx + k * stride])) for k in (0, 1, 2))
    w = _c127(_c127(p1 - q1) + 3 * (q0 - p0))
    a = (27 * w + 63) >> 7
    q0n = _s2u(q0 - a)
    p0n = _s2u(p0 + a)
    a = (18 * w + 63) >> 7
    q1n = _s2u(q1 - a)
    p1n = _s2u(p1 + a)
    a = (9 * w + 63) >> 7
    q2n = _s2u(q2 - a)
    p2n = _s2u(p2 + a)
    p[idx - 3 * stride] = p2n
    p[idx - 2 * stride] = p1n
    p[idx - stride] = p0n
    p[idx] = q0n
    p[idx + stride] = q1n
    p[idx + 2 * stride] = q2n


def _filter_edge(plane, x, y, n, horizontal, mb_edge, interior, edge_lim, hev_t):
    """Normal-filter one edge of length n at column x (vertical edge:
    pixels plane[y:y+n, x] are q0) or row y (horizontal edge)."""
    h_, w_ = plane.shape
    flat = plane.reshape(-1)
    stride = w_ if horizontal else 1
    for k in range(n):
        idx = (y + k) * w_ + x if not horizontal else y * w_ + (x + k)
        if not _normal_mask(flat, idx, stride, interior, edge_lim):
            continue
        if _hev(flat, idx, stride, hev_t):
            _filter_common(flat, idx, stride, True)
        elif mb_edge:
            _mb_filter(flat, idx, stride)
        else:
            _filter_common(flat, idx, stride, False)


def _filter_edge_simple(plane, x, y, n, horizontal, edge_lim):
    h_, w_ = plane.shape
    flat = plane.reshape(-1)
    stride = w_ if horizontal else 1
    for k in range(n):
        idx = (y + k) * w_ + x if not horizontal else y * w_ + (x + k)
        if _simple_mask(flat, idx, stride, edge_lim):
            _filter_common(flat, idx, stride, True)


# ---------------------------------------------------------------------------
# Frame decode
# ---------------------------------------------------------------------------


class _MBInfo:
    __slots__ = ("ymode", "uvmode", "bmodes", "segment", "skip", "has_coeffs")


def decode_frame(vp8_body: bytes):
    """Decode a VP8 KEYFRAME to (y, u, v) uint8 numpy planes (cropped
    to the frame size; chroma ceil-halved).  Raises ValueError on
    non-keyframes or malformed streams."""
    if len(vp8_body) < 10:
        raise ValueError("VP8 payload too short for a frame header")
    tag = vp8_body[0] | (vp8_body[1] << 8) | (vp8_body[2] << 16)
    if tag & 1:
        raise ValueError("not a VP8 keyframe (interframes need state)")
    first_part_size = tag >> 5
    if vp8_body[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    (w_raw, h_raw) = struct.unpack("<HH", vp8_body[6:10])
    width, height = w_raw & 0x3FFF, h_raw & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("empty VP8 frame")
    mb_w, mb_h = (width + 15) // 16, (height + 15) // 16

    d = VP8BoolDecoder(vp8_body[10 : 10 + first_part_size])
    d.get(128)  # color_space
    d.get(128)  # clamping_type

    # segmentation (§9.3)
    seg_enabled = d.get(128)
    seg_update_map = False
    seg_abs = False
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        seg_update_map = bool(d.get(128))
        update_data = d.get(128)
        if update_data:
            seg_abs = bool(d.get(128))
            seg_q = [d.flag_with_value(7) for _ in range(4)]
            seg_lf = [d.flag_with_value(6) for _ in range(4)]
        if seg_update_map:
            seg_tree_probs = [
                d.literal(8) if d.get(128) else 255 for _ in range(3)
            ]

    filter_type = d.get(128)
    filter_level = d.literal(6)
    sharpness = d.literal(3)
    lf_delta_enabled = d.get(128)
    ref_lf_delta = [0, 0, 0, 0]
    mode_lf_delta = [0, 0, 0, 0]
    if lf_delta_enabled:
        if d.get(128):  # delta update
            ref_lf_delta = [d.flag_with_value(6) for _ in range(4)]
            mode_lf_delta = [d.flag_with_value(6) for _ in range(4)]

    n_parts = 1 << d.literal(2)

    y_ac_qi = d.literal(7)
    y_dc_delta = d.flag_with_value(4)
    y2_dc_delta = d.flag_with_value(4)
    y2_ac_delta = d.flag_with_value(4)
    uv_dc_delta = d.flag_with_value(4)
    uv_ac_delta = d.flag_with_value(4)

    d.get(128)  # refresh_entropy_probs — single-frame decode ignores it

    # token probability updates (§13.4)
    probs = [
        [[list(DEFAULT_COEFF_PROBS[t][b][c]) for c in range(3)] for b in range(8)]
        for t in range(4)
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for pidx in range(11):
                    if d.get(COEFF_UPDATE_PROBS[t][b][c][pidx]):
                        probs[t][b][c][pidx] = d.literal(8)

    mb_no_skip = d.get(128)
    prob_skip_false = d.literal(8) if mb_no_skip else 0

    # token partitions
    part_base = 10 + first_part_size
    sizes_len = 3 * (n_parts - 1)
    if part_base + sizes_len > len(vp8_body):
        raise ValueError("truncated VP8 partition table")
    offs = part_base + sizes_len
    partitions = []
    for i in range(n_parts):
        if i < n_parts - 1:
            sz = (
                vp8_body[part_base + 3 * i]
                | (vp8_body[part_base + 3 * i + 1] << 8)
                | (vp8_body[part_base + 3 * i + 2] << 16)
            )
        else:
            sz = len(vp8_body) - offs
        if offs + sz > len(vp8_body) or sz < 0:
            raise ValueError("truncated VP8 token partition")
        partitions.append(VP8BoolDecoder(vp8_body[offs : offs + sz]))
        offs += sz

    # per-segment dequant factors (§14.1)
    def seg_quant(seg_id):
        if seg_enabled:
            base = seg_q[seg_id] if seg_abs else y_ac_qi + seg_q[seg_id]
        else:
            base = y_ac_qi
        q = _clamp_q(base)
        y1dc = DC_QLOOKUP[_clamp_q(q + y_dc_delta)]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clamp_q(q + y2_dc_delta)] * 2
        y2ac = AC_QLOOKUP[_clamp_q(q + y2_ac_delta)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clamp_q(q + uv_dc_delta, 117)]
        uvac = AC_QLOOKUP[_clamp_q(q + uv_ac_delta)]
        return (y1dc, y1ac, y2dc, y2ac, uvdc, uvac)

    dq = [seg_quant(s) for s in range(4)]

    # ---- pass 1: mode decode (first partition, raster order) ----------
    mbs = []
    above_bmodes = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left_bmodes = [B_DC_PRED] * 4
        row = []
        for mb_x in range(mb_w):
            mb = _MBInfo()
            mb.segment = 0
            if seg_update_map:
                mb.segment = _tree_read(d, MB_SEGMENT_TREE, seg_tree_probs)
            mb.skip = d.get(prob_skip_false) if mb_no_skip else 0
            ymode = _tree_read(d, KF_YMODE_TREE, KF_YMODE_PROB)
            mb.ymode = ymode
            if ymode == B_PRED:
                bmodes = []
                for sb in range(16):
                    sy, sx = sb >> 2, sb & 3
                    above_m = (
                        above_bmodes[mb_x][sx] if sy == 0 else bmodes[sb - 4]
                    )
                    left_m = left_bmodes[sy] if sx == 0 else bmodes[sb - 1]
                    m = _tree_read(
                        d, BMODE_TREE, KF_B_MODE_PROB[above_m][left_m]
                    )
                    bmodes.append(m)
                mb.bmodes = bmodes
            else:
                implied = {
                    DC_PRED: B_DC_PRED,
                    V_PRED: B_VE_PRED,
                    H_PRED: B_HE_PRED,
                    TM_PRED: B_TM_PRED,
                }[ymode]
                mb.bmodes = [implied] * 16
            mb.uvmode = _tree_read(d, UV_MODE_TREE, KF_UV_MODE_PROB)
            above_bmodes[mb_x] = mb.bmodes[12:16]
            left_bmodes = [mb.bmodes[3], mb.bmodes[7], mb.bmodes[11], mb.bmodes[15]]
            row.append(mb)
        mbs.append(row)

    # ---- pass 2: coefficients + reconstruction ------------------------
    W, H = mb_w * 16, mb_h * 16
    Wc, Hc = mb_w * 8, mb_h * 8
    Y = np.zeros((H, W), np.uint8)
    U = np.zeros((Hc, Wc), np.uint8)
    V = np.zeros((Hc, Wc), np.uint8)

    # entropy contexts: above per MB column, left per MB row
    above_nz = [[0] * 9 for _ in range(mb_w)]  # y0..y3, u0,u1, v0,v1, y2
    coeffs_store = [[None] * mb_w for _ in range(mb_h)]

    for mb_y in range(mb_h):
        td = partitions[mb_y % n_parts]
        left_nz = [0] * 9
        for mb_x in range(mb_w):
            mb = mbs[mb_y][mb_x]
            q = dq[mb.segment]
            has_y2 = mb.ymode != B_PRED
            ycoeffs = [None] * 16
            ucoeffs = [None] * 4
            vcoeffs = [None] * 4
            y2block = None
            nz_any = 0
            if mb.skip:
                for k in range(8):
                    above_nz[mb_x][k] = 0
                    left_nz[k] = 0
                if has_y2:
                    above_nz[mb_x][8] = 0
                    left_nz[8] = 0
            else:
                if has_y2:
                    ctx = above_nz[mb_x][8] + left_nz[8]
                    y2block, nz = _decode_coeffs(
                        td, probs[1], ctx, 0, q[2], q[3]
                    )
                    above_nz[mb_x][8] = left_nz[8] = nz
                    nz_any |= nz
                btype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                ynz = [0] * 16
                for sb in range(16):
                    sy, sx = sb >> 2, sb & 3
                    a = above_nz[mb_x][sx] if sy == 0 else ynz[sb - 4]
                    l = left_nz[sy] if sx == 0 else ynz[sb - 1]
                    blk, nz = _decode_coeffs(
                        td, probs[btype], a + l, first, q[0], q[1]
                    )
                    ynz[sb] = nz
                    ycoeffs[sb] = blk
                    nz_any |= nz
                for k in range(4):
                    above_nz[mb_x][k] = ynz[12 + k]
                    left_nz[k] = ynz[4 * k + 3]
                for plane_idx, store in ((0, ucoeffs), (1, vcoeffs)):
                    cnz = [0] * 4
                    for sb in range(4):
                        sy, sx = sb >> 1, sb & 1
                        base = 4 + 2 * plane_idx
                        a = above_nz[mb_x][base + sx] if sy == 0 else cnz[sx]
                        l = left_nz[base + sy] if sx == 0 else cnz[2 * sy]
                        blk, nz = _decode_coeffs(
                            td, probs[2], a + l, 0, q[4], q[5]
                        )
                        cnz[sb] = nz
                        store[sb] = blk
                        nz_any |= nz
                    above_nz[mb_x][base] = cnz[2]
                    above_nz[mb_x][base + 1] = cnz[3]
                    left_nz[base] = cnz[1]
                    left_nz[base + 1] = cnz[3]
            mb.has_coeffs = nz_any

            # ---- reconstruction ----------------------------------------
            x0, y0 = mb_x * 16, mb_y * 16
            cx0, cy0 = mb_x * 8, mb_y * 8
            if has_y2:
                if y2block is not None:
                    y2out = _iwht4x4(y2block)
                else:
                    y2out = [0] * 16
                _pred_block(Y, x0, y0, 16, mb.ymode, mb_x, mb_y, mb_w)
                for sb in range(16):
                    sy, sx = sb >> 2, sb & 3
                    blk = ycoeffs[sb] if ycoeffs[sb] is not None else [0] * 16
                    blk[0] = y2out[sb]
                    if any(blk):
                        res = _idct4x4(blk)
                        _add_residual(Y, x0 + 4 * sx, y0 + 4 * sy, res)
            else:
                for sb in range(16):
                    sy, sx = sb >> 2, sb & 3
                    bx, by = x0 + 4 * sx, y0 + 4 * sy
                    A, L, C, AR = _edge_pixels(
                        Y, bx, by, mb_x, mb_y, sx, sy, mb_w, W
                    )
                    pred = _pred4(mb.bmodes[sb], A, L, C, AR)
                    blk = ycoeffs[sb]
                    if blk is not None and any(blk):
                        res = _idct4x4(blk)
                        for yy in range(4):
                            for xx in range(4):
                                Y[by + yy, bx + xx] = _clip255(
                                    pred[yy][xx] + res[4 * yy + xx]
                                )
                    else:
                        for yy in range(4):
                            for xx in range(4):
                                Y[by + yy, bx + xx] = pred[yy][xx]
            for plane, store in ((U, ucoeffs), (V, vcoeffs)):
                _pred_block(plane, cx0, cy0, 8, mb.uvmode, mb_x, mb_y, mb_w)
                for sb in range(4):
                    sy, sx = sb >> 1, sb & 1
                    blk = store[sb]
                    if blk is not None and any(blk):
                        res = _idct4x4(blk)
                        _add_residual(plane, cx0 + 4 * sx, cy0 + 4 * sy, res)

    # ---- loop filter (§15) --------------------------------------------
    if filter_level > 0:
        _loop_filter(
            Y,
            U,
            V,
            mbs,
            mb_w,
            mb_h,
            filter_type,
            filter_level,
            sharpness,
            seg_enabled,
            seg_abs,
            seg_lf,
            lf_delta_enabled,
            ref_lf_delta,
            mode_lf_delta,
        )

    cw, ch = (width + 1) // 2, (height + 1) // 2
    return (
        Y[:height, :width].copy(),
        U[:ch, :cw].copy(),
        V[:ch, :cw].copy(),
    )


def _add_residual(plane, x, y, res):
    blk = plane[y : y + 4, x : x + 4].astype(np.int32)
    blk += np.asarray(res, np.int32).reshape(4, 4)
    plane[y : y + 4, x : x + 4] = np.clip(blk, 0, 255).astype(np.uint8)


def _edge_pixels(Y, bx, by, mb_x, mb_y, sx, sy, mb_w, W):
    """The 13 context pixels of a luma 4x4 subblock: above[4], left[4],
    corner, above-right[4] — with VP8's exact edge rules, including
    the STALE above-right for right-column subblocks below the top
    subblock row (they reuse the above macroblock row's pixels)."""
    have_above = by > 0
    have_left = bx > 0
    if have_above:
        A = [int(v) for v in Y[by - 1, bx : bx + 4]]
    else:
        A = [127, 127, 127, 127]
    if have_left:
        L = [int(v) for v in Y[by : by + 4, bx - 1]]
    else:
        L = [129, 129, 129, 129]
    if have_above and have_left:
        C = int(Y[by - 1, bx - 1])
    elif not have_above:
        C = 127
    else:
        C = 129
    # above-right
    if not have_above:
        AR = [127, 127, 127, 127]
    elif sx == 3:
        # right column: ALWAYS taken from the above-MB pixel row (the
        # spec's stale-AR rule) — which is the 127 border on the top MB
        # row; off the frame's right edge replicate that row's last px
        row = mb_y * 16 - 1
        xr = (mb_x + 1) * 16
        if row < 0:
            AR = [127, 127, 127, 127]
        elif mb_x + 1 < mb_w:
            AR = [int(v) for v in Y[row, xr : xr + 4]]
        else:
            AR = [int(Y[row, xr - 1])] * 4
    else:
        AR = [int(v) for v in Y[by - 1, bx + 4 : bx + 8]]
    return A, L, C, AR


def _loop_filter(
    Y,
    U,
    V,
    mbs,
    mb_w,
    mb_h,
    filter_type,
    filter_level,
    sharpness,
    seg_enabled,
    seg_abs,
    seg_lf,
    lf_delta_enabled,
    ref_lf_delta,
    mode_lf_delta,
):
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            mb = mbs[mb_y][mb_x]
            level = filter_level
            if seg_enabled:
                level = (
                    seg_lf[mb.segment]
                    if seg_abs
                    else filter_level + seg_lf[mb.segment]
                )
            if lf_delta_enabled:
                level += ref_lf_delta[0]  # intra frame
                if mb.ymode == B_PRED:
                    level += mode_lf_delta[0]
            level = 0 if level < 0 else 63 if level > 63 else level
            if level == 0:
                continue
            interior = level
            if sharpness > 0:
                interior >>= 2 if sharpness > 4 else 1
                if interior > 9 - sharpness:
                    interior = 9 - sharpness
            if interior < 1:
                interior = 1
            mb_lim = (level + 2) * 2 + interior
            sub_lim = level * 2 + interior
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            # §15.2: interior edges are filtered only when the MB has
            # coefficients or is 4x4-predicted (libvpx re-derives the
            # skip flag from the actual eob totals, not the bitstream
            # flag alone).
            inner = bool(mb.has_coeffs) or mb.ymode == B_PRED
            x0, y0 = mb_x * 16, mb_y * 16
            cx0, cy0 = mb_x * 8, mb_y * 8
            if filter_type == 1:  # simple: luma only
                if mb_x > 0:
                    _filter_edge_simple(Y, x0, y0, 16, False, mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_edge_simple(Y, x0 + dx, y0, 16, False, sub_lim)
                if mb_y > 0:
                    _filter_edge_simple(Y, x0, y0, 16, True, mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_edge_simple(Y, x0, y0 + dy, 16, True, sub_lim)
            else:  # normal
                if mb_x > 0:
                    _filter_edge(Y, x0, y0, 16, False, True, interior, mb_lim, hev_t)
                    _filter_edge(U, cx0, cy0, 8, False, True, interior, mb_lim, hev_t)
                    _filter_edge(V, cx0, cy0, 8, False, True, interior, mb_lim, hev_t)
                if inner:
                    for dx in (4, 8, 12):
                        _filter_edge(
                            Y, x0 + dx, y0, 16, False, False, interior, sub_lim, hev_t
                        )
                    _filter_edge(
                        U, cx0 + 4, cy0, 8, False, False, interior, sub_lim, hev_t
                    )
                    _filter_edge(
                        V, cx0 + 4, cy0, 8, False, False, interior, sub_lim, hev_t
                    )
                if mb_y > 0:
                    _filter_edge(Y, x0, y0, 16, True, True, interior, mb_lim, hev_t)
                    _filter_edge(U, cx0, cy0, 8, True, True, interior, mb_lim, hev_t)
                    _filter_edge(V, cx0, cy0, 8, True, True, interior, mb_lim, hev_t)
                if inner:
                    for dy in (4, 8, 12):
                        _filter_edge(
                            Y, x0, y0 + dy, 16, True, False, interior, sub_lim, hev_t
                        )
                    _filter_edge(
                        U, cx0, cy0 + 4, 8, True, False, interior, sub_lim, hev_t
                    )
                    _filter_edge(
                        V, cx0, cy0 + 4, 8, True, False, interior, sub_lim, hev_t
                    )


def vp8_decode_yuv(webp_payload: bytes):
    """Decode a lossy WebP container's VP8 keyframe to (y, u, v)."""
    from polars_trading_spark.functions.webp import _webp_chunks

    body = next(
        (b for f, b in _webp_chunks(webp_payload) if f == b"VP8 "), None
    )
    if body is None:
        raise ValueError("no 'VP8 ' chunk — not a lossy WebP")
    return decode_frame(body)
