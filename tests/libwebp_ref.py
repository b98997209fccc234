"""Test-only ctypes bridge to the system libwebp — the third-party
interop oracle for our pure-Python VP8 decoder.

The engine itself never touches this (its codecs are stdlib-only); the
tests use libwebp to (a) ENCODE real lossy VP8 streams — exercising
B_PRED modes, token-probability updates, loop filtering, multiple
partitions — and (b) DECODE them to YUV planes with the reference
implementation.  Our decoder must reproduce those planes EXACTLY
(RFC 6386 decoding is bit-exact), which validates every transcribed
§13/§14 table end-to-end: a single wrong entry diverges immediately.

Import guarded: tests skip when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np


def _load():
    for cand in (
        "libwebp.so.7",
        "libwebp.so",
        ctypes.util.find_library("webp"),
    ):
        if not cand:
            continue
        try:
            return ctypes.CDLL(cand)
        except OSError:
            continue
    return None


_LIB = _load()

available = _LIB is not None

if available:
    _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.WebPFree.restype = None
    _LIB.WebPFree.argtypes = [ctypes.c_void_p]


def encode_rgb(rgb: np.ndarray, quality: float) -> bytes:
    """Encode an (h, w, 3) uint8 array to a LOSSY WebP via libwebp."""
    h, w, c = rgb.shape
    assert c == 3
    buf = np.ascontiguousarray(rgb).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(buf, w, h, w * 3, float(quality), ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeRGB failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        _LIB.WebPFree(out)


def decode_yuv(payload: bytes):
    """Decode any WebP to (y, u, v) uint8 planes via libwebp."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = _LIB.WebPDecodeYUV(
        payload,
        len(payload),
        ctypes.byref(w),
        ctypes.byref(h),
        ctypes.byref(up),
        ctypes.byref(vp),
        ctypes.byref(stride),
        ctypes.byref(uv_stride),
    )
    if not yp:
        raise RuntimeError("WebPDecodeYUV failed")
    try:
        W, H, s, us = w.value, h.value, stride.value, uv_stride.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        y = np.frombuffer(
            ctypes.string_at(yp, s * H), dtype=np.uint8
        ).reshape(H, s)[:, :W].copy()
        u = np.frombuffer(
            ctypes.string_at(up, us * ch), dtype=np.uint8
        ).reshape(ch, us)[:, :cw].copy()
        v = np.frombuffer(
            ctypes.string_at(vp, us * ch), dtype=np.uint8
        ).reshape(ch, us)[:, :cw].copy()
        return y, u, v
    finally:
        _LIB.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
