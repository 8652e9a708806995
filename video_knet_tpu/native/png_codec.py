"""ctypes bindings for the native PNG/RLE codecs (see png_codec.cpp)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    from video_knet_tpu.native.build import LIB, build

    path = LIB if os.path.exists(LIB) else build()
    if path is None or not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.vknet_png_info.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_int32)
    ] * 4
    lib.vknet_png_info.restype = ctypes.c_int
    lib.vknet_png_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.vknet_png_read.restype = ctypes.c_int
    lib.vknet_rle_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.vknet_rle_encode.restype = ctypes.c_int64
    _lib = lib
    return _lib


def read_png(path: str) -> np.ndarray | None:
    """Decode a PNG to [H, W] or [H, W, C]; None if the native lib is absent
    or the file uses an unsupported PNG mode (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    ch = ctypes.c_int32()
    bd = ctypes.c_int32()
    if lib.vknet_png_info(path.encode(), h, w, ch, bd) != 0:
        return None
    nbytes = h.value * w.value * ch.value * (bd.value // 8)
    buf = np.empty(nbytes, np.uint8)
    rc = lib.vknet_png_read(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nbytes
    )
    if rc != 0:
        return None
    if bd.value == 16:
        arr = buf.view(">u2").astype(np.uint16)
    else:
        arr = buf
    arr = arr.reshape(
        (h.value, w.value) if ch.value == 1 else (h.value, w.value, ch.value)
    )
    return arr


def rle_encode_counts(mask: np.ndarray) -> np.ndarray | None:
    """Column-major run lengths of a binary [H, W] mask (native fast path)."""
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, np.uint8)
    h, w = m.shape
    out = np.empty(h * w + 1, np.uint32)
    n = lib.vknet_rle_encode(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out[:n].astype(np.int64)
