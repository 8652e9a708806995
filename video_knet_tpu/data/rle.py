"""COCO-compatible run-length mask encoding, implemented from scratch in numpy.

Replaces the reference's dependency on the pycocotools `_mask` C extension
(external/ext/mask.py:3, tools_vis/apis/test.py:33-37 encode_mask_results), which
is only used host-side to serialize predicted masks for the YT-VIS submission
json. Produces the same wire format: column-major run lengths, delta-compressed
into the printable-ASCII string scheme used by the COCO API (5-bit groups,
continuation bit 0x20, offset 48).
"""

from __future__ import annotations

import numpy as np


def mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """Binary [H, W] mask -> column-major run lengths (first run is of zeros)."""
    try:
        from video_knet_tpu.native.png_codec import rle_encode_counts

        native = rle_encode_counts(np.asarray(mask))
        if native is not None:
            return native
    except Exception:
        pass
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    if n == 0:
        return np.zeros((0,), np.int64)
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    bounds = np.concatenate([[0], change, [n]])
    counts = np.diff(bounds)
    if flat[0] == 1:  # must start with a zero-run
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def counts_to_mask(counts: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    h, w = hw
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    return flat.reshape((h, w), order="F")


def counts_to_string(counts: np.ndarray) -> str:
    """COCO compressed RLE string (delta + 5-bit varint, offset 48)."""
    out = []
    cnts = [int(c) for c in counts]
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        while True:
            c = x & 0x1F
            x >>= 5  # arithmetic shift (python ints)
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
            if not more:
                break
    return "".join(out)


def string_to_counts(s: str) -> np.ndarray:
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        while True:
            c = ord(s[i]) - 48
            i += 1
            x |= (c & 0x1F) << (5 * k)
            if not (c & 0x20):
                if c & 0x10:  # sign-extend
                    x |= -1 << (5 * (k + 1))
                break
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.int64)


def encode_mask(mask: np.ndarray) -> dict:
    """Binary [H, W] mask -> COCO RLE dict {'size': [H, W], 'counts': str}."""
    return {
        "size": [int(mask.shape[0]), int(mask.shape[1])],
        "counts": counts_to_string(mask_to_counts(mask)),
    }


def decode_mask(rle: dict) -> np.ndarray:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, bytes):
            counts = counts.decode()
        counts = string_to_counts(counts)
    return counts_to_mask(np.asarray(counts), tuple(rle["size"]))


def rle_area(rle: dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = string_to_counts(counts if isinstance(counts, str) else counts.decode())
    return int(np.sum(counts[1::2]))
