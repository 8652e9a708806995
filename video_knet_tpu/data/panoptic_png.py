"""Panoptic PNG encodings used by the STEP/DVPS dataset family.

Behavioral parity with external/dataset/dvps_pipelines/loading.py:117-153:
  - KITTI-STEP stores panoptic GT as RGB PNG: R = semantic class,
    G * 256 + B = instance id ("divisor = -1" mode).
  - VIP-Seg / Cityscapes-DVPS store a single-channel id map with
    panoptic_id = semantic * divisor + instance (divisor = 1000); raw ids
    < 1000 are pure-semantic pixels and are multiplied up.
  - "divisor = 0" mode stores class and instance in two separate PNGs.
Internally everything is normalized to (semantic[int32], instance[int32]) pairs;
`PAN_DIVISOR` (10000) combines them into the canonical panoptic id used by the
targets/eval code (same constant as the reference's local_divisor).
"""

from __future__ import annotations

import numpy as np

PAN_DIVISOR = 10000  # canonical: pan_id = semantic * PAN_DIVISOR + instance


def decode_kitti_panoptic(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """RGB panoptic PNG -> (semantic, instance). rgb: [H, W, 3] uint8."""
    semantic = rgb[..., 0].astype(np.int32)
    instance = rgb[..., 1].astype(np.int32) * 256 + rgb[..., 2].astype(np.int32)
    return semantic, instance


def decode_divisor_panoptic(
    ids: np.ndarray, divisor: int = 1000, promote_bare_semantic: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Single-channel id map -> (semantic, instance).

    promote_bare_semantic: VIPSeg/VIPER convention — raw values below the divisor
    are bare semantic labels and become (label, 0).
    """
    ids = ids.astype(np.int64)
    if promote_bare_semantic:
        ids = np.where(ids < divisor, ids * divisor, ids)
    return (ids // divisor).astype(np.int32), (ids % divisor).astype(np.int32)


def encode_two_channel_vps(semantic: np.ndarray, track: np.ndarray) -> np.ndarray:
    """(semantic, track-id) -> 3-channel uint8 image in the reference's dump format
    (tools/test_step.py:52-65: ch0 = semantic, ch1 = track % 256, ch2 = track // 256).
    """
    out = np.zeros((*semantic.shape, 3), np.uint8)
    out[..., 0] = semantic.astype(np.uint8)
    out[..., 1] = (track % 256).astype(np.uint8)
    out[..., 2] = (track // 256).astype(np.uint8)
    return out


def load_png(path: str) -> np.ndarray:
    """Decode a PNG from disk. Uses the native C++ loader when built (see
    video_knet_tpu/native), falling back to PIL."""
    try:
        from video_knet_tpu.native import png_codec

        arr = png_codec.read_png(path)
        if arr is not None:
            return arr
    except Exception:
        pass
    from PIL import Image

    return np.asarray(Image.open(path))


def save_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(arr).save(path)
