"""Forecasting data pipelines: instance-map annotation loading + padding.

Rebuild of external/dataset/forecasting_pipelines/{loading.py, transforms.py}
(the reference's panoptic-forecasting experiments; referenced by no release
config — capability parity for SURVEY.md §2.6's last pipeline family).
Functional numpy utilities instead of mmcv PIPELINES classes:

- load_instance_annotations — LoadAnnotationsInstanceMasks (loading.py:84):
  a cityscapes-style instance map encodes things as id >= 10000 with
  class = id // 1000; extract per-instance binary masks, labels, boxes, and
  optionally the id-map with sub-10000 (stuff) ids scaled by 1000 (:107-110).
- bitmasks_to_boxes — bitmasks2bboxes (loading.py:8-19): note the reference
  keeps the INCLUSIVE max pixel index as x2/y2 (no +1); preserved.
- pad_to — PadFutureMMDet (transforms.py:58): fixed-size / divisor / square
  padding of image, masks, and segmentation with per-kind pad values.
- normalize_multiple — NormalizeMultiple (transforms.py:8).
- knet_ins_adapter — KNetInsAdapter (transforms.py:153): city-style 11+
  thing labels -> 0-based.
"""

from __future__ import annotations

import numpy as np

THING_ID_BASE = 10000  # loading.py:115: ids >= 10000 are instances
LABEL_DIV = 1000


def bitmasks_to_boxes(masks: np.ndarray) -> np.ndarray:
    """[N, H, W] binary -> [N, 4] boxes with INCLUSIVE max coords
    (loading.py:8-19 keeps x[-1]/y[-1] unshifted; empty masks -> zeros)."""
    n = masks.shape[0]
    boxes = np.zeros((n, 4), np.float32)
    x_any = np.any(masks, axis=1)
    y_any = np.any(masks, axis=2)
    for i in range(n):
        xs = np.where(x_any[i])[0]
        ys = np.where(y_any[i])[0]
        if len(xs) > 0 and len(ys) > 0:
            boxes[i] = (xs[0], ys[0], xs[-1], ys[-1])
    return boxes


def load_instance_annotations(
    inst_map: np.ndarray,
    *,
    with_mask: bool = True,
    with_inst: bool = False,
    semantic_seg: np.ndarray | None = None,
) -> dict | None:
    """LoadAnnotationsInstanceMasks.__call__ (loading.py:96-160) on decoded
    arrays. Returns None when with_mask and no instances exist (the reference
    drops the sample, :119-120)."""
    out: dict = {}
    if with_inst:
        gim = inst_map.astype(np.int64).copy()
        gim[inst_map < THING_ID_BASE] *= LABEL_DIV  # loading.py:109-110
        out["gt_instance_map"] = gim
    if with_mask:
        masks, labels = [], []
        for inst_id in np.unique(inst_map):
            if inst_id >= THING_ID_BASE:
                masks.append((inst_map == inst_id).astype(np.int64))
                labels.append(int(inst_id) // LABEL_DIV)
        if not masks:
            return None
        gt_masks = np.stack(masks)
        out["gt_masks"] = gt_masks
        out["gt_labels"] = np.asarray(labels)
        out["gt_bboxes"] = bitmasks_to_boxes(gt_masks)
    if semantic_seg is not None:
        out["gt_semantic_seg"] = semantic_seg
    return out


def _pad_2d(arr: np.ndarray, shape: tuple[int, int], val) -> np.ndarray:
    ph = max(0, shape[0] - arr.shape[0])
    pw = max(0, shape[1] - arr.shape[1])
    widths = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, widths, constant_values=val)


def pad_to(
    img: np.ndarray,
    *,
    size: tuple[int, int] | None = None,
    size_divisor: int | None = None,
    pad_to_square: bool = False,
    masks: np.ndarray | None = None,
    seg: np.ndarray | None = None,
    pad_val: dict | None = None,
) -> dict:
    """PadFutureMMDet (transforms.py:58-141): exactly one of size /
    size_divisor / pad_to_square; masks pad with their own value and seg
    with 255 by default."""
    pv = {"img": 0, "masks": 0, "seg": 255}
    pv.update(pad_val or {})
    if pad_to_square:
        if size is not None or size_divisor is not None:
            raise ValueError("size/size_divisor must be None for pad_to_square")
        m = max(img.shape[:2])
        size = (m, m)
    elif (size is None) == (size_divisor is None):
        raise ValueError("exactly one of size and size_divisor must be set")
    if size is None:
        d = size_divisor
        size = (int(np.ceil(img.shape[0] / d)) * d,
                int(np.ceil(img.shape[1] / d)) * d)
    out = {
        "img": _pad_2d(img, size, pv["img"]),
        "pad_shape": size,
        "pad_fixed_size": None if size_divisor else size,
        "pad_size_divisor": size_divisor,
    }
    if masks is not None:
        out["masks"] = np.stack(
            [_pad_2d(m, size, pv["masks"]) for m in masks]
        ) if len(masks) else masks
    if seg is not None:
        out["seg"] = _pad_2d(seg, size, pv["seg"])
    return out


def normalize_multiple(
    imgs: list[np.ndarray],
    mean,
    std,
    to_rgb: bool = True,
) -> list[np.ndarray]:
    """NormalizeMultiple (transforms.py:8-49): per-image (x[, BGR->RGB] -
    mean) / std over every image field."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    out = []
    for im in imgs:
        x = im.astype(np.float32)
        if to_rgb:
            x = x[..., ::-1]
        out.append((x - mean) / std)
    return out


def knet_ins_adapter(labels: np.ndarray, stuff_nums: int = 11) -> np.ndarray:
    """KNetInsAdapter (transforms.py:153-167): city-style thing class ids
    (starting at stuff_nums) -> 0-based."""
    return labels - stuff_nums
