"""COCO instance-segmentation result formatting.

Rebuild of the reference's non-panoptic test outputs: `segm2result`
(knet/det/kernel_update_head.py:470-483) groups thresholded masks + fake
score-only bboxes per class, and mmdet's `segm2json`-style formatter turns
them into the COCO detection/segmentation results json (RLE-encoded masks,
category ids mapped through the dataset's cat_ids).
"""

from __future__ import annotations

import json
import os

import numpy as np

from video_knet_tpu.data.rle import encode_mask


def segm2result(
    mask_probs: np.ndarray,  # [K, H, W] float probabilities
    labels: np.ndarray,  # [K]
    scores: np.ndarray,  # [K]
    *,
    num_classes: int,
    mask_thr: float = 0.5,
    score_thr: float = 0.0,
) -> tuple[list[np.ndarray], list[list[np.ndarray]]]:
    """(bbox_result, segm_result) per class (kernel_update_head.py:470-483).

    bbox rows are the reference's "fake bboxes": zeros with the score in the
    last column. Detections below score_thr are dropped (the reference keeps
    all max_per_img; pass 0.0 for parity).
    """
    labels = np.asarray(labels)
    scores = np.asarray(scores)
    seg_masks = np.asarray(mask_probs) > mask_thr
    keep = scores >= score_thr
    bbox_result = []
    segm_result: list[list[np.ndarray]] = [[] for _ in range(num_classes)]
    for cls in range(num_classes):
        sel = keep & (labels == cls)
        boxes = np.zeros((int(sel.sum()), 5), np.float32)
        boxes[:, -1] = scores[sel]
        bbox_result.append(boxes)
    for idx in np.nonzero(keep)[0]:
        segm_result[int(labels[idx])].append(seg_masks[idx])
    return bbox_result, segm_result


def instances_to_coco_json(
    image_id: int,
    mask_probs: np.ndarray,  # [K, H, W]
    labels: np.ndarray,
    scores: np.ndarray,
    cat_ids: list[int],
    *,
    mask_thr: float = 0.5,
    score_thr: float = 0.0,
) -> list[dict]:
    """One image's detections -> COCO `segm` results entries (RLE counts
    strings compatible with pycocotools, data/rle.py)."""
    out = []
    seg_masks = np.asarray(mask_probs) > mask_thr
    for k in range(len(scores)):
        if scores[k] < score_thr:
            continue
        m = seg_masks[k]
        ys, xs = np.nonzero(m)
        if len(ys) == 0:
            bbox = [0.0, 0.0, 0.0, 0.0]
        else:
            x0, y0 = float(xs.min()), float(ys.min())
            bbox = [x0, y0, float(xs.max()) - x0 + 1, float(ys.max()) - y0 + 1]
        out.append(
            {
                "image_id": int(image_id),
                "category_id": int(cat_ids[int(labels[k])]),
                "segmentation": encode_mask(m),
                "bbox": bbox,
                "score": float(scores[k]),
            }
        )
    return out


def write_coco_results(results: list[dict], out_dir: str) -> str:
    """Dump the accumulated segm results list as <out_dir>/coco_segm.json."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "coco_segm.json")

    def default(o):
        if isinstance(o, bytes):
            return o.decode("ascii")
        raise TypeError(type(o))

    with open(path, "w") as f:
        json.dump(results, f, default=default)
    return path
