"""Semantic segmentation mIoU via an accumulated confusion matrix.

Behavioral rebuild of `external/dataset/mIoU.py` (eval_miou): per-class
intersection-over-union from a global confusion matrix with an ignore label,
plus the VSPW video consistency metrics mVC_k (fraction of pixels whose class
persists across a k-frame window; poster Table 4 reports mVC8/mVC16).
"""

from __future__ import annotations

import numpy as np


class ConfusionMeter:
    def __init__(self, num_classes: int, ignore_label: int = 255):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.cm = np.zeros((num_classes, num_classes), np.int64)

    def update(self, pred: np.ndarray, gt: np.ndarray):
        valid = gt != self.ignore_label
        p = pred[valid].astype(np.int64)
        g = gt[valid].astype(np.int64)
        keys = g * self.num_classes + p
        self.cm += np.bincount(keys, minlength=self.num_classes**2).reshape(
            self.num_classes, self.num_classes
        )

    def result(self) -> dict:
        tp = self.cm.diagonal().astype(np.float64)
        union = self.cm.sum(0) + self.cm.sum(1) - tp
        present = union > 0
        iou = np.where(present, tp / np.maximum(union, 1e-15), np.nan)
        acc_per_class = tp / np.maximum(self.cm.sum(1), 1e-15)
        return {
            "mIoU": float(np.nanmean(iou)),
            "IoU_per_class": iou,
            "aAcc": float(tp.sum() / max(self.cm.sum(), 1)),
            "mAcc": float(np.nanmean(np.where(present, acc_per_class, np.nan))),
        }


def video_consistency(pred_frames: list[np.ndarray], gt_frames: list[np.ndarray],
                      window: int, ignore_label: int = 255) -> float:
    """VSPW mVC_k: mean over windows of |pixels consistently correct across the
    window| / |pixels with a consistent GT class across the window|."""
    n = len(pred_frames)
    if n < window:
        return float("nan")
    scores = []
    for i in range(n - window + 1):
        gts = np.stack(gt_frames[i : i + window])
        preds = np.stack(pred_frames[i : i + window])
        gt_same = np.all(gts == gts[0], axis=0) & (gts[0] != ignore_label)
        denom = gt_same.sum()
        if denom == 0:
            continue
        pred_same = np.all((preds == gts)[:, gt_same], axis=0)
        scores.append(pred_same.sum() / denom)
    return float(np.mean(scores)) if scores else float("nan")
