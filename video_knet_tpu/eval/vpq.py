"""Video Panoptic Quality (VPQ), vectorized numpy.

Behavioral rebuild of the windowed VPQ evaluation used by the reference
(`tools/eval_dvpq_step.py:21-98` vpq_eval + the k-frame window driver at the bottom
of that file): frames in a window are concatenated along the x-axis into one label
map, panoptic ids are `category * max_ins + instance`, matches are IoU > 0.5 with
void-overlap discounted from the union, and unmatched predictions that overlap
ignored GT regions by > 0.5 of their area are not counted as FP.

Implementation here is set-free/vectorized: all pair statistics come from
`np.unique` over combined 64-bit keys instead of python dict loops.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

MAX_INS = 2**16
IGNORE_CAT = 255
OFFSET = 2**30


@dataclass
class VPQStats:
    """Accumulated per-category statistics (index = category id)."""

    num_cat: int = 20
    iou: np.ndarray = field(default=None)  # type: ignore[assignment]
    tp: np.ndarray = field(default=None)  # type: ignore[assignment]
    fn: np.ndarray = field(default=None)  # type: ignore[assignment]
    fp: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        for name in ("iou", "tp", "fn", "fp"):
            if getattr(self, name) is None:
                setattr(self, name, np.zeros(self.num_cat, np.float64))

    def __iadd__(self, other: "VPQStats") -> "VPQStats":
        self.iou += other.iou
        self.tp += other.tp
        self.fn += other.fn
        self.fp += other.fp
        return self


def vpq_stats(pred_ids: np.ndarray, gt_ids: np.ndarray, num_cat: int = 20) -> VPQStats:
    """Panoptic match statistics for one (windowed) label map pair.

    pred_ids/gt_ids: int arrays of panoptic ids (category * 2^16 + instance).
    GT category 255 is void/ignore.
    """
    pred_ids = pred_ids.astype(np.int64).ravel()
    gt_ids = gt_ids.astype(np.int64).ravel()

    pred_u, pred_areas = np.unique(pred_ids, return_counts=True)
    gt_u, gt_areas = np.unique(gt_ids, return_counts=True)
    pred_area_of = dict(zip(pred_u.tolist(), pred_areas.tolist()))
    gt_area_of = dict(zip(gt_u.tolist(), gt_areas.tolist()))

    int_keys, int_areas = np.unique(gt_ids * OFFSET + pred_ids, return_counts=True)
    pair_gt = int_keys // OFFSET
    pair_pred = int_keys % OFFSET
    pair_gt_cat = pair_gt // MAX_INS
    pair_pred_cat = pair_pred // MAX_INS

    # overlap of each pred id with the void region (gt cat 255, instance 0 id)
    void_id = IGNORE_CAT * MAX_INS
    void_rows = pair_gt == void_id
    void_overlap = dict(zip(pair_pred[void_rows].tolist(), int_areas[void_rows].tolist()))
    # overlap of each pred id with ANY ignored gt id (gt cat == 255)
    ign_rows = pair_gt_cat == IGNORE_CAT
    ign_overlap: dict[int, int] = {}
    for p, a in zip(pair_pred[ign_rows].tolist(), int_areas[ign_rows].tolist()):
        ign_overlap[p] = ign_overlap.get(p, 0) + a

    stats = VPQStats(num_cat=num_cat)
    gt_matched: set[int] = set()
    pred_matched: set[int] = set()

    same_cat = pair_gt_cat == pair_pred_cat
    for g, p, a, cat in zip(
        pair_gt[same_cat].tolist(),
        pair_pred[same_cat].tolist(),
        int_areas[same_cat].tolist(),
        pair_gt_cat[same_cat].tolist(),
    ):
        union = gt_area_of[g] + pred_area_of[p] - a - void_overlap.get(p, 0)
        iou = a / union
        if iou > 0.5:
            stats.tp[cat] += 1
            stats.iou[cat] += iou
            gt_matched.add(g)
            pred_matched.add(p)

    for g, cat in zip(gt_u.tolist(), (gt_u // MAX_INS).tolist()):
        if g in gt_matched or cat == IGNORE_CAT:
            continue
        stats.fn[cat] += 1

    for p, area, cat in zip(
        pred_u.tolist(), pred_areas.tolist(), (pred_u // MAX_INS).tolist()
    ):
        if p in pred_matched:
            continue
        if ign_overlap.get(p, 0) / area > 0.5:
            continue
        stats.fp[cat] += 1
    return stats


def vpq_from_stats(
    stats: VPQStats, *, num_classes: int = 19, things_index: np.ndarray | None = None
) -> dict[str, float | np.ndarray]:
    """PQ/SQ/RQ aggregation (eval_dvpq_step.py:205-226)."""
    eps = 1e-10
    iou = stats.iou[:num_classes]
    tp = stats.tp[:num_classes]
    fn = stats.fn[:num_classes]
    fp = stats.fp[:num_classes]
    sq = iou / (tp + eps)
    rq = tp / (tp + 0.5 * fn + 0.5 * fp + eps)
    pq = sq * rq
    out: dict[str, float | np.ndarray] = {
        "PQ": float(pq.mean() * 100),
        "SQ": float(sq.mean() * 100),
        "RQ": float(rq.mean() * 100),
        "PQ_per_class": pq * 100,
        "SQ_per_class": sq * 100,
        "RQ_per_class": rq * 100,
    }
    if things_index is not None:
        out["PQ_th"] = float(pq[things_index].mean() * 100)
        out["PQ_st"] = float(pq[~things_index].mean() * 100)
    return out


def window_vpq(
    pred_cats: list[np.ndarray],
    pred_inss: list[np.ndarray],
    gt_pans: list[np.ndarray],
    *,
    eval_frames: int = 1,
    num_cat: int = 20,
) -> VPQStats:
    """Windowed VPQ over one sequence already decoded to arrays.

    pred_cats/pred_inss: per-frame category / instance-id maps.
    gt_pans: per-frame GT panoptic ids (category * 2^16 + instance).
    Frames in each window of `eval_frames` are concatenated along axis 1.
    """
    total = VPQStats(num_cat=num_cat)
    n = len(pred_cats)
    for i in range(n - eval_frames + 1):
        pred = np.concatenate(
            [
                pred_cats[j].astype(np.int64) * MAX_INS + pred_inss[j].astype(np.int64)
                for j in range(i, i + eval_frames)
            ],
            axis=1,
        )
        gt = np.concatenate(gt_pans[i : i + eval_frames], axis=1)
        total += vpq_stats(pred, gt, num_cat=num_cat)
    return total
