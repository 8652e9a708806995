"""Segmentation and Tracking Quality (STQ) and its depth-aware variant (DSTQ).

Behavioral rebuild of the STEP metric as used by the reference
(`tools/utils/STQ.py:42-291`, `tools/utils/DSTQ.py:9-130`, themselves deeplab2
ports): STQ = sqrt(AQ * mIoU) where AQ is a tube-IoU-weighted association score over
thing tracks and mIoU is the semantic confusion-matrix IoU; DSTQ adds geometric-mean
depth inlier rates at thresholds (1.25, 1.1).

Implementation differences (same results): pair statistics are accumulated with
`np.unique` over combined integer keys and Counters instead of per-id python loops;
the confusion matrix update uses `np.bincount`.

Panoptic label encoding: (semantic << label_bit_shift) + instance_id. GT instance
id 0 inside a thing class marks `crowd` (excluded from AQ, and prediction ids in
crowd regions are not punished).
"""

from __future__ import annotations

from collections import Counter, OrderedDict
from typing import Any, Mapping, Sequence

import numpy as np

_EPS = 1e-15


class STQuality:
    def __init__(
        self,
        num_classes: int,
        things_list: Sequence[int],
        ignore_label: int,
        label_bit_shift: int,
        offset: int,
    ):
        self._num_classes = num_classes
        self._things_list = list(things_list)
        self._ignore_label = ignore_label
        self._shift = label_bit_shift
        self._bit_mask = (1 << label_bit_shift) - 1
        self._offset = offset
        if offset < (num_classes << label_bit_shift):
            raise ValueError(
                "offset must be >= num_classes << label_bit_shift "
                f"({num_classes << label_bit_shift})"
            )
        if ignore_label >= num_classes:
            self._cm_size = num_classes + 1
            self._include = np.arange(num_classes)
        else:
            self._cm_size = num_classes
            self._include = np.array(
                [i for i in range(num_classes) if i != ignore_label]
            )
        self.reset_states()

    def reset_states(self):
        self._confusion: "OrderedDict[Any, np.ndarray]" = OrderedDict()
        self._pred_areas: "OrderedDict[Any, Counter]" = OrderedDict()
        self._gt_areas: "OrderedDict[Any, Counter]" = OrderedDict()
        self._intersections: "OrderedDict[Any, Counter]" = OrderedDict()
        self._seq_len: "OrderedDict[Any, int]" = OrderedDict()

    def _semantic(self, y: np.ndarray) -> np.ndarray:
        return y >> self._shift

    def update_state(self, y_true: np.ndarray, y_pred: np.ndarray, sequence_id=0):
        y_true = y_true.astype(np.int64)
        y_pred = y_pred.astype(np.int64)
        sem_t = self._semantic(y_true)
        sem_p = self._semantic(y_pred)
        if self._ignore_label > self._num_classes:
            sem_t = np.where(sem_t == self._ignore_label, self._num_classes, sem_t)
            sem_p = np.where(sem_p == self._ignore_label, self._num_classes, sem_p)

        if sequence_id not in self._confusion:
            self._confusion[sequence_id] = np.zeros(
                (self._cm_size, self._cm_size), np.int64
            )
            self._pred_areas[sequence_id] = Counter()
            self._gt_areas[sequence_id] = Counter()
            self._intersections[sequence_id] = Counter()
            self._seq_len[sequence_id] = 0
        self._seq_len[sequence_id] += 1

        cm_keys = sem_t.ravel() * self._cm_size + sem_p.ravel()
        self._confusion[sequence_id] += np.bincount(
            cm_keys, minlength=self._cm_size * self._cm_size
        ).reshape(self._cm_size, self._cm_size)

        inst_t = y_true & self._bit_mask
        things = np.zeros(self._cm_size + 1, bool)
        for c in self._things_list:
            things[c] = True
        t_mask = things[np.minimum(sem_t, self._cm_size)]
        p_mask = things[np.minimum(sem_p, self._cm_size)]
        crowd = t_mask & (inst_t == 0)
        t_mask = t_mask & ~crowd
        p_mask = p_mask & ~crowd

        def _accum(counter: Counter, values: np.ndarray):
            u, c = np.unique(values, return_counts=True)
            counter.update(dict(zip(u.tolist(), c.tolist())))

        _accum(self._pred_areas[sequence_id], y_pred[p_mask])
        _accum(self._gt_areas[sequence_id], y_true[t_mask])
        both = t_mask & p_mask
        _accum(
            self._intersections[sequence_id],
            y_true[both] * self._offset + y_pred[both],
        )

    def result(self) -> Mapping[str, Any]:
        n_seq = len(self._gt_areas)
        aq_per_seq = np.zeros(n_seq)
        num_tubes = np.zeros(n_seq)
        iou_per_seq = np.zeros(n_seq)
        ids = list(self._gt_areas.keys())

        total_cm = np.zeros((self._cm_size, self._cm_size), np.int64)
        for i, sid in enumerate(ids):
            gt_areas = self._gt_areas[sid]
            pred_areas = self._pred_areas[sid]
            inter = self._intersections[sid]
            num_tubes[i] = len(gt_areas)
            outer = 0.0
            for key, tpa in inter.items():
                gt_id = key // self._offset
                pr_id = key % self._offset
                gt_size = gt_areas[gt_id]
                union = pred_areas[pr_id] + gt_size - tpa
                outer += (tpa * (tpa / union)) / gt_size
            aq_per_seq[i] = outer

            cm = self._confusion[sid].copy()
            removal = np.zeros_like(cm)
            removal[self._include, :] = 1
            cm *= removal
            total_cm += cm
            tp = cm.diagonal()
            unions = cm.sum(0) + cm.sum(1) - tp
            present = np.count_nonzero(unions)
            iou_per_seq[i] = np.sum(tp / np.maximum(unions, _EPS)) / present

        aq_mean = aq_per_seq.sum() / np.maximum(num_tubes.sum(), _EPS)
        aq_per_seq = aq_per_seq / np.maximum(num_tubes, _EPS)

        tp = total_cm.diagonal()
        unions = total_cm.sum(0) + total_cm.sum(1) - tp
        present = np.count_nonzero(unions)
        iou_mean = np.sum(tp / np.maximum(unions, _EPS)) / present

        return {
            "STQ": float(np.sqrt(aq_mean * iou_mean)),
            "AQ": float(aq_mean),
            "IoU": float(iou_mean),
            "STQ_per_seq": np.sqrt(aq_per_seq * iou_per_seq),
            "AQ_per_seq": aq_per_seq,
            "IoU_per_seq": iou_per_seq,
            "ID_per_seq": ids,
            "Length_per_seq": list(self._seq_len.values()),
        }


class DSTQuality(STQuality):
    """Depth-aware STQ: DSTQ = (STQ^2 * prod(inlier rates))^(1/(2+T))."""

    def __init__(
        self,
        num_classes: int,
        things_list: Sequence[int],
        ignore_label: int,
        label_bit_shift: int,
        offset: int,
        depth_threshold: tuple[float, ...] = (1.25, 1.1),
    ):
        super().__init__(num_classes, things_list, ignore_label, label_bit_shift, offset)
        if not depth_threshold:
            raise ValueError("depth_threshold must be non-empty")
        self._depth_threshold = tuple(depth_threshold)
        self._depth_total: "OrderedDict[Any, int]" = OrderedDict()
        self._depth_inliers: list[OrderedDict] = [
            OrderedDict() for _ in self._depth_threshold
        ]

    def update_state(
        self,
        y_true: np.ndarray,
        y_pred: np.ndarray,
        d_true: np.ndarray | None = None,
        d_pred: np.ndarray | None = None,
        sequence_id=0,
    ):
        super().update_state(y_true, y_pred, sequence_id)
        if d_true is None or d_pred is None:
            return
        valid = d_true > 0
        total = int(valid.sum())
        valid = valid & (d_pred > 0)
        dt, dp = d_true[valid].astype(np.float64), d_pred[valid].astype(np.float64)
        err = np.maximum(dp / dt, dt / dp)
        for i, thr in enumerate(self._depth_threshold):
            inl = self._depth_inliers[i]
            inl[sequence_id] = inl.get(sequence_id, 0) + int((err <= thr).sum())
        self._depth_total[sequence_id] = self._depth_total.get(sequence_id, 0) + total

    def result(self) -> Mapping[str, Any]:
        base = dict(super().result())
        t = len(self._depth_threshold)
        totals = np.array(list(self._depth_total.values()), np.float64)
        rates = []
        for i in range(t):
            inl = np.array(
                [self._depth_inliers[i].get(s, 0) for s in self._depth_total],
                np.float64,
            )
            rates.append(inl.sum() / np.maximum(totals.sum(), _EPS))
        dstq = (base["STQ"] ** 2 * np.prod(rates)) ** (1.0 / (2 + t))
        base["DSTQ"] = float(dstq)
        for thr, r in zip(self._depth_threshold, rates):
            base[f"DQ@{thr}"] = float(r)
        return base
