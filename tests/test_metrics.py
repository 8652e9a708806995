"""Tests for VPQ / STQ / DSTQ / mIoU, including an oracle check against the
reference's vendored deeplab2 STQ implementation when /root/reference exists."""

import importlib.util
import os

import numpy as np
import pytest

from video_knet_tpu.eval.miou import ConfusionMeter, video_consistency
from video_knet_tpu.eval.stq import DSTQuality, STQuality
from video_knet_tpu.eval.vpq import MAX_INS, VPQStats, vpq_from_stats, vpq_stats, window_vpq


def _pan(cat, ins):
    return cat * MAX_INS + ins


def test_vpq_perfect_match():
    gt = np.full((8, 8), _pan(3, 1), np.int64)
    stats = vpq_stats(gt, gt, num_cat=5)
    assert stats.tp[3] == 1 and stats.iou[3] == 1.0
    assert stats.fn.sum() == 0 and stats.fp.sum() == 0


def test_vpq_iou_threshold():
    gt = np.zeros((10, 10), np.int64) + _pan(1, 1)
    pred = np.zeros((10, 10), np.int64) + _pan(1, 1)
    pred[:, :6] = _pan(1, 2)  # 40-pixel overlap with the gt's 100 => iou .4 for id1
    stats = vpq_stats(pred, gt, num_cat=3)
    # neither pred id reaches iou > 0.5 (40/100 and 60/100 > 0.5 actually)
    # id2 covers 60 pixels: iou = 60/100 = 0.6 -> TP; id1: 40/100 -> FP
    assert stats.tp[1] == 1
    assert stats.fp[1] == 1
    assert stats.fn[1] == 0


def test_vpq_void_discount():
    # prediction overlapping void gt: void overlap removed from union
    gt = np.full((10, 10), 255 * MAX_INS, np.int64)  # all void
    gt[:5] = _pan(2, 1)
    pred = np.full((10, 10), _pan(2, 1), np.int64)
    stats = vpq_stats(pred, gt, num_cat=5)
    # union = 50 (gt) + 100 (pred) - 50 (inter) - 50 (void overlap) = 50; iou = 1.0
    assert stats.tp[2] == 1 and stats.iou[2] == pytest.approx(1.0)


def test_vpq_ignored_pred_not_fp():
    gt = np.full((10, 10), 255 * MAX_INS, np.int64)
    pred = np.full((10, 10), _pan(1, 7), np.int64)
    stats = vpq_stats(pred, gt, num_cat=3)
    assert stats.fp.sum() == 0  # fully inside ignore region


def test_window_vpq_concat():
    cat = np.ones((4, 4), np.int64)
    ins = np.ones((4, 4), np.int64)
    gt = _pan(cat, ins)
    stats = window_vpq([cat, cat], [ins, ins], [gt, gt], eval_frames=2, num_cat=3)
    assert stats.tp[1] == 1  # one window, one tube
    res = vpq_from_stats(stats, num_classes=2)
    assert res["PQ"] > 0


def _encode(sem, ins, shift=16):
    return (sem.astype(np.int64) << shift) + ins.astype(np.int64)


def test_stq_perfect():
    stq = STQuality(num_classes=3, things_list=[1], ignore_label=255,
                    label_bit_shift=16, offset=2**24)
    sem = np.zeros((8, 8), np.int64)
    sem[:4] = 1
    ins = np.zeros((8, 8), np.int64)
    ins[:4] = 5
    y = _encode(sem, ins)
    stq.update_state(y, y, 0)
    stq.update_state(y, y, 0)
    r = stq.result()
    assert r["AQ"] == pytest.approx(1.0)
    assert r["IoU"] == pytest.approx(1.0)
    assert r["STQ"] == pytest.approx(1.0)


def test_stq_id_switch_halves_aq():
    stq = STQuality(num_classes=2, things_list=[1], ignore_label=255,
                    label_bit_shift=16, offset=2**24)
    sem = np.ones((4, 4), np.int64)
    gt = _encode(sem, np.full((4, 4), 3))
    pred1 = _encode(sem, np.full((4, 4), 8))
    pred2 = _encode(sem, np.full((4, 4), 9))  # id switch in frame 2
    stq.update_state(gt, pred1, 0)
    stq.update_state(gt, pred2, 0)
    r = stq.result()
    # tube: gt 32 px; two preds of 16 each with iou 16/32 -> AQ = (16*.5+16*.5)/32
    assert r["AQ"] == pytest.approx(0.5)
    assert r["IoU"] == pytest.approx(1.0)
    assert r["STQ"] == pytest.approx(np.sqrt(0.5))


def test_dstq_depth():
    d = DSTQuality(num_classes=2, things_list=[1], ignore_label=255,
                   label_bit_shift=16, offset=2**24, depth_threshold=(1.25, 1.1))
    sem = np.ones((4, 4), np.int64)
    y = _encode(sem, np.full((4, 4), 1))
    depth_gt = np.full((4, 4), 10.0)
    d.update_state(y, y, depth_gt, depth_gt * 1.2, 0)  # inlier at 1.25, not 1.1
    r = d.result()
    assert r["DQ@1.25"] == pytest.approx(1.0)
    assert r["DQ@1.1"] == pytest.approx(0.0)
    assert r["DSTQ"] == pytest.approx((1.0 * 1.0 * 0.0) ** (1 / 4))


REF_STQ = "/root/reference/tools/utils/STQ.py"


@pytest.mark.skipif(not os.path.exists(REF_STQ), reason="reference not mounted")
def test_stq_matches_reference_oracle():
    spec = importlib.util.spec_from_file_location("ref_stq", REF_STQ)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    rng = np.random.RandomState(0)
    ours = STQuality(num_classes=5, things_list=[1, 3], ignore_label=255,
                     label_bit_shift=16, offset=2**24)
    ref = ref_mod.STQuality(num_classes=5, things_list=[1, 3], ignore_label=255,
                            label_bit_shift=16, offset=2**24)
    for seq in range(2):
        for _ in range(3):
            sem_t = rng.randint(0, 5, (16, 16))
            sem_t[0, :4] = 255
            ins_t = rng.randint(0, 4, (16, 16))
            sem_p = rng.randint(0, 5, (16, 16))
            ins_p = rng.randint(0, 4, (16, 16))
            y_t = _encode(sem_t, ins_t)
            y_p = _encode(sem_p, ins_p)
            ours.update_state(y_t, y_p, seq)
            ref.update_state(y_t, y_p, seq)
    r_ours, r_ref = ours.result(), ref.result()
    for k in ("STQ", "AQ", "IoU"):
        assert r_ours[k] == pytest.approx(r_ref[k], abs=1e-12), k
    np.testing.assert_allclose(r_ours["STQ_per_seq"], r_ref["STQ_per_seq"])


def test_miou():
    m = ConfusionMeter(num_classes=3, ignore_label=255)
    gt = np.array([[0, 1, 2, 255]])
    pred = np.array([[0, 1, 1, 2]])
    m.update(pred, gt)
    r = m.result()
    # class0 iou 1, class1 iou 1/2 (fp into class1), class2 iou 0
    assert r["mIoU"] == pytest.approx((1.0 + 0.5 + 0.0) / 3)


def test_video_consistency():
    gt = [np.ones((4, 4), np.int64)] * 3
    pred = [np.ones((4, 4), np.int64), np.ones((4, 4), np.int64), np.zeros((4, 4), np.int64)]
    assert video_consistency(pred, gt, window=2) == pytest.approx(0.5)
    assert video_consistency(pred, gt, window=3) == pytest.approx(0.0)
