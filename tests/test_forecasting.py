"""Forecasting pipeline utilities: hand-computed oracle cases
(external/dataset/forecasting_pipelines/{loading,transforms}.py)."""

import numpy as np
import pytest

from video_knet_tpu.data.forecasting import (
    bitmasks_to_boxes,
    knet_ins_adapter,
    load_instance_annotations,
    normalize_multiple,
    pad_to,
)


def test_load_instance_annotations():
    inst = np.zeros((6, 8), np.int32)
    inst[:] = 7            # stuff id (< 10000)
    inst[1:3, 1:4] = 11001  # class 11, instance 1
    inst[4:6, 5:8] = 13002  # class 13, instance 2
    out = load_instance_annotations(inst, with_mask=True, with_inst=True)
    np.testing.assert_array_equal(out["gt_labels"], [11, 13])
    assert out["gt_masks"].shape == (2, 6, 8)
    assert out["gt_masks"][0].sum() == 6 and out["gt_masks"][1].sum() == 6
    # boxes keep the INCLUSIVE max index (loading.py:8-19)
    np.testing.assert_array_equal(out["gt_bboxes"][0], [1, 1, 3, 2])
    np.testing.assert_array_equal(out["gt_bboxes"][1], [5, 4, 7, 5])
    # gt_instance_map: stuff ids scaled by 1000, thing ids untouched
    assert out["gt_instance_map"][0, 0] == 7000
    assert out["gt_instance_map"][1, 1] == 11001


def test_load_instance_annotations_empty_returns_none():
    assert load_instance_annotations(np.zeros((4, 4), np.int32)) is None


def test_bitmasks_to_boxes_empty_mask():
    m = np.zeros((2, 4, 4), np.int64)
    m[0, 1, 2] = 1
    b = bitmasks_to_boxes(m)
    np.testing.assert_array_equal(b[0], [2, 1, 2, 1])
    np.testing.assert_array_equal(b[1], [0, 0, 0, 0])


def test_pad_to_divisor_and_values():
    img = np.ones((5, 7, 3), np.uint8)
    masks = np.ones((2, 5, 7), np.uint8)
    seg = np.ones((5, 7), np.uint8)
    out = pad_to(img, size_divisor=4, masks=masks, seg=seg)
    assert out["img"].shape == (8, 8, 3)
    assert out["pad_shape"] == (8, 8)
    assert out["img"][7, 7, 0] == 0          # img pads with 0
    assert out["masks"].shape == (2, 8, 8)
    assert out["masks"][0, 7, 7] == 0
    assert out["seg"][7, 7] == 255           # seg pads with 255


def test_pad_to_square_and_fixed():
    img = np.ones((5, 7, 3), np.uint8)
    out = pad_to(img, pad_to_square=True)
    assert out["img"].shape == (7, 7, 3)
    out = pad_to(img, size=(10, 10))
    assert out["img"].shape == (10, 10, 3)
    with pytest.raises(ValueError):
        pad_to(img)  # neither size nor divisor
    with pytest.raises(ValueError):
        pad_to(img, size=(8, 8), size_divisor=4)


def test_normalize_multiple_bgr_to_rgb():
    im = np.zeros((2, 2, 3), np.uint8)
    im[..., 0] = 10  # B
    im[..., 2] = 30  # R
    (out,) = normalize_multiple([im], mean=(0, 0, 0), std=(1, 1, 1),
                                to_rgb=True)
    assert out[0, 0, 0] == 30 and out[0, 0, 2] == 10


def test_knet_ins_adapter():
    np.testing.assert_array_equal(
        knet_ins_adapter(np.array([11, 13]), stuff_nums=11), [0, 2]
    )
