"""Polygon rasterization vs hand-traced cases + pycocotools oracle.

The rasterizer (data/polygon.py) must match pycocotools
``decode(merge(frPyObjects(...)))`` bit-for-bit — the reference's YT-VIS GT
path (/root/reference/external/ext/ytvos.py:266-270,
/root/reference/mmtrack/pipelines/loading.py:162).
"""

import json

import numpy as np
import pytest

from video_knet_tpu.data.polygon import polygons_to_mask
from video_knet_tpu.data.ytvis import YouTubeVISDataset


def test_axis_aligned_rectangle_hand_traced():
    # Rectangle (0,0)-(2,2): hand-traced through the COCO rleFrPoly algorithm
    # (5x upsample -> boundary crossings at pixel columns 0,1, rows [0,2)).
    m = polygons_to_mask([[0, 0, 2, 0, 2, 2, 0, 2]], 4, 4)
    exp = np.zeros((4, 4), np.uint8)
    exp[0:2, 0:2] = 1
    np.testing.assert_array_equal(m, exp)


def test_rectangle_interior_and_area():
    # Larger integer rectangle: fill is the half-open box [y0:y1, x0:x1].
    m = polygons_to_mask([[3, 2, 11, 2, 11, 9, 3, 9]], 16, 16)
    exp = np.zeros((16, 16), np.uint8)
    exp[2:9, 3:11] = 1
    np.testing.assert_array_equal(m, exp)


def test_triangle_properties():
    # Right triangle (0,0)-(10,0)-(0,10): area ~ shoelace/2, inside/outside.
    m = polygons_to_mask([[0, 0, 10, 0, 0, 10]], 12, 12)
    assert m[1, 1] == 1  # deep inside
    assert m[11, 11] == 0  # far outside
    assert abs(int(m.sum()) - 50) <= 10  # shoelace area 50 +- boundary band


def test_multi_part_union():
    a = polygons_to_mask([[0, 0, 3, 0, 3, 3, 0, 3]], 10, 10)
    b = polygons_to_mask([[5, 5, 9, 5, 9, 9, 5, 9]], 10, 10)
    u = polygons_to_mask(
        [[0, 0, 3, 0, 3, 3, 0, 3], [5, 5, 9, 5, 9, 9, 5, 9]], 10, 10
    )
    np.testing.assert_array_equal(u, a | b)


def test_degenerate_polygon_skipped():
    assert polygons_to_mask([[1, 1, 2, 2]], 8, 8).sum() == 0
    assert polygons_to_mask([], 8, 8).sum() == 0


def test_matches_pycocotools_oracle():
    mask_util = pytest.importorskip("pycocotools.mask")
    rng = np.random.RandomState(0)
    h, w = 37, 53
    for _ in range(20):
        n = int(rng.randint(3, 9))
        # random (possibly self-intersecting, fractional) polygon
        poly = (rng.rand(2 * n) * np.array([w, h] * n)).tolist()
        ours = polygons_to_mask([poly], h, w)
        rles = mask_util.frPyObjects([poly], h, w)
        ref = mask_util.decode(mask_util.merge(rles))
        np.testing.assert_array_equal(ours, ref)
    # multi-part objects
    for _ in range(5):
        polys = [
            (rng.rand(8) * np.array([w, h, w, h, w, h, w, h])).tolist()
            for _ in range(3)
        ]
        ours = polygons_to_mask(polys, h, w)
        ref = mask_util.decode(mask_util.merge(mask_util.frPyObjects(polys, h, w)))
        np.testing.assert_array_equal(ours, ref)


def test_ytvis_polygon_gt_rasterized(tmp_path):
    """clip_gt_arrays must rasterize polygon segmentations, not bbox-fill."""
    hw = (16, 20)
    # triangle strictly inside its bbox: a bbox fill would differ
    tri = [2.0, 2.0, 14.0, 2.0, 2.0, 12.0]
    images = [
        {"id": 1, "video_id": 1, "frame_id": 0, "height": hw[0], "width": hw[1],
         "file_name": "v1/f0.jpg"}
    ]
    annotations = [
        {"id": 1, "image_id": 1, "video_id": 1, "instance_id": 5,
         "category_id": 3, "segmentation": [tri], "bbox": [2, 2, 12, 10],
         "area": 60}
    ]
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 3, "name": "person"}],
        "videos": [{"id": 1}],
    }
    p = tmp_path / "ann.json"
    with open(p, "w") as f:
        json.dump(data, f)
    ds = YouTubeVISDataset(str(p))
    masks, labels, valid = ds.clip_gt_arrays(0, [0], max_insts=2)
    got = masks[0, 0]
    exp = polygons_to_mask([tri], *hw).astype(np.float32)
    np.testing.assert_array_equal(got, exp)
    # triangle, not a rectangle: bbox fill would have filled the full 10x12 box
    assert got.sum() < 10 * 12
    assert got[3, 3] == 1 and got[11, 13] == 0
