"""RLE codec round-trips (+ pycocotools oracle when available) and YT-VIS reader."""

import json

import numpy as np
import pytest

from video_knet_tpu.data.rle import (
    counts_to_string,
    decode_mask,
    encode_mask,
    mask_to_counts,
    rle_area,
    string_to_counts,
)
from video_knet_tpu.data.ytvis import (
    YouTubeVISDataset,
    format_vis_results,
    tracks_from_prediction,
)


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        m = (rng.rand(17, 23) > 0.6).astype(np.uint8)
        rle = encode_mask(m)
        np.testing.assert_array_equal(decode_mask(rle), m)
        assert rle_area(rle) == m.sum()


def test_rle_counts_edge_cases():
    assert mask_to_counts(np.zeros((3, 3), np.uint8)).tolist() == [9]
    assert mask_to_counts(np.ones((3, 3), np.uint8)).tolist() == [0, 9]
    s = counts_to_string(np.array([0, 9]))
    np.testing.assert_array_equal(string_to_counts(s), [0, 9])


def test_rle_matches_pycocotools():
    mask_util = pytest.importorskip("pycocotools.mask")
    rng = np.random.RandomState(1)
    for _ in range(5):
        m = (rng.rand(31, 19) > 0.5).astype(np.uint8)
        ours = encode_mask(m)
        ref = mask_util.encode(np.asfortranarray(m))
        assert ours["counts"] == ref["counts"].decode()
        assert ours["size"] == list(ref["size"])


def _fake_ytvis_json(path, n_videos=2, n_frames=4, hw=(16, 20)):
    images, annotations = [], []
    img_id, ann_id = 1, 1
    for v in range(1, n_videos + 1):
        for f in range(n_frames):
            images.append(
                {"id": img_id, "video_id": v, "frame_id": f,
                 "height": hw[0], "width": hw[1],
                 "file_name": f"v{v}/f{f}.jpg"}
            )
            m = np.zeros(hw, np.uint8)
            m[: hw[0] // 2, : hw[1] // 2] = 1
            annotations.append(
                {"id": ann_id, "image_id": img_id, "video_id": v,
                 "instance_id": v * 100, "category_id": 3,
                 "segmentation": encode_mask(m),
                 "bbox": [0, 0, hw[1] // 2, hw[0] // 2], "area": int(m.sum())}
            )
            img_id += 1
            ann_id += 1
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 3, "name": "person"}, {"id": 7, "name": "car"}],
        "videos": [{"id": v} for v in range(1, n_videos + 1)],
    }
    with open(path, "w") as f:
        json.dump(data, f)


def test_ytvis_reader_and_tubes(tmp_path):
    p = tmp_path / "ann.json"
    _fake_ytvis_json(p)
    ds = YouTubeVISDataset(str(p))
    assert len(ds) == 2
    rng = np.random.RandomState(0)
    idxs = ds.sample_clip(0, rng, num_frames=3, frame_range=(-2, 2))
    assert len(idxs) == 3
    masks, labels, valid = ds.clip_gt_arrays(0, idxs, max_insts=4)
    assert masks.shape == (4, 3, 16, 20)
    assert valid[0] and not valid[1]
    assert labels[0] == 0  # category 3 -> index 0
    assert masks[0].sum() > 0


def test_sample_clip_modes(tmp_path):
    p = tmp_path / "ann.json"
    _fake_ytvis_json(p, n_frames=9)
    ds = YouTubeVISDataset(str(p))
    rng = np.random.RandomState(3)
    for method in ("uniform", "bilateral_uniform"):
        for _ in range(20):
            idxs = ds.sample_clip(
                0, rng, num_frames=5, frame_range=(-4, 4), method=method
            )
            key, refs = idxs[0], idxs[1:]
            assert len(idxs) == 5
            assert all(abs(r - key) <= 4 for r in refs)
            # key never re-drawn as a ref unless used as static-shape padding
            non_pad = [r for r in refs if r != key]
            assert len(non_pad) == len(set(non_pad))  # no replacement
            if method == "bilateral_uniform" and 0 < key < 8:
                assert any(r < key for r in refs) and any(r > key for r in refs)


def test_format_results(tmp_path):
    masks = np.zeros((2, 3, 8, 8), np.float32)
    masks[:, 0, :4, :4] = 5.0  # logit > 0
    tracks = tracks_from_prediction(
        7, masks, np.array([1, 0, 0]), np.array([0.9, 0.1, 0.05]), cat_ids=[3, 7],
        score_thr=0.08,
    )
    assert len(tracks) == 2  # third filtered by score
    assert tracks[0]["category_id"] == 7
    assert tracks[0]["segmentations"][0] is not None
    assert tracks[1]["segmentations"][0] is None  # empty mask -> None
    path = format_vis_results([tracks], str(tmp_path / "out"))
    results = json.load(open(path))
    assert len(results) == 2
    assert {r["video_id"] for r in results} == {7}
