"""COCO-panoptic / Cityscapes-VPS readers and the VIS clip train loader."""

import json

import numpy as np
import pytest
from PIL import Image

from video_knet_tpu.data.coco_panoptic import (
    CityscapesVPSDataset,
    CocoPanopticDataset,
    id2rgb,
    rgb2id,
)


def test_rgb2id_roundtrip():
    ids = np.array([[0, 255, 70000]], np.int64)
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


def _write_coco_panoptic(root, file_names, hw=(16, 20)):
    (root / "imgs").mkdir()
    (root / "pan").mkdir()
    images, annotations = [], []
    for i, name in enumerate(file_names):
        img = np.zeros((*hw, 3), np.uint8)
        Image.fromarray(img).save(root / "imgs" / name)
        seg = np.zeros(hw, np.int64)
        seg[:8] = 1  # segment 1: thing (cat 100)
        seg[8:] = 2  # segment 2: stuff (cat 200)
        Image.fromarray(id2rgb(seg)).save(root / "pan" / name)
        images.append({"id": i + 1, "file_name": name, "height": hw[0], "width": hw[1]})
        annotations.append(
            {
                "image_id": i + 1,
                "file_name": name,
                "segments_info": [
                    {"id": 1, "category_id": 100, "iscrowd": 0},
                    {"id": 2, "category_id": 200, "iscrowd": 0},
                ],
            }
        )
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 100, "name": "car", "isthing": 1},
            {"id": 200, "name": "sky", "isthing": 0},
        ],
    }
    p = root / "panoptic.json"
    with open(p, "w") as f:
        json.dump(ann, f)
    return p


def test_coco_panoptic_reader(tmp_path):
    names = ["a.png", "b.png"]
    ann = _write_coco_panoptic(tmp_path, names)
    ds = CocoPanopticDataset(str(ann), str(tmp_path / "imgs"), str(tmp_path / "pan"))
    assert len(ds) == 2
    assert ds.num_thing_classes == 1 and ds.num_stuff_classes == 1
    sem, inst = ds.load_sem_inst(0)
    assert (sem[:8] == 0).all() and (sem[8:] == 1).all()
    assert (inst[:8] == 1).all() and (inst[8:] == 0).all()


def test_cityscapes_vps_pairs(tmp_path):
    names = [f"{c:04d}_{f:05d}_x.png" for c in range(2) for f in range(3)]
    ann = _write_coco_panoptic(tmp_path, names)
    ds = CityscapesVPSDataset(
        str(ann), str(tmp_path / "imgs"), str(tmp_path / "pan"), ref_range=(-1, 1)
    )
    assert len(ds.keys) == 6
    key, ref = ds.get_pair(0)
    kb = ds.samples[key].img
    rb = ds.samples[ref].img
    assert kb.split("/")[-1].split("_")[0] == rb.split("/")[-1].split("_")[0]
    assert kb != rb


def test_vis_train_loader(tmp_path):
    from tests.test_rle_ytvis import _fake_ytvis_json
    from video_knet_tpu.config_vis import VISConfig
    from video_knet_tpu.data.ytvis import YouTubeVISDataset
    from video_knet_tpu.data.vis_loader import VISTrainLoader

    p = tmp_path / "ann.json"
    _fake_ytvis_json(p, n_videos=2, n_frames=4, hw=(16, 20))
    # image files for the fake json
    for v in (1, 2):
        (tmp_path / f"v{v}").mkdir()
        for f in range(4):
            Image.fromarray(np.zeros((16, 20, 3), np.uint8)).save(
                tmp_path / f"v{v}" / f"f{f}.jpg.png"
            )
    ds = YouTubeVISDataset(str(p), img_root=str(tmp_path))
    # patch file names to the .png files we just wrote
    for video in ds.videos:
        for im in video.frames:
            im["file_name"] = im["file_name"] + ".png"
    cfg = VISConfig(num_frames=2, max_insts=4, mask_assign_stride=4)
    loader = VISTrainLoader(ds, cfg, batch_size=2, crop_hw=(32, 48))
    clip, gt = next(iter(loader))
    assert clip.shape == (2, 2, 32, 48, 3)
    assert gt.masks.shape == (2, 4, 2, 8, 12)
    assert bool(gt.valid[:, 0].all())
    assert float(gt.masks[:, 0].sum()) > 0
