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
    loader = VISTrainLoader(ds, cfg, batch_size=2, canvas_hw=(32, 48),
                            short_sides=(16, 24))
    clip, gt = next(iter(loader))
    assert clip.shape == (2, 2, 32, 48, 3)
    assert gt.masks.shape == (2, 4, 2, 8, 12)
    assert bool(gt.valid[:, 0].all())
    assert float(gt.masks[:, 0].sum()) > 0


def test_vis_loader_thread_invariance_and_sharding(tmp_path):
    """Batches must be bit-identical across thread counts, and process ranks
    must take disjoint strided batch slices (VERDICT r2 item 5 — VPS-loader
    parity for the VIS pipeline)."""
    from tests.test_rle_ytvis import _fake_ytvis_json
    from video_knet_tpu.config_vis import VISConfig
    from video_knet_tpu.data.ytvis import YouTubeVISDataset
    from video_knet_tpu.data.vis_loader import VISTrainLoader

    p = tmp_path / "ann.json"
    _fake_ytvis_json(p, n_videos=4, n_frames=4, hw=(16, 20))
    for v in (1, 2, 3, 4):
        (tmp_path / f"v{v}").mkdir(exist_ok=True)
        for f in range(4):
            Image.fromarray(
                np.random.RandomState(v * 10 + f)
                .randint(0, 255, (16, 20, 3))
                .astype(np.uint8)
            ).save(tmp_path / f"v{v}" / f"f{f}.jpg.png")
    ds = YouTubeVISDataset(str(p), img_root=str(tmp_path))
    for video in ds.videos:
        for im in video.frames:
            im["file_name"] = im["file_name"] + ".png"
    cfg = VISConfig(num_frames=2, max_insts=4, mask_assign_stride=4)

    def collect(num_threads, pi=0, pc=1):
        loader = VISTrainLoader(
            ds, cfg, batch_size=1, canvas_hw=(32, 48), short_sides=(16, 24),
            seed=3, num_threads=num_threads,
            process_index=pi, process_count=pc,
        )
        return [(np.asarray(c), np.asarray(g.masks)) for c, g in loader]

    a = collect(1)
    b = collect(4)
    assert len(a) == len(b) == 4
    for (ca, ma), (cb, mb) in zip(a, b):
        np.testing.assert_array_equal(ca, cb)
        np.testing.assert_array_equal(ma, mb)
    # rank sharding: rank r of 2 sees batches r, r+2 of the same sequence
    r0 = collect(2, pi=0, pc=2)
    r1 = collect(2, pi=1, pc=2)
    assert len(r0) == len(r1) == 2
    np.testing.assert_array_equal(r0[0][0], a[0][0])
    np.testing.assert_array_equal(r1[0][0], a[1][0])
    np.testing.assert_array_equal(r0[1][0], a[2][0])


def test_vis_multiscale_draw_mmcv_semantics(tmp_path):
    """The short-side draw must follow mmcv Resize(img_scale=(s, 1e6),
    keep_ratio=True) semantics: content short side == drawn s, aspect kept
    (youtubevis_2019.py SeqResize multiscale_mode='value')."""
    from video_knet_tpu.data.transforms import _resolve_geometry
    from video_knet_tpu.data.vis_loader import (
        YTVIS_SHORT_SIDES,
        sample_vis_transform_params,
    )

    seen = set()
    for seed in range(100):
        rng = np.random.RandomState(seed)
        p = sample_vis_transform_params(rng)
        s = p.img_scale[0]
        seen.add(s)
        assert s in YTVIS_SHORT_SIDES
        # landscape 720x1280 input: short side (height) becomes exactly s
        (rh, rw), _ = _resolve_geometry((720, 1280), (512, 928), p)
        assert rh == s
        assert abs(rw / rh - 1280 / 720) < 0.01
    assert seen == set(YTVIS_SHORT_SIDES)  # every scale is drawn


def _mini_vis_ds(tmp_path, n_frames=10):
    import json

    from video_knet_tpu.data.ytvis import YouTubeVISDataset

    data = {
        "categories": [{"id": 1, "name": "a"}],
        "videos": [{"id": 1}],
        "images": [
            {"id": 100 + i, "video_id": 1, "frame_id": i, "height": 8,
             "width": 8, "file_name": f"f{i}.png"}
            for i in range(n_frames)
        ],
        "annotations": [],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(data))
    return YouTubeVISDataset(str(p))


def test_sample_clip_no_key_padding_when_neighbors_exist(tmp_path):
    """Clip sampling must not duplicate the key frame when real in-window
    neighbor frames exist (VERDICT r2 item 7; coco_video_dataset.py:105-230)."""
    import numpy as np

    ds = _mini_vis_ds(tmp_path, n_frames=10)
    for method in ("uniform", "bilateral_uniform"):
        for seed in range(60):
            rng = np.random.RandomState(seed)
            idxs = ds.sample_clip(0, rng, num_frames=5, frame_range=(-2, 2),
                                  method=method)
            key, refs = idxs[0], idxs[1:]
            assert len(idxs) == 5
            assert all(abs(r - key) <= 2 for r in refs)
            # key never repeats among refs while the window has non-key frames
            assert key not in refs, (method, seed, idxs)


def test_sample_clip_boundary_fills_from_long_side(tmp_path):
    """Key at frame 0: the left side is empty, all 4 refs must come from the
    right side (reference takes min(2, side) per side and returns short; we
    refill from the long side + nearest-frame padding instead)."""
    import numpy as np

    ds = _mini_vis_ds(tmp_path, n_frames=10)
    hits = set()

    # force key=0 by overriding the key-frame randint draw
    class FixedRng(np.random.RandomState):
        def randint(self, lo, hi=None, **kw):
            return 0
    for seed in range(20):
        rng = FixedRng(seed)
        idxs = ds.sample_clip(0, rng, num_frames=5, frame_range=(-2, 2),
                              method="bilateral_uniform")
        refs = idxs[1:]
        assert all(1 <= r <= 2 for r in refs), idxs
        hits.update(refs)
        # window = {1, 2}: 4 refs from 2 frames -> duplicates expected, no key
        assert 0 not in refs
    assert hits == {1, 2}


def test_sample_clip_short_and_single_frame_video(tmp_path):
    import numpy as np

    ds3 = _mini_vis_ds(tmp_path, n_frames=3)
    for seed in range(30):
        idxs = ds3.sample_clip(0, np.random.RandomState(seed), num_frames=5,
                               frame_range=(-2, 2), method="bilateral_uniform")
        key, refs = idxs[0], idxs[1:]
        assert key not in refs  # 2 non-key frames exist -> pad from them
        assert len(refs) == 4
    ds1 = _mini_vis_ds(tmp_path, n_frames=1)
    idxs = ds1.sample_clip(0, np.random.RandomState(0), num_frames=5,
                           frame_range=(-2, 2))
    assert idxs == [0, 0, 0, 0, 0]  # only here may the key repeat
