"""Data layer tests: PNG codecs, dataset scan/pairing, transforms, GT packing."""

import numpy as np
import pytest
from PIL import Image

from video_knet_tpu.config import VideoKNetConfig
from video_knet_tpu.data.datasets import KittiStepDVPS
from video_knet_tpu.data.loader import VPSTrainLoader
from video_knet_tpu.data.panoptic_png import (
    decode_divisor_panoptic,
    decode_kitti_panoptic,
    encode_two_channel_vps,
)
from video_knet_tpu.data.transforms import (
    SeqTransformParams,
    apply_image_transform,
    apply_mask_transform,
    bilinear_resize,
    pack_panoptic_gt,
)


def test_kitti_png_roundtrip():
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[..., 0] = 13
    rgb[..., 1] = 2
    rgb[..., 2] = 7
    sem, inst = decode_kitti_panoptic(rgb)
    assert (sem == 13).all() and (inst == 2 * 256 + 7).all()


def test_divisor_png():
    ids = np.array([[5, 58012]])
    sem, inst = decode_divisor_panoptic(ids, promote_bare_semantic=True)
    assert sem[0, 0] == 5 and inst[0, 0] == 0
    assert sem[0, 1] == 58 and inst[0, 1] == 12


def test_two_channel_encode():
    sem = np.array([[3]], np.int32)
    track = np.array([[260]], np.int32)
    enc = encode_two_channel_vps(sem, track)
    assert enc[0, 0, 0] == 3 and enc[0, 0, 1] == 4 and enc[0, 0, 2] == 1


def test_bilinear_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.rand(8, 12).astype(np.float32)
    ours = bilinear_resize(x, (4, 6))
    ref = F.interpolate(
        torch.from_numpy(x)[None, None], (4, 6), mode="bilinear", align_corners=False
    )[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _write_fake_kitti(root, n_seqs=2, n_frames=4, hw=(64, 96)):
    d = root / "video_sequence" / "train"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for s in range(n_seqs):
        for f in range(n_frames):
            img = rng.randint(0, 255, (*hw, 3), np.uint8)
            Image.fromarray(img).save(d / f"{s:06d}_{f:06d}_leftImg8bit.png")
            pan = np.zeros((*hw, 3), np.uint8)
            pan[..., 0] = 10  # stuff class 10
            pan[: hw[0] // 2, :, 0] = 11  # person
            pan[: hw[0] // 2, :, 2] = 1  # instance 1
            Image.fromarray(pan).save(d / f"{s:06d}_{f:06d}_panoptic.png")
    return root


def test_kitti_scan_and_pairs(tmp_path):
    _write_fake_kitti(tmp_path)
    ds = KittiStepDVPS(str(tmp_path), split="train", ref_seq_index=[-2, -1, 1, 2])
    assert len(ds.frames) == 8
    assert len(ds) == 8  # every frame has at least one in-range ref
    key, ref = ds.get_pair(0)
    assert key.seq_id == ref.seq_id and key.img_id != ref.img_id
    firsts = [f for _, f in ds.iter_test()]
    assert sum(firsts) == 2  # one reset per sequence


def test_pack_panoptic_gt():
    sem = np.full((16, 16), 0, np.int32)
    sem[:8] = 11  # person rows
    inst = np.zeros((16, 16), np.int32)
    inst[:8] = 5
    gt = pack_panoptic_gt(
        sem, inst, thing_ids_in_seg=(11, 13), num_stuff_classes=17,
        max_insts=4, assign_stride=2,
    )
    assert gt.masks.shape == (4, 8, 8)
    assert gt.valid[0] and not gt.valid[1]
    assert gt.labels[0] == 0  # person -> thing 0
    assert gt.masks[0, :4].sum() == pytest.approx(4 * 8)  # top half
    # stuff: semantic class 0 = road -> slot 0
    assert gt.sem_valid[0] and gt.sem_masks[0, 5:].sum() > 0
    assert not gt.sem_valid[1]


def test_transform_fixed_shape():
    p = SeqTransformParams(scale=1.3, flip=True, crop_y=0.5, crop_x=0.5)
    img = np.random.RandomState(0).randint(0, 255, (60, 90, 3), np.uint8)
    out = apply_image_transform(img, p, (64, 96))
    assert out.shape == (64, 96, 3)
    lab = apply_mask_transform(np.zeros((60, 90), np.int32), p, (64, 96))
    assert lab.shape == (64, 96)
    # downscale: resized image smaller than the crop -> visible ignore padding
    p2 = SeqTransformParams(scale=0.5, flip=False, crop_y=0.0, crop_x=0.0)
    lab2 = apply_mask_transform(np.zeros((60, 90), np.int32), p2, (64, 96))
    assert lab2.shape == (64, 96)
    assert (lab2 == 255).any()


def test_loader_end_to_end(tmp_path):
    _write_fake_kitti(tmp_path)
    cfg = VideoKNetConfig(max_insts=4)
    ds = KittiStepDVPS(str(tmp_path), split="train", ref_seq_index=[-1, 1])
    loader = VPSTrainLoader(ds, cfg, batch_size=2, crop_hw=(64, 96), prefetch=1)
    batch = next(iter(loader))
    assert batch.img.shape == (2, 64, 96, 3)
    assert batch.ref_img.shape == (2, 64, 96, 3)
    assert batch.gt.masks.shape == (2, 4, 32, 48)
    assert batch.gt.sem_masks.shape == (2, 17, 32, 48)
    assert bool(batch.gt.valid[:, 0].all())


def _batches(loader):
    return [
        (np.asarray(b.img), np.asarray(b.ref_img), np.asarray(b.gt.masks))
        for b in loader
    ]


def test_loader_thread_count_deterministic(tmp_path):
    """4 decode threads must produce bit-identical batches to 1 thread."""
    _write_fake_kitti(tmp_path, n_seqs=2, n_frames=4)
    cfg = VideoKNetConfig(max_insts=4)
    ds = KittiStepDVPS(str(tmp_path), split="train", ref_seq_index=[-1, 1])
    mk = lambda nt: VPSTrainLoader(
        ds, cfg, batch_size=2, crop_hw=(64, 96), seed=7, num_threads=nt,
        process_index=0, process_count=1,
    )
    a, b = _batches(mk(1)), _batches(mk(4))
    assert len(a) == len(b) > 1
    for (i1, r1, m1), (i2, r2, m2) in zip(a, b):
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(m1, m2)


def test_loader_rank_sharding(tmp_path):
    """Two ranks partition the single-process batch stream (strided, disjoint)
    — the reference DistributedSampler semantics (external/train.py:41-50)."""
    _write_fake_kitti(tmp_path, n_seqs=2, n_frames=4)
    cfg = VideoKNetConfig(max_insts=4)
    ds = KittiStepDVPS(str(tmp_path), split="train", ref_seq_index=[-1, 1])
    mk = lambda r, w: VPSTrainLoader(
        ds, cfg, batch_size=2, crop_hw=(64, 96), seed=7,
        process_index=r, process_count=w,
    )
    full = _batches(mk(0, 1))
    r0, r1 = _batches(mk(0, 2)), _batches(mk(1, 2))
    assert len(r0) + len(r1) == len(full)
    for k, (i, _, _) in enumerate(r0):
        np.testing.assert_array_equal(i, full[2 * k][0])
    for k, (i, _, _) in enumerate(r1):
        np.testing.assert_array_equal(i, full[2 * k + 1][0])


def test_loader_abandoned_iteration_stops_producer(tmp_path):
    """Breaking out of a loader loop must shut the producer thread down —
    leaked producers (blocked forever on q.put) used to pile up across the
    suite and destabilize the process."""
    import threading
    import time

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.data.datasets import KittiStepDVPS
    from video_knet_tpu.data.loader import VPSTrainLoader

    _write_fake_kitti(tmp_path, n_seqs=2, n_frames=6)
    cfg = VideoKNetConfig(max_insts=4)
    ds = KittiStepDVPS(str(tmp_path), split="train")
    loader = VPSTrainLoader(ds, cfg, batch_size=1, crop_hw=(64, 96), seed=0,
                            num_threads=2, process_index=0, process_count=1,
                            prefetch=1)

    def alive():
        return [t for t in threading.enumerate()
                if t.name.startswith("vps-loader-producer")]

    for _ in range(3):
        for batch in loader:
            break  # abandon mid-epoch (plenty of batches left)
    deadline = time.time() + 15
    while alive() and time.time() < deadline:
        time.sleep(0.1)
    assert not alive(), f"leaked producer threads: {alive()}"
