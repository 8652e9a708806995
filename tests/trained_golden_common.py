"""Shared pieces of the TRAINED-weights serving golden (VERDICT r04 item 6).

The random-init serving golden (test_serving_golden.py) freezes plumbing
bit-identity but has to zero every score gate to see any instances at all, so
the decode paths release weights actually exercise — realistic score
distributions crossing the real thresholds (tracker init_score_thr=0.35 /
obj_score_thr=0.3 / match_score_thr=0.5, joint_train.py:62-75; decode
instance_score_thr=0.25), memo expiry after memo_tracklet_frames absent
frames (quasi_dense_embed_tracker.py:47-102), late track spawning — were
only guarded statistically. This module defines the tiny TRAINABLE config, a
12-frame synthetic sequence whose instance lifecycle forces those paths, and
the committed-fp16 weight (de)serialization used by both the regeneration
script (scripts/gen_serving_golden_trained.py) and the regression test
(tests/test_serving_golden_trained.py).

Why a committed checkpoint instead of training inside the test: goldens must
be bit-stable across machines, and 1k train steps amplify any cross-host
float difference into macroscopic weight divergence; a committed fp16
checkpoint (~13 MB for the 6.9 M-param tiny config) keeps the frozen model
identical everywhere while a single forward pass stays bit-reproducible.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

HW = (64, 96)
N_FRAMES = 12
WEIGHTS = os.path.join(os.path.dirname(__file__), "golden",
                       "serving_trained_tiny_fp16.npz")

# instance script (frame ranges, inclusive): A persists the whole sequence
# (long-lived track, >=8-frame identity carry at the RELEASE match threshold);
# B exists only on frames 0-5, so by the last frame it has been absent for
# longer than memo_tracklet_frames=5 and its tracklet EXPIRES from the memo;
# C (a different thing class) first appears on frame 8, so a brand-new id must
# cross init_score_thr mid-sequence.
A_FRAMES = (0, N_FRAMES - 1)
B_FRAMES = (0, 5)
C_FRAMES = (8, N_FRAMES - 1)


def write_sequence(root):
    """KITTI-STEP-layout synthetic sequence implementing the script above."""
    from PIL import Image

    d = root / "video_sequence" / "train"
    d.mkdir(parents=True, exist_ok=True)
    h, w = HW
    bh, bw = 24, 28
    for f in range(N_FRAMES):
        img = np.full((*HW, 3), 90, np.uint8)
        pan = np.zeros((*HW, 3), np.uint8)  # road (class 0) everywhere
        blobs = []
        # A: person, top row, left -> right
        xa = 2 + int((w - bw - 4) * f / (N_FRAMES - 1))
        blobs.append((2, xa, 11, 1, (200, 40, 40)))
        if B_FRAMES[0] <= f <= B_FRAMES[1]:
            # B: person, bottom row, right -> left (same class as A: class
            # gating cannot separate them; appearance must)
            xb = (w - bw - 2) - int((w - bw - 4) * f / (N_FRAMES - 1))
            blobs.append((36, xb, 11, 2, (40, 160, 220)))
        if C_FRAMES[0] <= f <= C_FRAMES[1]:
            # C: car, bottom row (B is long gone), slight motion
            xc = 20 + 3 * (f - C_FRAMES[0])
            blobs.append((36, xc, 13, 3, (230, 210, 60)))
        for y0, x0, cls, inst, color in blobs:
            img[y0:y0 + bh, x0:x0 + bw] = color
            pan[y0:y0 + bh, x0:x0 + bw, 0] = cls
            pan[y0:y0 + bh, x0:x0 + bw, 2] = inst
        Image.fromarray(img).save(d / f"000000_{f:06d}_leftImg8bit.png")
        Image.fromarray(pan).save(d / f"000000_{f:06d}_panoptic.png")
    return root


def tiny_cfg():
    """6.9 M-param VideoKNet: MiT-b0 backbone (no BN, no dropout — fully
    deterministic), 64-channel heads, 20 proposals. Release THRESHOLDS are
    the point, so TestCfg/TrackerConfig stay at their defaults (only
    max_per_img shrinks to the proposal count)."""
    import dataclasses

    from video_knet_tpu.config import (
        ConvKernelHeadConfig,
        KernelUpdateHeadConfig,
        KernelUpdatorConfig,
        TestCfg,
        TrackHeadConfig,
        VideoKNetConfig,
    )

    upd = KernelUpdatorConfig(in_channels=64, feat_channels=64,
                              out_channels=64)
    # video-config structural fields (VideoKNetConfig's custom defaults) must
    # survive the width shrink: mask_upsample_stride=4 pairs with
    # mask_assign_stride=2, feat_downsample_stride=4 with the stride-8 maps
    head = KernelUpdateHeadConfig(in_channels=64, out_channels=64,
                                  feedforward_channels=256, updator=upd,
                                  mask_upsample_stride=4)
    rpn = ConvKernelHeadConfig(num_proposals=20, in_channels=64,
                               out_channels=64, fpn_feat_channels=64,
                               feat_downsample_stride=4,
                               seg_use_sigmoid=False, loss_rank_weight=0.1)
    trk = TrackHeadConfig(in_channels=64, fc_out_channels=64,
                          embed_channels=64)
    return VideoKNetConfig(
        max_insts=4, num_proposals=20, backbone="mit_b0",
        link_previous=True, rpn=rpn, head=head, track=trk,
        test=TestCfg(max_per_img=20),
    )


def eval_frames(root):
    """Normalized full-sequence frames, ordered, as the online pipeline eats
    them (matches the train loader's normalization)."""
    from video_knet_tpu.data.datasets import KittiStepDVPS
    from video_knet_tpu.data.panoptic_png import load_png
    from video_knet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    ds = KittiStepDVPS(str(root), split="train", ref_seq_index=[-1, 1])
    samples = [s for s, _ in ds.iter_test()]
    return [
        jnp.asarray(
            (load_png(s.img).astype(np.float32) - IMAGENET_MEAN)
            / IMAGENET_STD
        )[None]
        for s in samples
    ]


def save_weights(variables, path=WEIGHTS):
    """Flatten the variables pytree; float leaves stored fp16 (half the
    bytes; the reload-then-freeze flow makes the rounding part of the frozen
    model, not an approximation of it)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, variables), sep="/"
    )
    out = {}
    for k, v in flat.items():
        out[k] = v.astype(np.float16) if v.dtype == np.float32 else v
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)


def load_weights(path=WEIGHTS):
    """Inverse of save_weights: fp16 -> fp32, unflatten to the variables
    pytree. Raises with regeneration instructions when the asset is gone."""
    from flax import traverse_util

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing — regenerate with "
            "`python scripts/gen_serving_golden_trained.py` and commit it"
        )
    z = np.load(path)
    flat = {}
    for k in z.files:
        v = z[k]
        flat[k] = jnp.asarray(
            v.astype(np.float32) if v.dtype == np.float16 else v
        )
    return traverse_util.unflatten_dict(flat, sep="/")


def run_pipeline(variables, frames, tracker_type="quasi_dense"):
    """Online serving at RELEASE thresholds over the committed weights."""
    from video_knet_tpu.models.video.inference import VPSInferencePipeline
    from video_knet_tpu.models.video.knet_vps import VideoKNet

    cfg = tiny_cfg()
    model = VideoKNet(cfg, train=False)
    pipe = VPSInferencePipeline(model, variables, cfg, out_hw=HW,
                                tracker_type=tracker_type)
    return [pipe.run_frame(f, is_first=(t == 0))
            for t, f in enumerate(frames)]


def flatten_results(results) -> dict:
    """Golden surface: per-frame panoptic/semantic/track maps + sorted
    segments_info columns (same schema as test_serving_golden.py)."""
    arrs = {}
    for t, r in enumerate(results):
        arrs[f"pan_{t}"] = np.asarray(r.panoptic_seg, np.int32)
        arrs[f"sem_{t}"] = np.asarray(r.semantic_map, np.int32)
        arrs[f"trk_{t}"] = np.asarray(r.track_map, np.int64)
        segs = sorted(r.segments_info, key=lambda s: s["id"])
        arrs[f"seg_ids_{t}"] = np.array([s["id"] for s in segs], np.int64)
        arrs[f"seg_cat_{t}"] = np.array(
            [s["category_id"] for s in segs], np.int64
        )
        arrs[f"seg_isthing_{t}"] = np.array(
            [bool(s["isthing"]) for s in segs], bool
        )
        arrs[f"seg_score_{t}"] = np.array(
            [float(s.get("score", 0.0)) for s in segs], np.float32
        )
    return arrs


def track_id_spans(arrs) -> dict:
    """{track_id: (first_frame, last_frame, n_frames_present)} from the
    flattened golden surface."""
    spans = {}
    for t in range(N_FRAMES):
        for tid in np.unique(arrs[f"trk_{t}"]):
            if tid <= 0:
                continue
            f0, f1, n = spans.get(int(tid), (t, t, 0))
            spans[int(tid)] = (min(f0, t), max(f1, t), n + 1)
    return spans
