"""VIS clip train loader: sample clips, shared-param transforms, fixed-slot tubes.

Replaces the reference's mmtrack Seq* pipeline for YT-VIS training
(configs/video_knet_vis/_base_/datasets/youtubevis_2019.py: 5 ref frames,
frame_range [-2, 2], multiscale resize, shared flip): all frames of a clip get
ONE transform parameter draw; GT tubes land in fixed slots (`ClipGT`) at the
mask-assign stride.
"""

from __future__ import annotations

import os
from typing import Iterator

import jax.numpy as jnp
import numpy as np

from video_knet_tpu.config_vis import VISConfig
from video_knet_tpu.data.panoptic_png import load_png
from video_knet_tpu.data.transforms import (
    apply_image_transform,
    bilinear_resize,
    sample_transform_params,
)
from video_knet_tpu.data.ytvis import YouTubeVISDataset
from video_knet_tpu.models.vis.knet_vis import ClipGT


class VISTrainLoader:
    def __init__(
        self,
        dataset: YouTubeVISDataset,
        cfg: VISConfig,
        *,
        batch_size: int = 1,
        crop_hw: tuple[int, int] = (360, 640),
        frame_range: tuple[int, int] = (-2, 2),
        seed: int = 0,
    ):
        self.ds = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.crop_hw = crop_hw
        self.frame_range = frame_range
        self.rng = np.random.RandomState(seed)

    def _load_clip(self, vid: int):
        cfg = self.cfg
        t = cfg.num_frames
        idxs = self.ds.sample_clip(
            vid, self.rng, num_frames=t, frame_range=self.frame_range
        )
        v = self.ds.videos[vid]
        p = sample_transform_params(self.rng, ratio_range=(0.8, 1.25))
        frames = []
        for fi in idxs:
            path = v.frames[fi]["file_name"]
            if self.ds.img_root:
                path = os.path.join(self.ds.img_root, path)
            frames.append(apply_image_transform(load_png(path), p, self.crop_hw))
        clip = np.stack(frames)  # [T, H, W, 3]

        masks, labels, valid = self.ds.clip_gt_arrays(
            vid, idxs, max_insts=cfg.max_insts
        )
        # transform GT tubes with the same params (resize+flip+crop via the
        # image-transform geometry applied to each mask frame)
        s = cfg.mask_assign_stride
        ah, aw = self.crop_hw[0] // s, self.crop_hw[1] // s
        g = masks.shape[0]
        out = np.zeros((g, t, ah, aw), np.float32)
        for gi in range(g):
            for ti in range(t):
                m = _transform_mask(masks[gi, ti], p, self.crop_hw)
                out[gi, ti] = bilinear_resize(m, (ah, aw))
        return clip, out, labels, valid

    def __iter__(self) -> Iterator[tuple]:
        order = self.rng.permutation(len(self.ds))
        b = self.batch_size
        for start in range(0, len(order) - b + 1, b):
            clips, masks, labels, valids = [], [], [], []
            for vid in order[start : start + b]:
                c, m, l, v = self._load_clip(int(vid))
                clips.append(c)
                masks.append(m)
                labels.append(l)
                valids.append(v)
            yield (
                jnp.asarray(np.stack(clips)),
                ClipGT(
                    masks=jnp.asarray(np.stack(masks)),
                    labels=jnp.asarray(np.stack(labels)),
                    valid=jnp.asarray(np.stack(valids)),
                ),
            )


def _transform_mask(mask: np.ndarray, p, crop_hw: tuple[int, int]) -> np.ndarray:
    from video_knet_tpu.data.transforms import _resolve_geometry, nearest_resize

    (rh, rw), (oy, ox) = _resolve_geometry(mask.shape[:2], crop_hw, p)
    x = nearest_resize(mask, (rh, rw))
    if p.flip:
        x = x[:, ::-1]
    x = x[oy : oy + crop_hw[0], ox : ox + crop_hw[1]]
    out = np.zeros(crop_hw, mask.dtype)
    out[: x.shape[0], : x.shape[1]] = x
    return out
