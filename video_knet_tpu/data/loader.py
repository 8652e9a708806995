"""Async host-side train loader: decode -> transform -> pack -> device batch.

Replaces the reference's torch DataLoader with worker subprocesses
(external/train.py:41-50): here a thread pool overlaps PNG decode + numpy
transforms with TPU compute (decode releases the GIL inside PIL/zlib, and the
optional C++ codec in video_knet_tpu/native decodes fully off-thread). Batches
have ONE static shape: images [B, H, W, 3] at crop size, GT in fixed slots.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax.numpy as jnp
import numpy as np

from video_knet_tpu.config import VideoKNetConfig
from video_knet_tpu.data.datasets import _DVPSScan
from video_knet_tpu.data.panoptic_png import decode_panoptic_ann, load_png
from video_knet_tpu.data.transforms import (
    apply_image_transform,
    apply_mask_transform,
    pack_panoptic_gt,
    sample_transform_params,
)
from video_knet_tpu.ops.targets import PanopticGT
from video_knet_tpu.train.vps import VPSBatch


class VPSTrainLoader:
    def __init__(
        self,
        dataset: _DVPSScan,
        cfg: VideoKNetConfig,
        *,
        batch_size: int,
        crop_hw: tuple[int, int] = (384, 1248),
        img_scale: tuple[int, int] | None = None,
        seed: int = 0,
        prefetch: int = 2,
        num_threads: int = 4,
    ):
        self.ds = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.crop_hw = crop_hw
        # base scale the random ratio multiplies (reference img_scale, e.g.
        # (384, 1248) KITTI-STEP / (720, 100000) VIP-Seg short-side-720);
        # defaults to the crop size, the release configs' choice.
        self.img_scale = img_scale if img_scale is not None else crop_hw
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self.num_threads = num_threads

    def _load_pair(self, idx: int, rng: np.random.RandomState):
        key, ref = self.ds.get_pair(idx)
        p = sample_transform_params(rng, img_scale=self.img_scale)
        out = []
        for s in (key, ref):
            img = apply_image_transform(load_png(s.img), p, self.crop_hw)
            sem, inst = decode_panoptic_ann(
                s.ann, getattr(self.ds, "ann_mode", "kitti_rgb")
            )
            sem_t = apply_mask_transform(sem, p, self.crop_hw)
            inst_t = apply_mask_transform(inst, p, self.crop_hw, pad_value=0)
            gt = pack_panoptic_gt(
                sem_t,
                inst_t,
                thing_ids_in_seg=self.ds.thing_ids_in_seg,
                num_stuff_classes=self.cfg.num_stuff_classes,
                max_insts=self.cfg.max_insts,
                assign_stride=self.cfg.mask_assign_stride,
            )
            out.append((img, gt))
        return out

    def _make_batch(self, idxs: list[int], seeds: list[int]) -> VPSBatch:
        pairs = [
            self._load_pair(i, np.random.RandomState(s)) for i, s in zip(idxs, seeds)
        ]
        def stack_gt(gts: list[PanopticGT]) -> PanopticGT:
            return PanopticGT(*[jnp.asarray(np.stack(x)) for x in zip(*gts)])

        imgs = jnp.asarray(np.stack([p[0][0] for p in pairs]))
        ref_imgs = jnp.asarray(np.stack([p[1][0] for p in pairs]))
        gt = stack_gt([p[0][1] for p in pairs])
        ref_gt = stack_gt([p[1][1] for p in pairs])
        return VPSBatch(imgs, ref_imgs, gt, ref_gt)

    def __iter__(self) -> Iterator[VPSBatch]:
        order = self.rng.permutation(len(self.ds))
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        n_batches = len(order) // self.batch_size

        def producer():
            for b in range(n_batches):
                idxs = order[b * self.batch_size : (b + 1) * self.batch_size].tolist()
                seeds = [int(self.rng.randint(0, 2**31)) for _ in idxs]
                q.put(self._make_batch(idxs, seeds))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                return
            yield batch
