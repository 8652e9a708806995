"""Async host-side train loader: decode -> transform -> pack -> device batch.

Replaces the reference's torch DataLoader with worker subprocesses + the
rank-sharding DistributedSampler (external/train.py:41-50,107-109): a
ThreadPoolExecutor of `num_threads` decode workers loads sample pairs in
parallel (PNG decode releases the GIL inside PIL/zlib, and the optional C++
codec in video_knet_tpu/native decodes fully off-thread) while the consumer
runs the TPU step; a bounded window keeps `prefetch` batches in flight.

Determinism & multi-host: the epoch permutation and every per-sample
augmentation seed are drawn up front from the loader seed, so batches are
bit-identical for any thread count; each process takes the strided slice
`batches[process_index::process_count]` of the SAME global batch sequence, so
multi-host training feeds disjoint data per host (the reference's
DistributedSampler semantics). Batches have ONE static shape: images
[B, H, W, 3] at crop size, GT in fixed slots.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
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
        process_index: int | None = None,
        process_count: int | None = None,
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
        self.num_threads = max(1, num_threads)
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = max(1, process_count)

    def _load_pair(self, idx: int, rng: np.random.RandomState):
        key, ref = self.ds.get_pair(idx, rng)
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

    @staticmethod
    def _assemble(pairs) -> VPSBatch:
        def stack_gt(gts: list[PanopticGT]) -> PanopticGT:
            return PanopticGT(*[jnp.asarray(np.stack(x)) for x in zip(*gts)])

        imgs = jnp.asarray(np.stack([p[0][0] for p in pairs]))
        ref_imgs = jnp.asarray(np.stack([p[1][0] for p in pairs]))
        gt = stack_gt([p[0][1] for p in pairs])
        ref_gt = stack_gt([p[1][1] for p in pairs])
        return VPSBatch(imgs, ref_imgs, gt, ref_gt)

    def _make_batch(self, idxs: list[int], seeds: list[int]) -> VPSBatch:
        return self._assemble(
            [self._load_pair(i, np.random.RandomState(s))
             for i, s in zip(idxs, seeds)]
        )

    def __iter__(self) -> Iterator[VPSBatch]:
        # epoch permutation + ALL augmentation seeds drawn up front: batches
        # are reproducible regardless of thread count or host sharding
        order = self.rng.permutation(len(self.ds))
        seeds = self.rng.randint(0, 2**31, size=len(order))
        n_batches = len(order) // self.batch_size
        my_batches = list(range(self.process_index, n_batches, self.process_count))
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        bsz = self.batch_size
        # consumers (especially tests) abandon the generator mid-epoch; without
        # a stop signal the producer blocks on q.put forever and leaks its
        # thread pool into the rest of the process
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    pending: list = []
                    it = iter(my_batches)

                    def submit(b: int):
                        sl = slice(b * bsz, (b + 1) * bsz)
                        pending.append([
                            pool.submit(self._load_pair, int(i),
                                        np.random.RandomState(int(s)))
                            for i, s in zip(order[sl], seeds[sl])
                        ])

                    for _ in range(self.prefetch + 1):
                        b = next(it, None)
                        if b is None:
                            break
                        submit(b)
                    while pending and not stop.is_set():
                        futs = pending.pop(0)
                        if not put(self._assemble([f.result() for f in futs])):
                            return
                        b = next(it, None)
                        if b is not None:
                            submit(b)
                put(None)
            except BaseException as e:  # surface worker errors to the consumer
                put(e)

        t = threading.Thread(target=producer, daemon=True, name="vps-loader-producer")
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            try:  # unblock a producer waiting on a full queue
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=10.0)
