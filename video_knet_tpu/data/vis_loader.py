"""VIS clip train loader: sample clips, shared-param transforms, fixed-slot tubes.

Replaces the reference's mmtrack Seq* pipeline for YT-VIS training
(configs/video_knet_vis/_base_/datasets/youtubevis_2019.py): a clip of
`cfg.num_frames` consecutive-window frames gets ONE shared transform draw —
`SeqResize(multiscale_mode='value', img_scale=[(288,1e6)..(512,1e6)],
keep_ratio=True)` becomes a short-side draw from `short_sides`, plus shared
flip — and GT tubes land in fixed slots (`ClipGT`) at the mask-assign stride.

TPU-first differences from the reference pipeline:
- the output canvas is ONE static shape (`canvas_hw`, pad bottom/right with
  zeros = the normalized mean) instead of per-batch size_divisor=32 padding;
  content that would overflow the canvas (portrait videos at large draws) is
  randomly cropped with clip-shared offsets;
- like the VPS loader (data/loader.py), decoding runs on a thread pool with
  bounded prefetch, every augmentation seed is drawn up front (batches are
  bit-identical for any thread count), and each process takes the strided
  slice batches[process_index::process_count] of the same global sequence
  (DistributedSampler semantics).

YT-VIS frames are JPEG: `load_png` falls through to PIL for non-PNG magic, so
the decode thread pool is the parallelism lever here (PIL JPEG decode drops
the GIL).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import jax.numpy as jnp
import numpy as np

from video_knet_tpu.config_vis import VISConfig
from video_knet_tpu.data.panoptic_png import load_png
from video_knet_tpu.data.transforms import (
    SeqTransformParams,
    apply_image_transform,
    bilinear_resize,
)
from video_knet_tpu.data.ytvis import YouTubeVISDataset
from video_knet_tpu.models.vis.knet_vis import ClipGT

# the reference's discrete short-side draw (youtubevis_2019.py SeqResize)
YTVIS_SHORT_SIDES = (288, 320, 352, 392, 416, 448, 480, 512)


def sample_vis_transform_params(
    rng: np.random.RandomState,
    *,
    short_sides: Sequence[int] = YTVIS_SHORT_SIDES,
    flip_prob: float = 0.5,
) -> SeqTransformParams:
    """multiscale_mode='value': one short side from the list, ratio 1.0.

    mmcv keep_ratio semantics follow from img_scale=(short, 1e6):
    factor = min(1e6/long_in, short/short_in) = short/short_in."""
    s = int(short_sides[rng.randint(0, len(short_sides))])
    return SeqTransformParams(
        scale=1.0,
        flip=bool(rng.rand() < flip_prob),
        crop_y=float(rng.rand()),
        crop_x=float(rng.rand()),
        img_scale=(s, 10**6),
    )


class VISTrainLoader:
    def __init__(
        self,
        dataset: YouTubeVISDataset,
        cfg: VISConfig,
        *,
        batch_size: int = 1,
        canvas_hw: tuple[int, int] = (512, 928),
        short_sides: Sequence[int] = YTVIS_SHORT_SIDES,
        frame_range: tuple[int, int] = (-2, 2),
        seed: int = 0,
        prefetch: int = 2,
        num_threads: int = 4,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        self.ds = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.canvas_hw = canvas_hw
        self.short_sides = tuple(short_sides)
        self.frame_range = frame_range
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self.num_threads = max(1, num_threads)
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = max(1, process_count)

    def _load_clip(self, vid: int, rng: np.random.RandomState):
        cfg = self.cfg
        t = cfg.num_frames
        idxs = self.ds.sample_clip(
            vid, rng, num_frames=t, frame_range=self.frame_range
        )
        v = self.ds.videos[vid]
        p = sample_vis_transform_params(rng, short_sides=self.short_sides)
        frames = []
        for fi in idxs:
            path = v.frames[fi]["file_name"]
            if self.ds.img_root:
                path = os.path.join(self.ds.img_root, path)
            frames.append(apply_image_transform(load_png(path), p, self.canvas_hw))
        clip = np.stack(frames)  # [T, H, W, 3]

        masks, labels, valid = self.ds.clip_gt_arrays(
            vid, idxs, max_insts=cfg.max_insts
        )
        # transform GT tubes with the same params (resize+flip+crop via the
        # image-transform geometry applied to each mask frame)
        s = cfg.mask_assign_stride
        ah, aw = self.canvas_hw[0] // s, self.canvas_hw[1] // s
        g = masks.shape[0]
        out = np.zeros((g, t, ah, aw), np.float32)
        for gi in range(g):
            if not valid[gi]:
                continue
            for ti in range(t):
                m = _transform_mask(masks[gi, ti], p, self.canvas_hw)
                out[gi, ti] = bilinear_resize(m, (ah, aw))
        return clip, out, labels, valid

    @staticmethod
    def _assemble(items) -> tuple:
        clips = jnp.asarray(np.stack([it[0] for it in items]))
        gt = ClipGT(
            masks=jnp.asarray(np.stack([it[1] for it in items])),
            labels=jnp.asarray(np.stack([it[2] for it in items])),
            valid=jnp.asarray(np.stack([it[3] for it in items])),
        )
        return clips, gt

    def __iter__(self) -> Iterator[tuple]:
        # epoch permutation + ALL augmentation seeds drawn up front: batches
        # are reproducible regardless of thread count or host sharding
        order = self.rng.permutation(len(self.ds))
        seeds = self.rng.randint(0, 2**31, size=len(order))
        bsz = self.batch_size
        n_batches = len(order) // bsz
        my_batches = list(range(self.process_index, n_batches, self.process_count))
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        # stop signal so abandoning the generator mid-epoch cannot leave the
        # producer blocked on q.put forever (same contract as data/loader.py)
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
                            pool.submit(self._load_clip, int(i),
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

        th = threading.Thread(target=producer, daemon=True, name="vis-loader-producer")
        th.start()
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
            th.join(timeout=10.0)


def _transform_mask(mask: np.ndarray, p, canvas_hw: tuple[int, int]) -> np.ndarray:
    from video_knet_tpu.data.transforms import _resolve_geometry, nearest_resize

    (rh, rw), (oy, ox) = _resolve_geometry(mask.shape[:2], canvas_hw, p)
    x = nearest_resize(mask, (rh, rw))
    if p.flip:
        x = x[:, ::-1]
    x = x[oy : oy + canvas_hw[0], ox : ox + canvas_hw[1]]
    out = np.zeros(canvas_hw, mask.dtype)
    out[: x.shape[0], : x.shape[1]] = x
    return out
