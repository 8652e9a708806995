"""Training-time evaluation (the reference's EvalHook / in-dataset evaluate()).

external/evalhooks.py:15,189 runs validation after each epoch and
KITTISTEPDVPSDataset.evaluate (external/kitti_step_dvps.py:190-318) scores
image-level PQ via vpq_eval. Here `evaluate_vps` runs the online inference
pipeline over a val dataset and accumulates the same per-image VPQ statistics
plus STQ, returning a metrics dict for logging / best-checkpoint selection.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from video_knet_tpu.data.datasets import _DVPSScan
from video_knet_tpu.data.panoptic_png import decode_panoptic_ann, load_png
from video_knet_tpu.data.transforms import keep_ratio_resize_pad, nearest_resize
from video_knet_tpu.eval.stq import STQuality
from video_knet_tpu.eval.vpq import MAX_INS, VPQStats, vpq_from_stats, vpq_stats


def evaluate_vps(
    pipeline,
    dataset: _DVPSScan,
    *,
    size_hw: tuple[int, int],
    max_frames: int | None = None,
    num_classes: int = 19,
) -> dict:
    """Returns {'PQ', 'PQ_th', 'PQ_st', 'STQ', 'AQ', 'IoU'} over the val scan."""
    stats = VPQStats(num_cat=num_classes + 1)
    stq = STQuality(
        num_classes=num_classes,
        things_list=list(dataset.thing_ids_in_seg),
        ignore_label=255,
        label_bit_shift=16,
        offset=2**25,
    )
    things = np.zeros(num_classes, bool)
    for t in dataset.thing_ids_in_seg:
        things[t] = True

    ann_mode = getattr(dataset, "ann_mode", "kitti_rgb")
    n = 0
    for sample, is_first in dataset.iter_test():
        if sample.ann is None:
            continue
        rgb = load_png(sample.img)
        ori_hw = rgb.shape[:2]
        # keep-ratio resize + pad (the reference's test pipeline), then crop
        # predictions back to the content region before rescaling
        x, content_hw = keep_ratio_resize_pad(rgb, size_hw)
        res = pipeline.run_frame(jnp.asarray(x)[None], is_first=is_first)
        ch, cw = content_hw
        sem = nearest_resize(
            res.semantic_map.astype(np.int64)[:ch, :cw], ori_hw)
        trk = nearest_resize(
            res.track_map.astype(np.int64)[:ch, :cw], ori_hw)
        gt_sem, gt_inst = decode_panoptic_ann(sample.ann, ann_mode)
        pred_pan = sem * MAX_INS + trk
        gt_pan = gt_sem.astype(np.int64) * MAX_INS + gt_inst.astype(np.int64)
        stats += vpq_stats(pred_pan, gt_pan, num_cat=num_classes + 1)
        stq.update_state(
            (gt_sem.astype(np.int64) << 16) + gt_inst.astype(np.int64),
            (sem << 16) + trk,
            sequence_id=sample.seq_id,
        )
        n += 1
        if max_frames is not None and n >= max_frames:
            break

    out = vpq_from_stats(stats, num_classes=num_classes, things_index=things)
    r = stq.result()
    out.update({"STQ": r["STQ"], "AQ": r["AQ"], "IoU": r["IoU"], "frames": n})
    return out
