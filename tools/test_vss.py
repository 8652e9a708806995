"""Video semantic segmentation (VSS) inference + mIoU / mVC evaluation.

The reference lists VSS as a supported task (poster Table 4: VSPW mIoU/mVC8/mVC16)
but ships no VSS code path ("To do", DATASET.md:66). Here VSS falls out of the
VPS model directly: the per-frame semantic map is the class-argmax of the kernel
masks' joint panoptic decode (things+stuff), evaluated with
eval/miou.ConfusionMeter and the mVC_k video-consistency metrics.

Usage:
  python tools/test_vss.py --data-root data/kitti-step --checkpoint ckpt \
      [--split val] [--eval]
"""

from __future__ import annotations

# allow `python tools/<tool>.py` from anywhere (repo root on sys.path)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--dataset", default="kitti_step", choices=["kitti_step", "vipseg"])
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--split", default="val")
    p.add_argument("--size", type=int, nargs=2, default=[384, 1248])
    p.add_argument("--vc-windows", type=int, nargs="+", default=[8, 16])
    return p.parse_args()


def main():
    args = parse_args()
    from video_knet_tpu.config import kitti_step_video_config, vipseg_video_config
    from video_knet_tpu.data.datasets import KittiStepDVPS, VIPSegDVPS
    from video_knet_tpu.data.panoptic_png import decode_kitti_panoptic, load_png
    from video_knet_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        bilinear_resize,
        nearest_resize,
    )
    from video_knet_tpu.eval.miou import ConfusionMeter, video_consistency
    from video_knet_tpu.models.video.inference import VPSInferencePipeline
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.utils.checkpoint import merge_params, restore_checkpoint

    cfg = (
        kitti_step_video_config()
        if args.dataset == "kitti_step"
        else vipseg_video_config()
    )
    cfg = dataclasses.replace(cfg, backbone=args.backbone)
    ds_cls = KittiStepDVPS if args.dataset == "kitti_step" else VIPSegDVPS
    ds = ds_cls(args.data_root, split=args.split)

    model = VideoKNet(cfg, train=False)
    h, w = args.size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    if args.checkpoint:
        loaded = restore_checkpoint(args.checkpoint)
        params = loaded.get("params", loaded)
        variables = {
            "params": merge_params(variables["params"], params),
            "batch_stats": loaded.get("batch_stats", variables.get("batch_stats", {})),
        }
    thing_ids = ds.thing_ids_in_seg if args.dataset == "kitti_step" else None
    pipe = VPSInferencePipeline(
        model, variables, cfg, out_hw=(h, w), thing_ids_in_orig=thing_ids
    )

    num_classes = cfg.num_classes
    meter = ConfusionMeter(num_classes)
    seq_preds: dict[int, list] = {}
    seq_gts: dict[int, list] = {}
    for sample, is_first in ds.iter_test():
        rgb = load_png(sample.img)
        ori_hw = rgb.shape[:2]
        x = (bilinear_resize(rgb, (h, w)) - IMAGENET_MEAN) / IMAGENET_STD
        res = pipe.run_frame(jnp.asarray(x)[None], is_first=is_first)
        sem = nearest_resize(res.semantic_map.astype(np.int32), ori_hw)
        seq_preds.setdefault(sample.seq_id, []).append(sem)
        if sample.ann:
            gt_sem, _ = decode_kitti_panoptic(load_png(sample.ann))
            seq_gts.setdefault(sample.seq_id, []).append(gt_sem.astype(np.int32))
            meter.update(sem, gt_sem)

    r = meter.result()
    print(f"mIoU {r['mIoU'] * 100:.1f}  aAcc {r['aAcc'] * 100:.1f}")
    for k in args.vc_windows:
        vcs = [
            video_consistency(seq_preds[s], seq_gts[s], window=k)
            for s in seq_gts
            if len(seq_gts[s]) >= k
        ]
        if vcs:
            print(f"mVC{k} {np.nanmean(vcs) * 100:.1f}")


if __name__ == "__main__":
    main()
