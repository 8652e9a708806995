"""Image K-Net panoptic evaluation CLI (per-class PQ/SQ/RQ table).

Equivalent surface to the reference's tools/test.py + the in-dataset
evaluate() (external/kitti_step_dvps.py:190-318): run single-image panoptic
inference over a val split and print PQ/SQ/RQ per class — the quality gate
for the phase-1 (image pretraining) checkpoint of the two-phase workflow.

Usage:
  python tools/test_image.py --dataset kitti_step --data-root data/kitti-step \
      --checkpoint work_dirs/image_knet/ckpt/step_8 --size 384 1248
"""

from __future__ import annotations

# allow `python tools/<tool>.py` from anywhere (repo root on sys.path)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="kitti_step",
                   choices=["kitti_step", "cityscapes_step", "vipseg"])
    p.add_argument("--data-root", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--size", type=int, nargs=2, default=[384, 1248])
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--max-insts", type=int, default=32)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from video_knet_tpu.config import vipseg_video_config
    from video_knet_tpu.configs import knet_s3_r50_fpn_cityscapes_step
    from video_knet_tpu.data.datasets import (
        CityscapesSTEPImages,
        KittiStepDVPS,
        VIPSegDVPS,
    )
    from video_knet_tpu.models.knet import KNet, panoptic_decode
    from video_knet_tpu.ops.panoptic import segments_to_host
    from video_knet_tpu.train.eval_hook import evaluate_image_panoptic
    from video_knet_tpu.utils.checkpoint import merge_params, restore_checkpoint
    from video_knet_tpu.config import KNetConfig

    if args.dataset == "vipseg":
        ds = VIPSegDVPS(args.data_root, split=args.split)
        v = vipseg_video_config()
        cfg = KNetConfig(
            num_thing_classes=58, num_stuff_classes=66,
            rpn=v.rpn, head=v.head, mask_assign_stride=v.mask_assign_stride,
        )
        class_names = None
    else:
        cfg = knet_s3_r50_fpn_cityscapes_step()
        if args.dataset == "kitti_step":
            ds = KittiStepDVPS(args.data_root, split=args.split)
            class_names = ds.CLASSES
        else:
            ds = CityscapesSTEPImages(args.data_root, split=args.split)
            class_names = KittiStepDVPS.CLASSES  # same 19-class space
    cfg = dataclasses.replace(cfg, backbone=args.backbone,
                              max_insts=args.max_insts)

    model = KNet(cfg, train=False)
    h, w = args.size
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    if args.checkpoint:
        loaded = restore_checkpoint(args.checkpoint)
        variables = {
            "params": merge_params(
                variables["params"], loaded.get("params", loaded)),
            "batch_stats": loaded.get(
                "batch_stats", variables.get("batch_stats", {})),
        }

    # weights as a jit argument (closure constants bloat the compile payload)
    @jax.jit
    def _forward(vars_, img):
        rpn_out, stage_outs = model.apply(vars_, img, mutable=False)
        return panoptic_decode(rpn_out, stage_outs, cfg, out_hw=(h, w))

    def forward(img):
        return _forward(variables, img)

    def decode_fn(img):
        return segments_to_host(forward(img).result, cfg.num_thing_classes)

    samples = (
        [ds.frames[k] for k in ds.order]
        if hasattr(ds, "frames") else ds.samples
    )
    res = evaluate_image_panoptic(
        decode_fn, samples,
        size_hw=(h, w),
        thing_ids_in_seg=ds.thing_ids_in_seg,
        num_classes=cfg.num_classes,
        ann_mode=getattr(ds, "ann_mode", "kitti_rgb"),
        max_images=args.max_images,
        class_names=class_names,
    )
    if "table" in res:
        print(res.pop("table"))
    print(json.dumps({k: round(float(v), 2) for k, v in res.items()
                      if not hasattr(v, "shape")}))


if __name__ == "__main__":
    main()
