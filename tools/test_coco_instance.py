"""COCO instance-segmentation inference CLI (results-json dump).

Equivalent surface to the reference's tools/test.py --format-only on the
instance config (configs/det/coco/knet_s3_r50_fpn_ms-3x_coco.py): run image
K-Net in instance mode over a COCO-format image list and write the COCO
`segm` results json (RLE masks, scores, category ids) for offline COCOeval.

Usage:
  python tools/test_coco_instance.py --ann-file ann.json --img-root imgs \
      --checkpoint ckpt/step_8 --size 800 1344 --out work_dirs/coco
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--img-root", default=None)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--size", type=int, nargs=2, default=[800, 1344])
    p.add_argument("--score-thr", type=float, default=0.0)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--out", required=True)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_knet_tpu.configs import get_config
    from video_knet_tpu.data.panoptic_png import load_png
    from video_knet_tpu.data.transforms import keep_ratio_resize_pad, nearest_resize
    from video_knet_tpu.eval.coco_instance import (
        instances_to_coco_json,
        write_coco_results,
    )
    from video_knet_tpu.models.knet import KNet, instance_decode
    from video_knet_tpu.utils.checkpoint import merge_params, restore_checkpoint

    with open(args.ann_file) as f:
        coco = json.load(f)
    cat_ids = sorted(c["id"] for c in coco.get("categories", []))
    images = coco["images"]
    if args.max_images:
        images = images[: args.max_images]

    cfg = get_config("knet_s3_r50_fpn_ms-3x_coco")
    cfg = dataclasses.replace(
        cfg, backbone=args.backbone,
        num_thing_classes=len(cat_ids) or cfg.num_thing_classes,
        rpn=dataclasses.replace(
            cfg.rpn,
            num_classes=len(cat_ids) or cfg.rpn.num_classes,
            num_thing_classes=len(cat_ids) or cfg.rpn.num_thing_classes,
        ),
        head=dataclasses.replace(
            cfg.head,
            num_classes=len(cat_ids) or cfg.head.num_classes,
            num_thing_classes=len(cat_ids) or cfg.head.num_thing_classes,
        ),
    )
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
        return instance_decode(rpn_out, stage_outs, cfg, out_hw=(h, w))

    def forward(img):
        return _forward(variables, img)

    results = []
    for im in images:
        path = im["file_name"]
        if args.img_root:
            path = os.path.join(args.img_root, path)
        rgb = load_png(path)
        x, (ch, cw) = keep_ratio_resize_pad(rgb, (h, w))
        pred = forward(jnp.asarray(x)[None])
        masks = np.asarray(pred.masks)[:, :ch, :cw]
        ori = (im.get("height", rgb.shape[0]), im.get("width", rgb.shape[1]))
        masks = np.stack([nearest_resize(m, ori) for m in masks])
        results.extend(
            instances_to_coco_json(
                im["id"], masks, np.asarray(pred.labels), np.asarray(pred.scores),
                cat_ids or list(range(cfg.num_thing_classes)),
                mask_thr=cfg.test.mask_thr, score_thr=args.score_thr,
            )
        )
    path = write_coco_results(results, args.out)
    print(json.dumps({"results": path, "n_detections": len(results),
                      "n_images": len(images)}))


if __name__ == "__main__":
    main()
