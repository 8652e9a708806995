"""Train image K-Net (Cityscapes-STEP / COCO panoptic pretraining phase).

Equivalent surface to the reference's tools/train.py with the
configs/det/knet_* image configs — phase 1 of the two-phase workflow
(README.md:59-80): pretrain the image model, then --load-from it into
tools/train_vps.py.

Usage:
  python tools/train_image.py --dataset cityscapes_step --data-root data/cityscapes \
      --epochs 8 --batch-size 8 [--backbone swin_base]
  python tools/train_image.py --dataset coco --ann-file panoptic_train.json \
      --img-root train2017 --pan-root panoptic_train2017
"""

from __future__ import annotations

# allow `python tools/<tool>.py` from anywhere (repo root on sys.path)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="cityscapes_step",
                   choices=["cityscapes_step", "coco", "kitti_step"])
    p.add_argument("--data-root", default=None)
    p.add_argument("--ann-file", default=None)
    p.add_argument("--img-root", default=None)
    p.add_argument("--pan-root", default=None)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--crop", type=int, nargs=2, default=[512, 1024])
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--work-dir", default="work_dirs/image_knet")
    p.add_argument("--load-from", default=None)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-insts", type=int, default=32)
    p.add_argument("--eval-interval", type=int, default=0,
                   help="evaluate PQ on the val split every N epochs (0 = off)")
    p.add_argument("--eval-size", type=int, nargs=2, default=None)
    p.add_argument("--eval-max-images", type=int, default=None)
    return p.parse_args()


def _run_eval(args, cfg, variables):
    """Per-class PQ/SQ/RQ on the val split (the reference's --no-validate
    counterpart: EvalHook -> in-dataset evaluate, kitti_step_dvps.py:190-318)."""
    import jax
    import jax.numpy as jnp

    from video_knet_tpu.data.datasets import CityscapesSTEPImages, KittiStepDVPS
    from video_knet_tpu.models.knet import KNet, panoptic_decode
    from video_knet_tpu.ops.panoptic import segments_to_host
    from video_knet_tpu.train.eval_hook import evaluate_image_panoptic

    if args.dataset == "kitti_step":
        ds = KittiStepDVPS(args.data_root, split="val")
        samples = [ds.frames[k] for k in ds.order]
    else:
        ds = CityscapesSTEPImages(args.data_root, split="val")
        samples = ds.samples
    h, w = args.eval_size or args.crop
    model = KNet(cfg, train=False)

    # weights as a jit argument (closure constants bloat the compile payload)
    @jax.jit
    def _forward(vars_, img):
        rpn_out, stage_outs = model.apply(vars_, img, mutable=False)
        return panoptic_decode(rpn_out, stage_outs, cfg, out_hw=(h, w))

    def forward(img):
        return _forward(variables, img)

    res = evaluate_image_panoptic(
        lambda img: segments_to_host(forward(img).result, cfg.num_thing_classes),
        samples,
        size_hw=(h, w),
        thing_ids_in_seg=ds.thing_ids_in_seg,
        num_classes=cfg.num_classes,
        ann_mode=getattr(ds, "ann_mode", "kitti_rgb"),
        max_images=args.eval_max_images,
        class_names=KittiStepDVPS.CLASSES,
    )
    print(res.pop("table", ""))
    return {k: float(v) for k, v in res.items() if not hasattr(v, "shape")}


def _iter_samples(args, cfg, rng):
    """Yields (img [H,W,3] float32, PanopticGT) at crop size."""
    from video_knet_tpu.data.panoptic_png import decode_kitti_panoptic, load_png
    from video_knet_tpu.data.transforms import (
        apply_image_transform,
        apply_mask_transform,
        pack_panoptic_gt,
        sample_transform_params,
    )

    crop = tuple(args.crop)
    if args.dataset == "coco":
        from video_knet_tpu.data.coco_panoptic import CocoPanopticDataset

        ds = CocoPanopticDataset(args.ann_file, args.img_root, args.pan_root)
        order = rng.permutation(len(ds))
        for i in order:
            s = ds.samples[int(i)]
            sem, inst = ds.load_sem_inst(int(i))
            p = sample_transform_params(rng)
            img = apply_image_transform(load_png(s.img), p, crop)
            sem_t = apply_mask_transform(sem, p, crop)
            inst_t = apply_mask_transform(inst, p, crop, pad_value=0)
            yield img, pack_panoptic_gt(
                sem_t, inst_t,
                thing_ids_in_seg=ds.thing_ids_in_seg,
                num_stuff_classes=ds.num_stuff_classes,
                max_insts=cfg.max_insts,
                assign_stride=cfg.mask_assign_stride,
            )
    else:
        from video_knet_tpu.data.datasets import CityscapesSTEPImages, KittiStepDVPS

        if args.dataset == "kitti_step":
            scan = KittiStepDVPS(args.data_root, split="train")
            samples = [scan.frames[k] for k in scan.order]
            thing_ids = scan.thing_ids_in_seg
        else:
            scan = CityscapesSTEPImages(args.data_root, split="train")
            samples = scan.samples
            thing_ids = scan.thing_ids_in_seg
        order = rng.permutation(len(samples))
        for i in order:
            s = samples[int(i)]
            if s.ann is None:
                continue
            sem, inst = decode_kitti_panoptic(load_png(s.ann))
            p = sample_transform_params(rng)
            img = apply_image_transform(load_png(s.img), p, crop)
            sem_t = apply_mask_transform(sem, p, crop)
            inst_t = apply_mask_transform(inst, p, crop, pad_value=0)
            yield img, pack_panoptic_gt(
                sem_t, inst_t,
                thing_ids_in_seg=thing_ids,
                num_stuff_classes=17,
                max_insts=cfg.max_insts,
                assign_stride=cfg.mask_assign_stride,
            )


def main():
    args = parse_args()
    from video_knet_tpu.configs import (
        knet_s3_r50_fpn_cityscapes_step,
        knet_s3_r50_fpn_coco_panoptic,
    )
    from video_knet_tpu.models.knet import KNet, knet_loss
    from video_knet_tpu.ops.targets import PanopticGT
    from video_knet_tpu.parallel.mesh import make_mesh, shard_batch
    from video_knet_tpu.train.optim import make_optimizer
    from video_knet_tpu.train.train_state import TrainState, create_train_state
    from video_knet_tpu.utils.checkpoint import (
        merge_params,
        restore_checkpoint,
        save_checkpoint,
    )
    import optax

    cfg = (
        knet_s3_r50_fpn_coco_panoptic()
        if args.dataset == "coco"
        else knet_s3_r50_fpn_cityscapes_step()
    )
    cfg = dataclasses.replace(cfg, backbone=args.backbone, max_insts=args.max_insts)

    model = KNet(cfg, train=True)
    h, w = args.crop
    variables = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, h, w, 3)))
    tx = make_optimizer(variables["params"], steps_per_epoch=1000, base_lr=args.lr)
    state = create_train_state(variables, tx)
    if args.load_from:
        loaded = restore_checkpoint(args.load_from)
        state = state._replace(
            params=merge_params(state.params, loaded.get("params", loaded))
        )

    mesh = make_mesh()

    def loss_fn(params, batch_stats, img, gt):
        rpn_out, stage_outs = model.apply(
            {"params": params, "batch_stats": batch_stats}, img, mutable=False
        )
        losses = knet_loss(rpn_out, stage_outs, gt, cfg)
        return sum(losses.values()), losses

    @jax.jit
    def step(state, img, gt):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, img, gt
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        losses = dict(losses)
        losses["total_loss"] = total
        return TrainState(state.step + 1, new_params, state.batch_stats, new_opt), losses

    os.makedirs(args.work_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    b = args.batch_size
    for epoch in range(args.epochs):
        t0 = time.time()
        imgs, gts = [], []
        it = 0
        for img, gt in _iter_samples(args, cfg, rng):
            imgs.append(img)
            gts.append(gt)
            if len(imgs) < b:
                continue
            batch_img = jnp.asarray(np.stack(imgs))
            batch_gt = PanopticGT(*[jnp.asarray(np.stack(x)) for x in zip(*gts)])
            batch_img, batch_gt = shard_batch(mesh, (batch_img, batch_gt))
            with mesh:
                state, losses = step(state, batch_img, batch_gt)
            imgs, gts = [], []
            it += 1
            if it % args.log_interval == 0:
                print(json.dumps(
                    {"epoch": epoch, "iter": it,
                     **{k: round(float(v), 4) for k, v in losses.items()}}
                ))
        save_checkpoint(os.path.join(args.work_dir, "ckpt"), state, step=epoch + 1)
        print(f"epoch {epoch + 1} done in {time.time() - t0:.1f}s")
        if (args.eval_interval and args.dataset != "coco"
                and (epoch + 1) % args.eval_interval == 0):
            metrics = _run_eval(
                args, cfg,
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            print(json.dumps({"epoch": epoch + 1, "eval": {
                k: round(v, 2) for k, v in metrics.items()}}))


if __name__ == "__main__":
    main()
