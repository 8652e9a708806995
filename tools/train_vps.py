"""Train Video K-Net VPS (KITTI-STEP / VIP-Seg) — TPU-native trainer CLI.

Equivalent surface to the reference's tools/train.py + external/train.py
(config -> dataset -> DDP model -> EpochBasedRunner): here the train step is one
jitted SPMD function over a data-parallel `jax.sharding.Mesh`; the loader
prefetches decoded, fixed-shape batches on host threads.

Usage:
  python tools/train_vps.py --data-root data/kitti-step --epochs 12 \
      --batch-size 8 --crop 384 1248 [--dataset vipseg] [--backbone swin_base] \
      [--load-from ckpt] [--resume-from ckpt] [--work-dir work_dirs/vps]
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
    p.add_argument("--data-root", required=True)
    p.add_argument("--dataset", default="kitti_step", choices=["kitti_step", "vipseg"])
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--crop", type=int, nargs=2, default=[384, 1248])
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--work-dir", default="work_dirs/vps")
    p.add_argument("--load-from", default=None, help="weights-only checkpoint")
    p.add_argument("--resume-from", default=None, help="full train-state checkpoint")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-insts", type=int, default=32)
    p.add_argument("--eval-interval", type=int, default=0,
                   help="run val VPQ/STQ every N epochs (0 = off)")
    p.add_argument("--eval-max-frames", type=int, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 forward/backward compute (fp32 master params)")
    p.add_argument("--freeze-detector", action="store_true",
                   help="non-joint two-phase mode: train only track/link layers")
    return p.parse_args()


def main():
    args = parse_args()
    from video_knet_tpu.config import kitti_step_video_config, vipseg_video_config
    from video_knet_tpu.data.datasets import KittiStepDVPS, VIPSegDVPS
    from video_knet_tpu.data.loader import VPSTrainLoader
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.parallel.mesh import make_mesh, shard_batch
    from video_knet_tpu.train.optim import make_optimizer
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vps import make_sharded_train_step
    from video_knet_tpu.utils.checkpoint import (
        merge_params,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = (
        kitti_step_video_config()
        if args.dataset == "kitti_step"
        else vipseg_video_config()
    )
    cfg = dataclasses.replace(cfg, backbone=args.backbone, max_insts=args.max_insts,
                              bf16_train=args.bf16)

    ds_cls = KittiStepDVPS if args.dataset == "kitti_step" else VIPSegDVPS
    ds = ds_cls(args.data_root, split="train", ref_seq_index=list(cfg.ref_seq_index),
                seed=args.seed)
    loader = VPSTrainLoader(
        ds, cfg, batch_size=args.batch_size, crop_hw=tuple(args.crop), seed=args.seed
    )
    steps_per_epoch = max(1, len(ds) // args.batch_size)

    model = VideoKNet(cfg, train=True)
    h, w = args.crop
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(args.seed), dummy, dummy)
    tx = make_optimizer(
        variables["params"], steps_per_epoch, base_lr=args.lr,
        frozen_stages=cfg.frozen_stages, freeze_detector=args.freeze_detector,
    )
    state = create_train_state(variables, tx)

    if args.load_from:
        from video_knet_tpu.utils.checkpoint import image_to_video_params

        loaded = restore_checkpoint(args.load_from)
        params = loaded.get("params", loaded)
        if "roi_head" in params:  # image-K-Net pretraining checkpoint
            params = image_to_video_params(params)
        state = state._replace(params=merge_params(state.params, params))
    if args.resume_from:
        state = restore_checkpoint(args.resume_from, target=state)

    mesh = make_mesh()
    step_fn = make_sharded_train_step(model, cfg, tx, mesh)

    os.makedirs(args.work_dir, exist_ok=True)
    log_path = os.path.join(args.work_dir, "train_log.jsonl")
    print(f"devices: {jax.device_count()} | steps/epoch: {steps_per_epoch}")

    from video_knet_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard()

    start_epoch = int(np.asarray(state.step)) // steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        for it, batch in enumerate(loader):
            batch = shard_batch(mesh, batch)
            with mesh:
                state, losses = step_fn(state, batch)
            if guard.requested:
                save_checkpoint(os.path.join(args.work_dir, "ckpt"), state,
                                step=int(np.asarray(state.step)))
                print("preemption checkpoint written; exiting")
                return
            if (it + 1) % args.log_interval == 0:
                losses = {k: float(v) for k, v in losses.items()}
                rate = args.batch_size * (it + 1) / (time.time() - t0)
                rec = dict(epoch=epoch, iter=it + 1, imgs_per_sec=round(rate, 2),
                           **{k: round(v, 4) for k, v in losses.items()})
                print(json.dumps(rec))
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
        save_checkpoint(
            os.path.join(args.work_dir, "ckpt"), state, step=epoch + 1
        )
        print(f"epoch {epoch + 1} done in {time.time() - t0:.1f}s")
        if args.eval_interval and (epoch + 1) % args.eval_interval == 0:
            from video_knet_tpu.models.video.inference import VPSInferencePipeline
            from video_knet_tpu.train.eval_hook import evaluate_vps

            try:
                val_ds = ds_cls(args.data_root, split="val")
                infer_model = VideoKNet(cfg, train=False)
                pipe = VPSInferencePipeline(
                    infer_model,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    cfg, out_hw=(h, w),
                )
                metrics = evaluate_vps(
                    pipe, val_ds, size_hw=(h, w),
                    max_frames=args.eval_max_frames,
                    num_classes=cfg.num_classes,
                )
                rec = {"epoch": epoch + 1,
                       **{k: round(float(v), 4) for k, v in metrics.items()
                          if not hasattr(v, "shape") or v.shape == ()}}
                print("eval:", json.dumps(rec))
                with open(log_path, "a") as f:
                    f.write(json.dumps({"eval": rec}) + "\n")
            except FileNotFoundError:
                print("eval skipped: no val split found")


if __name__ == "__main__":
    main()
