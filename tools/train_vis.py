"""Train Video K-Net VIS on YouTube-VIS — TPU-native trainer CLI.

Equivalent surface to the reference's tools/train.py with the
configs/video_knet_vis configs (KNetTrack clip training).

Usage:
  python tools/train_vis.py --ann-file train.json --img-root train/JPEGImages \
      --epochs 12 --batch-size 4 [--crop 360 640]
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


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--img-root", default=None)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--crop", type=int, nargs=2, default=[360, 640])
    p.add_argument("--num-frames", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--work-dir", default="work_dirs/vis")
    p.add_argument("--load-from", default=None)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    from video_knet_tpu.config_vis import youtube_vis_2019_config
    from video_knet_tpu.data.vis_loader import VISTrainLoader
    from video_knet_tpu.data.ytvis import YouTubeVISDataset
    from video_knet_tpu.models.vis.knet_vis import KNetVIS
    from video_knet_tpu.parallel.mesh import make_mesh, shard_batch
    from video_knet_tpu.train.optim import make_optimizer
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vis import make_sharded_vis_train_step
    from video_knet_tpu.utils.checkpoint import (
        merge_params,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = dataclasses.replace(
        youtube_vis_2019_config(), backbone=args.backbone, num_frames=args.num_frames
    )
    ds = YouTubeVISDataset(args.ann_file, img_root=args.img_root)
    loader = VISTrainLoader(
        ds, cfg, batch_size=args.batch_size, canvas_hw=tuple(args.crop),
        seed=args.seed,
    )
    steps_per_epoch = max(1, len(ds) // args.batch_size)

    model = KNetVIS(cfg, train=True)
    h, w = args.crop
    dummy = jnp.zeros((1, cfg.num_frames, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(args.seed), dummy)
    tx = make_optimizer(variables["params"], steps_per_epoch, base_lr=args.lr)
    state = create_train_state(variables, tx)
    if args.load_from:
        loaded = restore_checkpoint(args.load_from)
        state = state._replace(
            params=merge_params(state.params, loaded.get("params", loaded))
        )

    mesh = make_mesh()
    step_fn = make_sharded_vis_train_step(model, cfg, tx, mesh)
    os.makedirs(args.work_dir, exist_ok=True)
    for epoch in range(args.epochs):
        t0 = time.time()
        for it, (clip, gt) in enumerate(loader):
            clip, gt = shard_batch(mesh, (clip, gt))
            with mesh:
                state, losses = step_fn(state, clip, gt)
            if (it + 1) % args.log_interval == 0:
                rec = dict(
                    epoch=epoch, iter=it + 1,
                    **{k: round(float(v), 4) for k, v in losses.items()},
                )
                print(json.dumps(rec))
        save_checkpoint(os.path.join(args.work_dir, "ckpt"), state, step=epoch + 1)
        print(f"epoch {epoch + 1} done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
