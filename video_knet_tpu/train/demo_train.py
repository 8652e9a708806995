"""Synthetic-data smoke train: `python -m video_knet_tpu.train.demo_train`.

Runs N data-parallel train steps of the full Video K-Net VPS model on synthetic
batches over whatever devices exist (the single real TPU chip, or the virtual CPU
mesh under XLA_FLAGS=--xla_force_host_platform_device_count=8), printing the loss
curve. This is the end-to-end trainer exercise without a dataset on disk.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch-per-device", type=int, default=1)
    p.add_argument("--hw", type=int, nargs=2, default=[128, 256])
    p.add_argument("--max-insts", type=int, default=8)
    args = p.parse_args()

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.parallel.mesh import make_mesh, shard_batch
    from video_knet_tpu.train.optim import make_optimizer
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vps import make_sharded_train_step, make_synthetic_batch

    cfg = VideoKNetConfig(max_insts=args.max_insts)
    model = VideoKNet(cfg, train=True)
    h, w = args.hw
    b = args.batch_per_device * jax.device_count()
    print(f"devices={jax.device_count()} batch={b} hw={h}x{w}")

    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    tx = make_optimizer(variables["params"], steps_per_epoch=1000)
    state = create_train_state(variables, tx)
    mesh = make_mesh()
    step_fn = make_sharded_train_step(model, cfg, tx, mesh)

    for i in range(args.steps):
        batch = shard_batch(mesh, make_synthetic_batch(cfg, b, (h, w), seed=i))
        t0 = time.time()
        with mesh:
            state, losses = step_fn(state, batch)
        total = float(losses["total_loss"])
        print(f"step {i}: total_loss={total:.4f}  ({time.time() - t0:.2f}s)")
        assert jnp.isfinite(total)
    print("smoke train OK")


if __name__ == "__main__":
    main()
