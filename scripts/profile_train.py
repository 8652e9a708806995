"""Train-step time breakdown on the real chip (VERDICT r2 item 2).

Times separately-jitted sub-graphs of the VPS train step to attribute the
step's milliseconds (a device trace via jax.profiler is preferable when the
backend supports it; this decomposition works over the remote-TPU tunnel):

  full        — the production train step (fwd + bwd + AdamW)
  fwd         — loss value only (no grad)
  backbone    — backbone+neck fwd+bwd alone on both frames (proxy loss)
  loss_block  — video_knet_loss fwd+bwd at FIXED model outputs (Hungarian
                solves + target building + loss math, no model)

heads fwd+bwd ≈ full − backbone − loss_block (shared residuals: optimizer,
GT prep). Prints one JSON line; writes nothing.

Usage: python scripts/profile_train.py [--hw 384 1248] [--batch 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/vknet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


PEAK_BF16 = 197e12  # v5e dense bf16; good enough for relative attribution
HBM_BW = 8.19e11  # v5e HBM bytes/s


def cost_of(jitted, *args) -> tuple[float, float]:
    """(flops, bytes accessed) of the compiled sub-graph via XLA cost analysis."""
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", float("nan"))), float(
        c.get("bytes accessed", float("nan"))
    )


def timed(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 1248))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--bf16", action="store_true",
                    help="profile the production bf16_train path")
    args = ap.parse_args()
    hw = tuple(args.hw)
    b = args.batch

    from jax.sharding import Mesh

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet, video_knet_loss
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vps import (
        make_sharded_train_step,
        make_synthetic_batch,
        make_vps_loss_fn,
    )

    cfg = VideoKNetConfig(max_insts=8, bf16_train=args.bf16)
    model = VideoKNet(cfg, train=True)
    batch = make_synthetic_batch(cfg, b, hw)
    variables = model.init(jax.random.PRNGKey(0), batch.img, batch.ref_img)
    tx = optax.adamw(1e-4, weight_decay=5e-2)
    state = create_train_state(variables, tx)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    res = {}

    # full step — the jitted step DONATES its input state, and the state's
    # buffers alias `variables`, so the state must be built on fresh copies
    # (the sub-block timings below reuse `variables`)
    step = make_sharded_train_step(model, cfg, tx, mesh)
    s = create_train_state(
        jax.tree_util.tree_map(jnp.array, variables), tx
    )
    res["full_flops"], res["full_bytes"] = cost_of(step, s, batch)
    s, _ = step(s, batch)
    s, _ = step(s, batch)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        s, losses = step(s, batch)
    jax.block_until_ready(losses)
    res["full_ms"] = (time.perf_counter() - t0) / iters * 1e3
    # roofline: ideal compute / memory walls for the full step
    res["full_compute_ms_ideal"] = res["full_flops"] / PEAK_BF16 * 1e3
    res["full_mem_ms_ideal"] = res["full_bytes"] / HBM_BW * 1e3

    # forward-only loss
    loss_fn = make_vps_loss_fn(model, cfg)
    fwd = jax.jit(lambda p, bs, bt: loss_fn(p, bs, bt)[0])
    res["fwd_ms"] = timed(fwd, variables["params"], variables["batch_stats"], batch) * 1e3

    # backbone+neck fwd+bwd on both frames, as ONE concatenated [ref; key]
    # pass of batch 2B — exactly how the joint train step runs the backbone
    # (knet_vps.py:__call__ batches the branches for MXU utilization)
    def bb_loss(params):
        vs = {"params": params, "batch_stats": variables["batch_stats"]}
        img, ref = batch.img, batch.ref_img
        if cfg.bf16_train:
            from video_knet_tpu.utils.precision import cast_variables

            vs = cast_variables(vs)
            img, ref = img.astype(jnp.bfloat16), ref.astype(jnp.bfloat16)
        both = jnp.concatenate([ref, img], axis=0)
        feats = model.apply(vs, both, method=VideoKNet.extract_feat)
        return sum(jnp.mean(jnp.square(x.astype(jnp.float32))) for x in feats)

    bb_grad = jax.jit(jax.grad(bb_loss))
    res["backbone_flops"], res["backbone_bytes"] = cost_of(
        bb_grad, variables["params"]
    )
    res["backbone_fwd_bwd_ms"] = timed(bb_grad, variables["params"]) * 1e3

    # loss block at fixed model outputs
    outs = jax.jit(
        lambda p: model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch.img, batch.ref_img,
        )
    )(variables["params"])
    outs = jax.block_until_ready(outs)

    def loss_on_outputs(o):
        key, ref, ke, re_ = o
        ls = video_knet_loss((key, ref), (ke, re_), batch.gt, batch.ref_gt, cfg)
        return sum(ls.values())

    lgrad = jax.jit(jax.grad(loss_on_outputs))
    res["loss_block_flops"], res["loss_block_bytes"] = cost_of(lgrad, outs)
    res["loss_block_fwd_bwd_ms"] = timed(lgrad, outs) * 1e3

    res["heads_fwd_bwd_ms_est"] = (
        res["full_ms"] - res["backbone_fwd_bwd_ms"] - res["loss_block_fwd_bwd_ms"]
    )
    res = {k: round(v, 2) for k, v in res.items()}
    res["hw"] = list(hw)
    res["batch"] = b
    res["device"] = jax.devices()[0].device_kind
    print(json.dumps(res))


if __name__ == "__main__":
    main()
