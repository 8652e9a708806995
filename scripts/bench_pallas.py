"""On-chip A/B: Pallas fused mask ops vs the default XLA path.

Runs on the real TPU (default axon backend). Measures:
  1. isolated mask_pool (jnp vs fused_mask_pool) at the K-Net release shape
  2. isolated assemble+sigmoid (jnp vs fused_assemble_sigmoid)
  3. the full jitted VPS frame step with VKNET_PALLAS off vs on

Results are recorded in PARITY.md ("Pallas" section); this is the measurement
behind the earn-or-prune decision (VERDICT.md round 1, item 7).

Usage: python scripts/bench_pallas.py [--iters 50]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vknet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from video_knet_tpu.ops.mask_pool import mask_pool, set_pallas_enabled
from video_knet_tpu.ops.pallas.mask_ops import fused_assemble_sigmoid, fused_mask_pool
from video_knet_tpu.utils.profiling import benchmark


def bench_isolated(iters: int, dtype):
    rng = np.random.RandomState(0)
    name = jnp.dtype(dtype).name
    masks = jnp.asarray(rng.randn(1, 117, 48, 156).astype(np.float32), dtype=dtype)
    feats = jnp.asarray(rng.randn(1, 48, 156, 256).astype(np.float32), dtype=dtype)
    jnp_pool = jax.jit(functools.partial(mask_pool, hard_thr=0.5, binary=True))
    r = benchmark(jnp_pool, masks, feats, iters=iters)
    print(f"mask_pool[{name}]      xla:    {r.mean_s * 1e6:9.1f} us")
    r = benchmark(
        functools.partial(fused_mask_pool, hard_thr=0.5), masks, feats, iters=iters
    )
    print(f"mask_pool[{name}]      pallas: {r.mean_s * 1e6:9.1f} us")

    kernels = jnp.asarray(rng.randn(1, 117, 256).astype(np.float32) * 0.1, dtype=dtype)
    jnp_asm = jax.jit(
        lambda k, f: jax.nn.sigmoid(jnp.einsum("bnc,bhwc->bnhw", k, f))
    )
    r = benchmark(jnp_asm, kernels, feats, iters=iters)
    print(f"assemble+sig[{name}]   xla:    {r.mean_s * 1e6:9.1f} us")
    r = benchmark(fused_assemble_sigmoid, kernels, feats, iters=iters)
    print(f"assemble+sig[{name}]   pallas: {r.mean_s * 1e6:9.1f} us")


def bench_frame_step(iters: int, use_pallas: bool):
    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.inference import make_frame_step
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.utils.precision import cast_variables

    set_pallas_enabled(use_pallas)
    try:
        cfg = VideoKNetConfig(max_insts=8)
        model = VideoKNet(cfg, train=False)
        img = jnp.zeros((1, 384, 1248, 3), jnp.float32)
        variables = cast_variables(model.init(jax.random.PRNGKey(0), img, img))
        img = img.astype(jnp.bfloat16)
        n_tot = cfg.num_proposals + cfg.num_stuff_classes
        k = cfg.head.conv_kernel_size**2
        prev = jnp.zeros((1, n_tot, k, cfg.head.in_channels), jnp.bfloat16)
        step = make_frame_step(model, variables, cfg, out_hw=(384, 1248))
        # pipelined timing (bench.py methodology): chain steps through the
        # carried kernels, sync once — per-iteration block_until_ready would
        # add a remote-tunnel round trip to every step
        import time

        is_first = jnp.asarray(False)
        t0 = time.perf_counter()
        out = None
        for _ in range(3):
            out = step(img, prev, is_first)
            prev = out["new_obj_feats"]
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(img, prev, is_first)
            prev = out["new_obj_feats"]
        jax.block_until_ready(out)
        mean_s = (time.perf_counter() - t0) / iters
        tag = "pallas" if use_pallas else "xla   "
        print(
            f"frame_step[{tag}]: {mean_s * 1e3:8.3f} ms "
            f"({1.0 / mean_s:.1f} fps, warmup+compile {compile_s:.1f} s)"
        )
        return mean_s
    finally:
        set_pallas_enabled(False)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--skip-step", action="store_true")
    args = p.parse_args()
    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    for dtype in (jnp.float32, jnp.bfloat16):
        bench_isolated(args.iters, dtype)
    if not args.skip_step:
        off = bench_frame_step(args.iters, use_pallas=False)
        on = bench_frame_step(args.iters, use_pallas=True)
        print(f"step speedup (xla->pallas): {off / on:.3f}x")


if __name__ == "__main__":
    main()
