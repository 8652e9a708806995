"""Serving-step time breakdown at b=1 vs b=8 (VERDICT r04 item 4).

BENCH_r04 showed batched 8-stream serving at only 1.23x the single-stream
device step (185.3 vs 150.7 fps) with the host fully overlapped — so the
batched device graph IS the floor, but nothing said whether R-50 @ 384x1248
genuinely saturates the chip at b=1 or the batched graph has a layout/fusion
problem. This script attributes the serving step's milliseconds per frame to

  backbone_neck — ResNet-50 + FPN forward
  model_fwd     — the full VideoKNet.test_step (backbone + kernel heads +
                  linking + track embeds); heads = model_fwd - backbone_neck
  frame         — the complete serving graph (test_step + panoptic decode +
                  on-device tracker), the same windowed-scan graph bench.py's
                  device_step_fps times; decode+tracker = frame - model_fwd

at each batch size. Sub-ms blocks cannot be timed call-by-call through the
remote-TPU tunnel (per-dispatch overhead is milliseconds), so each block is
iterated K times INSIDE one jit via lax.scan with a scalar data feedback
(the carry perturbs the input by c*1e-30, forcing serial re-execution), and
the full frame graph threads its real recurrence (kernels + tracker memory)
across repeated windows exactly like serving does. XLA cost analysis
provides per-block FLOPs and bytes-accessed upper bounds for the roofline
columns (compute ideal vs HBM-bytes-UB ideal).

Usage: python scripts/profile_serving.py [--hw 384 1248] [--batches 1 8]
Prints one JSON line; writes nothing.
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

jax.config.update("jax_compilation_cache_dir", "/tmp/vknet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_BF16 = 197e12  # v5e dense bf16 FLOP/s
HBM_BW = 8.19e11  # v5e HBM bytes/s


def loop_timed(body, *args, K=12, M=3):
    """Time `body(carry, *args) -> carry` executed K times inside ONE jit
    (scan with scalar feedback); returns seconds per iteration.

    The carry is threaded across the M outer dispatches, and the timed
    region ends with jax.device_get of the scalar carry, NOT
    block_until_ready: on the remote axon backend block_until_ready on a
    small scalar result can return before execution (measured 26 us/iter for
    a 134-GFLOP graph, >5x the chip's peak — the unchained-execution
    pathology PARITY.md round 5 records), while an actual value transfer
    forces the sync (probe: same graph, 2.85 ms/iter with device_get). The
    one tunnel RTT this adds is amortized over M*K iterations."""

    @jax.jit
    def run(c0, *a):
        def sbody(c, _):
            return body(c, *a), None

        c, _ = jax.lax.scan(sbody, c0, None, length=K)
        return c

    c = jnp.zeros((), jnp.float32)
    for _ in range(2):
        c = run(c, *args)
    jax.device_get(c)
    t0 = time.perf_counter()
    for _ in range(M):
        c = run(c, *args)
    jax.device_get(c)
    return (time.perf_counter() - t0) / (M * K)


def fmax(tree) -> jnp.ndarray:
    """Scalar feedback: max of the first float leaf."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.max(leaf).astype(jnp.float32)
    return jnp.zeros((), jnp.float32)


def cost_of(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", float("nan"))), float(
        c.get("bytes accessed", float("nan"))
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(384, 1248))
    ap.add_argument("--batches", type=int, nargs="+", default=(1, 8))
    args = ap.parse_args()
    hw = tuple(args.hw)

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.device_tracker import init_tracker_state
    from video_knet_tpu.models.video.inference import (
        _track_embed_dim,
        make_device_tracker_frame_step,
    )
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.utils.precision import cast_variables

    cfg = VideoKNetConfig(max_insts=8)
    model = VideoKNet(cfg, train=False)
    img0 = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, img0)
    variables = cast_variables(variables)  # the bf16 serving path
    rng = np.random.RandomState(0)
    n_tot = cfg.num_proposals + cfg.num_stuff_classes
    kk = cfg.head.conv_kernel_size ** 2

    res = {"hw": list(hw), "device": jax.devices()[0].device_kind,
           "dtype": "bf16"}

    for b in args.batches:
        img = jnp.asarray(rng.randn(b, *hw, 3).astype(np.float32),
                          jnp.bfloat16)
        prev = jnp.zeros((b, n_tot, kk, cfg.head.in_channels), jnp.float32)
        isf = jnp.zeros((b,), bool) if b > 1 else jnp.asarray(False)
        row: dict = {}

        # ---- backbone + neck forward
        def bb(c, vars_, im):
            feats = model.apply(
                vars_, im + (c * 1e-30).astype(im.dtype),
                method=VideoKNet.extract_feat,
            )
            return fmax(feats)

        row["backbone_neck_ms"] = loop_timed(bb, variables, img) * 1e3
        jbb = jax.jit(
            lambda vars_, im: model.apply(
                vars_, im, method=VideoKNet.extract_feat
            )
        )
        f, by = cost_of(jbb, variables, img)
        row["backbone_neck_gflops"] = f / 1e9
        row["backbone_neck_compute_ideal_ms"] = f / PEAK_BF16 * 1e3
        row["backbone_neck_mem_ideal_ms_ub"] = by / HBM_BW * 1e3

        # ---- full model forward (test_step: heads + linking + embeds)
        def mf(c, vars_, im, pv):
            out = model.apply(
                vars_, im + (c * 1e-30).astype(im.dtype), pv, isf,
                method=VideoKNet.test_step,
            )
            return fmax(out)

        row["model_fwd_ms"] = loop_timed(mf, variables, img, prev) * 1e3
        jmf = jax.jit(
            lambda vars_, im, pv: model.apply(
                vars_, im, pv, isf, method=VideoKNet.test_step
            )
        )
        f, by = cost_of(jmf, variables, img, prev)
        row["model_fwd_gflops"] = f / 1e9
        row["model_fwd_compute_ideal_ms"] = f / PEAK_BF16 * 1e3
        row["model_fwd_mem_ideal_ms_ub"] = by / HBM_BW * 1e3

        # ---- complete serving frame graph (scan window, real recurrence)
        step = make_device_tracker_frame_step(
            model, variables, cfg, hw, batched=(b > 1)
        )
        K = 8
        if b > 1:
            stacked = jnp.broadcast_to(img, (K, *img.shape))
            isfs = jnp.zeros((K, b), bool)
        else:
            stacked = jnp.broadcast_to(img, (K, *img.shape))
            isfs = jnp.zeros((K,), bool)
        do = jnp.ones((K,), bool)
        st = init_tracker_state(
            cfg.tracker, cfg.test.max_per_img, _track_embed_dim(cfg)
        )
        if b > 1:
            st = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (b, *x.shape)), st
            )
        pv, stt = prev, st
        out = None
        for _ in range(2):  # compile + steady layout
            out = step.scan(stacked, pv, stt, isfs, do)
            pv, stt = out["new_obj_feats"], out["track_state"]
        jax.block_until_ready(out["pan"])
        t0 = time.perf_counter()
        M = 4
        for _ in range(M):
            out = step.scan(stacked, pv, stt, isfs, do)
            pv, stt = out["new_obj_feats"], out["track_state"]
        jax.block_until_ready(out["pan"])
        row["frame_ms"] = (time.perf_counter() - t0) / (M * K) * 1e3

        jscan = jax.jit(lambda im, p, s, i, d: step.scan(im, p, s, i, d))
        # XLA cost analysis counts a lax.scan body ONCE (not length times),
        # so the scan graph's numbers are already per-frame — do NOT divide
        # by K (doing so made frame_gflops 8x smaller than model_fwd_gflops,
        # which the frame graph contains).
        f, by = cost_of(jscan, stacked, prev, st, isfs, do)
        row["frame_gflops"] = f / 1e9
        row["frame_compute_ideal_ms"] = f / PEAK_BF16 * 1e3
        row["frame_mem_ideal_ms_ub"] = by / HBM_BW * 1e3

        # ---- derived attributions
        row["heads_ms_est"] = row["model_fwd_ms"] - row["backbone_neck_ms"]
        row["decode_tracker_ms_est"] = row["frame_ms"] - row["model_fwd_ms"]
        res[f"b{b}"] = {k: round(v, 3) for k, v in row.items()}

    bs = [b for b in args.batches if f"b{b}" in res]
    if len(bs) >= 2:
        lo, hi = f"b{bs[0]}", f"b{bs[-1]}"
        ratio = bs[-1] / bs[0]
        res["scaling"] = {
            k.replace("_ms", ""): round(
                res[lo][k] * ratio / res[hi][k], 2
            )
            for k in ("backbone_neck_ms", "model_fwd_ms", "frame_ms")
        }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
