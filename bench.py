"""Benchmark: Video K-Net VPS (R-50) online inference throughput on one chip.

Measures frames/sec of the jitted per-frame step (backbone + FPN + kernel heads +
cross-frame linking + panoptic decode + track embeddings) at KITTI-STEP-like
resolution (384 x 1248, the reference's train crop / test short side;
configs/det/video_knet_kitti_step/...joint_train.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / V100_BASELINE_FPS; the reference publishes no throughput
(SURVEY.md §6), so the baseline is a V100 estimate for this model class (R-50
kernel-based panoptic at ~0.5 MP, ~=10 fps on V100 with the reference's python/
CPU-sync-heavy inference loop).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

V100_BASELINE_FPS = 10.0
H, W = 384, 1248
WARMUP = 3
ITERS = 20
USE_BF16 = os.environ.get("VKNET_BENCH_BF16", "1") == "1"


def main():
    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.models.video.inference import make_frame_step
    from video_knet_tpu.utils.precision import cast_variables

    cfg = VideoKNetConfig(max_insts=8)
    model = VideoKNet(cfg, train=False)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img)
    if USE_BF16:
        variables = cast_variables(variables)
        img = img.astype(jnp.bfloat16)
    n_tot = cfg.num_proposals + cfg.num_stuff_classes
    k = cfg.head.conv_kernel_size**2
    prev_obj = jnp.zeros(
        (1, n_tot, k, cfg.head.in_channels),
        jnp.bfloat16 if USE_BF16 else jnp.float32,
    )

    step = make_frame_step(model, variables, cfg, out_hw=(H, W))

    is_first = jnp.asarray(False)
    out = None
    for _ in range(WARMUP):
        out = step(img, prev_obj, is_first)
        prev_obj = out["new_obj_feats"]
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(img, prev_obj, is_first)
        prev_obj = out["new_obj_feats"]
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = ITERS / dt
    print(
        json.dumps(
            {
                "metric": "vps_online_inference_fps_r50_384x1248",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / V100_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
