"""Model FLOPs/params via XLA cost analysis.

Equivalent surface to tools/get_flops.py (reference uses mmcv's
get_model_complexity_info over forward_dummy); here XLA's compiled cost analysis
reports exact HLO flops for the jitted forward.

Usage:
  python tools/get_flops.py [--model vps|image|vis] [--shape 384 1248]
"""

from __future__ import annotations

# allow `python tools/<tool>.py` from anywhere (repo root on sys.path)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="vps", choices=["vps", "image", "vis"])
    p.add_argument("--shape", type=int, nargs=2, default=[384, 1248])
    p.add_argument("--backbone", default="resnet50")
    args = p.parse_args()
    h, w = args.shape

    import dataclasses

    if args.model == "image":
        from video_knet_tpu.config import KNetConfig
        from video_knet_tpu.models.knet import KNet

        cfg = dataclasses.replace(KNetConfig(), backbone=args.backbone)
        model = KNet(cfg, train=False)
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        fn = lambda img: model.apply(variables, img, mutable=False)
        lowered = jax.jit(fn).lower(x)
    elif args.model == "vps":
        from video_knet_tpu.config import kitti_step_video_config
        from video_knet_tpu.models.video.knet_vps import VideoKNet

        cfg = dataclasses.replace(kitti_step_video_config(), backbone=args.backbone)
        model = VideoKNet(cfg, train=False)
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, x)
        n_tot = cfg.num_proposals + cfg.num_stuff_classes
        prev = jnp.zeros((1, n_tot, 1, 256), jnp.float32)
        fn = lambda img, p: model.apply(
            variables, img, p, jnp.asarray(False), method=VideoKNet.test_step
        )
        lowered = jax.jit(fn).lower(x, prev)
    else:
        from video_knet_tpu.config_vis import youtube_vis_2019_config
        from video_knet_tpu.models.vis.knet_vis import KNetVIS

        cfg = youtube_vis_2019_config()
        model = KNetVIS(cfg, train=False)
        x = jnp.zeros((1, 5, h, w, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        fn = lambda clip: model.apply(variables, clip, mutable=False)
        lowered = jax.jit(fn).lower(x)

    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables["params"])
    )
    print(f"model={args.model} input={h}x{w}")
    print(f"GFLOPs: {flops / 1e9:.2f}")
    print(f"params: {n_params / 1e6:.2f} M")


if __name__ == "__main__":
    main()
