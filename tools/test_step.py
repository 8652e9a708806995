"""Online VPS inference over a DVPS dataset; dumps per-frame PNGs.

Equivalent surface to the reference's tools/test_step.py:24-75: for every frame in
sequence order run the stateful per-frame step (tracker resets at sequence
boundaries) and write `{seq}/{frame}_cat.png`, `{seq}/{frame}_ins.png` and the
3-channel `final/` visualization consumed by the offline VPQ/STQ evaluators.

Usage:
  python tools/test_step.py --data-root data/kitti-step --checkpoint ckpt \
      --out out/vps [--split val]
"""

from __future__ import annotations

# allow `python tools/<tool>.py` from anywhere (repo root on sys.path)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
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
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--split", default="val")
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, nargs=2, default=[384, 1248],
                   help="inference H W (static shape)")
    p.add_argument("--tracker", default="quasi_dense",
                   choices=["quasi_dense", "quasi_dense_host", "unitrack",
                            "tao", "simple", "overlap"])
    p.add_argument("--appearance", default=None,
                   choices=[None, "resnet18", "resnet34", "resnet50", "random"],
                   help="UniTrack frozen appearance encoder (--tracker "
                        "unitrack): embeddings come from this net over the "
                        "raw frame instead of the track head")
    p.add_argument("--appearance-checkpoint", default=None,
                   help="torchvision-style .pth for the appearance encoder")
    p.add_argument("--tta-scales", type=float, nargs="*", default=None,
                   help="multi-scale TTA ratios, e.g. 0.75 1.0 1.25 "
                        "(MultiScaleFlipAugVideo parity)")
    p.add_argument("--tta-flip", action="store_true",
                   help="add horizontal-flip TTA")
    return p.parse_args()


def main():
    args = parse_args()
    from video_knet_tpu.config import kitti_step_video_config, vipseg_video_config
    from video_knet_tpu.data.datasets import KittiStepDVPS, VIPSegDVPS
    from video_knet_tpu.data.panoptic_png import encode_two_channel_vps, load_png, save_png
    from video_knet_tpu.data.transforms import keep_ratio_resize_pad
    from video_knet_tpu.models.video.inference import VPSInferencePipeline
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.utils.checkpoint import merge_params, restore_checkpoint

    cfg = (
        kitti_step_video_config()
        if args.dataset == "kitti_step"
        else vipseg_video_config()
    )
    cfg = dataclasses.replace(cfg, backbone=args.backbone)
    ds_cls = KittiStepDVPS if args.dataset == "kitti_step" else VIPSegDVPS
    ds = ds_cls(args.data_root, split=args.split)

    model = VideoKNet(cfg, train=False)
    h, w = args.size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    if args.checkpoint:
        loaded = restore_checkpoint(args.checkpoint)
        params = loaded.get("params", loaded)
        variables = {
            "params": merge_params(variables["params"], params),
            "batch_stats": loaded.get("batch_stats", variables.get("batch_stats", {})),
        }

    appearance_fn = None
    if args.appearance:
        from video_knet_tpu.models.video.appearance import (
            init_appearance,
            make_appearance_fn,
            make_appearance_model,
        )

        app_model = make_appearance_model(args.appearance)
        app_vars = init_appearance(app_model, hw=(h, w))
        if args.appearance_checkpoint:
            import torch

            from video_knet_tpu.utils.checkpoint import import_torch_resnet

            sd = torch.load(args.appearance_checkpoint, map_location="cpu")
            sd = sd.get("state_dict", sd)
            a_params, a_stats = import_torch_resnet(sd, prefix="")
            app_vars = {"params": a_params, "batch_stats": a_stats}
        appearance_fn = make_appearance_fn(app_model, app_vars)

    thing_ids = ds.thing_ids_in_seg if args.dataset == "kitti_step" else None
    pipe = VPSInferencePipeline(
        model, variables, cfg, out_hw=(h, w), thing_ids_in_orig=thing_ids,
        tracker_type=args.tracker, appearance_fn=appearance_fn,
    )

    tta_fn = tta_lut = None
    if args.tta_scales:
        # MultiScaleFlipAugVideo parity: fuse semantic logits across scales /
        # flips over the jitted forward (data/tta.py; one compile per scale)
        from video_knet_tpu.data.tta import (
            make_tta_semantic_fn,
            things_first_to_dataset_lut,
        )

        tta_fn = make_tta_semantic_fn(
            model, variables, cfg, (h, w), args.tta_scales, flip=args.tta_flip
        )
        tta_lut = things_first_to_dataset_lut(
            cfg.num_thing_classes, cfg.num_stuff_classes, thing_ids
        )

    os.makedirs(args.out, exist_ok=True)
    n = 0
    t0 = time.time()
    pairs = list(ds.iter_test())
    flags = [f for _, f in pairs]
    meta: list = []

    def frames():
        for sample, _ in pairs:
            rgb = load_png(sample.img)
            # keep-ratio resize into the static canvas (reference test
            # pipeline: keep_ratio Resize + Pad); crop back to content below
            x, content = keep_ratio_resize_pad(rgb, (h, w))
            meta.append((rgb.shape[:2], content, rgb if tta_fn else None))
            yield jnp.asarray(x)[None]

    # windowed pipelined inference: device steps for the next frames overlap
    # the host-side tracking/PNG writing of the previous ones
    for i, res in enumerate(pipe.run_sequence(frames(), flags)):
        sample = pairs[i][0]
        ori_hw, (ch, cw), rgb = meta[i]

        seq_dir = os.path.join(args.out, "panoptic", str(sample.seq_id))
        final_dir = os.path.join(args.out, "final", str(sample.seq_id))
        os.makedirs(seq_dir, exist_ok=True)
        os.makedirs(final_dir, exist_ok=True)
        # resize label maps back to original resolution (nearest)
        from video_knet_tpu.data.transforms import nearest_resize

        sem = nearest_resize(res.semantic_map.astype(np.int32)[:ch, :cw], ori_hw)
        if tta_fn is not None:
            # fused multi-scale semantic map replaces the single-scale one;
            # the panoptic/track outputs stay single-scale (reference release
            # configs never fuse instance outputs across scales either)
            sem = nearest_resize(tta_lut[tta_fn(rgb)][:ch, :cw], ori_hw)
        trk = nearest_resize(res.track_map.astype(np.int32)[:ch, :cw], ori_hw)
        stem = f"{sample.img_id:06d}"
        save_png(os.path.join(seq_dir, stem + "_cat.png"), sem.astype(np.uint8))
        save_png(os.path.join(seq_dir, stem + "_ins.png"),
                 (trk % 65536).astype(np.uint16))
        save_png(os.path.join(final_dir, stem + ".png"),
                 encode_two_channel_vps(sem, trk))
        n += 1
        if n % 50 == 0:
            print(f"{n} frames, {n / (time.time() - t0):.2f} fps")
    print(f"done: {n} frames in {time.time() - t0:.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
