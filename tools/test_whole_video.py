"""Whole-video VIS inference + YT-VIS submission dump.

Equivalent surface to tools_vis/test_whole_video.py + tools_vis/apis/test.py: load
each video, run the clip model over all frames (chunked to a static clip length),
RLE-encode the per-frame masks, and write results.json + submission_file.zip.

Usage:
  python tools/test_whole_video.py --ann-file valid.json --img-root valid/JPEGImages \
      --checkpoint ckpt --out out/vis [--clip-len 8] [--size 360 640]
"""

from __future__ import annotations

# allow `python tools/<tool>.py` from anywhere (repo root on sys.path)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--img-root", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--clip-len", type=int, default=8)
    p.add_argument("--size", type=int, nargs=2, default=[360, 640])
    p.add_argument("--score-thr", type=float, default=0.0)
    return p.parse_args()


def main():
    args = parse_args()
    from video_knet_tpu.config_vis import youtube_vis_2019_config
    from video_knet_tpu.data.panoptic_png import load_png
    from video_knet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, bilinear_resize
    from video_knet_tpu.data.ytvis import (
        YouTubeVISDataset,
        format_vis_results,
        tracks_from_prediction,
    )
    from video_knet_tpu.models.vis.knet_vis import KNetVIS, vis_decode
    from video_knet_tpu.utils.checkpoint import merge_params, restore_checkpoint

    cfg = youtube_vis_2019_config()
    ds = YouTubeVISDataset(args.ann_file, img_root=args.img_root)
    h, w = args.size
    t = args.clip_len

    model = KNetVIS(cfg, train=False)
    dummy = jnp.zeros((1, t, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy)
    if args.checkpoint:
        loaded = restore_checkpoint(args.checkpoint)
        params = loaded.get("params", loaded)
        variables = {
            "params": merge_params(variables["params"], params),
            "batch_stats": loaded.get("batch_stats", variables.get("batch_stats", {})),
        }

    # weights as a jit argument (closure constants bloat the compile payload)
    @jax.jit
    def _run_clip(vars_, clip):
        outs = model.apply(vars_, clip, mutable=False)
        return vis_decode(outs, cfg, out_hw=(h, w))

    def run_clip(clip):
        return _run_clip(variables, clip)

    all_tracks = []
    t0 = time.time()
    for vi, video in enumerate(ds.videos):
        frames = []
        for im in video.frames:
            path = im["file_name"]
            if args.img_root:
                path = os.path.join(args.img_root, path)
            rgb = load_png(path)
            x = bilinear_resize(rgb, (h, w))
            frames.append((x - IMAGENET_MEAN) / IMAGENET_STD)
        n = len(frames)
        # chunk the video into static-length clips (last chunk padded by repeat)
        per_frame_masks = []
        labels = scores = None
        for start in range(0, n, t):
            chunk = frames[start : start + t]
            while len(chunk) < t:
                chunk.append(chunk[-1])
            clip = jnp.asarray(np.stack(chunk))[None]
            pred = run_clip(clip)
            m = np.asarray(pred.masks)[: min(t, n - start)]
            per_frame_masks.append(m)
            if labels is None:  # first chunk fixes tube identity/category
                labels = np.asarray(pred.labels)
                scores = np.asarray(pred.scores)
        masks = np.concatenate(per_frame_masks, axis=0)  # [n, K, h, w]
        tracks = tracks_from_prediction(
            video.video_id, masks, labels, scores, ds.cat_ids,
            score_thr=args.score_thr,
        )
        all_tracks.append(tracks)
        if (vi + 1) % 20 == 0:
            print(f"{vi + 1}/{len(ds)} videos, {(vi + 1) / (time.time() - t0):.2f} vids/s")

    path = format_vis_results(all_tracks, args.out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
