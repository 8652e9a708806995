"""Cityscapes-VPS VPQ: windowed PQ with lambda in {0, 5, 10, 15} frames.

Equivalent surface to the reference's tools/eval_vps.py +
tools/utils/cityscapesvps_eval.py (CityscapesVps.inference_panoptic_video):
every val clip contributes 6 evaluated frames; VPQ^lambda concatenates
(lambda/5 + 1) consecutive evaluated frames per window. Inputs here are the
cat/ins PNG dumps of tools/test_step.py against 2-channel GT panoptic PNGs
(category, instance).

Usage:
  python tools/eval_vpq_cityscapes.py RESULT_DIR --gt-dir gtFinePanoptic/val
"""

from __future__ import annotations

# allow `python tools/<tool>.py` from anywhere (repo root on sys.path)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_path")
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--num-classes", type=int, default=19)
    p.add_argument("--thing-ids", type=int, nargs="+", default=list(range(11, 19)))
    p.add_argument("--lambdas", type=int, nargs="+", default=[0, 5, 10, 15])
    args = p.parse_args()

    from video_knet_tpu.data.panoptic_png import load_png
    from video_knet_tpu.eval.vpq import MAX_INS, VPQStats, vpq_from_stats, window_vpq

    pred_dir = os.path.join(args.result_path, "panoptic")
    things = np.zeros(args.num_classes, bool)
    for t in args.thing_ids:
        things[t] = True

    seqs = sorted(os.listdir(pred_dir))
    for lam in args.lambdas:
        k = lam // 5 + 1
        total = VPQStats(num_cat=args.num_classes + 1)
        for seq in seqs:
            d = os.path.join(pred_dir, seq)
            cats = sorted(f for f in os.listdir(d) if f.endswith("_cat.png"))
            inss = sorted(f for f in os.listdir(d) if f.endswith("_ins.png"))
            gts = sorted(
                f for f in os.listdir(args.gt_dir) if f.startswith(seq)
            )
            pc = [load_png(os.path.join(d, f)).astype(np.int64) for f in cats]
            pi = [load_png(os.path.join(d, f)).astype(np.int64) for f in inss]
            gp = []
            for f in gts:
                g = load_png(os.path.join(args.gt_dir, f)).astype(np.int64)
                if g.ndim == 3:  # 2-channel (cat, ins) stored as RGB
                    gp.append(g[..., 0] * MAX_INS + g[..., 1])
                else:
                    gp.append(g)
            n = min(len(pc), len(gp))
            if n >= k:
                total += window_vpq(pc[:n], pi[:n], gp[:n], eval_frames=k,
                                    num_cat=args.num_classes + 1)
        res = vpq_from_stats(total, num_classes=args.num_classes, things_index=things)
        print(
            f"lambda={lam}: VPQ {res['PQ']:.1f}  th {res['PQ_th']:.1f}  "
            f"st {res['PQ_st']:.1f}"
        )


if __name__ == "__main__":
    main()
