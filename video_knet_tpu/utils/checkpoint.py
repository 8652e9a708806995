"""Checkpoint save/restore + torch->JAX weight import.

Replaces the reference's mmcv runner checkpointing (SURVEY.md §5.4: per-epoch
save with meta, `--resume-from` restoring model+optimizer+epoch, `--load-from`
weights-only) with orbax pytree checkpoints, and provides name-mapping importers
so torch-trained reference weights (ResNet-50 backbones and full K-Net
checkpoints) can seed parity tests, mirroring the two-phase transfer workflow
(image pretrain -> video finetune, README.md:59-80).
"""

from __future__ import annotations

import os
import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, state: Any, *, step: int | None = None) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(path: str, target: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), item=jax.device_get(target))
    return ckptr.restore(os.path.abspath(path))


def _t2j(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


class TrackedStateDict(dict):
    """Dict wrapper recording which checkpoint keys were actually read, so
    importers can assert that a reference state_dict was fully consumed
    (VERDICT round-1 item 2: importer asserts on leftover unconsumed keys)."""

    def __init__(self, data: Mapping[str, Any], used: set | None = None,
                 prefix: str = ""):
        super().__init__(data)
        self.used: set = used if used is not None else set()
        self.prefix = prefix

    def __getitem__(self, k):
        self.used.add(self.prefix + k)
        return super().__getitem__(k)

    def mark(self, k):
        self.used.add(self.prefix + k)


def _conv(w) -> np.ndarray:
    """torch conv [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return _t2j(w).transpose(2, 3, 1, 0)


def import_torch_resnet(
    state_dict: Mapping[str, Any], prefix: str = "backbone."
) -> tuple[dict, dict]:
    """mmdet/torchvision-style ResNet state_dict -> (params, batch_stats) pytrees
    matching video_knet_tpu.models.resnet.ResNet naming.

    Handles torchvision ('layer1.0.conv1.weight') and mmcv ('backbone.layer1...')
    prefixes; SyncBN/BN both map to flax BatchNorm(scale/bias + running stats).
    """
    used = getattr(state_dict, "used", None)
    sd = TrackedStateDict(
        {k[len(prefix):] if k.startswith(prefix) else k: v
         for k, v in state_dict.items()},
        used=used if used is not None else set(),
        prefix=prefix if any(k.startswith(prefix) for k in state_dict) else "",
    )
    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val)

    def map_bn(src, dst):
        put(params, dst + ("scale",), _t2j(sd[src + ".weight"]))
        put(params, dst + ("bias",), _t2j(sd[src + ".bias"]))
        put(stats, dst + ("mean",), _t2j(sd[src + ".running_mean"]))
        put(stats, dst + ("var",), _t2j(sd[src + ".running_var"]))

    put(params, ("conv1", "kernel"), _conv(sd["conv1.weight"]))
    map_bn("bn1", ("bn1",))
    for key in sd:
        m = re.match(r"layer(\d)\.(\d+)\.conv(\d)\.weight$", key)
        if m:
            s, b, c = m.groups()
            blk = f"layer{s}_block{b}"
            put(params, (blk, f"conv{c}", "kernel"), _conv(sd[key]))
            map_bn(f"layer{s}.{b}.bn{c}", (blk, f"bn{c}"))
        m = re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight$", key)
        if m:
            s, b = m.groups()
            blk = f"layer{s}_block{b}"
            put(params, (blk, "downsample_conv", "kernel"), _conv(sd[key]))
            map_bn(f"layer{s}.{b}.downsample.1", (blk, "downsample_bn"))
    return params, stats


def import_torch_fpn(state_dict: Mapping[str, Any], prefix: str = "neck.") -> dict:
    """mmdet FPN state_dict -> params for models.resnet.FPN."""
    used = getattr(state_dict, "used", None)
    sd = TrackedStateDict(
        {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)},
        used=used if used is not None else set(),
        prefix=prefix,
    )
    params: dict = {}
    for i in range(4):
        params[f"lateral{i}"] = {
            "kernel": _conv(sd[f"lateral_convs.{i}.conv.weight"]),
            "bias": _t2j(sd[f"lateral_convs.{i}.conv.bias"]),
        }
        params[f"fpn_conv{i}"] = {
            "kernel": _conv(sd[f"fpn_convs.{i}.conv.weight"]),
            "bias": _t2j(sd[f"fpn_convs.{i}.conv.bias"]),
        }
    return params


def import_torch_hrnet(
    state_dict: Mapping[str, Any], prefix: str = "", width: int = 18
) -> tuple[dict, dict]:
    """UniTrack HRNet state_dict -> (params, batch_stats) pytrees matching
    video_knet_tpu.models.video.hrnet.HRNetEncoder naming.

    Mirrors the reference module tree (unitrack/model/hrnet.py): stem
    conv1/bn1/conv2/bn2; `layer1.{b}` Bottlenecks; `transition{t}.{i}(.0).{0,1}`
    Sequentials; `stage{s}.{m}.branches.{b}.{k}` BasicBlocks;
    `stage{s}.{m}.fuse_layers.{i}.{j}(.{k}).{0,1}` conv+bn pairs;
    `incre_modules.{i}.0` Bottlenecks and `downsamp_modules.{i}.{0,1}`
    conv(+bias)+bn. `final_layer.*` and `classifier.*` are dead code in the
    reference forward (hrnet.py:488-500 never calls them) and are skipped;
    everything else must be consumed — leftover keys (except
    num_batches_tracked bookkeeping) raise, so a renamed or missing module
    fails loudly instead of silently keeping random init.
    """
    sd = TrackedStateDict(
        {k[len(prefix):] if k.startswith(prefix) else k: v
         for k, v in state_dict.items()},
    )
    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val)

    def map_bn(src, dst):
        put(params, dst + ("scale",), _t2j(sd[src + ".weight"]))
        put(params, dst + ("bias",), _t2j(sd[src + ".bias"]))
        put(stats, dst + ("mean",), _t2j(sd[src + ".running_mean"]))
        put(stats, dst + ("var",), _t2j(sd[src + ".running_var"]))

    def map_conv_bn(conv_src, bn_src, dst_stem, *, bias=False):
        put(params, (dst_stem + "_conv", "kernel"), _conv(sd[conv_src]))
        if bias:
            put(params, (dst_stem + "_conv", "bias"),
                _t2j(sd[conv_src.rsplit(".", 1)[0] + ".bias"]))
        map_bn(bn_src, (dst_stem + "_bn",))

    def map_bottleneck(src, blk):
        for c in (1, 2, 3):
            put(params, (blk, f"conv{c}", "kernel"), _conv(sd[f"{src}.conv{c}.weight"]))
            map_bn(f"{src}.bn{c}", (blk, f"bn{c}"))
        if f"{src}.downsample.0.weight" in sd:
            put(params, (blk, "downsample_conv", "kernel"),
                _conv(sd[f"{src}.downsample.0.weight"]))
            map_bn(f"{src}.downsample.1", (blk, "downsample_bn"))

    def map_basic(src, blk):
        for c in (1, 2):
            put(params, (blk, f"conv{c}", "kernel"), _conv(sd[f"{src}.conv{c}.weight"]))
            map_bn(f"{src}.bn{c}", (blk, f"bn{c}"))

    # stem
    for c in (1, 2):
        put(params, (f"conv{c}", "kernel"), _conv(sd[f"conv{c}.weight"]))
        map_bn(f"bn{c}", (f"bn{c}",))
    # stage1 Bottlenecks
    for b in range(4):
        map_bottleneck(f"layer1.{b}", f"layer1_block{b}")
    # transition1 (two entries); transition2/3 have only the new branch
    map_conv_bn("transition1.0.0.weight", "transition1.0.1", "transition1_0")
    map_conv_bn("transition1.1.0.0.weight", "transition1.1.0.1", "transition1_1_0")
    for t in (2, 3):
        map_conv_bn(f"transition{t}.{t}.0.0.weight", f"transition{t}.{t}.0.1",
                    f"transition{t}_{t}_0")
    # stages 2..4 (HRNET_STAGES layout: (modules, blocks) = (1,4),(4,4),(3,4))
    for s, (num_modules, num_blocks) in zip((2, 3, 4), ((1, 4), (4, 4), (3, 4))):
        for m in range(num_modules):
            base = f"stage{s}.{m}"
            for b in range(s):
                for k in range(num_blocks):
                    map_basic(f"{base}.branches.{b}.{k}",
                              f"stage{s}_m{m}_b{b}_block{k}")
            for i in range(s):
                for j in range(s):
                    if j > i:
                        map_conv_bn(
                            f"{base}.fuse_layers.{i}.{j}.0.weight",
                            f"{base}.fuse_layers.{i}.{j}.1",
                            f"stage{s}_m{m}_fuse{i}_{j}",
                        )
                    elif j < i:
                        for k in range(i - j):
                            map_conv_bn(
                                f"{base}.fuse_layers.{i}.{j}.{k}.0.weight",
                                f"{base}.fuse_layers.{i}.{j}.{k}.1",
                                f"stage{s}_m{m}_fuse{i}_{j}_{k}",
                            )
    # classification head: incre Bottlenecks + chained downsample adds
    for i in range(4):
        map_bottleneck(f"incre_modules.{i}.0", f"incre{i}_block0")
    for i in range(3):
        map_conv_bn(f"downsamp_modules.{i}.0.weight", f"downsamp_modules.{i}.1",
                    f"downsamp{i}", bias=True)

    leftover = [
        k for k in sd
        if k not in sd.used
        and not k.endswith("num_batches_tracked")
        and not k.startswith(("final_layer.", "classifier."))
    ]
    if leftover:
        raise KeyError(f"unconsumed HRNet checkpoint keys: {leftover[:8]}...")
    return params, stats


def load_torch_file(path: str) -> Mapping[str, Any]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj.get("state_dict", obj)


def image_to_video_params(image_params: dict) -> dict:
    """Remap an image-K-Net param tree for loading into VideoKNet.

    The two-phase workflow (README.md:59-80): image pretraining then --load-from
    into the video model. The video model hosts the kernel-update heads at top
    level (mask_head_{s}) instead of under roi_head; tracking/linking layers stay
    randomly initialized.
    """
    out = {k: v for k, v in image_params.items() if k != "roi_head"}
    for name, head in image_params.get("roi_head", {}).items():
        out[name] = head
    return out


def merge_params(target: dict, imported: dict) -> dict:
    """Recursively overlay imported leaves onto a target params tree (shape-checked)."""
    out = dict(target)
    for k, v in imported.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            if k in out and hasattr(out[k], "shape") and out[k].shape != v.shape:
                raise ValueError(f"shape mismatch at {k}: {out[k].shape} vs {v.shape}")
            out[k] = v
    return out
