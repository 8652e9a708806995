"""Full torch->JAX importer for reference K-Net checkpoints.

Maps an mmdet-trained Video K-Net / image K-Net state_dict (torch) onto our flax
param tree so reference checkpoints can seed fp-tolerance parity tests
(SURVEY.md §5.4). Name correspondences follow the reference module definitions:

  backbone.* / neck.*                 -> checkpoint.import_torch_resnet / _fpn
  rpn_head.init_kernels.weight        -> rpn_head/init_kernels          (kernel_head.py:124)
  rpn_head.localization_fpn.convs_all_levels.{i}[.conv{j}].{conv,gn}
                                      -> rpn_head/localization_fpn/l{i}_conv{j}
                                         (semantic_fpn_wrapper.py:74-150)
  rpn_head.localization_fpn.{conv_pred,aux_convs.k}
                                      -> .../conv_pred, aux_conv{k}
  rpn_head.{loc_convs,seg_convs}.{i}  -> rpn_head/{loc,seg}_conv{i}
  rpn_head.conv_seg                   -> rpn_head/conv_seg
  roi_head.mask_head.{s}.kernel_update_conv.{dynamic_layer,input_layer,
      input_gate,update_gate,fc_layer,norm_in,norm_out,input_norm_in,
      input_norm_out,fc_norm}         -> roi_head/mask_head_{s}/kernel_update_conv/*
                                         (knet/kernel_updator.py:36-53)
  roi_head.mask_head.{s}.attention.attn.{in_proj_*,out_proj}
                                      -> .../attention/{query,key,value,out}
  roi_head.mask_head.{s}.ffn.layers.{0.0,1}
                                      -> .../ffn/{Dense_0,Dense_1}
  roi_head.mask_head.{s}.{cls_fcs,mask_fcs}.{0 Linear,1 LN}
                                      -> .../{cls,mask}_fcs/{Dense_0,LayerNorm_0}
  roi_head.mask_head.{s}.{fc_cls,fc_mask,feat_transform}
                                      -> same names

Torch Linear weight [out, in] transposes to flax [in, out]; torch MHA packed
in_proj [3C, C] splits into per-head flax {query,key,value} kernels.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from video_knet_tpu.utils.checkpoint import (
    TrackedStateDict,
    _conv,
    _t2j,
    import_torch_fpn,
    import_torch_resnet,
)

# Keys in reference checkpoints that carry no weights we need: BN step
# counters, attention buffers recomputed at trace time, classification heads.
_IGNORABLE = re.compile(
    r"(num_batches_tracked$|relative_position_index$|attn_mask$|"
    r"^head\.|^norm\.|rpn_head\.localization_fpn\.positional_encoding)"
)


def _check_consumed(sd: TrackedStateDict, strict: bool, what: str):
    leftover = sorted(
        k for k in sd if k not in sd.used and not _IGNORABLE.search(k)
    )
    if leftover and strict:
        raise KeyError(f"{what}: {len(leftover)} unconsumed checkpoint keys, "
                       f"e.g. {leftover[:8]}")
    return leftover


def _lin(w) -> np.ndarray:
    return _t2j(w).T  # [out, in] -> [in, out]


def _put(tree: dict, path: tuple, val):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = val


def _ln(sd, src, dst, out):
    _put(out, dst + ("scale",), _t2j(sd[src + ".weight"]))
    _put(out, dst + ("bias",), _t2j(sd[src + ".bias"]))


def _convmodule(sd, src, dst, out):
    """mmcv ConvModule -> our ConvNormAct (Conv_0 [+ GroupNorm_0])."""
    _put(out, dst + ("Conv_0", "kernel"), _conv(sd[src + ".conv.weight"]))
    if src + ".conv.bias" in sd:
        _put(out, dst + ("Conv_0", "bias"), _t2j(sd[src + ".conv.bias"]))
    if src + ".gn.weight" in sd:
        _put(out, dst + ("GroupNorm_0", "scale"), _t2j(sd[src + ".gn.weight"]))
        _put(out, dst + ("GroupNorm_0", "bias"), _t2j(sd[src + ".gn.bias"]))


def _linear(sd, src, dst, out, bias=True):
    _put(out, dst + ("kernel",), _lin(sd[src + ".weight"]))
    if bias and src + ".bias" in sd:
        _put(out, dst + ("bias",), _t2j(sd[src + ".bias"]))


def _mha(sd, src, dst, out, num_heads: int):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = _t2j(sd[src + ".in_proj_weight"])  # [3C, C]
    b = _t2j(sd[src + ".in_proj_bias"])  # [3C]
    c = w.shape[1]
    hd = c // num_heads
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * c : (i + 1) * c].T.reshape(c, num_heads, hd)  # [in, h, hd]
        bi = b[i * c : (i + 1) * c].reshape(num_heads, hd)
        _put(out, dst + (name, "kernel"), wi)
        _put(out, dst + (name, "bias"), bi)
    wo = _t2j(sd[src + ".out_proj.weight"]).T.reshape(num_heads, hd, c)
    _put(out, dst + ("out", "kernel"), wo)
    _put(out, dst + ("out", "bias"), _t2j(sd[src + ".out_proj.bias"]))


def import_torch_knet(
    state_dict: Mapping[str, Any],
    *,
    num_stages: int = 3,
    num_heads: int = 8,
    num_loc_convs: int = 1,
    num_seg_convs: int = 1,
    num_aux_convs: int = 1,
    end_level: int = 3,
    upsample_times: int = 2,
    num_cls_fcs: int = 1,
    num_mask_fcs: int = 1,
    strict: bool = False,
) -> tuple[dict, dict]:
    """Returns (params, batch_stats) overlays for models.knet.KNet /
    models.video.knet_vps.VideoKNet (shared names; video linking and
    track-embedding layers are mapped when present in the checkpoint).

    With strict=True, raises if any non-buffer checkpoint key was left
    unconsumed — the guard that a reference VPS checkpoint fully loads."""
    sd = TrackedStateDict(dict(state_dict))
    params: dict = {}
    if any(k.startswith("backbone.patch_embed.") for k in sd):
        # swin-backbone joint-train checkpoint (the Swin-B VIP-Seg / KITTI
        # configs): route the backbone subtree through the swin importer
        bb_keys = [k for k in sd if k.startswith("backbone.")]
        params["backbone"] = import_torch_swin(
            {k: dict.__getitem__(sd, k) for k in bb_keys}, strict=strict
        )
        for k in bb_keys:
            sd.mark(k)
        stats = {}
    else:
        bb_params, bb_stats = import_torch_resnet(sd, prefix="backbone.")
        params["backbone"] = bb_params
        stats = {"backbone": bb_stats}
    params["neck"] = import_torch_fpn(sd, prefix="neck.")

    rpn: dict = {}
    _put(rpn, ("init_kernels",),
         _t2j(sd["rpn_head.init_kernels.weight"])[:, :, 0, 0])
    _put(rpn, ("conv_seg", "kernel"),
         _conv(sd["rpn_head.conv_seg.weight"]))
    _put(rpn, ("conv_seg", "bias"), _t2j(sd["rpn_head.conv_seg.bias"]))
    for i in range(num_loc_convs):
        _convmodule(sd, f"rpn_head.loc_convs.{i}", ("loc_conv" + str(i),), rpn)
    for i in range(num_seg_convs):
        _convmodule(sd, f"rpn_head.seg_convs.{i}", ("seg_conv" + str(i),), rpn)

    fpn_tree: dict = {}
    for key in list(sd):
        m = re.match(
            r"rpn_head\.localization_fpn\.convs_all_levels\.(\d+)\.conv(\d+)\.conv\.weight",
            key,
        )
        if m:
            i, j = m.groups()
            _convmodule(
                sd,
                f"rpn_head.localization_fpn.convs_all_levels.{i}.conv{j}",
                (f"l{i}_conv{j}",),
                fpn_tree,
            )
    _convmodule(sd, "rpn_head.localization_fpn.conv_pred", ("conv_pred",), fpn_tree)
    for k in range(num_aux_convs):
        _convmodule(
            sd, f"rpn_head.localization_fpn.aux_convs.{k}", (f"aux_conv{k}",), fpn_tree
        )
    rpn["localization_fpn"] = fpn_tree
    params["rpn_head"] = rpn

    roi: dict = {}
    for s in range(num_stages):
        pre = f"roi_head.mask_head.{s}"
        if pre + ".fc_mask.weight" not in sd:
            pre = f"mask_head.{s}"  # video model stores heads at top level
        head: dict = {}
        if pre + ".feat_transform.conv.weight" in sd:
            _put(head, ("feat_transform", "kernel"),
                 _conv(sd[pre + ".feat_transform.conv.weight"]))
            if pre + ".feat_transform.conv.bias" in sd:
                _put(head, ("feat_transform", "bias"),
                     _t2j(sd[pre + ".feat_transform.conv.bias"]))
        ku = pre + ".kernel_update_conv"
        for lin in ("dynamic_layer", "input_layer", "input_gate", "update_gate",
                    "fc_layer"):
            _linear(sd, f"{ku}.{lin}", ("kernel_update_conv", lin), head)
        for ln in ("norm_in", "norm_out", "input_norm_in", "input_norm_out",
                   "fc_norm"):
            _ln(sd, f"{ku}.{ln}", ("kernel_update_conv", ln), head)
        _mha(sd, pre + ".attention.attn", ("attention",), head, num_heads)
        _ln(sd, pre + ".attention_norm", ("attention_norm",), head)
        _linear(sd, pre + ".ffn.layers.0.0", ("ffn", "Dense_0"), head)
        _linear(sd, pre + ".ffn.layers.1", ("ffn", "Dense_1"), head)
        _ln(sd, pre + ".ffn_norm", ("ffn_norm",), head)
        for branch, n_fcs in (("cls_fcs", num_cls_fcs), ("mask_fcs", num_mask_fcs)):
            for i in range(n_fcs):
                _linear(sd, f"{pre}.{branch}.{3 * i}",
                        (branch, f"Dense_{i}"), head, bias=False)
                _ln(sd, f"{pre}.{branch}.{3 * i + 1}", (branch, f"LayerNorm_{i}"), head)
        _linear(sd, pre + ".fc_cls", ("fc_cls",), head)
        _linear(sd, pre + ".fc_mask", ("fc_mask",), head)
        # Video linking layers (joint-train checkpoints). The reference config
        # replicates previous='placeholder' over ALL stages (joint_train config
        # mask_head list), but only the last stage's layers are ever exercised
        # (kernel_iter_head.py:302-309,453-456) — map the last stage, consume
        # and discard the dead earlier-stage copies.
        if pre + ".attention_previous.attn.in_proj_weight" in sd:
            tgt = head if s == num_stages - 1 else {}
            _mha(sd, pre + ".attention_previous.attn", ("attention_previous",),
                 tgt, num_heads)
            _ln(sd, pre + ".attention_previous_norm", ("attention_previous_norm",),
                tgt)
            _linear(sd, pre + ".link_ffn.layers.0.0", ("link_ffn_previous", "Dense_0"),
                    tgt)
            _linear(sd, pre + ".link_ffn.layers.1", ("link_ffn_previous", "Dense_1"),
                    tgt)
            _ln(sd, pre + ".link_ffn_norm", ("link_ffn_previous_norm",), tgt)
        roi[f"mask_head_{s}"] = head
    params["roi_head"] = roi

    # Track-embedding layers of the joint-train VPS model: detector-level
    # embed_fcs (Linear no-bias + LN) -> fc_embed (joint_train.py:114-126) and
    # the QuasiDenseMaskEmbedHeadGTMask MLP (track_heads.py:600-642: fcs x2 +
    # fc_embed), all folded into our models.video.knet_vps.TrackEmbed.
    if "fc_embed.weight" in sd:
        te: dict = {}
        _linear(sd, "embed_fcs.0", ("embed_fc0",), te, bias=False)
        _ln(sd, "embed_fcs.1", ("embed_ln0",), te)
        _linear(sd, "fc_embed", ("fc_embed",), te)
        if "track_head.fc_embed.weight" in sd:
            i = 0
            # num_fcs varies per config (2 release, 1 "short_track_fc")
            while f"track_head.fcs.{i}.weight" in sd:
                _linear(sd, f"track_head.fcs.{i}", (f"track_fc{i}",), te)
                i += 1
            _linear(sd, "track_head.fc_embed", ("track_fc_embed",), te)
        params["track_embed"] = te

    _check_consumed(sd, strict, "import_torch_knet")
    return params, stats


def import_torch_swin(
    state_dict: Mapping[str, Any], *, strict: bool = False
) -> dict:
    """Official Swin checkpoint (microsoft naming) -> params for
    models.swin.SwinTransformer.

    Plays the role of the reference's swin_converter + custom load_checkpoint
    (/root/reference/swin/ckpt_convert.py:85, swin/swin_checkpoint.py:283),
    consuming the official naming directly. Our PatchMerging uses the official
    slice order (x0=even/even, x1=odd/even, x2=even/odd, x3=odd/odd), so no
    unfold-reorder correction is needed — weights map by plain transposition.

    Handles both classification checkpoints (final `norm.`/`head.` skipped;
    per-stage out_norms stay at init) and detection checkpoints carrying
    per-stage `norm{i}` layers, with or without a `backbone.` prefix.
    """
    raw = {k: v for k, v in state_dict.items()}
    if any(k.startswith("backbone.") for k in raw):
        raw = {k[len("backbone."):]: v for k, v in raw.items()
               if k.startswith("backbone.")}
    sd = TrackedStateDict(raw)
    p: dict = {}
    _put(p, ("patch_embed", "kernel"), _conv(sd["patch_embed.proj.weight"]))
    _put(p, ("patch_embed", "bias"), _t2j(sd["patch_embed.proj.bias"]))
    if "patch_embed.norm.weight" in sd:
        _ln(sd, "patch_embed.norm", ("patch_norm",), p)
    if "absolute_pos_embed" in sd:
        pe = _t2j(sd["absolute_pos_embed"])  # official [1, N, C]
        if pe.ndim == 3:
            g = int(round(pe.shape[1] ** 0.5))
            pe = pe.reshape(1, g, g, pe.shape[-1])
        _put(p, ("absolute_pos_embed",), pe)

    # per-block trees, then restacked into the scan layout
    # stage{i}_pairs/blk{j%2}/<leaf> with leading axis j//2 (models/swin.py
    # scans over [no-shift, shift] block pairs)
    blocks: dict[tuple[int, int], dict] = {}
    for key in list(sd):
        m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.norm1\.weight$", key)
        if not m:
            continue
        i, j = int(m.group(1)), int(m.group(2))
        src = f"layers.{i}.blocks.{j}"
        b: dict = {}
        _ln(sd, src + ".norm1", ("norm1",), b)
        _ln(sd, src + ".norm2", ("norm2",), b)
        _linear(sd, src + ".attn.qkv", ("attn", "qkv"), b)
        _linear(sd, src + ".attn.proj", ("attn", "proj"), b)
        _put(b, ("attn", "relative_position_bias_table"),
             _t2j(sd[src + ".attn.relative_position_bias_table"]))
        _linear(sd, src + ".mlp.fc1", ("mlp_fc1",), b)
        _linear(sd, src + ".mlp.fc2", ("mlp_fc2",), b)
        blocks[(i, j)] = b
    import jax as _jax
    import jax.numpy as _jnp

    for i in sorted({s for s, _ in blocks}):
        js = sorted(j for s, j in blocks if s == i)
        pairs: dict = {}
        for parity, nm in ((0, "blk0"), (1, "blk1")):
            trees = [blocks[(i, j)] for j in js if j % 2 == parity]
            pairs[nm] = _jax.tree_util.tree_map(
                lambda *xs: _jnp.stack(xs), *trees
            )
        p[f"stage{i}_pairs"] = pairs

    for key in list(sd):
        m = re.match(r"layers\.(\d+)\.downsample\.reduction\.weight$", key)
        if m:
            i = m.group(1)
            _linear(sd, f"layers.{i}.downsample.reduction",
                    (f"downsample{i}", "reduction"), p, bias=False)
            _ln(sd, f"layers.{i}.downsample.norm", (f"downsample{i}", "norm"), p)
        m = re.match(r"norm(\d+)\.weight$", key)
        if m:  # detection-style per-stage output norms
            i = m.group(1)
            _ln(sd, f"norm{i}", (f"out_norm{i}",), p)

    _check_consumed(sd, strict, "import_torch_swin")
    return p
