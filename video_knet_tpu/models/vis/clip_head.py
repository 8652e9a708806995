"""Clip-level tracker head for VIS: query fusion + clip kernel-update stages.

TPU-first rebuild of KernelFrameIterHeadVideo + KernelUpdateHeadVideo
(knet_vis/tracker/kernel_frame_iter_head.py:14-383,
knet_vis/tracker/kernel_update_head.py:20-374):

 - `_query_fusion`: per-frame kernels [B, T, N, C] are merged into N clip kernels
   by mean over T or by cross-attention from a learned init query against all T*N
   kernels (+ LN + FFN + LN).
 - stages 0..assign_stages-1 operate on CLIP kernels: mask-pool per frame
   (einsum over [B,T,N,H,W] x [B,T,H,W,C]), fuse across frames, KernelUpdator,
   kernel-interaction MHA, FFN, cls + mask branches; new masks are per-frame
   dynamic convs of the shared clip kernels (one einsum).
 - stages assign_stages.. operate PER-FRAME: the clip kernels are broadcast over
   T and each frame's kernels update independently (no cls branch); the python
   per-(image, frame) conv loops of the reference become batched einsums.

All python loops over batch/frames are replaced by batched tensor ops; the
per-frame branch folds T into the batch axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.config import KernelUpdateHeadConfig
from video_knet_tpu.models.kernel_updator import KernelUpdator
from video_knet_tpu.models.layers import FFN, MLP, resize_mask_bilinear
from video_knet_tpu.models.kernel_iter_head import upscale_masks

Array = jax.Array


class ClipStageOutput(NamedTuple):
    cls_score: Array | None  # [B, N, C] (None for per-frame stages)
    mask_preds: Array  # [B, T, N, H, W]
    scaled_mask_preds: Array  # [B, T, N, Hs, Ws]
    object_feats: Array  # [B, N, C] (clip) or [B, T, N, C] (per-frame)


class ClipKernelUpdateHead(nn.Module):
    """One clip stage. `per_frame=True` -> kernels carry a T axis, no cls."""

    cfg: KernelUpdateHeadConfig
    per_frame: bool = False

    @nn.compact
    def __call__(
        self, x: Array, proposal_feat: Array, mask_preds: Array
    ) -> tuple[Array | None, Array, Array]:
        """x: [B, T, H, W, C]; mask_preds: [B, T, N, Hm, Wm];
        proposal_feat: [B, N, C] (clip) or [B, T, N, C] (per-frame)."""
        cfg = self.cfg
        b, t = x.shape[:2]
        n = proposal_feat.shape[-2]
        if cfg.feat_transform:
            x = nn.Conv(cfg.in_channels, (1, 1), name="feat_transform")(x)
        h, w, c = x.shape[-3:]

        if mask_preds.shape[-2:] != (h, w):
            gather_mask = resize_mask_bilinear(mask_preds, (h, w))
        else:
            gather_mask = mask_preds
        hard = (jax.nn.sigmoid(gather_mask.astype(jnp.float32)) > cfg.hard_mask_thr
                ).astype(x.dtype)
        # per-frame mask pooling: one batched MXU contraction
        x_feat_tf = jnp.einsum("btnhw,bthwc->btnc", hard, x)

        if self.per_frame:
            x_feat = x_feat_tf  # [B, T, N, C]
            kernels = proposal_feat  # [B, T, N, C]
        else:
            x_feat = x_feat_tf.mean(axis=1)  # frame fusion: mean (release config)
            kernels = proposal_feat  # [B, N, C]

        obj_feat = KernelUpdator(
            in_channels=cfg.updator.in_channels,
            feat_channels=cfg.updator.feat_channels,
            out_channels=cfg.updator.out_channels,
            name="kernel_update_conv",
        )(x_feat, kernels[..., None, :])[..., 0, :]  # K=1 group axis

        # kernel interaction over the N kernels (frames folded into batch when
        # per_frame)
        flat = obj_feat.reshape(-1, n, c)
        att = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, qkv_features=c, name="attention"
        )(flat, flat)
        flat = nn.LayerNorm(epsilon=1e-5, name="attention_norm")(flat + att)
        obj_feat = flat.reshape(obj_feat.shape)

        if cfg.with_ffn:
            obj_feat = nn.LayerNorm(epsilon=1e-5, name="ffn_norm")(
                FFN(cfg.feedforward_channels, cfg.in_channels, name="ffn")(obj_feat)
            )

        cls_score = None
        if not self.per_frame:
            cls_feat = MLP(cfg.num_cls_fcs, cfg.in_channels, name="cls_fcs")(obj_feat)
            cls_score = nn.Dense(
                cfg.num_classes,
                bias_init=nn.initializers.constant(-4.59511985013459),
                name="fc_cls",
            )(cls_feat)

        mask_feat = MLP(cfg.num_mask_fcs, cfg.in_channels, name="mask_fcs")(obj_feat)
        mask_kernels = nn.Dense(cfg.out_channels, name="fc_mask")(mask_feat)

        if self.per_frame:
            new_masks = jnp.einsum("btnc,bthwc->btnhw", mask_kernels, x)
        else:
            new_masks = jnp.einsum("bnc,bthwc->btnhw", mask_kernels, x)
        return cls_score, new_masks, obj_feat


class ClipKernelHead(nn.Module):
    """The tracker head: query fusion + tracker_num_stages clip stages.

    query_merge_method: 'mean' | 'attention' | 'attention_pos' (learned query
    positional embeddings added on both sides, kernel_frame_iter_head.py:156-168).
    direct_seed=True corresponds to the reference's `direct_tracker` mode
    (knet_vis/tracker/track.py:194-213): the clip kernels are re-seeded from the
    raw learned init kernels instead of fusing the per-frame final kernels.
    with_mask_init adds the fc_mask dynamic-conv mask re-initialization
    (kernel_frame_iter_head.py:170-180).
    """

    head_cfg: KernelUpdateHeadConfig
    num_stages: int = 3
    assign_stages: int = 2
    num_proposals: int = 100
    query_merge_method: str = "mean"
    with_mask_init: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        per_frame_kernels: Array | None,
        mask_preds: Array,
        direct_kernels: Array | None = None,
        clip_kernels: Array | None = None,
    ) -> list[ClipStageOutput]:
        """x: [B, T, H, W, C] frame features; per_frame_kernels: [B, T, N, C];
        mask_preds: [B, T, N, Hm, Wm] per-frame final masks from the image head;
        direct_kernels: [N, C] raw init kernels (direct_tracker mode);
        clip_kernels: [B, N, C] already-clip-level kernels (the volume kernel
        head, ConvKernelHeadVideo in knet_vis/tracker/kernel_head.py:12) —
        skips the query merge entirely."""
        c = self.head_cfg.in_channels
        b, t, n = mask_preds.shape[:3]

        if clip_kernels is not None:
            object_feats = clip_kernels
        elif direct_kernels is not None:
            object_feats = jnp.broadcast_to(direct_kernels[None], (b, n, c))
        elif self.query_merge_method == "mean":
            object_feats = per_frame_kernels.mean(axis=1)  # [B, N, C]
        elif self.query_merge_method in ("attention", "attention_pos"):
            init_q = self.param(
                "init_query", nn.initializers.normal(1.0), (self.num_proposals, c)
            )
            kv = per_frame_kernels.reshape(b, t * n, c)
            q = jnp.broadcast_to(init_q[None], (b, self.num_proposals, c))
            if self.query_merge_method == "attention_pos":
                q_pos = self.param(
                    "query_pos", nn.initializers.normal(1.0), (self.num_proposals, c)
                )
                q = q + q_pos[None]
                kv = kv + jnp.tile(q_pos, (t, 1))[None]
            fused = nn.MultiHeadDotProductAttention(
                num_heads=8, qkv_features=c, name="query_merge_attn"
            )(q, kv)
            fused = nn.LayerNorm(epsilon=1e-5, name="query_merge_norm")(fused)
            fused = FFN(c * 8, c, name="query_merge_ffn")(fused)
            object_feats = nn.LayerNorm(epsilon=1e-5, name="query_merge_ffn_norm")(
                fused
            )
        else:
            raise ValueError(self.query_merge_method)

        if self.with_mask_init:
            mask_kernels = nn.Dense(c, name="fc_mask_init")(object_feats)
            mask_preds = jnp.einsum("bnc,bthwc->btnhw", mask_kernels, x)

        outs: list[ClipStageOutput] = []
        for stage in range(self.num_stages):
            per_frame = stage >= self.assign_stages
            if per_frame and object_feats.ndim == 3:
                object_feats = jnp.broadcast_to(
                    object_feats[:, None], (b, t, n, c)
                )
            cls_score, mask_preds, object_feats = ClipKernelUpdateHead(
                self.head_cfg, per_frame=per_frame, name=f"mask_head_{stage}"
            )(x, object_feats, mask_preds)
            scaled = upscale_masks(mask_preds, self.head_cfg.mask_upsample_stride)
            outs.append(ClipStageOutput(cls_score, mask_preds, scaled, object_feats))
        return outs
