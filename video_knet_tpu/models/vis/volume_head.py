"""Volume (3-D tube) kernel-init head for VIS clips.

Rebuild of ConvKernelHeadVolume (knet_vis/tracker/kernel_frame_head.py:12): the
learned init kernels convolve against the WHOLE clip's localization features at
once, producing tube mask logits [B, T, N, H, W] directly (one kernel owns one
tube from the start, instead of per-frame init + later fusion). The kernels are
then enriched with tube-mask-pooled clip features. Pairs with
ClipKernelHead(direct-style seeding) for a fully volume-native VIS pipeline.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.config import ConvKernelHeadConfig
from video_knet_tpu.models.layers import ConvNormAct
from video_knet_tpu.models.semantic_fpn import SemanticFPN

Array = jax.Array


class VolumeRPNOutputs(NamedTuple):
    proposal_feats: Array  # [B, N, C] clip (tube) kernels
    x_feats: Array  # [B, T, H, W, C]
    tube_mask_preds: Array  # [B, T, N, H, W]
    seg_preds: Array  # [B, T, H, W, num_classes]


class ClipVolumeKernelHead(nn.Module):
    cfg: ConvKernelHeadConfig

    @nn.compact
    def __call__(self, feats: list[Array], num_frames: int) -> VolumeRPNOutputs:
        """feats: FPN levels with leading axis B*T (frames contiguous per video)."""
        cfg = self.cfg
        loc_out = SemanticFPN(
            feat_channels=cfg.fpn_feat_channels,
            out_channels=cfg.out_channels,
            upsample_times=cfg.fpn_upsample_times,
            with_positional_encoding=cfg.fpn_positional_encoding,
            num_aux_convs=cfg.fpn_num_aux_convs,
            num_frames=num_frames,
            name="localization_fpn",
        )(feats)
        loc_feats, semantic_feats = loc_out[0], loc_out[1]
        for i in range(cfg.num_loc_convs):
            loc_feats = ConvNormAct(cfg.out_channels, 1, norm="gn",
                                    name=f"loc_conv{i}")(loc_feats)
        for i in range(cfg.num_seg_convs):
            semantic_feats = ConvNormAct(cfg.out_channels, 1, norm="gn",
                                         name=f"seg_conv{i}")(semantic_feats)

        bt, h, w, c = loc_feats.shape
        t = num_frames
        b = bt // t
        init_kernels = self.param(
            "init_kernels",
            nn.initializers.normal(stddev=cfg.kernel_init_std),
            (cfg.num_proposals, cfg.out_channels),
        )
        loc_clip = loc_feats.reshape(b, t, h, w, c)
        # volume dynamic conv: one kernel -> one tube across all frames
        tube_masks = jnp.einsum("nc,bthwc->btnhw", init_kernels, loc_clip)

        seg_preds = nn.Conv(cfg.num_classes, (1, 1), name="conv_seg")(semantic_feats)
        x_feats = (semantic_feats + loc_feats).reshape(b, t, h, w, c)

        proposal_feats = jnp.broadcast_to(
            init_kernels[None], (b, cfg.num_proposals, c)
        )
        if cfg.proposal_feats_with_obj:
            hard = (jax.nn.sigmoid(tube_masks.astype(jnp.float32)) > 0.5).astype(
                x_feats.dtype
            )
            obj = jnp.einsum("btnhw,bthwc->bnc", hard, x_feats) / t
            proposal_feats = proposal_feats + obj

        return VolumeRPNOutputs(
            proposal_feats=proposal_feats,
            x_feats=x_feats,
            tube_mask_preds=tube_masks,
            seg_preds=seg_preds.reshape(b, t, h, w, -1),
        )
