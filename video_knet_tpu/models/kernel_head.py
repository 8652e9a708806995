"""ConvKernelHead: kernel-init ("RPN") head.

Rebuild of knet/det/kernel_head.py:12-265: holds the N learned init kernels, runs the
localization Semantic-FPN, predicts init thing masks by dynamic conv of the kernels
against the loc features, predicts stuff semantic logits, enriches the proposal
kernels with mask-pooled features, and concatenates stuff kernels/masks
(cat_stuff_mask). Loss lives in video_knet_tpu/models/knet.py's train step.
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


class RPNOutputs(NamedTuple):
    proposal_feats: Array  # [B, N_total, K*K, C] init kernels (things [+ stuff])
    x_feats: Array  # [B, H, W, C] fused features for the iter head
    mask_preds: Array  # [B, N_total, H, W] init mask logits (things [+ stuff])
    seg_preds: Array  # [B, H, W, num_classes] semantic logits
    thing_mask_preds: Array  # [B, N_prop, H, W] (pre-concat, for rpn loss)
    init_kernels: Array  # [N_prop, C] the raw learned kernels (direct_tracker)


class ConvKernelHead(nn.Module):
    cfg: ConvKernelHeadConfig

    @nn.compact
    def __call__(self, feats: list[Array], num_frames: int | None = None) -> RPNOutputs:
        """num_frames set -> clip inputs [B*T, ...]: the localization FPN uses the
        3-D (temporal) positional encoding (SemanticFPNWrapper3D equivalent)."""
        cfg = self.cfg
        if getattr(cfg, "fpn_type", "semantic_fpn") == "upernet_align":
            if num_frames is not None:
                raise ValueError(
                    "fpn_type='upernet_align' has no 3-D temporal positional "
                    "encoding; clip (VIS, num_frames) inputs require "
                    "fpn_type='semantic_fpn'"
                )
            from video_knet_tpu.models.sfnet import UperNetAlignHead

            loc_out = UperNetAlignHead(
                out_channels=cfg.out_channels,
                num_aux_convs=max(cfg.fpn_num_aux_convs, 1),
                with_positional_encoding=cfg.fpn_positional_encoding,
                name="localization_fpn",
            )(feats)
        else:
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
            loc_feats = ConvNormAct(cfg.out_channels, 1, norm="gn", name=f"loc_conv{i}")(
                loc_feats
            )
        for i in range(cfg.num_seg_convs):
            semantic_feats = ConvNormAct(
                cfg.out_channels, 1, norm="gn", name=f"seg_conv{i}"
            )(semantic_feats)

        b = loc_feats.shape[0]
        # the learned proposal kernels (init_kernels 1x1 conv weight, kernel_head.py:124)
        init_kernels = self.param(
            "init_kernels",
            nn.initializers.normal(stddev=cfg.kernel_init_std),
            (cfg.num_proposals, cfg.out_channels),
        )
        mask_preds = jnp.einsum("nc,bhwc->bnhw", init_kernels, loc_feats)

        conv_seg = nn.Conv(cfg.num_classes, (1, 1), name="conv_seg")
        seg_preds = conv_seg(semantic_feats)  # [B, H, W, num_classes]

        x_feats = semantic_feats + loc_feats

        proposal_feats = jnp.broadcast_to(
            init_kernels[None], (b, cfg.num_proposals, cfg.out_channels)
        )
        if cfg.proposal_feats_with_obj:
            s = jax.nn.sigmoid(mask_preds)
            hard = (s > 0.5).astype(x_feats.dtype)
            m = hard if cfg.use_binary else hard * s.astype(x_feats.dtype)
            obj_feats = jnp.einsum("bnhw,bhwc->bnc", m, x_feats)
            proposal_feats = proposal_feats + obj_feats

        thing_mask_preds = mask_preds
        if cfg.cat_stuff_mask:
            stuff_logits = seg_preds[..., cfg.num_thing_classes:]  # [B, H, W, S]
            mask_preds = jnp.concatenate(
                [mask_preds, jnp.transpose(stuff_logits, (0, 3, 1, 2))], axis=1
            )
            # stuff kernels are the conv_seg weights for stuff classes
            stuff_kernels = conv_seg.variables["params"]["kernel"][0, 0][
                :, cfg.num_thing_classes:
            ].T  # [S, C]
            proposal_feats = jnp.concatenate(
                [
                    proposal_feats,
                    jnp.broadcast_to(
                        stuff_kernels[None],
                        (b, cfg.num_stuff_classes, cfg.out_channels),
                    ),
                ],
                axis=1,
            )

        return RPNOutputs(
            proposal_feats=proposal_feats[:, :, None, :],  # K*K group axis (K=1)
            x_feats=x_feats,
            mask_preds=mask_preds,
            seg_preds=seg_preds,
            thing_mask_preds=thing_mask_preds,
            init_kernels=init_kernels,
        )
