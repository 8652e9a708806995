"""KernelUpdateHead: one stage of iterative kernel refinement.

Rebuild of knet/det/kernel_update_head.py:170-277 with TPU-first batching:
 1. mask-pool features with hard-thresholded sigmoid masks (one MXU matmul)
 2. KernelUpdator fuses pooled group features into the kernels
 3. multi-head self-attention over the kernel set + LN ("kernel interaction")
 4. FFN + LN
 5. cls branch (MLP -> fc_cls) and mask branch (MLP -> fc_mask)
 6. new masks = dynamic conv of the kernels against the features
    (conv_kernel_size=1 in all release configs -> a single einsum/matmul)

The per-image python loop around F.conv2d (reference :251-257) becomes a batched
grouped convolution / einsum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.config import KernelUpdateHeadConfig
from video_knet_tpu.models.kernel_updator import KernelUpdator
from video_knet_tpu.models.layers import FFN, MLP, resize_mask_bilinear
from video_knet_tpu.ops.mask_pool import mask_pool

Array = jax.Array


def assemble_masks(kernels: Array, x: Array, kernel_size: int) -> Array:
    """Dynamic conv of per-image kernels against features.

    kernels: [B, N, K*K, C]; x: [B, H, W, C]. Returns [B, N, H, W].
    K == 1 is a plain contraction; K > 1 uses a grouped convolution with the batch
    folded into groups (replaces the reference's per-image conv2d loop).
    """
    b, n, g, c = kernels.shape
    if kernel_size == 1:
        return jnp.einsum("bnc,bhwc->bnhw", kernels[:, :, 0, :], x)
    k = kernel_size
    h, w = x.shape[1], x.shape[2]
    lhs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w, b * c)
    # rhs layout HWIO with feature_group_count=b: out channel index = bi*n + ni
    rhs = kernels.reshape(b, n, k, k, c)
    rhs = jnp.transpose(rhs, (2, 3, 4, 0, 1)).reshape(k, k, c, b * n)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=b,
    )  # [1, H, W, B*N]
    out = out.reshape(h, w, b, n)
    return jnp.transpose(out, (2, 3, 0, 1))


class KernelUpdateHead(nn.Module):
    """One refinement stage; `with_previous` enables the cross-frame linking
    branches of the video variant (knet/video/kernel_update_head.py:281-541):

    previous_type — how the TRACKING kernels are produced from the previous
      frame's kernels (feeds only the association embedding):
        'ffn'        cross-attn(query=cur, kv=prev) + link FFN  (release config)
        'update'     KernelUpdator(x_feat, prev) first, then cross-attn + FFN
        'update_obj' KernelUpdator(cur obj_feat, prev) first, then as above
    previous_link — how the INPUT proposal kernels are rewritten from prev
      kernels before the normal update (ablations, :324-369):
        None, 'link_atten' (cross-attn + FFN),
        'update_dynamic_cov' (KernelUpdator(x_feat, prev) then cross-attn + FFN)
    """

    cfg: KernelUpdateHeadConfig
    with_previous: bool = False  # video variant: cross-frame kernel-link branch
    previous_type: str = "ffn"
    previous_link: str | None = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        proposal_feat: Array,
        mask_preds: Array,
        previous_obj_feats: Array | None = None,
    ) -> tuple[Array, Array, Array, Array | None]:
        """x: [B, H, W, C]; proposal_feat: [B, N, K*K, C]; mask_preds: [B, N, Hm, Wm].

        Returns (cls_score [B, N, num_classes], new_mask_preds [B, N, H, W],
        obj_feat [B, N, K*K, C], obj_feat_track or None).

        When `with_previous` and `previous_obj_feats` [B, N, K*K, C] is given, the
        video linking branch (knet/video/kernel_update_head.py:394-415,
        previous_type='ffn') computes obj_feat_track = LN(link_ffn(LN(cross_attn(
        query=obj_feat, kv=previous, residual)))) — the main cls/mask path is
        unaffected (linking only feeds the tracking embedding).
        """
        cfg = self.cfg
        b, n = proposal_feat.shape[:2]
        if cfg.feat_transform:
            x = nn.Conv(cfg.in_channels, (1, 1), name="feat_transform")(x)
        h, w, c = x.shape[-3:]

        if mask_preds.shape[-2:] != (h, w):
            gather_mask = resize_mask_bilinear(mask_preds, (h, w))
        else:
            gather_mask = mask_preds
        x_feat = mask_pool(gather_mask, x, hard_thr=cfg.hard_mask_thr, binary=True)

        def cross_link(cur, prev, name):
            """cross-attn(query=cur, kv=prev) + LN + link FFN + LN on flat kernels."""
            g_ = cur.shape[2]
            cur_f = cur.reshape(b, n, g_ * c)
            prev_f = prev.reshape(b, n, g_ * c)
            att = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads, qkv_features=g_ * c,
                name=f"attention_{name}",
            )(cur_f, prev_f)
            y = nn.LayerNorm(epsilon=1e-5, name=f"attention_{name}_norm")(cur_f + att)
            y = y.reshape(b, n, g_, c)
            return nn.LayerNorm(epsilon=1e-5, name=f"link_ffn_{name}_norm")(
                FFN(cfg.feedforward_channels, cfg.in_channels, name=f"link_ffn_{name}")(y)
            )

        # proposal-kernel rewrite from the previous frame (previous_link ablations)
        if (
            self.with_previous
            and previous_obj_feats is not None
            and self.previous_link is not None
        ):
            prev_in = previous_obj_feats
            if self.previous_link == "update_dynamic_cov":
                prev_in = KernelUpdator(
                    in_channels=cfg.updator.in_channels,
                    feat_channels=cfg.updator.feat_channels,
                    out_channels=cfg.updator.out_channels,
                    name="link_update_conv",
                )(x_feat, prev_in)
            elif self.previous_link != "link_atten":
                raise ValueError(self.previous_link)
            proposal_feat = cross_link(proposal_feat, prev_in, "link")

        obj_feat = KernelUpdator(
            in_channels=cfg.updator.in_channels,
            feat_channels=cfg.updator.feat_channels,
            out_channels=cfg.updator.out_channels,
            name="kernel_update_conv",
        )(x_feat, proposal_feat)

        # kernel interaction: MHA over the N kernels on the flattened K*K*C vector
        g = obj_feat.shape[2]
        flat = obj_feat.reshape(b, n, g * c)
        att = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, qkv_features=g * c, name="attention"
        )(flat, flat)
        flat = nn.LayerNorm(epsilon=1e-5, name="attention_norm")(flat + att)
        obj_feat = flat.reshape(b, n, g, c)

        if cfg.with_ffn:
            obj_feat = nn.LayerNorm(epsilon=1e-5, name="ffn_norm")(
                FFN(cfg.feedforward_channels, cfg.in_channels, name="ffn")(obj_feat)
            )

        obj_feat_track = None
        if self.with_previous and previous_obj_feats is not None:
            if self.previous_type == "ffn":
                prev_track = previous_obj_feats
            elif self.previous_type in ("update", "update_obj"):
                seed = x_feat if self.previous_type == "update" else obj_feat[:, :, 0]
                prev_track = KernelUpdator(
                    in_channels=cfg.updator.in_channels,
                    feat_channels=cfg.updator.feat_channels,
                    out_channels=cfg.updator.out_channels,
                    name="track_update_conv",
                )(seed, previous_obj_feats)
            else:
                raise ValueError(self.previous_type)
            obj_feat_track = cross_link(obj_feat, prev_track, "previous")

        cls_feat = obj_feat.sum(axis=-2)  # [B, N, C]
        mask_feat = obj_feat

        cls_feat = MLP(cfg.num_cls_fcs, cfg.in_channels, name="cls_fcs")(cls_feat)
        mask_feat = MLP(cfg.num_mask_fcs, cfg.in_channels, name="mask_fcs")(mask_feat)

        cls_score = nn.Dense(
            cfg.num_classes,
            bias_init=nn.initializers.constant(-4.59511985013459),  # focal prior 0.01
            name="fc_cls",
        )(cls_feat)
        mask_kernels = nn.Dense(cfg.out_channels, name="fc_mask")(mask_feat)

        new_mask_preds = assemble_masks(mask_kernels, x, cfg.conv_kernel_size)
        return cls_score, new_mask_preds, obj_feat, obj_feat_track
