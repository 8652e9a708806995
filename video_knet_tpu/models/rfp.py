"""DetectoRS components: SAC, RFP-capable ResNet, RFP-capable Swin, RFP neck.

Rebuilds the reference's registered-but-unreleased DetectoRS experiments:
  - DetectoRS_ResNet_Custom + SAC bottleneck (/root/reference/swin/DetectRS.py:16,209)
  - SwinTransformerRFP (/root/reference/swin/swin_transformer_rfp.py:760,874)
No release config uses them (SURVEY.md §2.4); they are provided as components
with the same recursion contract: every backbone here accepts an optional
`rfp_feats` list (one per stage, None for stage 0) injected through a 1x1
"rfp_conv", and `RFP` runs the recursive-feature-pyramid loop (unroll
`rfp_steps`, per-level sigmoid-weighted fusion — the mmdet RFP neck semantics
the reference's backbones plug into).

TPU notes: the recursion is a static python loop (fixed rfp_steps) so XLA sees
one fused graph; SAC's two dilated convs share one weight tensor (+ a delta on
the atrous branch) and both map to MXU convolutions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.models.resnet import FPN, RESNET_STAGE_BLOCKS
from video_knet_tpu.models.swin import SWIN_PRESETS, PatchMerging, SwinBlock

Array = jax.Array


class SAConv(nn.Module):
    """Switchable Atrous Convolution (DetectoRS §4; DetectRS.py:48-57).

    out = switch * conv(x, W, d=1) + (1 - switch) * conv(x, W + dW, d=3)
    with a global-context pre/post 1x1 addition; switch is a 1x1 conv over
    5x5-average-pooled features.
    """

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        # pre-context: global average pooled 1x1, added back
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x + nn.Conv(cin, (1, 1), name="pre_context")(gap)

        s = nn.avg_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        switch = jax.nn.sigmoid(
            nn.Conv(1, (1, 1), strides=(self.stride, self.stride),
                    name="switch")(s)
        )

        w = self.param(
            "kernel", nn.initializers.he_normal(), (3, 3, cin, self.features)
        )
        dw = self.param("weight_diff", nn.initializers.zeros, w.shape)

        def conv(inp, kernel, dil):
            return jax.lax.conv_general_dilated(
                inp, kernel, window_strides=(self.stride, self.stride),
                padding=[(dil, dil), (dil, dil)], rhs_dilation=(dil, dil),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        out = switch * conv(x, w, 1) + (1.0 - switch) * conv(x, w + dw, 3)
        gap = jnp.mean(out, axis=(1, 2), keepdims=True)
        return out + nn.Conv(self.features, (1, 1), name="post_context")(gap)


class DetectoRSBottleneck(nn.Module):
    """Bottleneck with optional SAC conv2 and an RFP injection point
    (DetectRS.py:16-118): rfp_conv(rfp_feat) is added before the final ReLU
    of the block (zero-initialized, so recursion starts as identity)."""

    features: int
    stride: int = 1
    use_running_average: bool = True
    with_sac: bool = False
    with_rfp: bool = False

    @nn.compact
    def __call__(self, x: Array, rfp_feat: Array | None = None) -> Array:
        ura = self.use_running_average
        bn = lambda name: nn.BatchNorm(
            use_running_average=ura, momentum=0.9, epsilon=1e-5, name=name
        )
        residual = x
        y = nn.relu(bn("bn1")(nn.Conv(self.features, (1, 1), use_bias=False,
                                      name="conv1")(x)))
        if self.with_sac:
            y = SAConv(self.features, stride=self.stride, name="sac")(y)
        else:
            y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                        padding="SAME", use_bias=False, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = bn("bn3")(nn.Conv(self.features * 4, (1, 1), use_bias=False,
                              name="conv3")(y))
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = bn("downsample_bn")(
                nn.Conv(self.features * 4, (1, 1),
                        strides=(self.stride, self.stride), use_bias=False,
                        name="downsample_conv")(residual)
            )
        y = y + residual
        if self.with_rfp and rfp_feat is not None:
            y = y + nn.Conv(
                self.features * 4, (1, 1),
                kernel_init=nn.initializers.zeros, name="rfp_conv",
            )(rfp_feat)
        return nn.relu(y)


class DetectoRSResNet(nn.Module):
    """ResNet with SAC stages 2-4 and per-stage RFP injection
    (DetectoRS_ResNet_Custom, DetectRS.py:209-338). `rfp_feats`, when given,
    is one feature map per stage (entry 0 unused, matching the reference's
    `rfp_feats[i] if i > 0 else None`)."""

    depth: int = 50
    sac_stages: Sequence[int] = (2, 3, 4)
    frozen_stages: int = 1
    norm_eval: bool = True
    train: bool = False

    @nn.compact
    def __call__(
        self, x: Array, rfp_feats: Sequence[Array] | None = None
    ) -> list[Array]:
        blocks = RESNET_STAGE_BLOCKS[self.depth]

        def ura_for(stage_idx: int) -> bool:
            if not self.train or self.norm_eval:
                return True
            return stage_idx <= self.frozen_stages

        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=ura_for(0), momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)

        outs = []
        widths = (64, 128, 256, 512)
        for s, (w, n_blocks) in enumerate(zip(widths, blocks), start=1):
            rfp = rfp_feats[s - 1] if (rfp_feats is not None and s > 1) else None
            for b in range(n_blocks):
                stride = 2 if (b == 0 and s > 1) else 1
                y = DetectoRSBottleneck(
                    features=w, stride=stride, use_running_average=ura_for(s),
                    with_sac=s in self.sac_stages,
                    with_rfp=(b == 0 and s > 1),
                    name=f"layer{s}_block{b}",
                )(y, rfp)
            if self.frozen_stages >= s:
                y = jax.lax.stop_gradient(y)
            outs.append(y)
        return outs


class SwinTransformerRFP(nn.Module):
    """Swin with per-stage RFP injection (swin_transformer_rfp.py:846-872):
    after each stage's blocks, x += rfp_conv(rfp_feat) for stages > 0, before
    the patch-merging downsample."""

    preset: str = "base"
    window_size: int = 7
    drop_path_rate: float = 0.0
    frozen_stages: int = -1
    train: bool = False

    @nn.compact
    def __call__(
        self, x: Array, rfp_feats: Sequence[Array] | None = None
    ) -> list[Array]:
        embed_dim, depths, num_heads = SWIN_PRESETS[self.preset]
        det = not self.train
        x = nn.Conv(embed_dim, (4, 4), strides=(4, 4), name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        total = sum(depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        blk_idx = 0
        outs = []
        dim = embed_dim
        for stage, (depth, heads) in enumerate(zip(depths, num_heads)):
            for blk in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=heads, window_size=self.window_size,
                    shift=0 if blk % 2 == 0 else self.window_size // 2,
                    drop_path=dpr[blk_idx], deterministic=det,
                    name=f"stage{stage}_block{blk}",
                )(x)
                blk_idx += 1
            if rfp_feats is not None and stage > 0:
                x = x + nn.Conv(
                    dim, (1, 1), kernel_init=nn.initializers.zeros,
                    name=f"rfp_conv{stage}",
                )(rfp_feats[stage])
            outs.append(nn.LayerNorm(epsilon=1e-5, name=f"out_norm{stage}")(x))
            if stage < len(depths) - 1:
                x = PatchMerging(dim, name=f"downsample{stage}")(x)
                dim *= 2
        return outs


class RFP(nn.Module):
    """Recursive Feature Pyramid over an RFP-capable backbone.

    The mmdet `RFP` neck contract the reference backbones register for:
    unrolled `rfp_steps` passes — step k feeds the previous FPN levels back
    into the backbone stages through the rfp_convs, then fuses old and new
    FPN levels with a per-level learned sigmoid weight. Backbone + FPN params
    are shared across steps (one flax submodule instance each)."""

    backbone: str = "detectors_r50"  # 'detectors_r50' | 'swin_base_rfp' | ...
    rfp_steps: int = 2
    train: bool = False

    def setup(self):
        if self.backbone.startswith("detectors"):
            self.bb = DetectoRSResNet(
                depth=int(self.backbone.split("_r")[-1]), train=self.train
            )
        else:
            self.bb = SwinTransformerRFP(
                preset=self.backbone.replace("swin_", "").replace("_rfp", ""),
                train=self.train,
            )
        self.fpn = FPN()
        self.fusers = [
            nn.Conv(1, (1, 1), name=f"fusion_weight{i}") for i in range(4)
        ]

    def __call__(self, x: Array) -> list[Array]:
        feats = self.bb(x)
        levels = self.fpn(feats)[:4]
        for _ in range(self.rfp_steps - 1):
            # FPN level i is at the stride of backbone stage i: feed back 1:1
            new_feats = self.bb(x, rfp_feats=levels)
            new_levels = self.fpn(new_feats)[:4]
            fused = []
            for i, (old, new) in enumerate(zip(levels, new_levels)):
                w = jax.nn.sigmoid(self.fusers[i](new))
                fused.append(w * new + (1.0 - w) * old)
            levels = fused
        return levels
