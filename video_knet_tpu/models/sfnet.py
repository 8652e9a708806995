"""SFNet-style aligned semantic head + STDC backbones (K-Net aux variants).

Rebuilds the registered-but-unreleased alternatives bundled in the reference's
semantic-FPN wrapper file (/root/reference/knet/det/semantic_fpn_wrapper.py):
  - AlignedModule (:321-357) — flow-warp alignment of the coarse feature onto
    the fine grid (SFNet, "Semantic Flow for Fast and Accurate Scene Parsing")
  - UperNetAlignHead (:239-318) — top-down pathway whose upsampling is the
    aligned warp, sum-fused at stride 8, sine PE, DCN output conv
  - STDCNet813 / STDCNet1446 (:413,506) — the STDC light backbones (ConvX stem
    + CatBottleneck stages) at strides 4/8/16/32

TPU notes: the flow warp is a gather-free bilinear sample built from four
weighted `take`s (static shapes, vectorized over the batch); everything else is
plain convs that XLA maps to the MXU. No release config uses these heads (same
as the reference); `ConvKernelHeadConfig.fpn_type='upernet_align'` makes the
head runnable inside the kernel-init RPN.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.models.deform_conv import DeformConv2d
from video_knet_tpu.models.layers import sine_positional_encoding

Array = jax.Array


def grid_sample_bilinear(x: Array, gx: Array, gy: Array) -> Array:
    """torch.F.grid_sample(align_corners=True, padding_mode='zeros') on NHWC.

    x: [B, h, w, C]; gx/gy: [B, H, W] normalized coords in [-1, 1].
    """
    b, h, w, c = x.shape
    ix = (gx + 1.0) * 0.5 * (w - 1)
    iy = (gy + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    outs = []
    for dx in (0, 1):
        for dy in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (1 - jnp.abs(ix - xi)) * (1 - jnp.abs(iy - yi))
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            flat = x.reshape(b, h * w, c)
            idx = yi_c * w + xi_c  # [B, H, W]
            gathered = jnp.take_along_axis(
                flat, idx.reshape(b, -1, 1), axis=1
            ).reshape(*idx.shape, c)
            outs.append(gathered * (wgt * valid)[..., None])
    return sum(outs)


class AlignedModule(nn.Module):
    """Flow-warp alignment (semantic_fpn_wrapper.py:321-357)."""

    outplane: int

    @nn.compact
    def __call__(self, low: Array, high: Array) -> Array:
        """low: fine [B, H, W, C]; high: coarse [B, h, w, C] -> high warped to
        [B, H, W, C]."""
        hh, ww = low.shape[1:3]
        l = nn.Conv(self.outplane, (1, 1), use_bias=False, name="down_l")(low)
        g = nn.Conv(self.outplane, (1, 1), use_bias=False, name="down_h")(high)
        g = jax.image.resize(g, (g.shape[0], hh, ww, g.shape[-1]), "bilinear")
        flow = nn.Conv(2, (3, 3), padding="SAME", use_bias=False,
                       name="flow_make")(jnp.concatenate([g, l], axis=-1))
        # base grid (align_corners) + flow normalized by output size
        gy, gx = jnp.meshgrid(
            jnp.linspace(-1.0, 1.0, hh), jnp.linspace(-1.0, 1.0, ww),
            indexing="ij",
        )
        gx = gx[None] + flow[..., 0] / ww
        gy = gy[None] + flow[..., 1] / hh
        return grid_sample_bilinear(high, gx, gy)


class AlignedModuleV2PoolingAtten(nn.Module):
    """v2 alignment (semantic_fpn_wrapper.py:357-410): two flows (one per
    direction), both features warped onto the fine grid, fused by a spatial
    gate over channel mean/max statistics."""

    outplane: int

    @nn.compact
    def __call__(self, low: Array, high: Array) -> Array:
        hh, ww = low.shape[1:3]
        l = nn.Conv(self.outplane, (1, 1), use_bias=False, name="down_l")(low)
        g = nn.Conv(self.outplane, (1, 1), use_bias=False, name="down_h")(high)
        g = jax.image.resize(g, (g.shape[0], hh, ww, g.shape[-1]), "bilinear")
        flow = nn.Conv(4, (3, 3), padding="SAME", use_bias=False,
                       name="flow_make")(jnp.concatenate([g, l], axis=-1))
        gy0, gx0 = jnp.meshgrid(
            jnp.linspace(-1.0, 1.0, hh), jnp.linspace(-1.0, 1.0, ww),
            indexing="ij",
        )
        warp_h = grid_sample_bilinear(
            high, gx0[None] + flow[..., 0] / ww, gy0[None] + flow[..., 1] / hh
        )
        warp_l = grid_sample_bilinear(
            low, gx0[None] + flow[..., 2] / ww, gy0[None] + flow[..., 3] / hh
        )
        stats = jnp.concatenate(
            [
                jnp.mean(g, axis=-1, keepdims=True),
                jnp.mean(low, axis=-1, keepdims=True),
                jnp.max(g, axis=-1, keepdims=True),
                jnp.max(low, axis=-1, keepdims=True),
            ],
            axis=-1,
        )
        gate = jax.nn.sigmoid(
            nn.Conv(1, (3, 3), padding="SAME", use_bias=False,
                    name="flow_gate")(stats)
        )
        return warp_h * gate + warp_l * (1.0 - gate)


class UperNetAlignHead(nn.Module):
    """Aligned top-down head (semantic_fpn_wrapper.py:239-318).

    Returns [main, aux...] like SemanticFPN so ConvKernelHead can use it as a
    drop-in localization FPN (main -> loc branch, aux -> seg branch).
    """

    out_channels: int = 256
    num_aux_convs: int = 1
    with_positional_encoding: bool = True
    align_type: str = "v1"  # 'v1' | 'v2' (pooling-attention gate)

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> list[Array]:
        feats = list(feats)[:4]
        n = len(feats)
        f = feats[-1]
        pyramid = [f]
        for i in reversed(range(n - 1)):
            lateral = nn.relu(
                nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, name=f"fpn_in_bn{i}")(
                    nn.Conv(self.out_channels, (1, 1), name=f"fpn_in{i}")(feats[i])
                )
            )
            align_cls = (
                AlignedModule if self.align_type == "v1"
                else AlignedModuleV2PoolingAtten
            )
            warped = align_cls(self.out_channels // 2,
                               name=f"align{i}")(lateral, f)
            f = lateral + warped
            pyramid.append(
                nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, name=f"fpn_out_bn{i}")(
                    nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            name=f"fpn_out{i}")(f)
                )
            )
        # sum-fuse at the stride-8 level's size (conv_out[1] in the reference)
        hh, ww = feats[1].shape[1:3]
        fused = sum(
            jax.image.resize(p, (p.shape[0], hh, ww, p.shape[-1]), "bilinear")
            for p in pyramid
        )
        if self.with_positional_encoding:
            fused = fused + sine_positional_encoding(
                fused.shape[1], fused.shape[2], self.out_channels // 2
            )[None]
        out = DeformConv2d(self.out_channels, name="dcn_out")(fused)
        outs = [out]
        for k in range(self.num_aux_convs):
            outs.append(
                nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        name=f"aux_conv{k}")(fused)
            )
        return outs


class ConvX(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, name="conv")(x)
        y = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         name="bn")(y)
        return nn.relu(y)


class CatBottleneck(nn.Module):
    """STDC cat-fusion block (semantic_fpn_wrapper.py:650-697)."""

    out_planes: int
    block_num: int = 4
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        o = self.out_planes
        out1 = ConvX(o // 2, kernel=1, name="conv0")(x)
        outs = []
        cur = out1
        for idx in range(1, self.block_num):
            if idx == 1:
                if self.stride == 2:
                    # depthwise stride-2 "avd" on the half-width branch
                    cur = nn.Conv(
                        o // 2, (3, 3), strides=(2, 2), padding="SAME",
                        feature_group_count=o // 2, use_bias=False,
                        name="avd_conv",
                    )(cur)
                    cur = nn.BatchNorm(use_running_average=True, momentum=0.9,
                                       epsilon=1e-5, name="avd_bn")(cur)
                width = o // 2 if self.block_num == 2 else o // 4
                cur = ConvX(width, name=f"conv{idx}")(cur)
            elif idx < self.block_num - 1:
                cur = ConvX(o // 2 ** (idx + 1), name=f"conv{idx}")(cur)
            else:
                cur = ConvX(o // 2 ** idx, name=f"conv{idx}")(cur)
            outs.append(cur)
        if self.stride == 2:
            out1 = nn.avg_pool(out1, (3, 3), strides=(2, 2), padding="SAME")
        return jnp.concatenate([out1] + outs, axis=-1)


class STDCNet(nn.Module):
    """STDCNet813 (layers 2,2,2) / STDCNet1446 (layers 4,5,3); returns feats at
    strides 4, 8, 16, 32 (semantic_fpn_wrapper.py:413-504 forward)."""

    base: int = 64
    layers: Sequence[int] = (2, 2, 2)
    block_num: int = 4

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        base = self.base
        y = ConvX(base // 2, stride=2, name="stem0")(x)
        y = ConvX(base, stride=2, name="stem1")(y)  # stride 4
        outs = [y]
        for i, n_blocks in enumerate(self.layers):
            for j in range(n_blocks):
                out_planes = base * 2 ** (i + 2)
                y = CatBottleneck(
                    out_planes, block_num=self.block_num,
                    stride=2 if j == 0 else 1, name=f"stage{i}_block{j}",
                )(y)
            outs.append(y)
        return outs
