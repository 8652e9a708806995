"""Common NN building blocks (TPU-first: NHWC, static shapes).

ConvNormAct mirrors mmcv ConvModule(conv->norm->act); bilinear resize mirrors
torch F.interpolate(mode='bilinear', align_corners=False) which jax.image.resize
('linear') matches.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def resize_bilinear(x: Array, out_hw: tuple[int, int]) -> Array:
    """Bilinear resize on NHWC (or [..., H, W, C]) matching align_corners=False."""
    shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method="linear")


def resize_mask_bilinear(m: Array, out_hw: tuple[int, int]) -> Array:
    """Bilinear resize on [..., H, W] mask stacks."""
    shape = m.shape[:-2] + (out_hw[0], out_hw[1])
    return jax.image.resize(m, shape, method="linear")


def upsample2x(x: Array, times: int = 1) -> Array:
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (h * (2**times), w * (2**times)))


class GroupNorm32(nn.Module):
    """GN with 32 groups (mmcv default in this model family)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        # use_fast_variance=False: the one-pass E[x^2]-E[x]^2 form returns
        # inf-inf = NaN for large-but-finite inputs (|x| >~ 1e19 in fp32);
        # conv stacks can transiently reach that under aggressive from-scratch
        # overfits. The two-pass form degrades gracefully instead.
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5, use_fast_variance=False
        )(x)


class ConvNormAct(nn.Module):
    """Conv2d -> optional norm -> optional activation, NHWC.

    norm: None | 'gn' | 'ln' | 'bn' (bn uses running averages only; see ResNet for
    the trainable/sync variant).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: str | None = None
    act: Callable[[Array], Array] | None = nn.relu
    use_bias: bool | None = None
    name_prefix: str = ""

    @nn.compact
    def __call__(self, x):
        use_bias = self.use_bias if self.use_bias is not None else (self.norm is None)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=use_bias,
        )(x)
        if self.norm == "gn":
            # two-pass variance: see GroupNorm32
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, use_fast_variance=False)(x)
        elif self.norm == "ln":
            x = nn.LayerNorm(epsilon=1e-5)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class MLP(nn.Module):
    """Stack of (Linear(no bias) -> LN -> ReLU) used for cls/mask branches.

    kernel_update_head.py:128-147.
    """

    num_layers: int
    features: int

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers):
            x = nn.Dense(self.features, use_bias=False)(x)
            x = nn.LayerNorm(epsilon=1e-5)(x)
            x = nn.relu(x)
        return x


class FFN(nn.Module):
    """Transformer FFN with residual (mmcv FFN: Linear-ReLU-Linear + identity)."""

    hidden: int = 2048
    out: int = 256

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden)(x)
        y = nn.relu(y)
        y = nn.Dense(self.out)(y)
        return x + y


class MultiHeadSelfAttention(nn.Module):
    """Self-attention over the kernel set (the 'kernel interaction' op).

    kernel_update_head.py:100-103,206 — residual + LN applied by the caller.
    """

    num_heads: int = 8

    @nn.compact
    def __call__(self, x):  # [B, N, D]
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=x.shape[-1]
        )(x, x)
        return x + y  # mmcv MultiheadAttention adds the identity residual


def sine_positional_encoding(
    h: int, w: int, num_feats: int = 128, temperature: int = 10000, normalize: bool = True
) -> Array:
    """DETR-style 2D sine positional encoding -> [H, W, 2*num_feats].

    Equivalent to mmcv SinePositionalEncoding(num_feats=128, normalize=True) with an
    all-zeros ignore mask (semantic_fpn_wrapper.py:203-209).
    """
    eps, scale = 1e-6, 2 * jnp.pi
    y_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    if normalize:
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(
        h, w, -1
    )
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(
        h, w, -1
    )
    return jnp.concatenate([pos_y, pos_x], axis=-1)  # [H, W, 2*num_feats]


def sine_positional_encoding_3d(
    t: int, h: int, w: int, num_feats: int = 128, temperature: int = 10000
) -> Array:
    """Clip-aware sine encoding -> [T, H, W, 2*num_feats]: the 2-D spatial code
    plus a temporal sine over the full channel width, added per frame.

    Equivalent to PositionEmbeddingSine3D (knet_vis/tracker/positional_encoding.py:15,
    normalize=True): pos = cat(pos_y, pos_x) + pos_z with dim_t_z over 2*num_feats.
    """
    eps, scale = 1e-6, 2 * jnp.pi
    spatial = sine_positional_encoding(h, w, num_feats, temperature)  # [H, W, 2F]
    z = jnp.arange(1, t + 1, dtype=jnp.float32)
    z = z / (z[-1] + eps) * scale
    dim_z = jnp.arange(2 * num_feats, dtype=jnp.float32)
    dim_z = temperature ** (2 * (dim_z // 2) / (2 * num_feats))
    pos_z = z[:, None] / dim_z
    pos_z = jnp.stack(
        [jnp.sin(pos_z[:, 0::2]), jnp.cos(pos_z[:, 1::2])], axis=2
    ).reshape(t, -1)
    return spatial[None] + pos_z[:, None, None, :]
