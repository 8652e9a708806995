"""MixVisionTransformer (SegFormer mit_b0..b5) backbone, NHWC.

Capability parity with swin/mix_transformer.py:204-428 (registered in the
reference for SegFormer experiments): overlapping patch embeds (7x7/4 then
3x3/2), efficient self-attention with spatial-reduction ratios (8,4,2,1),
Mix-FFN with a 3x3 depthwise conv, LN-everywhere, 4 stage outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

MIT_PRESETS = {
    # embed_dims, depths
    "b0": ((32, 64, 160, 256), (2, 2, 2, 2)),
    "b1": ((64, 128, 320, 512), (2, 2, 2, 2)),
    "b2": ((64, 128, 320, 512), (3, 4, 6, 3)),
    "b3": ((64, 128, 320, 512), (3, 4, 18, 3)),
    "b4": ((64, 128, 320, 512), (3, 8, 27, 3)),
    "b5": ((64, 128, 320, 512), (3, 6, 40, 3)),
}
MIT_HEADS = (1, 2, 5, 8)
MIT_SR = (8, 4, 2, 1)
MIT_MLP_RATIO = (4, 4, 4, 4)


class EfficientAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x: Array, hw: tuple[int, int]) -> Array:
        b, n, c = x.shape
        h, w = hw
        q = nn.Dense(c, name="q")(x).reshape(b, n, self.num_heads, c // self.num_heads)
        kv_in = x
        if self.sr_ratio > 1:
            r = self.sr_ratio
            kv_in = x.reshape(b, h, w, c)
            kv_in = nn.Conv(c, (r, r), strides=(r, r), name="sr")(kv_in)
            kv_in = kv_in.reshape(b, -1, c)
            kv_in = nn.LayerNorm(epsilon=1e-5, name="sr_norm")(kv_in)
        kv = nn.Dense(2 * c, name="kv")(kv_in).reshape(
            b, -1, 2, self.num_heads, c // self.num_heads
        )
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (c // self.num_heads) ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: Array, hw: tuple[int, int]) -> Array:
        b, n, c = x.shape
        h, w = hw
        y = nn.Dense(self.hidden, name="fc1")(x)
        y = y.reshape(b, h, w, self.hidden)
        y = nn.Conv(
            self.hidden, (3, 3), padding="SAME",
            feature_group_count=self.hidden, name="dwconv",
        )(y)
        y = y.reshape(b, n, self.hidden)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, name="fc2")(y)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x: Array, hw) -> Array:
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                                   name="attn")(y, hw)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + MixFFN(self.dim, self.dim * self.mlp_ratio, name="mlp")(y, hw)


class MixVisionTransformer(nn.Module):
    preset: str = "b0"

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        dims, depths = MIT_PRESETS[self.preset]
        outs = []
        for stage in range(4):
            if stage == 0:
                x = nn.Conv(dims[0], (7, 7), strides=(4, 4), padding="SAME",
                            name="patch_embed0")(x)
            else:
                x = nn.Conv(dims[stage], (3, 3), strides=(2, 2), padding="SAME",
                            name=f"patch_embed{stage}")(x)
            b, h, w, c = x.shape
            x = nn.LayerNorm(epsilon=1e-6, name=f"embed_norm{stage}")(
                x.reshape(b, h * w, c)
            )
            for blk in range(depths[stage]):
                x = MiTBlock(
                    dims[stage], MIT_HEADS[stage], MIT_SR[stage],
                    MIT_MLP_RATIO[stage], name=f"stage{stage}_block{blk}",
                )(x, (h, w))
            x = nn.LayerNorm(epsilon=1e-6, name=f"out_norm{stage}")(x)
            x = x.reshape(b, h, w, c)
            outs.append(x)
        return outs
