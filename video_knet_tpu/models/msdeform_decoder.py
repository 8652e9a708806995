"""MSDeformAttn pixel decoder (optional neck for the *deformable_fpn* configs).

Rebuild of knet/det/msdeformattn_decoder.py:18 (Mask2Former-style): a 6-layer
deformable-attention transformer encoder over the top 3 FPN levels + an FPN-style
top-down fusion producing refreshed multi-scale features. The CUDA
MultiScaleDeformableAttention op becomes `ops.sampling.ms_deform_attn_core`
(gather-based bilinear sampling, static shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.models.layers import ConvNormAct, sine_positional_encoding
from video_knet_tpu.ops.sampling import ms_deform_attn_core

Array = jax.Array


class MSDeformAttention(nn.Module):
    """One multi-scale deformable attention op over L levels."""

    embed_dim: int = 256
    num_heads: int = 8
    num_points: int = 4

    @nn.compact
    def __call__(
        self,
        query: Array,  # [B, Q, C]
        ref_points: Array,  # [B, Q, L, 2] normalized (x, y)
        value_levels: list[Array],  # list of [B, H_l, W_l, C]
    ) -> Array:
        b, q, c = query.shape
        m = self.num_heads
        l = len(value_levels)
        p = self.num_points
        d = c // m

        values = [
            nn.Dense(c, name=f"value_proj{i}")(v).reshape(b, *v.shape[1:3], m, d)
            for i, v in enumerate(value_levels)
        ]
        offsets = nn.Dense(
            m * l * p * 2,
            kernel_init=nn.initializers.zeros,
            name="sampling_offsets",
        )(query).reshape(b, q, m, l, p, 2)
        attn = nn.Dense(m * l * p, name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(b, q, m, l * p), axis=-1).reshape(
            b, q, m, l, p
        )

        # normalize offsets by each level's resolution
        wh = jnp.stack(
            [jnp.array([v.shape[2], v.shape[1]], jnp.float32) for v in value_levels]
        )  # [L, 2] (w, h)
        locs = ref_points[:, :, None, :, None, :] + offsets / wh[None, None, None, :, None, :]
        out = ms_deform_attn_core(values, locs, attn)
        return nn.Dense(c, name="output_proj")(out)


class DeformAttnEncoderLayer(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 1024

    @nn.compact
    def __call__(self, query, ref_points, shapes):
        # shapes: static list of (H_l, W_l); query is the flattened concat
        levels = _unflatten(query, shapes)
        att = MSDeformAttention(self.embed_dim, self.num_heads, name="self_attn")(
            query, ref_points, levels
        )
        query = nn.LayerNorm(epsilon=1e-5, name="norm1")(query + att)
        y = nn.Dense(self.ffn_dim, name="ffn1")(query)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dim, name="ffn2")(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(query + y)


def _unflatten(flat: Array, shapes: list[tuple[int, int]]) -> list[Array]:
    outs = []
    start = 0
    b, _, c = flat.shape
    for h, w in shapes:
        outs.append(flat[:, start : start + h * w].reshape(b, h, w, c))
        start += h * w
    return outs


def _reference_points(shapes: list[tuple[int, int]]) -> Array:
    pts = []
    for h, w in shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
    return jnp.concatenate(pts, axis=0)  # [sum HW, 2]


class MSDeformAttnPixelDecoder(nn.Module):
    """Encoder over the top `num_encoder_levels` FPN levels + top-down fusion."""

    embed_dim: int = 256
    num_layers: int = 6
    num_encoder_levels: int = 3

    @nn.compact
    def __call__(self, feats: list[Array]) -> list[Array]:
        """feats: FPN levels strides (4, 8, 16, 32); returns refreshed levels."""
        enc_feats = feats[-self.num_encoder_levels:]
        shapes = [(f.shape[1], f.shape[2]) for f in enc_feats]
        b = feats[0].shape[0]
        c = self.embed_dim

        tokens = []
        for i, f in enumerate(enc_feats):
            x = nn.Conv(c, (1, 1), name=f"input_proj{i}")(f)
            pe = sine_positional_encoding(x.shape[1], x.shape[2], c // 2)
            lvl = self.param(
                f"level_embed{i}", nn.initializers.normal(1.0), (c,)
            )
            tokens.append((x + pe[None] + lvl[None, None, None]).reshape(b, -1, c))
        query = jnp.concatenate(tokens, axis=1)

        ref = _reference_points(shapes)  # [sumHW, 2]
        ref = jnp.broadcast_to(
            ref[None, :, None, :], (b, ref.shape[0], len(shapes), 2)
        )
        for i in range(self.num_layers):
            query = DeformAttnEncoderLayer(c, name=f"layer{i}")(query, ref, shapes)

        enc_out = _unflatten(query, shapes)
        # FPN-style top-down fusion into the untouched lower levels
        outs = list(enc_out)
        lower = feats[: -self.num_encoder_levels]
        prev = outs[0]
        for i in range(len(lower) - 1, -1, -1):
            lat = nn.Conv(c, (1, 1), name=f"lateral{i}")(lower[i])
            up = jax.image.resize(prev, lat.shape, method="nearest")
            prev = ConvNormAct(c, 3, norm="gn", name=f"fuse{i}")(lat + up)
            outs.insert(0, prev)
        return outs
