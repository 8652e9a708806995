"""Deformable convolution (DCNv1) via gather-based bilinear sampling.

TPU-native replacement for mmcv's DeformConv2dPack CUDA op, used by the
reference's deformable localization-FPN variant
(knet/det/semantic_fpn_wrapper.py:11,256): a 3x3 conv whose taps are displaced
by learned per-pixel offsets. Offsets come from a zero-initialized conv (DCN
convention); each displaced tap is a bilinear gather, and the tap-weighted sum
is one einsum on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.ops.sampling import bilinear_sample

Array = jax.Array


class DeformConv2d(nn.Module):
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        k = self.kernel_size
        nk = k * k
        offsets = nn.Conv(
            2 * nk, (k, k), padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="offset_conv",
        )(x)  # [B, H, W, 2*nk] as (dy, dx) pairs
        offsets = offsets.reshape(b, h, w, nk, 2)

        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        taps = jnp.stack(
            jnp.meshgrid(
                jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
                jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2,
                indexing="ij",
            ),
            axis=-1,
        ).reshape(nk, 2)  # [nk, 2] (dy, dx)

        sample_y = ys[None, :, :, None] + taps[None, None, None, :, 0] + offsets[..., 0]
        sample_x = xs[None, :, :, None] + taps[None, None, None, :, 1] + offsets[..., 1]
        # gather: [B, H, W, nk, C]
        gathered = jax.vmap(bilinear_sample)(x, sample_y, sample_x)

        weight = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (nk, c, self.features),
        )
        out = jnp.einsum("bhwkc,kcf->bhwf", gathered, weight)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return out + bias
