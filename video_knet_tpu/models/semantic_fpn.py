"""Semantic-FPN localization neck (Panoptic-FPN style).

Rebuild of SemanticFPNWrapper as configured by the release configs
(knet/det/semantic_fpn_wrapper.py:17-236 with start_level=0, end_level=3,
upsample_times=2, sine positional encoding at level 3, sum-fuse, conv_pred +
1 aux conv, GN norm): all four FPN levels are convolved (+ upsampled) to stride 8
and summed; two 1x1 heads produce the 'thing' and 'stuff' branch features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.models.layers import ConvNormAct, sine_positional_encoding, upsample2x

Array = jax.Array


class SemanticFPN(nn.Module):
    """num_frames set -> the clip-aware 3-D variant (SemanticFPNWrapper3D,
    knet_vis/tracker/semantic_fpn_wrapper3D.py:190): inputs are [B*T, H, W, C]
    with frames contiguous per video and the positional encoding gains a
    temporal sine component."""

    feat_channels: int = 256
    out_channels: int = 256
    upsample_times: int = 2
    end_level: int = 3
    with_positional_encoding: bool = True
    num_aux_convs: int = 1
    num_frames: int | None = None

    @nn.compact
    def __call__(self, feats: list[Array]) -> list[Array]:
        # feats: FPN levels at strides 4, 8, 16, 32 (NHWC). Output stride:
        # stride(end_level) / 2^upsample_times == 8 for the release configs.
        from video_knet_tpu.models.layers import sine_positional_encoding_3d

        mlvl = []
        for i in range(self.end_level + 1):
            x = feats[i]
            if i == self.end_level and self.with_positional_encoding:
                h_, w_, c_ = x.shape[-3:]
                if self.num_frames is not None:
                    pe = sine_positional_encoding_3d(
                        self.num_frames, h_, w_, c_ // 2
                    )  # [T, H, W, C]
                    bt = x.shape[0]
                    pe = jnp.tile(pe, (bt // self.num_frames, 1, 1, 1))
                    x = x + pe.astype(x.dtype)
                else:
                    pe = sine_positional_encoding(h_, w_, c_ // 2)
                    x = x + pe[None].astype(x.dtype)
            if i == 0:
                # level 0: (end_level - upsample_times) stride-2 convs
                for j in range(self.end_level - self.upsample_times):
                    x = ConvNormAct(self.feat_channels, 3, stride=2, norm="gn",
                                    name=f"l0_conv{j}")(x)
            else:
                n_up = self.upsample_times - (self.end_level - i)
                for j in range(i):
                    x = ConvNormAct(self.feat_channels, 3, norm="gn",
                                    name=f"l{i}_conv{j}")(x)
                    if j < n_up:
                        x = upsample2x(x)
            mlvl.append(x)

        # inputs whose H/W aren't divisible by 32 give off-by-one level sizes
        # (the reference pads to size_divisor=32 instead); align to level 0
        target_hw = mlvl[0].shape[-3:-1]
        from video_knet_tpu.models.layers import resize_bilinear

        mlvl = [
            m if m.shape[-3:-1] == target_hw else resize_bilinear(m, target_hw)
            for m in mlvl
        ]
        fused = sum(mlvl)
        out = ConvNormAct(self.out_channels, 1, norm="gn", name="conv_pred")(fused)
        outs = [out]
        for k in range(self.num_aux_convs):
            outs.append(
                ConvNormAct(self.out_channels, 1, norm="gn", name=f"aux_conv{k}")(fused)
            )
        return outs
