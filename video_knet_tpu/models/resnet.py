"""ResNet backbone (torch-style bottleneck), NHWC, TPU-first.

Capability parity with the reference's mmdet ResNet as configured
(configs/det/_base_/models/knet_kitti_step_s3_r50_fpn.py:11-20):
depth=50, out_indices=(0,1,2,3), frozen_stages=1, style='pytorch' (stride on the 3x3
conv), norm_eval / SyncBN modes.

TPU notes: under jit with a batch-sharded mesh, BatchNorm batch statistics are global
reductions, so 'SyncBN' comes for free; `norm_eval=True` uses running averages. The
frozen stem/stage-1 apply stop_gradient (optimizer masking handles weight decay).
"""

from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

Array = jax.Array

RESNET_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class BottleneckBlock(nn.Module):
    features: int  # bottleneck width; out = features * 4
    stride: int = 1
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        ura = self.use_running_average
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=ura, momentum=0.9, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=ura, momentum=0.9, epsilon=1e-5, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=ura, momentum=0.9, epsilon=1e-5, name="bn3")(y)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=ura, momentum=0.9, epsilon=1e-5, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns the four stage outputs (strides 4, 8, 16, 32)."""

    depth: int = 50
    frozen_stages: int = 1  # -1 none; 0 stem; k freezes stem + stages 1..k
    norm_eval: bool = True  # BN in eval mode during training (image configs)
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        blocks = RESNET_STAGE_BLOCKS[self.depth]

        def ura_for(stage_idx: int) -> bool:
            # stage_idx 0 == stem; BN uses running stats when eval-mode or frozen
            if not self.train or self.norm_eval:
                return True
            return stage_idx <= self.frozen_stages

        # stem
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=ura_for(0), momentum=0.9, epsilon=1e-5,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            y = jax.lax.stop_gradient(y)

        outs = []
        widths = (64, 128, 256, 512)
        for s, (w, n_blocks) in enumerate(zip(widths, blocks), start=1):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and s > 1) else 1
                y = BottleneckBlock(
                    features=w, stride=stride, use_running_average=ura_for(s),
                    name=f"layer{s}_block{b}",
                )(y)
            if self.frozen_stages >= s:
                y = jax.lax.stop_gradient(y)
            outs.append(y)
        return outs


class FPN(nn.Module):
    """mmdet-style FPN (lateral 1x1 + top-down sum + 3x3 output convs).

    As configured: in [256,512,1024,2048] -> 256, start_level 0, num_outs 4
    (no extra levels needed).
    """

    out_channels: int = 256
    num_outs: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> list[Array]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[-3], laterals[i - 1].shape[-2]
            # mmdet FPN upsamples with nearest by default
            up = jax.image.resize(
                laterals[i],
                laterals[i].shape[:-3] + (h, w, laterals[i].shape[-1]),
                method="nearest",
            )
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding="SAME", name=f"fpn_conv{i}")(l)
            for i, l in enumerate(laterals)
        ]
        return outs[: self.num_outs]
