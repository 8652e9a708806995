"""Backbone factory: ResNet-50/101 or Swin tiny/small/base/large.

Mirrors the reference's backbone surface (mmdet ResNet in the r50 configs,
SwinTransformerDIY in swin_b/swin_l configs, swin/swin_transformer.py:516)."""

from __future__ import annotations

from flax import linen as nn

from video_knet_tpu.models.resnet import ResNet
from video_knet_tpu.models.swin import SwinTransformer


def build_backbone(name: str, *, frozen_stages: int, norm_eval: bool, train: bool,
                   drop_path_rate: float = 0.0,
                   module_name: str = "backbone") -> nn.Module:
    if name.startswith("resnet"):
        return ResNet(
            depth=int(name.replace("resnet", "")),
            frozen_stages=frozen_stages,
            norm_eval=norm_eval,
            train=train,
            name=module_name,
        )
    if name.startswith("swin"):
        preset = name.split("_", 1)[1] if "_" in name else "base"
        return SwinTransformer(
            preset=preset,
            frozen_stages=frozen_stages,
            drop_path_rate=drop_path_rate,
            train=train,
            name=module_name,
        )
    if name.startswith("mit_"):
        from video_knet_tpu.models.mit import MixVisionTransformer

        return MixVisionTransformer(preset=name.split("_", 1)[1], name=module_name)
    raise ValueError(f"unknown backbone {name}")
