"""Backbone + neck factory: ResNet-50/101, Swin tiny/small/base/large, the
DetectoRS/RFP recursive backbones, and the neck variants.

Mirrors the reference's backbone surface (mmdet ResNet in the r50 configs,
SwinTransformerDIY in swin_b/swin_l configs, swin/swin_transformer.py:516;
DetectoRSResNet swin/DetectRS.py:209 and SwinTransformerRFP
swin/swin_transformer_rfp.py:874 are registry-reachable there) and the neck
surface (mmdet FPN in the release configs, MSDeformAttnPixelDecoder in the
*deformable_fpn* configs, knet/det/msdeformattn_decoder.py:18)."""

from __future__ import annotations

from flax import linen as nn

from video_knet_tpu.models.resnet import FPN, ResNet
from video_knet_tpu.models.swin import SwinTransformer

# backbones whose output is already a 4-level 256-ch pyramid (the recursive
# feature pyramid IS their neck); models skip the separate neck for these
PYRAMID_BACKBONES = ("detectors_r50", "detectors_r101", "swin_b_rfp",
                     "swin_base_rfp", "swin_t_rfp", "swin_tiny_rfp")


def backbone_is_pyramid(name: str) -> bool:
    return name in PYRAMID_BACKBONES


def build_backbone(name: str, *, frozen_stages: int, norm_eval: bool, train: bool,
                   drop_path_rate: float = 0.0,
                   module_name: str = "backbone") -> nn.Module:
    if backbone_is_pyramid(name):
        from video_knet_tpu.models.rfp import RFP

        rfp_name = name
        if name.startswith("swin"):
            # normalize 'swin_b_rfp' -> RFP's 'swin_<preset>_rfp' naming
            preset = {"b": "base", "t": "tiny"}.get(
                name.split("_")[1], name.split("_")[1]
            )
            rfp_name = f"swin_{preset}_rfp"
        kwargs = {} if module_name is None else {"name": module_name}
        return RFP(backbone=rfp_name, train=train, **kwargs)
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


def build_neck(neck_type: str, backbone: str, name: str = "neck") -> nn.Module | None:
    """Neck module for raw backbone features, or None when the backbone's
    output is already the pyramid (RFP)."""
    if backbone_is_pyramid(backbone):
        return None
    if neck_type == "fpn":
        return FPN(name=name)
    if neck_type == "msdeform_pixel_decoder":
        from video_knet_tpu.models.msdeform_decoder import MSDeformAttnPixelDecoder

        return MSDeformAttnPixelDecoder(name=name)
    raise ValueError(f"unknown neck_type {neck_type}")
