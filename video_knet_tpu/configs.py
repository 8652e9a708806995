"""Named config registry: the reference's release config surface.

Each factory mirrors one of the reference's mmcv config files (cited per entry);
`get_config(name)` accepts either our short name or the reference's config file
stem. Field names/defaults follow the originals (SURVEY.md §2.8); static-shape
additions (max_insts GT slots) are TPU-design extras.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from video_knet_tpu.config import (
    KNetConfig,
    VideoKNetConfig,
    kitti_step_image_config,
    kitti_step_video_config,
    vipseg_video_config,
)
from video_knet_tpu.config_vis import VISConfig, youtube_vis_2019_config


def knet_s3_r50_fpn_cityscapes_step() -> KNetConfig:
    """configs/det/knet_cityscapes_step/knet_s3_r50_fpn.py — image K-Net
    pretraining on Cityscapes-STEP (19 cls = 2 thing + 17 stuff)."""
    return kitti_step_image_config()


def knet_s3_swin_b_fpn_cityscapes_step() -> KNetConfig:
    """configs/det/knet_cityscapes_step/knet_s3_swin_b_fpn.py."""
    return dataclasses.replace(kitti_step_image_config(), backbone="swin_base",
                               backbone_drop_path_rate=0.3)


def knet_s3_swin_l_fpn_cityscapes_step() -> KNetConfig:
    """configs/det/knet_cityscapes_step/knet_s3_swin_l_fpn.py."""
    return dataclasses.replace(kitti_step_image_config(), backbone="swin_large",
                               backbone_drop_path_rate=0.2)


def knet_s3_r50_fpn_coco_panoptic() -> KNetConfig:
    """configs/det/coco/knet_s3_r50_fpn_ms-3x_coco-panoptic.py (133 classes)."""
    base = kitti_step_image_config()
    return dataclasses.replace(
        base,
        num_thing_classes=80,
        num_stuff_classes=53,
        rpn=dataclasses.replace(
            base.rpn, num_classes=133, num_thing_classes=80, num_stuff_classes=53
        ),
        head=dataclasses.replace(
            base.head, num_classes=133, num_thing_classes=80, num_stuff_classes=53
        ),
    )


def knet_s3_r50_fpn_coco_instance() -> KNetConfig:
    """configs/det/coco/knet_s3_r50_fpn_ms-3x_coco.py — COCO instance
    segmentation (80 thing classes, no stuff rows, no panoptic decode; test
    output is top-k instance masks, kernel_iter_head.py:271-282 +
    kernel_update_head.py:443-483)."""
    base = kitti_step_image_config()
    return dataclasses.replace(
        base,
        num_thing_classes=80,
        num_stuff_classes=0,
        rpn=dataclasses.replace(
            base.rpn, num_classes=80, num_thing_classes=80, num_stuff_classes=0,
            cat_stuff_mask=False, seg_use_sigmoid=True,
        ),
        head=dataclasses.replace(
            base.head, num_classes=80, num_thing_classes=80, num_stuff_classes=0,
        ),
    )


def knet_s3_r50_deformable_fpn_coco_instance() -> KNetConfig:
    """configs/det/coco/knet_s3_r50_deformable_fpn_ms-3x_coco.py — COCO
    instance seg with the MSDeformAttnPixelDecoder neck
    (_base_/models/knet_s3_r50_deformable_fpn.py)."""
    return dataclasses.replace(
        knet_s3_r50_fpn_coco_instance(), neck_type="msdeform_pixel_decoder"
    )


def knet_s3_swin_b_deformable_fpn_coco_instance() -> KNetConfig:
    """configs/det/coco/knet_s3_swin-b_deformable_fpn_ms-3x_coco.py."""
    return dataclasses.replace(
        knet_s3_r50_deformable_fpn_coco_instance(), backbone="swin_base",
        backbone_drop_path_rate=0.3,
    )


def video_knet_s3_r50_kitti_step_joint_train() -> VideoKNetConfig:
    """configs/det/video_knet_kitti_step/video_knet_s3_r50_rpn_1x_kitti_step_
    sigmoid_stride2_mask_embed_link_ffn_joint_train.py — THE flagship VPS model."""
    return kitti_step_video_config()


def video_knet_s3_swin_b_kitti_step_joint_update() -> VideoKNetConfig:
    """configs/det/video_knet_kitti_step/video_knet_s3_swinb_..._joint_update.py:
    swin-b with previous_link='update_dynamic_cov', previous_type='update'."""
    return dataclasses.replace(
        kitti_step_video_config(), backbone="swin_base",
        backbone_drop_path_rate=0.3,
        previous_link="update_dynamic_cov", previous_type="update",
    )


def video_knet_s3_swin_l_kitti_step_joint_update() -> VideoKNetConfig:
    """configs/det/video_knet_kitti_step/video_knet_s3_swinl_..._joint_update.py."""
    return dataclasses.replace(
        video_knet_s3_swin_b_kitti_step_joint_update(), backbone="swin_large",
        backbone_drop_path_rate=0.2,
    )


def video_knet_s3_swin_l_kitti_step_short_track_fc() -> VideoKNetConfig:
    """...swinl_..._update_conv_short_track_fc.py: previous_link=
    'update_dynamic_cov', previous_type='ffn', track-head MLP num_fcs=1."""
    base = kitti_step_video_config()
    return dataclasses.replace(
        base, backbone="swin_large", backbone_drop_path_rate=0.2,
        previous_link="update_dynamic_cov", previous_type="ffn",
        track=dataclasses.replace(base.track, num_fcs=1),
    )


def video_knet_fuse_track_kitti_step() -> VideoKNetConfig:
    """VideoKNetFuseTrack ablation (knet/video/knet_track_head.py:12):
    QueryTrackHead match-score CE instead of the quasi-dense kernel embedding.
    Registered-but-unreleased in the reference (no config file ships)."""
    return dataclasses.replace(
        kitti_step_video_config(), track_head_type="query_fuse"
    )


def video_knet_roi_gt_box_kitti_step() -> VideoKNetConfig:
    """VideoKNetQuansiTrackROIGTBoxJointTrain ablation
    (knet/video/knet_quansi_dense_roi_gt_box_joint_train.py:17): track
    embeddings RoIAligned at GT-mask boxes. No reference config file ships."""
    return dataclasses.replace(
        kitti_step_video_config(), track_head_type="roi_gt_box"
    )


def video_knet_toy_kitti_step() -> VideoKNetConfig:
    """Toy Video K-Net (knet/video/knet_quansi_dense_embed_fc_toy_exp.py:15,
    README.md:114-117): per-frame kernels, NO cross-frame kernel linking; the
    association embedding alone carries identity."""
    return dataclasses.replace(kitti_step_video_config(), link_previous=False)


def video_knet_unitrack_kitti_step() -> VideoKNetConfig:
    """VideoKNetUniTrack baseline (knet/video/knet_uni_track.py:13, the
    "K-Net + UniTrack" poster-table row): per-frame K-Net detections, no
    kernel linking / learned track head; association is UniTrack's frozen-
    appearance Kalman tracker — select tracker_type='unitrack' with an
    appearance encoder from models/video/appearance.py at serving time
    (tools/test_step.py --tracker unitrack --appearance resnet18)."""
    return dataclasses.replace(kitti_step_video_config(), link_previous=False)


def video_knet_s3_r50_vipseg() -> VideoKNetConfig:
    """configs/det/video_knet_vipseg/*.py — 124 classes (58 thing / 66 stuff)."""
    return vipseg_video_config()


def video_knet_s3_swin_b_vipseg() -> VideoKNetConfig:
    """configs/det/video_knet_vipseg/video_knet_s3_swin_b_rpn_vipseg_mask_
    embed_link_ffn_joint_train_8e.py — the 5th BASELINE config: Swin-B VPS on
    VIP-Seg (124 classes, short-side-720 frames, previous_type='ffn' linking,
    drop_path 0.3, 8 epochs)."""
    return dataclasses.replace(
        vipseg_video_config(), backbone="swin_base", backbone_drop_path_rate=0.3
    )


def video_knet_vis_r50_ytvis2019() -> VISConfig:
    """configs/video_knet_vis/video_knet_vis/*.py — YT-VIS 2019 (40 classes)."""
    return youtube_vis_2019_config()


def video_knet_vis_swin_b_ytvis2019() -> VISConfig:
    return dataclasses.replace(youtube_vis_2019_config(), backbone="swin_base",
                               backbone_drop_path_rate=0.3)


def video_knet_vis_r50_deformable_ytvis2019() -> VISConfig:
    """configs/video_knet_vis/video_knet_vis/knet_track_r50_deformable_fpn_1x_
    youtubevis.py: MSDeformAttnPixelDecoder neck instead of FPN
    (_base_/models/knet_track_r50_deformablefpn.py)."""
    return dataclasses.replace(
        youtube_vis_2019_config(), neck_type="msdeform_pixel_decoder"
    )


def video_knet_vis_swin_b_deformable_ytvis2019() -> VISConfig:
    """configs/video_knet_vis/video_knet_vis/knet_track_swinb_deformable_1x_
    youtubevis.py."""
    return dataclasses.replace(
        video_knet_vis_swin_b_ytvis2019(), neck_type="msdeform_pixel_decoder"
    )


def knet_s3_detectors_r50_cityscapes_step() -> KNetConfig:
    """DetectoRS (SAC + recursive feature pyramid) image K-Net — the reference
    keeps DetectoRSResNet/RFP registered but ships no config
    (swin/DetectRS.py:209); smoke config for the same reachability."""
    return dataclasses.replace(kitti_step_image_config(), backbone="detectors_r50")


def knet_s3_swin_b_rfp_cityscapes_step() -> KNetConfig:
    """SwinTransformerRFP image K-Net (swin/swin_transformer_rfp.py:874) —
    registered-but-unreleased in the reference; smoke config."""
    return dataclasses.replace(kitti_step_image_config(), backbone="swin_b_rfp")


def video_knet_vis_volume_r50_ytvis2019() -> VISConfig:
    """Volume (tube-kernel) VIS ablation: ConvKernelHeadVideo init
    (knet_vis/tracker/kernel_head.py:12), clip stages only."""
    return dataclasses.replace(youtube_vis_2019_config(), kernel_head_mode="volume")


CONFIGS: dict[str, Callable] = {
    "knet_s3_r50_fpn_cityscapes_step": knet_s3_r50_fpn_cityscapes_step,
    "knet_s3_swin_b_fpn_cityscapes_step": knet_s3_swin_b_fpn_cityscapes_step,
    "knet_s3_swin_l_fpn_cityscapes_step": knet_s3_swin_l_fpn_cityscapes_step,
    "knet_s3_r50_fpn_ms-3x_coco-panoptic": knet_s3_r50_fpn_coco_panoptic,
    "knet_s3_r50_fpn_ms-3x_coco": knet_s3_r50_fpn_coco_instance,
    "knet_s3_r50_deformable_fpn_ms-3x_coco": knet_s3_r50_deformable_fpn_coco_instance,
    "knet_s3_swin-b_deformable_fpn_ms-3x_coco": (
        knet_s3_swin_b_deformable_fpn_coco_instance
    ),
    "video_knet_s3_r50_rpn_1x_kitti_step_sigmoid_stride2_mask_embed_link_ffn_joint_train": (
        video_knet_s3_r50_kitti_step_joint_train
    ),
    "video_knet_s3_r50_rpn_1x_kitti_step_sigmoid_stride2_mask_embed_link_ffn_joint_train_8e": (
        video_knet_s3_r50_kitti_step_joint_train  # 8-epoch schedule, same model
    ),
    "video_knet_s3_swinb_rpn_1x_kitti_step_sigmoid_stride2_mask_embed_link_ffn_joint_update": (
        video_knet_s3_swin_b_kitti_step_joint_update
    ),
    "video_knet_s3_swinl_rpn_1x_kitti_step_sigmoid_stride2_mask_embed_link_ffn_joint_update": (
        video_knet_s3_swin_l_kitti_step_joint_update
    ),
    "video_knet_s3_swinl_rpn_1x_kitti_step_sigmoid_stride2_mask_embed_link_ffn_update_conv_short_track_fc": (
        video_knet_s3_swin_l_kitti_step_short_track_fc
    ),
    "video_knet_kitti_step_r50": video_knet_s3_r50_kitti_step_joint_train,
    "video_knet_kitti_step_swin_b": video_knet_s3_swin_b_kitti_step_joint_update,
    "video_knet_kitti_step_swin_l": video_knet_s3_swin_l_kitti_step_joint_update,
    "video_knet_kitti_step_toy": video_knet_toy_kitti_step,
    "video_knet_kitti_step_unitrack": video_knet_unitrack_kitti_step,
    "video_knet_kitti_step_fuse_track": video_knet_fuse_track_kitti_step,
    "video_knet_kitti_step_roi_gt_box": video_knet_roi_gt_box_kitti_step,
    "video_knet_vipseg_r50": video_knet_s3_r50_vipseg,
    "video_knet_vipseg_swin_b": video_knet_s3_swin_b_vipseg,
    "video_knet_s3_swin_b_rpn_vipseg_mask_embed_link_ffn_joint_train_8e": (
        video_knet_s3_swin_b_vipseg
    ),
    "video_knet_vis_r50_ytvis2019": video_knet_vis_r50_ytvis2019,
    "video_knet_vis_swin_b_ytvis2019": video_knet_vis_swin_b_ytvis2019,
    "video_knet_vis_volume_r50_ytvis2019": video_knet_vis_volume_r50_ytvis2019,
    "video_knet_vis_r50_deformable_ytvis2019": video_knet_vis_r50_deformable_ytvis2019,
    "video_knet_vis_swin_b_deformable_ytvis2019": (
        video_knet_vis_swin_b_deformable_ytvis2019
    ),
    "knet_track_r50_deformable_fpn_1x_youtubevis": (
        video_knet_vis_r50_deformable_ytvis2019
    ),
    "knet_track_swinb_deformable_1x_youtubevis": (
        video_knet_vis_swin_b_deformable_ytvis2019
    ),
    "knet_s3_detectors_r50_cityscapes_step": knet_s3_detectors_r50_cityscapes_step,
    "knet_s3_swin_b_rfp_cityscapes_step": knet_s3_swin_b_rfp_cityscapes_step,
}


def get_config(name: str):
    if name not in CONFIGS:
        raise KeyError(f"unknown config '{name}'; known: {sorted(CONFIGS)}")
    return CONFIGS[name]()
