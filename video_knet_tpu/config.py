"""Config system: dataclasses mirroring the reference's public config surface.

Field names/defaults follow the mmcv config dicts of the five release configs
(configs/det/_base_/models/knet_kitti_step_s3_r50_fpn.py and
configs/det/video_knet_kitti_step/...joint_train.py). Static-shape additions
(max_insts GT slots) are new, required by the TPU design.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Sequence


@dataclass(frozen=True)
class AssignerConfig:
    cls_weight: float = 2.0  # FocalLossCost
    dice_weight: float = 4.0  # DiceCost(pred_act=True)
    mask_weight: float = 1.0  # MaskCost(pred_act=True)
    # TPU addition: compute the (detached) mask/dice matching costs at HEAD
    # resolution against average-pooled GT instead of on the x4-bilinear-
    # upsampled masks (the reference order, mask_hungarian_assigner.py:44-114
    # at mask_assign_stride). The upsample adds no information, so the
    # assignments agree except on boundary near-ties; 16x fewer cost-chain
    # bytes. Default OFF for reference parity — A/B in bench.py.
    coarse_costs: bool = False


@dataclass(frozen=True)
class KernelUpdatorConfig:
    in_channels: int = 256
    feat_channels: int = 256
    out_channels: int = 256


@dataclass(frozen=True)
class KernelUpdateHeadConfig:
    num_classes: int = 19
    num_thing_classes: int = 2
    num_stuff_classes: int = 17
    num_ffn_fcs: int = 2
    num_heads: int = 8
    num_cls_fcs: int = 1
    num_mask_fcs: int = 1
    feedforward_channels: int = 2048
    in_channels: int = 256
    out_channels: int = 256
    conv_kernel_size: int = 1
    mask_upsample_stride: int = 2  # 4 for the video KITTI-STEP config
    hard_mask_thr: float = 0.5
    feat_transform: bool = True  # 1x1 conv, no norm/act
    with_ffn: bool = True
    # losses
    loss_mask_weight: float = 1.0
    loss_dice_weight: float = 4.0
    loss_cls_weight: float = 2.0
    loss_rank_weight: float = 0.0  # 0.1 in image config; 0 (absent) in video config
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    updator: KernelUpdatorConfig = field(default_factory=KernelUpdatorConfig)


@dataclass(frozen=True)
class ConvKernelHeadConfig:
    num_proposals: int = 100
    num_classes: int = 19
    num_thing_classes: int = 2
    num_stuff_classes: int = 17
    in_channels: int = 256
    out_channels: int = 256
    conv_kernel_size: int = 1
    feat_downsample_stride: int = 2  # 4 for video config
    feat_refine: bool = False
    use_binary: bool = True
    num_loc_convs: int = 1
    num_seg_convs: int = 1
    proposal_feats_with_obj: bool = True
    cat_stuff_mask: bool = True
    kernel_init_std: float = 1.0
    # localization fpn
    # 'semantic_fpn' (release) | 'upernet_align' (SFNet aligned head,
    # semantic_fpn_wrapper.py:239 — registered-but-unreleased variant)
    fpn_type: str = "semantic_fpn"
    fpn_feat_channels: int = 256
    fpn_upsample_times: int = 2
    fpn_positional_encoding: bool = True
    fpn_num_aux_convs: int = 1
    # losses
    loss_mask_weight: float = 1.0
    loss_dice_weight: float = 4.0
    loss_rank_weight: float = 0.1
    loss_seg_weight: float = 1.0
    seg_use_sigmoid: bool = True  # focal seg loss (image); False -> CE (video config)


@dataclass(frozen=True)
class TrackHeadConfig:
    """QuasiDenseMaskEmbedHeadGTMask as configured (num_convs=0 -> pure MLP)."""

    num_fcs: int = 2  # 1 in the swin-l "short_track_fc" config
    in_channels: int = 256
    fc_out_channels: int = 256
    embed_channels: int = 256
    loss_track_weight: float = 0.25
    loss_track_aux_weight: float = 1.0
    aux_neg_pos_ub: int = 3
    aux_neg_margin: float = 0.1
    # QueryTrackHead (knet/video/track_heads.py:16, the FuseTrack ablation):
    # match-score MLP width and CE weight
    query_fc_out_channels: int = 1024
    match_loss_weight: float = 1.0


@dataclass(frozen=True)
class TrackerConfig:
    """QuasiDenseEmbedTracker thresholds (joint_train.py:62-75)."""

    init_score_thr: float = 0.35
    obj_score_thr: float = 0.3
    match_score_thr: float = 0.5
    memo_tracklet_frames: int = 5
    memo_momentum: float = 0.8
    nms_conf_thr: float = 0.5
    nms_backdrop_iou_thr: float = 0.3
    nms_class_iou_thr: float = 0.7
    with_cats: bool = True
    match_metric: str = "bisoftmax"
    memo_capacity: int = 128  # static slots for tracklet memory (TPU addition)


@dataclass(frozen=True)
class TestCfg:
    max_per_img: int = 100
    mask_thr: float = 0.5
    merge_joint: bool = True
    instance_score_thr: float = 0.25
    overlap_thr: float = 0.6
    iou_thr: float = 0.5
    stuff_max_area: int = 4096
    # TPU addition: run the joint-argmax merge at the mask resolution and
    # nearest-upsample the resulting label map, instead of bilinearly resizing
    # all N_tot mask channels to full output resolution first (the reference's
    # order, kernel_iter_head.py:616-655). Same decisions away from mask
    # boundaries; ~3x faster decode. Set False for bit-parity with the reference.
    fast_decode: bool = True


@dataclass(frozen=True)
class KNetConfig:
    """Image K-Net (knet/det/knet.py) — also the base of the video models."""

    backbone: str = "resnet50"
    backbone_drop_path_rate: float = 0.0  # 0.3 swin-b / 0.2 swin-l configs
    # 'fpn' (release) | 'msdeform_pixel_decoder' (the *deformable_fpn* configs,
    # knet/det/msdeformattn_decoder.py:18). Ignored for RFP backbones
    # ('detectors_r50', 'swin_b_rfp'), whose recursive pyramid IS the neck.
    neck_type: str = "fpn"
    frozen_stages: int = 1
    norm_eval: bool = True
    # TPU mixed precision: forward+backward compute in bfloat16 (params cast at
    # use, fp32 master copies + fp32 optimizer state + fp32 losses). No loss
    # scaling needed for bf16 on TPU. Off = full fp32 (the reference trains
    # fp32 on V100s).
    bf16_train: bool = False
    num_stages: int = 3
    assign_stages: int = 3  # image config leaves default(5) > num_stages -> all stages
    stage_loss_weights: Sequence[float] = (1.0, 1.0, 1.0)
    num_proposals: int = 100
    num_thing_classes: int = 2
    num_stuff_classes: int = 17
    mask_assign_stride: int = 4  # 2 for video config
    ignore_label: int = 255
    max_insts: int = 32  # static GT slots (TPU addition)
    rpn: ConvKernelHeadConfig = field(default_factory=ConvKernelHeadConfig)
    head: KernelUpdateHeadConfig = field(
        default_factory=lambda: KernelUpdateHeadConfig(loss_rank_weight=0.1)
    )
    assigner: AssignerConfig = field(default_factory=AssignerConfig)
    test: TestCfg = field(default_factory=TestCfg)

    @property
    def num_classes(self) -> int:
        return self.num_thing_classes + self.num_stuff_classes


@dataclass(frozen=True)
class VideoKNetConfig(KNetConfig):
    """VideoKNetQuansiEmbedFCJointTrain (joint_train config)."""

    mask_assign_stride: int = 2
    link_previous: bool = True
    previous_type: str = "ffn"  # 'ffn' | 'update' | 'update_obj'
    previous_link: str | None = None  # None | 'link_atten' | 'update_dynamic_cov'
    # Track-embedding source (the VPS detector-ablation family):
    #   'kernel_embed' — release (VideoKNetQuansiEmbedFCJointTrain)
    #   'query_fuse'   — VideoKNetFuseTrack (knet/video/knet_track_head.py:12):
    #                    QueryTrackHead match-score CE over the final kernels
    #   'roi_gt_box'   — VideoKNetQuansiTrackROIGTBoxJointTrain
    #                    (knet_quansi_dense_roi_gt_box_joint_train.py:17):
    #                    RoIAligned appearance embeddings at GT-mask boxes
    track_head_type: str = "kernel_embed"
    ref_seq_index: Sequence[int] = (-2, -1, 1, 2)
    track: TrackHeadConfig = field(default_factory=TrackHeadConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    rpn: ConvKernelHeadConfig = field(
        default_factory=lambda: ConvKernelHeadConfig(
            feat_downsample_stride=4, seg_use_sigmoid=False, loss_rank_weight=0.1
        )
    )
    head: KernelUpdateHeadConfig = field(
        default_factory=lambda: KernelUpdateHeadConfig(mask_upsample_stride=4)
    )


def kitti_step_image_config() -> KNetConfig:
    return KNetConfig()


def kitti_step_video_config() -> VideoKNetConfig:
    return VideoKNetConfig()


def semkitti_video_config() -> VideoKNetConfig:
    """SemKITTI-DVPS: 19 classes, 8 things (ids 11..18), depth-aware GT
    (external/semkitti_dvps.py; class/instance in separate PNGs)."""
    return dataclasses.replace(
        VideoKNetConfig(),
        num_thing_classes=8,
        num_stuff_classes=11,
        rpn=ConvKernelHeadConfig(
            num_classes=19, num_thing_classes=8, num_stuff_classes=11,
            feat_downsample_stride=4, seg_use_sigmoid=False,
            loss_rank_weight=0.1,
        ),
        head=KernelUpdateHeadConfig(
            num_classes=19, num_thing_classes=8, num_stuff_classes=11,
            mask_upsample_stride=4,
        ),
    )


def vipseg_video_config() -> VideoKNetConfig:
    return dataclasses.replace(
        VideoKNetConfig(),
        num_thing_classes=58,
        num_stuff_classes=66,
        rpn=ConvKernelHeadConfig(
            num_classes=124, num_thing_classes=58, num_stuff_classes=66,
            feat_downsample_stride=4, seg_use_sigmoid=False,
        ),
        head=KernelUpdateHeadConfig(
            num_classes=124, num_thing_classes=58, num_stuff_classes=66,
            mask_upsample_stride=4,
        ),
    )
