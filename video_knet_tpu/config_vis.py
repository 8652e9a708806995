"""Config for the VIS (YouTube-VIS) model family.

Field names/defaults mirror configs/video_knet_vis/_base_/models/knet_track_r50.py:
40 classes (all things, no stuff), 100 proposals, per-frame K-Net (3 stages) +
clip tracker head (3 stages, assign_stages=2, query_merge='mean'),
mask_assign_stride=4, max_per_img=10; dataset: 5 ref frames, range +-2
(configs/video_knet_vis/_base_/datasets/youtubevis_2019.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from video_knet_tpu.config import (
    AssignerConfig,
    ConvKernelHeadConfig,
    KernelUpdateHeadConfig,
    TestCfg,
)


@dataclass(frozen=True)
class VISConfig:
    backbone: str = "resnet50"
    backbone_drop_path_rate: float = 0.0  # 0.3 in the swin-b VIS config
    # 'fpn' | 'msdeform_pixel_decoder' (knet_track_r50_deformablefpn.py neck)
    neck_type: str = "fpn"
    frozen_stages: int = 1
    norm_eval: bool = True
    bf16_train: bool = False  # bf16 forward/backward, fp32 masters (train/vps.py)
    num_classes: int = 40
    num_proposals: int = 100
    num_frames: int = 5  # clip length at train (whole video at test)
    mask_assign_stride: int = 4
    max_insts: int = 16  # static tube slots
    # kernel-init mode: 'frame' (per-frame K-Net then clip fusion, the release
    # pipeline) | 'volume' (ConvKernelHeadVideo tube kernels,
    # knet_vis/tracker/kernel_head.py:12 — skips the per-frame iter head)
    kernel_head_mode: str = "frame"
    # per-frame K-Net
    num_stages: int = 3
    assign_stages: int = 3
    stage_loss_weights: tuple = (1.0, 1.0, 1.0)
    # clip tracker head
    tracker_num_stages: int = 3
    tracker_assign_stages: int = 2
    tracker_stage_loss_weights: tuple = (1.0, 1.0, 1.0)
    query_merge_method: str = "mean"  # 'mean' | 'attention' | 'attention_pos'
    direct_tracker: bool = False  # re-seed tracker kernels from the raw init kernels
    with_mask_init: bool = False  # fc_mask dynamic-conv mask re-initialization
    rpn: ConvKernelHeadConfig = field(
        default_factory=lambda: ConvKernelHeadConfig(
            num_classes=40,
            num_thing_classes=40,
            num_stuff_classes=0,
            cat_stuff_mask=False,
            feat_downsample_stride=2,
            loss_rank_weight=0.1,
            seg_use_sigmoid=True,
        )
    )
    head: KernelUpdateHeadConfig = field(
        default_factory=lambda: KernelUpdateHeadConfig(
            num_classes=40,
            num_thing_classes=40,
            num_stuff_classes=0,
            mask_upsample_stride=2,
        )
    )
    assigner: AssignerConfig = field(default_factory=AssignerConfig)
    test: TestCfg = field(default_factory=lambda: TestCfg(max_per_img=10))

    @property
    def num_thing_classes(self) -> int:
        return self.num_classes

    @property
    def num_stuff_classes(self) -> int:
        return 0


def youtube_vis_2019_config() -> VISConfig:
    return VISConfig()
