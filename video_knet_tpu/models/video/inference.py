"""Online VPS inference: stateful per-frame loop (device step + host tracker).

Rebuild of VideoKNetQuansiEmbedFCJointTrain.simple_test
(knet_quansi_dense_embed_fc_joint_train.py:472-612) and tools/test_step.py: one
jitted device step per frame (forward + linking + panoptic decode + embeddings +
semantic filter); the tiny tracker bookkeeping runs on host. Memory carried across
frames: the previous frame's final kernels (device array) + tracker memo (host).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from video_knet_tpu.config import VideoKNetConfig
from video_knet_tpu.models.video.knet_vps import VideoKNet, vps_decode
from video_knet_tpu.models.video.tracker import (
    QuasiDenseEmbedTracker,
    masks_to_boxes,
)
from video_knet_tpu.ops.panoptic import segments_to_host

# KITTI-STEP: the 2 thing classes sit at indices 11 (person) and 13 (car) of the
# 19-class cityscapes label space (external/dataset/dvps_pipelines/loading.py cherry
# =[11, 13]; joint_train.py:698-719).
KITTI_STEP_THING_IDS = (11, 13)


def make_frame_step(model: VideoKNet, variables, cfg: VideoKNetConfig, out_hw,
                    batched: bool = False):
    """Builds the jitted per-frame device function.

    batched=True serves B independent video streams per step (vmapped decode,
    per-stream embeddings/filters) — the multi-stream throughput mode for
    offline evaluation of many sequences at once."""

    @jax.jit
    def step(img, prev_obj_feats, is_first):
        out = model.apply(
            variables, img, prev_obj_feats, is_first, method=VideoKNet.test_step
        )
        pred = vps_decode(
            out["rpn_out"], out["stage_outs"], out["track_obj_feats"], cfg, out_hw,
            batched=batched,
        )
        # semantic filter (joint_train.py:546-553): argmax over seg logits; the
        # argmax is taken at feature resolution and nearest-upsampled (identical
        # label map away from boundaries, ~19x less resize traffic)
        seg = out["rpn_out"].seg_preds if batched else out["rpn_out"].seg_preds[0]
        sem_label = jnp.argmax(seg, axis=-1).astype(jnp.int32)
        shape = (seg.shape[0], *out_hw) if batched else tuple(out_hw)
        sem_label = jax.image.resize(sem_label, shape, method="nearest")
        semantic_thing = (sem_label < cfg.num_thing_classes).astype(jnp.float32)
        return dict(
            pred=pred,
            embeds=out["track_embeds"] if batched else out["track_embeds"][0],
            semantic_thing=semantic_thing,
            new_obj_feats=out["new_obj_feats"],
        )

    return step


@dataclass
class VPSResult:
    panoptic_seg: np.ndarray
    segments_info: list
    semantic_map: np.ndarray
    track_map: np.ndarray


def semantic_map_from_panoptic(
    pan: np.ndarray,
    segments_info: list,
    *,
    num_thing_classes: int,
    num_stuff_classes: int,
    thing_ids_in_orig: tuple[int, ...] | None = KITTI_STEP_THING_IDS,
) -> np.ndarray:
    """Panoptic ids -> dataset-label-space semantic map (joint_train.py:698-722).

    thing_ids_in_orig given (KITTI-STEP style): thing k -> thing_ids_in_orig[k];
    stuff (1-based cat) -> its original index skipping thing slots.
    None: the dataset space IS the repo's things-first space (VIP-Seg after the
    vip2hb-equivalent decode): thing -> cat; stuff -> cat - 1 + num_thing.
    """
    sem = np.zeros(pan.shape, np.int32)
    for seg in segments_info:
        region = pan == seg["id"]
        if seg["isthing"]:
            if thing_ids_in_orig is not None:
                sem[region] = thing_ids_in_orig[seg["category_id"]]
            else:
                sem[region] = seg["category_id"]
        else:
            cat = seg["category_id"] - 1
            if thing_ids_in_orig is not None:
                offset = 0
                for tid in thing_ids_in_orig:
                    if cat + offset >= tid:
                        offset += 1
                sem[region] = cat + offset
            else:
                sem[region] = cat + num_thing_classes
    return sem


class VPSInferencePipeline:
    """Carries per-video state; call run_frame for each frame in order.

    tracker_type selects the association strategy:
      'quasi_dense' — the release tracker (QuasiDenseEmbedTracker);
      'unitrack'    — the K-Net + UniTrack baseline (Kalman + appearance,
                      knet/video/knet_uni_track.py:13);
      'simple' / 'overlap' — the GIoU / mask-IoU greedy matchers
                      (knet/video/tracker.py:14).
    """

    def __init__(self, model: VideoKNet, variables, cfg: VideoKNetConfig, out_hw,
                 thing_ids_in_orig=KITTI_STEP_THING_IDS,
                 tracker_type: str = "quasi_dense"):
        self.cfg = cfg
        self.out_hw = out_hw
        self.step = make_frame_step(model, variables, cfg, out_hw)
        self.thing_ids_in_orig = thing_ids_in_orig
        self.tracker_type = tracker_type
        n_tot = cfg.num_proposals + cfg.num_stuff_classes
        k = cfg.head.conv_kernel_size**2
        self._zero_obj = jnp.zeros((1, n_tot, k, cfg.head.in_channels), jnp.float32)
        self.reset()

    def _make_tracker(self):
        if self.tracker_type == "quasi_dense":
            return QuasiDenseEmbedTracker(self.cfg.tracker)
        if self.tracker_type == "unitrack":
            from video_knet_tpu.models.video.unitrack import MaskAssociationTracker

            return MaskAssociationTracker()
        from video_knet_tpu.models.video.tracker_variants import (
            OverlapTracker,
            SimpleMaskTracker,
        )

        if self.tracker_type == "overlap":
            return OverlapTracker()
        if self.tracker_type == "simple":
            return SimpleMaskTracker()
        raise ValueError(self.tracker_type)

    def reset(self):
        self.tracker = self._make_tracker()
        self.prev_obj_feats = self._zero_obj
        self.frame_id = 0

    def run_frame(self, img: jnp.ndarray, is_first: bool) -> VPSResult:
        if is_first:
            self.reset()
        out = self.step(img, self.prev_obj_feats, jnp.asarray(is_first))
        self.prev_obj_feats = out["new_obj_feats"]

        pred = out["pred"]
        pan, segments_info = segments_to_host(pred.result, self.cfg.num_thing_classes)
        semantic_thing = np.asarray(out["semantic_thing"])
        embeds = np.asarray(out["embeds"])

        # collect kept things (joint_train.py:541-567)
        keep = np.asarray(pred.result.keep)
        isthing = np.asarray(pred.result.isthing)
        thing_sel = np.nonzero(keep & isthing)[0]
        track_map = np.zeros(pan.shape, np.float64)
        if len(thing_sel) > 0:
            masks = np.stack(
                [pan == int(np.asarray(pred.result.seg_ids)[k]) for k in thing_sel]
            )
            labels = np.asarray(pred.result.labels)[thing_sel]
            scores = np.asarray(pred.result.scores)[thing_sel]
            # candidate k indexes the topk thing list; its embedding comes from its
            # source proposal (thing_mask_idx)
            inst = np.asarray(pred.result.instance_idx)[thing_sel]
            mask_idx = np.asarray(pred.thing_mask_idx)
            det_embeds = embeds[mask_idx[inst]]
            filt = masks * semantic_thing[None]
            if self.tracker_type == "quasi_dense":
                boxes = masks_to_boxes(filt)
                bboxes5 = np.concatenate([boxes, scores[:, None]], axis=1)
                sel, _, ids = self.tracker.match(
                    bboxes5, labels, det_embeds, self.frame_id
                )
                ids = ids + 1
                ids[ids == -1] = 0  # suppressed (-2 + 1) -> 0
            elif self.tracker_type == "unitrack":
                ids = self.tracker.step(filt.astype(bool), det_embeds, scores)
                sel = np.arange(len(ids))
            else:  # simple / overlap
                ids = self.tracker.step(filt.astype(bool), scores)
                sel = np.arange(len(ids))
            for src, tid in zip(sel, ids):
                if tid > 0:
                    track_map[masks[src].astype(bool)] = tid

        sem = semantic_map_from_panoptic(
            pan, segments_info,
            num_thing_classes=self.cfg.num_thing_classes,
            num_stuff_classes=self.cfg.num_stuff_classes,
            thing_ids_in_orig=self.thing_ids_in_orig,
        )
        self.frame_id += 1
        return VPSResult(pan, segments_info, sem, track_map)


