"""KNetVIS: clip-level video instance segmentation (YouTube-VIS).

TPU-first rebuild of KNetTrack (knet_vis/tracker/track.py:16-381): a clip
[B, T, H, W, 3] runs backbone+FPN with T folded into the batch, a per-frame K-Net
(kernel init head + iterative update head, instance-only: no stuff rows), then the
clip tracker head fuses per-frame kernels into clip "tube" kernels
(models/vis/clip_head.py).

Training (knet_vis/tracker/kernel_frame_iter_head.py:181-310): per-frame rpn/iter
losses on per-frame GT + tracker-stage tube losses where predictions and GT tubes
are flattened to (N, T*H*W) and Hungarian-matched per clip
(knet_vis/tracker/mask_hungarian_assigner.py:60-190); unlike the image head the
tube assignment at stage s < assign_stages uses stage s's OWN detached outputs.

GT tubes are built host-side into fixed slots (`ClipGT`): slot g holds instance
g's mask for every frame (zeros where absent) — the reference's per-call python
tube construction becomes static data layout.

Inference (whole clip): top-k over the flattened (N, num_classes) clip scores ->
per-frame masks sharing one instance id per tube (kernel_frame_iter_head.py:313-368).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.config_vis import VISConfig
from video_knet_tpu.models.kernel_head import ConvKernelHead, RPNOutputs
from video_knet_tpu.models.kernel_iter_head import KernelIterHead, StageOutput
from video_knet_tpu.models.resnet import FPN
from video_knet_tpu.models.vis.clip_head import ClipKernelHead, ClipStageOutput
import video_knet_tpu.ops.hungarian as hung
from video_knet_tpu.ops import losses as L
from video_knet_tpu.ops.targets import PanopticGT

Array = jax.Array


class ClipGT(NamedTuple):
    """Fixed-slot GT tubes at mask-assign-stride resolution."""

    masks: Array  # [B, G, T, H, W] float (zeros where the instance is absent)
    labels: Array  # [B, G] int32
    valid: Array  # [B, G] bool


class VISOutputs(NamedTuple):
    rpn_out: RPNOutputs  # per-frame (leading axis B*T)
    frame_stage_outs: list[StageOutput]  # per-frame iter head stages (B*T)
    clip_stage_outs: list[ClipStageOutput]  # tracker stages (B, T, ...)


class KNetVIS(nn.Module):
    cfg: VISConfig
    train: bool = False

    @nn.compact
    def __call__(self, clip: Array) -> VISOutputs:
        """clip: [B, T, H, W, 3]."""
        cfg = self.cfg
        b, t = clip.shape[:2]
        flat = clip.reshape(b * t, *clip.shape[2:])
        from video_knet_tpu.models.backbones import build_backbone, build_neck

        feats = build_backbone(
            cfg.backbone,
            frozen_stages=cfg.frozen_stages,
            norm_eval=cfg.norm_eval,
            train=self.train,
            drop_path_rate=cfg.backbone_drop_path_rate,
        )(flat)
        neck = build_neck(getattr(cfg, "neck_type", "fpn"), cfg.backbone)
        fpn = feats if neck is None else neck(feats)

        if cfg.kernel_head_mode == "volume":
            # volume (tube) kernel init: one kernel owns one tube from the start
            # (ConvKernelHeadVideo, knet_vis/tracker/kernel_head.py:12); the
            # per-frame iter head is skipped and the clip stages run directly.
            from video_knet_tpu.models.vis.volume_head import ClipVolumeKernelHead

            vol = ClipVolumeKernelHead(cfg.rpn, name="rpn_head")(fpn, num_frames=t)
            clip_outs = ClipKernelHead(
                cfg.head,
                num_stages=cfg.tracker_num_stages,
                assign_stages=cfg.tracker_assign_stages,
                num_proposals=cfg.num_proposals,
                query_merge_method=cfg.query_merge_method,
                with_mask_init=cfg.with_mask_init,
                name="tracker",
            )(vol.x_feats, None, vol.tube_mask_preds, clip_kernels=vol.proposal_feats)
            return VISOutputs(vol, [], clip_outs)

        rpn_out = ConvKernelHead(cfg.rpn, name="rpn_head")(fpn, num_frames=t)
        frame_outs = KernelIterHead(
            cfg.head, num_stages=cfg.num_stages, name="roi_head"
        )(rpn_out.x_feats, rpn_out.proposal_feats, rpn_out.mask_preds)

        last = frame_outs[-1]
        n = cfg.num_proposals
        c = cfg.head.in_channels
        x_clip = rpn_out.x_feats.reshape(b, t, *rpn_out.x_feats.shape[1:])
        kernels_clip = last.object_feats[:, :n, 0, :].reshape(b, t, n, c)
        masks_clip = last.mask_preds[:, :n].reshape(b, t, n, *last.mask_preds.shape[-2:])
        clip_outs = ClipKernelHead(
            cfg.head,
            num_stages=cfg.tracker_num_stages,
            assign_stages=cfg.tracker_assign_stages,
            num_proposals=n,
            query_merge_method=cfg.query_merge_method,
            with_mask_init=cfg.with_mask_init,
            name="tracker",
        )(
            x_clip, kernels_clip, masks_clip,
            direct_kernels=rpn_out.init_kernels if cfg.direct_tracker else None,
        )
        return VISOutputs(rpn_out, frame_outs, clip_outs)


def frame_gt_from_clip(gt: ClipGT) -> PanopticGT:
    """Per-frame PanopticGT view of the tubes (T folded into batch).

    A slot is valid in a frame only if the instance appears there (the reference
    rebuilds per-frame GT lists; empty-frame instances are absent from them).
    """
    b, g, t, h, w = gt.masks.shape
    masks = jnp.transpose(gt.masks, (0, 2, 1, 3, 4)).reshape(b * t, g, h, w)
    present = masks.reshape(b * t, g, -1).sum(-1) > 0
    labels = jnp.broadcast_to(gt.labels[:, None], (b, t, g)).reshape(b * t, g)
    valid = jnp.broadcast_to(gt.valid[:, None], (b, t, g)).reshape(b * t, g) & present
    ids = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[None], (b * t, g)
    )
    empty = jnp.zeros((b * t, 0, h, w), jnp.float32)
    return PanopticGT(
        masks=masks,
        labels=labels,
        valid=valid,
        instance_ids=jnp.where(valid, ids, -1),
        sem_masks=empty,
        sem_valid=jnp.zeros((b * t, 0), bool),
    )


def _tube_assign(
    scaled_masks: Array,  # [B, T, N, H, W]
    cls_score: Array | None,  # [B, N, C]
    gt: ClipGT,
    cfg: VISConfig,
) -> Array:
    """Hungarian tube assignment -> gt_of_pred [B, N]."""
    b, t, n = scaled_masks.shape[:3]
    pred = jax.lax.stop_gradient(
        jnp.transpose(scaled_masks, (0, 2, 1, 3, 4)).reshape(b, n, -1)
    )
    gt_flat = gt.masks.reshape(b, gt.masks.shape[1], -1)

    def one(p, c, gm, gv, gl):
        cost = hung.dice_cost(p, gm, weight=cfg.assigner.dice_weight) + hung.mask_cost(
            p, gm, weight=cfg.assigner.mask_weight
        )
        if c is not None:
            cost = cost + hung.focal_cls_cost(c, gl, weight=cfg.assigner.cls_weight)
        return hung.pad_and_solve(cost, gv)[0]

    if cls_score is not None:
        cls_score = jax.lax.stop_gradient(cls_score)
        return jax.vmap(lambda p, c, gm, gv, gl: one(p, c, gm, gv, gl))(
            pred, cls_score, gt_flat, gt.valid, gt.labels
        )
    return jax.vmap(lambda p, gm, gv, gl: one(p, None, gm, gv, gl))(
        pred, gt_flat, gt.valid, gt.labels
    )


def _tube_stage_loss(
    out: ClipStageOutput, gt_of_pred: Array, gt: ClipGT, cfg: VISConfig, prefix: str
) -> dict[str, Array]:
    """Tube cls/mask/dice. The mask losses run on GATHERED matched rows
    ([B, G, T*H*W] instead of [B, N, T*H*W] with zero weights) — identical
    weighted means, ~N/G times less HBM traffic and no [B, N, T, H, W]
    target materialization (see models/knet.py:stage_loss)."""
    from video_knet_tpu.ops.targets import pred_of_gt_from

    h = cfg.head
    c = cfg.num_classes
    b, t, n = out.scaled_mask_preds.shape[:3]
    matched = gt_of_pred >= 0
    safe = jnp.maximum(gt_of_pred, 0)
    labels = jnp.where(matched, jnp.take_along_axis(gt.labels, safe, axis=1), c)
    num_pos = jnp.maximum(jnp.sum(matched.astype(jnp.float32)), 1.0)

    losses = {}
    if out.cls_score is not None:
        losses[f"{prefix}_loss_cls"] = L.sigmoid_focal_loss(
            out.cls_score.reshape(b * n, c),
            labels.reshape(b * n),
            num_classes=c,
            gamma=h.focal_gamma,
            alpha=h.focal_alpha,
            loss_weight=h.loss_cls_weight,
            avg_factor=num_pos,
        )
    g = gt.masks.shape[1]
    p2g = pred_of_gt_from(gt_of_pred, g)  # [B, G]
    g_matched = p2g >= 0
    g_safe = jnp.maximum(p2g, 0)
    pred_tubes = jnp.transpose(out.scaled_mask_preds, (0, 2, 1, 3, 4))  # [B, N, T, H, W]
    rows_pred = jnp.take_along_axis(
        pred_tubes, g_safe[..., None, None, None], axis=1
    )  # [B, G, T, H, W]
    flat_pred = rows_pred.reshape(b * g, -1)
    flat_tgt = gt.masks.reshape(b * g, -1)
    flat_w = g_matched.astype(jnp.float32).reshape(b * g)
    losses[f"{prefix}_loss_mask"] = L.binary_cross_entropy(
        flat_pred, flat_tgt, flat_w, loss_weight=h.loss_mask_weight
    )
    losses[f"{prefix}_loss_dice"] = L.dice_loss(
        flat_pred, flat_tgt, flat_w, loss_weight=h.loss_dice_weight
    )
    return losses


def volume_rpn_loss(vol, gt: ClipGT, cfg: VISConfig) -> dict[str, Array]:
    """ConvKernelHeadVideo losses: tube-assigned mask/dice on the init tube
    masks + per-frame dense seg loss (knet_vis/tracker/kernel_head.py loss
    surface, tube targets like the video assigner)."""
    from video_knet_tpu.models.kernel_iter_head import upscale_masks
    from video_knet_tpu.ops.targets import build_semantic_map

    r = cfg.rpn
    b, t, n, h, w = vol.tube_mask_preds.shape
    flat = vol.tube_mask_preds.reshape(b * t, n, h, w)
    scaled_f = upscale_masks(flat, r.feat_downsample_stride)
    scaled = scaled_f.reshape(b, t, n, *scaled_f.shape[-2:])
    gt_of_pred = _tube_assign(scaled, None, gt, cfg)

    # gathered matched rows (see _tube_stage_loss)
    from video_knet_tpu.ops.targets import pred_of_gt_from

    g = gt.masks.shape[1]
    p2g = pred_of_gt_from(gt_of_pred, g)
    g_matched = p2g >= 0
    g_safe = jnp.maximum(p2g, 0)
    pred_tubes = jnp.transpose(scaled, (0, 2, 1, 3, 4))  # [B, N, T, H, W]
    rows_pred = jnp.take_along_axis(
        pred_tubes, g_safe[..., None, None, None], axis=1
    )
    flat_pred = rows_pred.reshape(b * g, -1)
    flat_tgt = gt.masks.reshape(b * g, -1)
    flat_w = g_matched.astype(jnp.float32).reshape(b * g)
    losses = {
        "loss_rpn_mask": L.binary_cross_entropy(
            flat_pred, flat_tgt, flat_w, loss_weight=r.loss_mask_weight
        ),
        "loss_rpn_dice": L.dice_loss(
            flat_pred, flat_tgt, flat_w, loss_weight=r.loss_dice_weight
        ),
    }

    fgt = frame_gt_from_clip(gt)
    c = cfg.num_classes
    seg = vol.seg_preds.reshape(b * t, h, w, c)
    seg_scaled = jax.image.resize(
        seg,
        (b * t, h * r.feat_downsample_stride, w * r.feat_downsample_stride, c),
        method="linear",
    )
    seg_t = build_semantic_map(
        fgt, num_thing_classes=cfg.num_thing_classes, num_classes=c
    )
    flat_seg = seg_scaled.reshape(-1, c)
    flat_t = seg_t.reshape(-1)
    num_dense_pos = jnp.maximum(jnp.sum((flat_t < c).astype(jnp.float32)), 1.0)
    losses["loss_rpn_seg"] = L.sigmoid_focal_loss(
        flat_seg, flat_t, num_classes=c,
        loss_weight=r.loss_seg_weight, avg_factor=num_dense_pos,
    )
    return losses


def knet_vis_loss(outs: VISOutputs, gt: ClipGT, cfg: VISConfig) -> dict[str, Array]:
    """Per-frame rpn/iter losses + tracker tube losses (volume mode: tube rpn
    losses instead of the per-frame branch)."""
    from video_knet_tpu.models.knet import iter_head_losses, rpn_loss

    if cfg.kernel_head_mode == "volume":
        losses = volume_rpn_loss(outs.rpn_out, gt, cfg)
    else:
        fgt = frame_gt_from_clip(gt)
        losses = rpn_loss(outs.rpn_out, fgt, cfg)
        iter_losses, _ = iter_head_losses(
            outs.rpn_out, outs.frame_stage_outs, fgt, cfg
        )
        losses.update(iter_losses)

    gt_of_pred = None
    for s, out in enumerate(outs.clip_stage_outs):
        if s < cfg.tracker_assign_stages:
            gt_of_pred = _tube_assign(out.scaled_mask_preds, out.cls_score, gt, cfg)
        stage = _tube_stage_loss(out, gt_of_pred, gt, cfg, f"tracker_s{s}")
        losses.update(
            {k: v * cfg.tracker_stage_loss_weights[s] for k, v in stage.items()}
        )
    return losses


class VISPrediction(NamedTuple):
    masks: Array  # [T, max_per_img, H, W] float mask logits per frame
    labels: Array  # [max_per_img]
    scores: Array  # [max_per_img]
    track_ids: Array  # [max_per_img] (constant per tube)


def vis_decode(outs: VISOutputs, cfg: VISConfig, out_hw: tuple[int, int] | None = None
               ) -> VISPrediction:
    """Whole-clip decode for one video (batch of 1): top-k (proposal, class) pairs
    over the final clip cls scores; masks from the last stage, shared tube ids."""
    # the last stage with cls is the final clip-level one (assign_stages - 1)
    cls_stage = outs.clip_stage_outs[cfg.tracker_assign_stages - 1]
    last = outs.clip_stage_outs[-1]
    scores = jax.nn.sigmoid(cls_stage.cls_score[0])  # [N, C]
    c = cfg.num_classes
    flat = scores.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, cfg.test.max_per_img)
    mask_idx = top_idx // c
    labels = (top_idx % c).astype(jnp.int32)
    masks = jnp.take(last.scaled_mask_preds[0], mask_idx, axis=1)  # [T, K, H, W]
    if out_hw is not None and masks.shape[-2:] != tuple(out_hw):
        from video_knet_tpu.models.layers import resize_mask_bilinear

        masks = resize_mask_bilinear(masks, tuple(out_hw))
    return VISPrediction(
        masks=masks,
        labels=labels,
        scores=top_scores,
        track_ids=jnp.arange(cfg.test.max_per_img, dtype=jnp.int32),
    )
