"""KNet: the image panoptic detector (backbone + FPN + kernel heads) and its
training losses / panoptic inference.

Rebuild of knet/det/knet.py + the loss plumbing of kernel_head.py:267-428 and
kernel_iter_head.py:139-231 as pure jittable functions over fixed-slot GT.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.config import KNetConfig
from video_knet_tpu.models.kernel_head import ConvKernelHead, RPNOutputs
from video_knet_tpu.models.kernel_iter_head import KernelIterHead, StageOutput, upscale_masks
from video_knet_tpu.models.resnet import FPN
import video_knet_tpu.ops.hungarian as hung
from video_knet_tpu.ops import losses as L
from video_knet_tpu.ops.panoptic import PanopticResult, merge_joint
from video_knet_tpu.ops.targets import PanopticGT
from video_knet_tpu.models.layers import resize_mask_bilinear

Array = jax.Array


class KNet(nn.Module):
    """Forward-only module; losses are computed by `knet_loss` below."""

    cfg: KNetConfig
    train: bool = False

    @nn.compact
    def __call__(self, img: Array) -> tuple[RPNOutputs, list[StageOutput]]:
        cfg = self.cfg
        from video_knet_tpu.models.backbones import build_backbone, build_neck

        feats = build_backbone(
            cfg.backbone,
            frozen_stages=cfg.frozen_stages,
            norm_eval=cfg.norm_eval,
            train=self.train,
            drop_path_rate=cfg.backbone_drop_path_rate,
        )(img)
        neck = build_neck(getattr(cfg, "neck_type", "fpn"), cfg.backbone)
        fpn = feats if neck is None else neck(feats)
        rpn_out = ConvKernelHead(cfg.rpn, name="rpn_head")(fpn)
        stage_outs = KernelIterHead(
            cfg.head, num_stages=cfg.num_stages, name="roi_head"
        )(rpn_out.x_feats, rpn_out.proposal_feats, rpn_out.mask_preds)
        return rpn_out, stage_outs


def _batched_assign(
    scaled_thing_masks: Array,
    cls_scores: Array | None,
    gt: PanopticGT,
    cfg: KNetConfig,
) -> Array:
    """vmapped Hungarian assignment of detached thing masks to GT instances.

    Returns gt_of_pred [B, N] (-1 = background)."""
    masks = jax.lax.stop_gradient(scaled_thing_masks)
    if cls_scores is not None:
        cls_scores = jax.lax.stop_gradient(cls_scores)

        def one(m, c, gm, gv, gl):
            cost = hung.hungarian_cost_matrix(
                m, gm, c, gl,
                cls_weight=cfg.assigner.cls_weight,
                dice_weight=cfg.assigner.dice_weight,
                mask_weight=cfg.assigner.mask_weight,
            )
            return hung.pad_and_solve(cost, gv)[0]

        return jax.vmap(one)(masks, cls_scores, gt.masks, gt.valid, gt.labels)

    def one_nocls(m, gm, gv):
        cost = hung.hungarian_cost_matrix(
            m, gm, None, None,
            cls_weight=0.0,
            dice_weight=cfg.assigner.dice_weight,
            mask_weight=cfg.assigner.mask_weight,
        )
        return hung.pad_and_solve(cost, gv)[0]

    return jax.vmap(one_nocls)(masks, gt.masks, gt.valid)


def branch_assignment_costs(
    rpn_out: RPNOutputs,
    stage_outs: list[StageOutput],
    gt: PanopticGT,
    cfg: KNetConfig,
) -> list[Array]:
    """All Hungarian cost matrices of one branch, in order [rpn, stage0..stageA-1].

    Each is [B, N, G]. Solving them TOGETHER through one vmapped solver runs the
    lockstep lanes once instead of serializing 1 + assign_stages while-loops on
    the TPU scalar core (see solve_assignments).

    With cfg.assigner.coarse_costs the (detached) costs are computed from the
    HEAD-resolution masks against average-pooled GT instead of upsampling every
    mask tensor to assign stride first — 16x fewer cost-chain bytes at the
    video config's mask_upsample_stride=4, and (together with stage_loss's
    gather-then-upscale) no full-resolution stage mask tensor survives DCE."""
    n_prop = cfg.num_proposals
    coarse = cfg.assigner.coarse_costs
    costs = []

    def pooled_gt(masks):
        """GT masks average-pooled to the pred resolution (integer factor)."""
        f = gt.masks.shape[-1] // masks.shape[-1]
        if f <= 1:
            return gt.masks
        b, g, hs, ws = gt.masks.shape
        return gt.masks.reshape(b, g, hs // f, f, ws // f, f).mean(axis=(3, 5))

    def batched_cost(masks, cls, cls_weight):
        masks = jax.lax.stop_gradient(masks)
        cls = None if cls is None else jax.lax.stop_gradient(cls)
        gm_all = pooled_gt(masks) if coarse else gt.masks

        def one(m, gm, gl, c=None):
            return hung.hungarian_cost_matrix(
                m, gm, c, gl,
                cls_weight=cls_weight,
                dice_weight=cfg.assigner.dice_weight,
                mask_weight=cfg.assigner.mask_weight,
            )

        if cls is None:
            return jax.vmap(one)(masks, gm_all, gt.labels)
        return jax.vmap(lambda m, gm, gl, c: one(m, gm, gl, c))(
            masks, gm_all, gt.labels, cls
        )

    rpn_thing = (
        rpn_out.thing_mask_preds
        if coarse
        else upscale_masks(rpn_out.thing_mask_preds, cfg.rpn.feat_downsample_stride)
    )
    costs.append(batched_cost(rpn_thing, None, 0.0))

    prev_masks = (
        rpn_out.mask_preds
        if coarse
        else upscale_masks(rpn_out.mask_preds, cfg.head.mask_upsample_stride)
    )[:, :n_prop]
    prev_cls = None
    for s in range(min(cfg.assign_stages, len(stage_outs))):
        cls_for_assign = (
            prev_cls[:, :n_prop, : cfg.num_thing_classes]
            if prev_cls is not None
            else None
        )
        costs.append(
            batched_cost(
                prev_masks, cls_for_assign,
                cfg.assigner.cls_weight if cls_for_assign is not None else 0.0,
            )
        )
        prev_masks = (
            stage_outs[s].mask_preds if coarse else stage_outs[s].scaled_mask_preds
        )[:, :n_prop]
        prev_cls = stage_outs[s].cls_score
    return costs


def solve_assignments(
    costs: list[Array], valid: Array
) -> tuple[list[Array], list[Array]]:
    """Solve L cost sets [B, N, G] as ONE vmapped Hungarian over L*B lanes.

    Returns (gt_of_pred list of [B, N], pred_of_gt list of [B, G])."""
    l = len(costs)
    b = costs[0].shape[0]
    stacked = jnp.concatenate([c.reshape(-1, *c.shape[1:]) for c in costs], axis=0)
    valids = jnp.tile(valid, (l, 1))
    gt_of_pred, pred_of_gt = jax.vmap(hung.pad_and_solve)(stacked, valids)
    return (
        [gt_of_pred[i * b : (i + 1) * b] for i in range(l)],
        [pred_of_gt[i * b : (i + 1) * b] for i in range(l)],
    )


def rpn_loss(rpn_out: RPNOutputs, gt: PanopticGT, cfg: KNetConfig,
             gt_of_pred: Array | None = None) -> dict[str, Array]:
    """ConvKernelHead losses (kernel_head.py:337-428)."""
    c = cfg.num_classes
    r = cfg.rpn
    scaled = upscale_masks(rpn_out.thing_mask_preds, r.feat_downsample_stride)
    if gt_of_pred is None:
        gt_of_pred = _batched_assign(scaled, None, gt, cfg)
    # mask/dice on GATHERED matched rows (see stage_loss): identical weighted
    # means, none of the [B, N, H, W] target materialization
    from video_knet_tpu.ops.targets import (
        build_rank_target_gathered,
        build_semantic_map,
        pred_of_gt_from,
    )

    b = gt_of_pred.shape[0]
    g = gt.masks.shape[1]
    p2g = pred_of_gt_from(gt_of_pred, g)
    matched = p2g >= 0
    safe = jnp.maximum(p2g, 0)
    rows_pred = jnp.take_along_axis(scaled, safe[..., None, None], axis=1)
    rows_w = matched.astype(jnp.float32)
    losses = {
        "loss_rpn_mask": L.binary_cross_entropy(
            rows_pred.reshape(b * g, *scaled.shape[-2:]),
            gt.masks.reshape(b * g, *scaled.shape[-2:]),
            rows_w.reshape(b * g),
            loss_weight=r.loss_mask_weight,
        ),
        "loss_rpn_dice": L.dice_loss(
            rows_pred.reshape(b * g, *scaled.shape[-2:]),
            gt.masks.reshape(b * g, *scaled.shape[-2:]),
            rows_w.reshape(b * g),
            loss_weight=r.loss_dice_weight,
        ),
    }
    if r.loss_rank_weight > 0:
        rank_t = build_rank_target_gathered(
            gt.masks, rows_w, safe, ignore_label=255
        )
        losses["loss_rpn_rank"] = _rank_loss_batched(scaled, rank_t, r.loss_rank_weight)
    seg_targets = build_semantic_map(
        gt, num_thing_classes=cfg.num_thing_classes, num_classes=c
    )
    # semantic seg loss on the scaled seg logits
    seg_scaled = jax.image.resize(
        rpn_out.seg_preds,
        rpn_out.seg_preds.shape[:-3]
        + (
            rpn_out.seg_preds.shape[-3] * r.feat_downsample_stride,
            rpn_out.seg_preds.shape[-2] * r.feat_downsample_stride,
            rpn_out.seg_preds.shape[-1],
        ),
        method="linear",
    )
    if r.seg_use_sigmoid:
        # focal seg loss averaged by #pixels with a real class (kernel_head.py:404-418)
        flat_seg = seg_scaled.reshape(-1, c)
        flat_t = seg_targets.reshape(-1)
        num_dense_pos = jnp.maximum(jnp.sum((flat_t < c).astype(jnp.float32)), 1.0)
        losses["loss_rpn_seg"] = L.sigmoid_focal_loss(
            flat_seg, flat_t, num_classes=c,
            loss_weight=r.loss_seg_weight, avg_factor=num_dense_pos,
        )
    else:
        losses["loss_rpn_seg"] = L.softmax_cross_entropy(
            seg_scaled, seg_targets, ignore_index=c, loss_weight=r.loss_seg_weight
        )
    return losses


def _rank_loss_batched(scaled_masks: Array, rank_target: Array, weight: float) -> Array:
    """CE over N mask logits per pixel with ignore=255 (kernel_update_head.py:341)."""
    logits = jnp.moveaxis(scaled_masks, 1, -1)  # [B, H, W, N]
    return L.softmax_cross_entropy(logits, rank_target, ignore_index=255, loss_weight=weight)


def stage_loss(
    out: StageOutput,
    gt_of_pred: Array,
    gt: PanopticGT,
    cfg: KNetConfig,
    prefix: str,
) -> dict[str, Array]:
    """One KernelUpdateHead stage loss (kernel_update_head.py:279-349).

    Mask/dice run on GATHERED rows — the G matched thing predictions plus the
    S stuff rows — instead of all N_tot proposals with zero weights: both
    losses are weighted means, so the value is identical while the [B, N_tot,
    H, W] target materialization and ~5x of the HBM traffic disappear."""
    from video_knet_tpu.ops.targets import (
        build_rank_target_gathered,
        build_stage_label_targets,
        pred_of_gt_from,
    )

    h = cfg.head
    c = cfg.num_classes
    s = cfg.num_stuff_classes
    labels, label_weights, num_pos = build_stage_label_targets(
        gt_of_pred, gt,
        num_thing_classes=cfg.num_thing_classes,
        num_stuff_classes=cfg.num_stuff_classes,
    )
    b, n_tot = labels.shape
    n_prop = n_tot - s
    avg = jnp.maximum(num_pos, 1.0)
    losses = {
        f"{prefix}_loss_cls": L.sigmoid_focal_loss(
            out.cls_score.reshape(b * n_tot, c),
            labels.reshape(b * n_tot),
            label_weights.reshape(b * n_tot, c),
            num_classes=c,
            gamma=h.focal_gamma,
            alpha=h.focal_alpha,
            loss_weight=h.loss_cls_weight,
            avg_factor=avg,
        )
    }
    g = gt.masks.shape[1]
    p2g = pred_of_gt_from(gt_of_pred[:, :n_prop], g)  # [B, G] thing row per slot
    matched = p2g >= 0
    safe = jnp.maximum(p2g, 0)
    # gather the G matched + S stuff rows at HEAD resolution, then upscale
    # only those rows: bilinear resize acts on (H, W) independently of the
    # row axis, so gather-then-resize is bit-identical to gathering from
    # out.scaled_mask_preds — but the full [B, N_tot, Hs, Ws] upsample is
    # never materialized when nothing else consumes it (rank loss off +
    # coarse assignment costs lets XLA dead-code-eliminate it; A/B numbers
    # in PARITY.md's round-5 roofline section)
    mp = out.mask_preds
    thing_pred = jnp.take_along_axis(
        mp[:, :n_prop], safe[..., None, None], axis=1
    )  # [B, G, h, w]
    rows_small = jnp.concatenate([thing_pred, mp[:, n_prop:]], axis=1)
    rows_pred = upscale_masks(rows_small, h.mask_upsample_stride)
    rows_t = jnp.concatenate([gt.masks, gt.sem_masks], axis=1)
    rows_w = jnp.concatenate(
        [matched.astype(jnp.float32), gt.sem_valid.astype(jnp.float32)], axis=1
    )
    r = g + s
    hw = rows_pred.shape[-2:]
    losses[f"{prefix}_loss_mask"] = L.binary_cross_entropy(
        rows_pred.reshape(b * r, *hw),
        rows_t.reshape(b * r, *hw),
        rows_w.reshape(b * r),
        loss_weight=h.loss_mask_weight,
    )
    losses[f"{prefix}_loss_dice"] = L.dice_loss(
        rows_pred.reshape(b * r, *hw),
        rows_t.reshape(b * r, *hw),
        rows_w.reshape(b * r),
        loss_weight=h.loss_dice_weight,
    )
    if h.loss_rank_weight > 0:
        sm = out.scaled_mask_preds  # rank CE needs ALL N mask logits per pixel
        orig_idx = jnp.concatenate(
            [safe, jnp.broadcast_to(
                n_prop + jnp.arange(s, dtype=jnp.int32)[None], (b, s)
            )],
            axis=1,
        )
        rank_t = build_rank_target_gathered(
            rows_t, rows_w, orig_idx, ignore_label=255
        )
        losses[f"{prefix}_loss_rank"] = _rank_loss_batched(sm, rank_t, h.loss_rank_weight)
    return losses


def iter_head_losses(
    rpn_out: RPNOutputs,
    stage_outs: list[StageOutput],
    gt: PanopticGT,
    cfg: KNetConfig,
    assignments: list[Array] | None = None,
) -> tuple[dict[str, Array], Array]:
    """Per-stage assignment + losses (kernel_iter_head.py:139-231).

    Stage s assigns using the *previous* stage's detached scaled masks/cls
    (the init RPN masks for s=0). `assignments` (one [B, N] per assign stage)
    may be precomputed by solve_assignments; otherwise solved here. Returns
    (losses, last-stage gt_of_pred) — the final assignment is reused by the
    video tracking loss.
    """
    if assignments is None:
        costs = branch_assignment_costs(rpn_out, stage_outs, gt, cfg)
        assignments = solve_assignments(costs, gt.valid)[0][1:]
    losses: dict[str, Array] = {}
    gt_of_pred = None
    for s, out in enumerate(stage_outs):
        if s < cfg.assign_stages:
            gt_of_pred = assignments[s]
        losses.update(
            {
                k: v * cfg.stage_loss_weights[s]
                for k, v in stage_loss(out, gt_of_pred, gt, cfg, f"s{s}").items()
            }
        )
    return losses, gt_of_pred


def knet_loss(
    rpn_out: RPNOutputs, stage_outs: list[StageOutput], gt: PanopticGT, cfg: KNetConfig
) -> dict[str, Array]:
    costs = branch_assignment_costs(rpn_out, stage_outs, gt, cfg)
    assigns, _ = solve_assignments(costs, gt.valid)
    losses = rpn_loss(rpn_out, gt, cfg, gt_of_pred=assigns[0])
    iter_losses, _ = iter_head_losses(
        rpn_out, stage_outs, gt, cfg, assignments=assigns[1:]
    )
    losses.update(iter_losses)
    return losses


class InstancePrediction(NamedTuple):
    """COCO instance-seg decode output (fixed max_per_img slots)."""

    masks: Array  # [max_per_img, H, W] float mask probabilities
    labels: Array  # [max_per_img] int32 class labels
    scores: Array  # [max_per_img] float


def instance_decode_single(
    cls_score_logits: Array,  # [N_tot, C]
    mask_preds: Array,  # [N_tot, Hs, Ws]
    cfg: KNetConfig,
    out_hw: tuple[int, int] | None = None,
) -> InstancePrediction:
    """Top-k instance-segmentation decode (the non-panoptic test branch,
    kernel_iter_head.py:271-282 + kernel_update_head.py:443-468 get_seg_masks):
    sigmoid scores over (proposal, class) pairs, top max_per_img, bilinear
    mask upsample. Masks stay as probabilities; threshold with
    cfg.test.mask_thr at dump time (segm2result lives in eval/coco_instance)."""
    t = cfg.test
    c = cfg.num_thing_classes  # instance mode: all classes are things
    scores = jax.nn.sigmoid(
        cls_score_logits[: cfg.num_proposals, :c].astype(jnp.float32)
    ).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(scores, t.max_per_img)
    mask_idx = top_idx // c
    labels = (top_idx % c).astype(jnp.int32)
    masks = jnp.take(mask_preds[: cfg.num_proposals], mask_idx, axis=0)
    if out_hw is not None and masks.shape[-2:] != tuple(out_hw):
        masks = resize_mask_bilinear(masks, tuple(out_hw))
    return InstancePrediction(
        masks=jax.nn.sigmoid(masks.astype(jnp.float32)),
        labels=labels,
        scores=top_scores,
    )


def instance_decode(
    rpn_out: RPNOutputs,
    stage_outs: list[StageOutput],
    cfg: KNetConfig,
    out_hw: tuple[int, int] | None = None,
) -> InstancePrediction:
    """Batch-of-1 wrapper around instance_decode_single."""
    last = stage_outs[-1]
    return instance_decode_single(
        last.cls_score[0], last.scaled_mask_preds[0], cfg, out_hw
    )


class PanopticPrediction(NamedTuple):
    result: PanopticResult
    thing_kernels: Array  # [max_per_img, K*K, C] kernels of the topk things (tracking)
    thing_mask_idx: Array  # [max_per_img] source proposal index of each topk thing
    seg_preds: Array  # [H, W, C] semantic logits (stuff filter for VPS)


def panoptic_decode(
    rpn_out: RPNOutputs,
    stage_outs: list[StageOutput],
    cfg: KNetConfig,
    out_hw: tuple[int, int] | None = None,
) -> PanopticPrediction:
    """Panoptic post-processing for a batch-of-1 forward (back-compat wrapper
    around `panoptic_decode_single`; use `panoptic_decode_batch` for multi-stream
    inference)."""
    last = stage_outs[-1]
    return panoptic_decode_single(
        last.cls_score[0], last.scaled_mask_preds[0], last.object_feats[0],
        rpn_out.seg_preds[0], cfg, out_hw,
    )


def panoptic_decode_batch(
    rpn_out: RPNOutputs,
    stage_outs: list[StageOutput],
    cfg: KNetConfig,
    out_hw: tuple[int, int] | None = None,
) -> PanopticPrediction:
    """vmapped decode over the batch axis (multi-stream online inference)."""
    last = stage_outs[-1]
    return jax.vmap(
        lambda c, m, o, s: panoptic_decode_single(c, m, o, s, cfg, out_hw)
    )(last.cls_score, last.scaled_mask_preds, last.object_feats, rpn_out.seg_preds)


def panoptic_decode_single(
    cls_score_logits: Array,  # [N_tot, C]
    mask_preds: Array,  # [N_tot, Hs, Ws]
    object_feats: Array,  # [N_tot, K*K, C]
    seg_preds: Array,  # [h, w, C]
    cfg: KNetConfig,
    out_hw: tuple[int, int] | None = None,
) -> PanopticPrediction:
    """Panoptic post-processing for one image.

    kernel_iter_head.py:332-370 with merge_joint=True: topk thing (proposal,
    class) pairs + per-class stuff rows, sigmoid, rescale, joint-argmax merge.
    """
    t = cfg.test
    cls_score = jax.nn.sigmoid(cls_score_logits)  # [N_tot, C]
    n_prop = cfg.num_proposals
    nt = cfg.num_thing_classes

    thing_scores_full = cls_score[:n_prop, :nt].reshape(-1)  # [N*T]
    # small configs can have fewer (proposal, class) pairs than max_per_img
    k_top = min(t.max_per_img, int(thing_scores_full.shape[0]))
    top_scores, top_idx = jax.lax.top_k(thing_scores_full, k_top)
    mask_idx = top_idx // nt
    thing_labels = (top_idx % nt).astype(jnp.int32)
    thing_masks = jnp.take(mask_preds[:n_prop], mask_idx, axis=0)

    stuff_scores = jnp.diagonal(cls_score[n_prop:, nt:])  # [S]
    stuff_labels = nt + jnp.arange(cfg.num_stuff_classes, dtype=jnp.int32)
    stuff_masks = mask_preds[n_prop:]

    masks = jnp.concatenate([thing_masks, stuff_masks], axis=0)
    upsample_after = (
        t.fast_decode and out_hw is not None and masks.shape[-2:] != tuple(out_hw)
    )
    if out_hw is not None and masks.shape[-2:] != tuple(out_hw) and not upsample_after:
        masks = resize_mask_bilinear(masks, tuple(out_hw))
    probs = jax.nn.sigmoid(masks.astype(jnp.float32))
    scores = jnp.concatenate([top_scores, stuff_scores], axis=0).astype(jnp.float32)
    labels = jnp.concatenate([thing_labels, stuff_labels], axis=0)

    res = merge_joint(
        probs, scores, labels,
        num_thing_classes=nt,
        instance_score_thr=t.instance_score_thr,
        overlap_thr=t.overlap_thr,
    )
    if upsample_after:
        pan = jax.image.resize(res.panoptic_seg, tuple(out_hw), method="nearest")
        res = res._replace(panoptic_seg=pan)
    thing_kernels = jnp.take(object_feats[:n_prop], mask_idx, axis=0)
    return PanopticPrediction(res, thing_kernels, mask_idx, seg_preds)
