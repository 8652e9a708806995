"""Static-shape GT containers and training-target builders.

The reference builds per-image targets with python lists and dynamic gathers
(kernel_update_head.py:351-441, kernel_head.py:430-467). Here GT lives in fixed
slots with validity masks and targets are pure batched tensor ops, so the whole
train step jits.

Conventions:
  G = max thing-instance slots, S = num stuff classes,
  N = num proposals (thing kernels), N_tot = N + S (cat_stuff_mask rows).
  labels use [0, num_thing) for things, [num_thing, num_classes) for stuff,
  num_classes = background.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class PanopticGT(NamedTuple):
    """Per-batch padded ground truth at mask-assign-stride resolution."""

    masks: Array  # [B, G, H, W] float thing instance masks
    labels: Array  # [B, G] int32 thing class labels
    valid: Array  # [B, G] bool
    instance_ids: Array  # [B, G] int32 (video tracking; -1 where invalid)
    sem_masks: Array  # [B, S, H, W] float stuff class masks
    sem_valid: Array  # [B, S] bool (stuff class present)


class StageTargets(NamedTuple):
    labels: Array  # [B, N_tot] int32
    label_weights: Array  # [B, N_tot, C] float
    mask_targets: Array  # [B, N_tot, H, W] float
    mask_weights: Array  # [B, N_tot] float
    num_pos: Array  # scalar: total positive rows in batch (avg_factor for focal)


def pred_of_gt_from(gt_of_pred: Array, num_gt: int) -> Array:
    """Invert a [B, N] gt-of-pred assignment to [B, G] pred-of-gt (-1 unmatched)."""
    eq = gt_of_pred[:, :, None] == jnp.arange(num_gt)[None, None]  # [B, N, G]
    has = jnp.any(eq, axis=1)
    idx = jnp.argmax(eq, axis=1).astype(jnp.int32)
    return jnp.where(has, idx, -1)


def build_stage_label_targets(
    gt_of_pred: Array,
    gt: PanopticGT,
    *,
    num_thing_classes: int,
    num_stuff_classes: int,
) -> tuple[Array, Array, Array]:
    """The label part of build_stage_targets: (labels [B, N_tot],
    label_weights [B, N_tot, C], num_pos) — without materializing the
    [B, N_tot, H, W] mask targets (the mask losses gather matched rows
    instead; see models/knet.py:stage_loss)."""
    b, n = gt_of_pred.shape
    s = num_stuff_classes
    c = num_thing_classes + num_stuff_classes
    matched = gt_of_pred >= 0
    safe_idx = jnp.maximum(gt_of_pred, 0)
    thing_labels = jnp.where(
        matched, jnp.take_along_axis(gt.labels, safe_idx, axis=1), c
    )
    thing_label_weights = jnp.concatenate(
        [
            jnp.ones((b, n, num_thing_classes), jnp.float32),
            jnp.zeros((b, n, s), jnp.float32),
        ],
        axis=-1,
    )
    stuff_cls = num_thing_classes + jnp.arange(s, dtype=jnp.int32)
    stuff_labels = jnp.where(gt.sem_valid, stuff_cls[None], c)
    eye = jnp.eye(s, dtype=jnp.float32)
    stuff_label_weights = jnp.broadcast_to(
        jnp.concatenate(
            [jnp.zeros((s, num_thing_classes), jnp.float32), eye], axis=-1
        )[None],
        (b, s, c),
    )
    labels = jnp.concatenate([thing_labels, stuff_labels], axis=1)
    label_weights = jnp.concatenate(
        [thing_label_weights, stuff_label_weights], axis=1
    )
    num_pos = jnp.sum((labels < c).astype(jnp.float32))
    return labels, label_weights, num_pos


def build_rank_target_gathered(
    rows_t: Array,  # [B, R, H, W] gathered mask targets
    rows_w: Array,  # [B, R] weights
    orig_idx: Array,  # [B, R] original row index of each gathered row
    *,
    ignore_label: int = 255,
) -> Array:
    """build_rank_target on gathered rows: per pixel, the ORIGINAL row index of
    the highest-original-index positive row covering it ("later rows
    overwrite", kernel_update_head.py:327-342) — identical to running
    build_rank_target on the dense [B, N, H, W] targets."""
    occupied = (rows_t > 0) & (rows_w[..., None, None] > 0)
    prio = jnp.where(rows_w > 0, orig_idx + 1, 0)  # [B, R]
    sel = jnp.argmax(occupied * prio[:, :, None, None], axis=1)  # [B, H, W]
    any_mask = jnp.any(occupied, axis=1)
    b = sel.shape[0]
    label_at = jnp.take_along_axis(
        orig_idx, sel.reshape(b, -1), axis=1
    ).reshape(sel.shape)
    return jnp.where(any_mask, label_at, ignore_label).astype(jnp.int32)


def build_stage_targets(
    gt_of_pred: Array,
    gt: PanopticGT,
    *,
    num_thing_classes: int,
    num_stuff_classes: int,
) -> StageTargets:
    """Targets for one KernelUpdateHead stage (with stuff rows).

    gt_of_pred: [B, N] assignment (-1 = background) from the Hungarian matcher.
    Mirrors kernel_update_head.py:351-404:
      thing rows: label-weight 1 on thing columns, 0 on stuff columns;
      stuff rows: label-weight 1 only on their own diagonal column; label is the
      stuff class when present else background; mask weight 1 when present.
    """
    b, n = gt_of_pred.shape
    s = num_stuff_classes
    c = num_thing_classes + num_stuff_classes
    matched = gt_of_pred >= 0
    safe_idx = jnp.maximum(gt_of_pred, 0)

    thing_labels = jnp.where(
        matched, jnp.take_along_axis(gt.labels, safe_idx, axis=1), c
    )
    thing_mask_targets = jnp.where(
        matched[..., None, None],
        jnp.take_along_axis(gt.masks, safe_idx[..., None, None], axis=1),
        0.0,
    )
    thing_mask_weights = matched.astype(jnp.float32)
    thing_label_weights = jnp.concatenate(
        [
            jnp.ones((b, n, num_thing_classes), jnp.float32),
            jnp.zeros((b, n, s), jnp.float32),
        ],
        axis=-1,
    )

    stuff_cls = num_thing_classes + jnp.arange(s, dtype=jnp.int32)
    stuff_labels = jnp.where(gt.sem_valid, stuff_cls[None], c)
    stuff_mask_targets = gt.sem_masks
    stuff_mask_weights = gt.sem_valid.astype(jnp.float32)
    eye = jnp.eye(s, dtype=jnp.float32)
    stuff_label_weights = jnp.broadcast_to(
        jnp.concatenate([jnp.zeros((s, num_thing_classes), jnp.float32), eye], axis=-1)[
            None
        ],
        (b, s, c),
    )

    labels = jnp.concatenate([thing_labels, stuff_labels], axis=1)
    label_weights = jnp.concatenate([thing_label_weights, stuff_label_weights], axis=1)
    mask_targets = jnp.concatenate([thing_mask_targets, stuff_mask_targets], axis=1)
    mask_weights = jnp.concatenate([thing_mask_weights, stuff_mask_weights], axis=1)
    num_pos = jnp.sum((labels < c).astype(jnp.float32))
    return StageTargets(labels, label_weights, mask_targets, mask_weights, num_pos)


class RPNTargets(NamedTuple):
    labels: Array  # [B, N] int32
    mask_targets: Array  # [B, N, H, W]
    mask_weights: Array  # [B, N]
    seg_targets: Array  # [B, H, W] int32 semantic map (ignore = num_classes)
    num_pos: Array


def build_semantic_map(gt: PanopticGT, *, num_thing_classes: int, num_classes: int) -> Array:
    """Per-pixel semantic class map: stuff filled first, thing masks overwrite.

    kernel_head.py:446-462 (fill order: stuff slots in order, then pos things in
    order; later fills overwrite earlier ones). ignore/void = num_classes.
    """
    s = gt.sem_masks.shape[1]
    stuff_cls = num_thing_classes + jnp.arange(s, dtype=jnp.int32)
    # stack [stuff..., things...]; priority = position (later overwrites)
    all_masks = jnp.concatenate(
        [
            gt.sem_masks * gt.sem_valid[..., None, None],
            gt.masks * gt.valid[..., None, None],
        ],
        axis=1,
    )  # [B, S+G, H, W]
    all_labels = jnp.concatenate(
        [
            jnp.broadcast_to(stuff_cls[None], gt.sem_valid.shape),
            gt.labels,
        ],
        axis=1,
    )  # [B, S+G]
    occupied = all_masks > 0
    m = occupied.shape[1]
    prio = jnp.arange(1, m + 1, dtype=jnp.int32)  # later slots win
    sel = jnp.argmax(occupied * prio[None, :, None, None], axis=1)  # [B, H, W]
    any_mask = jnp.any(occupied, axis=1)
    label_at = jnp.take_along_axis(all_labels, sel.reshape(sel.shape[0], -1), axis=1).reshape(
        sel.shape
    )
    return jnp.where(any_mask, label_at, num_classes).astype(jnp.int32)


def build_rank_target(
    mask_targets: Array, mask_weights: Array, *, ignore_label: int = 255
) -> Array:
    """Per-pixel index of the positive row owning the pixel (later rows overwrite).

    mask_targets: [B, R, H, W]; mask_weights: [B, R]. kernel_update_head.py:327-342.
    """
    occupied = (mask_targets > 0) & (mask_weights[..., None, None] > 0)
    r = occupied.shape[1]
    prio = jnp.arange(1, r + 1, dtype=jnp.int32)
    sel = jnp.argmax(occupied * prio[None, :, None, None], axis=1)
    any_mask = jnp.any(occupied, axis=1)
    return jnp.where(any_mask, sel, ignore_label).astype(jnp.int32)


def build_rpn_targets(
    gt_of_pred: Array,
    gt: PanopticGT,
    *,
    num_thing_classes: int,
    num_classes: int,
) -> RPNTargets:
    """Targets for ConvKernelHead loss (thing proposals only + dense seg map)."""
    matched = gt_of_pred >= 0
    safe_idx = jnp.maximum(gt_of_pred, 0)
    labels = jnp.where(matched, jnp.take_along_axis(gt.labels, safe_idx, axis=1), num_classes)
    mask_targets = jnp.where(
        matched[..., None, None],
        jnp.take_along_axis(gt.masks, safe_idx[..., None, None], axis=1),
        0.0,
    )
    mask_weights = matched.astype(jnp.float32)
    seg_targets = build_semantic_map(
        gt, num_thing_classes=num_thing_classes, num_classes=num_classes
    )
    num_pos = jnp.sum(matched.astype(jnp.float32))
    return RPNTargets(labels, mask_targets, mask_weights, seg_targets, num_pos)
