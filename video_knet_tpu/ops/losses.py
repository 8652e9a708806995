"""Loss library for kernel-based segmentation, TPU-first (static shapes + weights).

Every loss here takes *fixed-shape padded* tensors plus explicit per-element weights
instead of the reference's dynamic gather of positive samples. Semantics match the
reference (lxtGH/Video-K-Net) losses:

- dice:     knet/det/dice_loss.py:8-17 (p^2+t^2 denominator, eps=1e-3, on sigmoid probs)
- focal:    mmdet sigmoid focal loss as configured (gamma=2, alpha=0.25)
- mask CE:  mmdet CrossEntropyLoss(use_sigmoid=True) — BCE-with-logits, elementwise mean
- seg CE:   mmdet CrossEntropyLoss(use_sigmoid=False) with ignore_index
- multipos: knet/video/qdtrack/losses/multipos_cross_entropy_loss.py:6-41
- L2 aux:   knet/video/qdtrack/losses/l2_loss.py:23 (hard mining + neg/pos ratio cap)

All reductions avoid data-dependent shapes: "mean over positives" becomes
sum(loss * w) / max(sum(w), eps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


def _weighted_mean(loss: Array, weight: Array | None, avg_factor: Array | None = None) -> Array:
    """sum(loss * weight) / avg_factor, defaulting avg_factor to sum(weight)."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if weight is None:
            return jnp.mean(loss)
        avg_factor = jnp.sum(weight)
    return jnp.sum(loss) / jnp.maximum(avg_factor, _EPS)


def dice_loss(
    pred_logits: Array,
    target: Array,
    weight: Array | None = None,
    *,
    eps: float = 1e-3,
    loss_weight: float = 1.0,
    avg_factor: Array | None = None,
) -> Array:
    """Dice loss over per-sample masks.

    pred_logits: [P, ...spatial] mask logits (sigmoid applied internally).
    target:      [P, ...spatial] binary targets.
    weight:      [P] validity weight per sample (replaces reference's pos gather).

    Matches reference dice: d = 2*sum(p*t) / (sum(p^2)+eps + sum(t^2)+eps); loss = 1-d.
    """
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    t = target.astype(jnp.float32)
    p = p.reshape(p.shape[0], -1)
    t = t.reshape(t.shape[0], -1)
    a = jnp.sum(p * t, axis=1)
    b = jnp.sum(p * p, axis=1) + eps
    c = jnp.sum(t * t, axis=1) + eps
    d = (2.0 * a) / (b + c)
    return loss_weight * _weighted_mean(1.0 - d, weight, avg_factor)


def sigmoid_focal_loss(
    logits: Array,
    labels: Array,
    label_weights: Array | None = None,
    *,
    num_classes: int,
    gamma: float = 2.0,
    alpha: float = 0.25,
    loss_weight: float = 1.0,
    avg_factor: Array | None = None,
) -> Array:
    """Sigmoid focal loss.

    logits:        [P, C] class logits.
    labels:        [P] int labels in [0, num_classes]; num_classes == background.
    label_weights: [P] or [P, C] weights (the panoptic-aware per-class weight matrix
                   of kernel_update_head.py:365,389-400 is the 2D case).
    avg_factor defaults to number of positive (non-background) labels, clamped >= 1,
    mirroring kernel_update_head.py:295-297.
    """
    logits = logits.astype(jnp.float32)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    p = jax.nn.sigmoid(logits)
    # standard sigmoid focal loss (same form as mmdet py_sigmoid_focal_loss)
    pt = (1.0 - p) * one_hot + p * (1.0 - one_hot)
    focal_weight = (alpha * one_hot + (1.0 - alpha) * (1.0 - one_hot)) * pt**gamma
    bce = _bce_with_logits(logits, one_hot)
    loss = bce * focal_weight
    if label_weights is not None:
        if label_weights.ndim == 1:
            label_weights = label_weights[:, None]
        loss = loss * label_weights
    if avg_factor is None:
        pos = (labels >= 0) & (labels < num_classes)
        avg_factor = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, _EPS)


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    # numerically stable binary cross entropy with logits
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def binary_cross_entropy(
    pred_logits: Array,
    target: Array,
    weight: Array | None = None,
    *,
    loss_weight: float = 1.0,
    avg_factor: Array | None = None,
) -> Array:
    """Mask BCE: mean of elementwise BCE-with-logits over weighted samples.

    pred_logits/target: [P, ...spatial]; weight: [P] per-sample validity.
    Reference computes plain mean over the gathered positive masks; here the
    per-sample weight is broadcast over spatial dims and the mean is taken over
    weighted *elements* (identical value for 0/1 weights).
    """
    pred_logits = pred_logits.astype(jnp.float32)
    loss = _bce_with_logits(pred_logits, target.astype(jnp.float32))
    if weight is not None:
        w = weight.reshape(weight.shape + (1,) * (loss.ndim - weight.ndim))
        w = jnp.broadcast_to(w, loss.shape)
    else:
        w = None
    return loss_weight * _weighted_mean(loss, w, avg_factor)


def softmax_cross_entropy(
    logits: Array,
    labels: Array,
    *,
    ignore_index: int,
    loss_weight: float = 1.0,
    avg_factor: Array | None = None,
) -> Array:
    """Softmax CE with ignore_index; mean over non-ignored entries.

    logits: [..., C]; labels: [...] int. Matches torch F.cross_entropy(ignore_index).
    """
    logits = logits.astype(jnp.float32)
    valid = (labels != ignore_index).astype(jnp.float32)
    safe_labels = jnp.where(labels == ignore_index, 0, labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    return loss_weight * _weighted_mean(nll, valid, avg_factor)


def multi_pos_cross_entropy(
    sim: Array,
    targets: Array,
    weight: Array | None = None,
    *,
    loss_weight: float = 1.0,
    avg_factor: Array | None = None,
) -> Array:
    """Multi-positive contrastive CE over a similarity matrix.

    sim:     [P, Q] dot-product similarities (key-pos vs ref-pos embeddings).
    targets: [P, Q] in {1 (positive pair), 0 (negative pair), -1 (invalid/padded)}.
    weight:  [P] per-row weight.

    Per row: loss = logsumexp over {0} U {sim_neg_j - sim_pos_i : valid pairs},
    identical to multipos_cross_entropy_loss.py:6-41 (which pads a 0 and masks with
    +-inf). Fixed-shape version uses masking instead of repeat_interleave.
    """
    sim = sim.astype(jnp.float32)
    pos = targets == 1
    neg = targets == 0
    neg_inf = jnp.finfo(jnp.float32).min
    # logsumexp over positives of (-sim) and over negatives of (+sim), per row.
    lse_pos = jax.nn.logsumexp(jnp.where(pos, -sim, neg_inf), axis=1)  # [P]
    lse_neg = jax.nn.logsumexp(jnp.where(neg, sim, neg_inf), axis=1)  # [P]
    # loss = log(1 + sum_i exp(-pos_i) * sum_j exp(neg_j))
    #      = logaddexp(0, lse_pos + lse_neg); rows with no pos or no neg give -inf sum
    pair_term = lse_pos + lse_neg
    has_pair = jnp.any(pos, axis=1) & jnp.any(neg, axis=1)
    pair_term = jnp.where(has_pair, pair_term, neg_inf)
    loss = jnp.logaddexp(0.0, pair_term)
    return loss_weight * _weighted_mean(loss, weight, avg_factor)


def l2_track_aux_loss(
    sim: Array,
    targets: Array,
    *,
    neg_pos_ub: int = 3,
    pos_margin: float = 0.0,
    neg_margin: float = 0.1,
    loss_weight: float = 1.0,
) -> Array:
    """Auxiliary L2 loss on cosine similarities with hard negative mining.

    sim:     [P, Q] cosine similarities.
    targets: [P, Q] in {1 pos, 0 neg, -1 invalid}.

    Mirrors l2_loss.py:23-110: subtract margins, clamp to [0,1], squared error vs
    target; if #neg > neg_pos_ub * #pos keep only the hardest num_pos*ub negatives
    (global top-k over the matrix); average over kept entries.
    """
    sim = sim.astype(jnp.float32)
    pos = targets == 1
    neg = targets == 0
    pred = sim
    if pos_margin > 0:
        pred = jnp.where(pos, pred - pos_margin, pred)
    if neg_margin > 0:
        pred = jnp.where(neg, pred - neg_margin, pred)
    pred = jnp.clip(pred, 0.0, 1.0)
    err = (pred - jnp.where(pos, 1.0, 0.0)) ** 2

    num_pos = jnp.sum(pos)
    num_neg = jnp.sum(neg)
    total = pos.size

    # hard mining: keep top-k hardest negatives when negs exceed the cap.
    cap = num_pos * neg_pos_ub
    neg_err = jnp.where(neg, err, -1.0).reshape(-1)
    # rank of each negative by error, descending: rank k means it is the (k+1)-th hardest
    order = jnp.argsort(-neg_err)
    ranks = jnp.zeros((total,), jnp.int32).at[order].set(jnp.arange(total, dtype=jnp.int32))
    keep_neg = neg.reshape(-1) & (ranks < cap)
    apply_cap = (neg_pos_ub > 0) & (num_neg / (num_pos + 1) > neg_pos_ub)
    neg_w = jnp.where(apply_cap, keep_neg.astype(jnp.float32), neg.reshape(-1).astype(jnp.float32))
    w = pos.reshape(-1).astype(jnp.float32) + neg_w
    return loss_weight * _weighted_mean(err.reshape(-1), w)


def rank_cross_entropy(
    mask_logits: Array,
    rank_target: Array,
    *,
    ignore_index: int = 255,
    loss_weight: float = 0.1,
) -> Array:
    """Rank loss: per-pixel CE treating the N mask logits as class logits.

    mask_logits: [N, H, W] (one image), rank_target: [H, W] int (index of the kernel
    owning each pixel, ignore_index elsewhere). kernel_update_head.py:327-342.
    """
    logits = jnp.moveaxis(mask_logits, 0, -1)  # [H, W, N]
    return softmax_cross_entropy(
        logits, rank_target, ignore_index=ignore_index, loss_weight=loss_weight
    )
