"""On-device Hungarian (linear sum assignment) for mask matching.

The reference solves per-image, per-stage assignments on the CPU with scipy
(knet/det/mask_hungarian_assigner.py:245-251), a device->host sync inside the train
step. Here the Jonker-Volgenant shortest-augmenting-path algorithm (the same one
scipy's linear_sum_assignment uses) is expressed with lax control flow over a padded
square cost matrix, so it jits, vmaps over the batch, and stays on the TPU.

Rectangular problems (N predictions x G ground truths, G <= N) are padded with
constant-cost dummy columns: every dummy assignment contributes the same constant to
the objective, so the real-column matching is unchanged and the dummy matches are
simply dropped by the caller's validity mask.

Also provides the K-Net matching cost (FocalLossCost + DiceCost + MaskCost with the
reference's weights/activations, mask_hungarian_assigner.py:15-114).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_INF = jnp.float32(1e9)


def hungarian(cost: Array) -> Array:
    """Exact min-cost assignment on a rectangular cost matrix (rows <= cols).

    cost: [r, c] float with r <= c. Returns col_of_row: [r] int32 — the column
    assigned to each row (every row is matched; the matching is optimal).
    Jittable and vmappable. The sequential depth is O(r) augmentations, so
    callers should orient the SMALLER side as rows (e.g. GT slots, not the 100
    proposals) — this is what makes on-TPU train-time matching cheap.
    """
    r, c = cost.shape
    assert r <= c, "hungarian expects rows <= cols (transpose first)"
    cost = cost.astype(jnp.float32)

    u = jnp.zeros((r,), jnp.float32)  # row potentials
    v = jnp.zeros((c + 1,), jnp.float32)  # col potentials (col c is virtual)
    p = jnp.full((c + 1,), -1, jnp.int32)  # p[j] = row matched to col j

    def assign_row(i, carry):
        u, v, p = carry
        p = p.at[c].set(i)
        minv = jnp.full((c,), _INF, jnp.float32)
        way = jnp.full((c,), c, jnp.int32)
        used = jnp.zeros((c + 1,), jnp.bool_)
        j0 = jnp.int32(c)

        def cond(state):
            _, _, _, _, _, p, j0 = state
            return p[j0] != -1

        def body(state):
            u, v, minv, way, used, p, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0, :] - u[i0] - v[:c]
            upd = jnp.logical_and(~used[:c], cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used[:c], _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # u[p[j]] += delta for used cols; p[j] >= 0 whenever used[j]
            u = u.at[jnp.where(used, p, 0)].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = minv - jnp.where(used[:c], 0.0, delta)
            return u, v, minv, way, used, p, j1

        u, v, minv, way, used, p, j0 = jax.lax.while_loop(
            cond, body, (u, v, minv, way, used, p, j0)
        )

        # augment along the alternating path back to the virtual column
        def aug_cond(state):
            _, j0 = state
            return j0 != c

        def aug_body(state):
            p, j0 = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    u, v, p = jax.lax.fori_loop(0, r, assign_row, (u, v, p))
    row_of_col = p[:c]  # [c] row matched to each col (-1 = unmatched)
    col_of_row = jnp.full((r,), -1, jnp.int32)
    cols = jnp.arange(c, dtype=jnp.int32)
    col_of_row = col_of_row.at[jnp.where(row_of_col >= 0, row_of_col, r)].set(
        jnp.where(row_of_col >= 0, cols, -1), mode="drop"
    )
    return col_of_row


def pad_and_solve(cost: Array, col_valid: Array) -> tuple[Array, Array]:
    """Solve assignment where only `col_valid` columns (GT slots) are real.

    cost:      [N, M] prediction-x-GT costs (arbitrary values in invalid columns).
    col_valid: [M] bool. Requires M <= N (more predictions than GTs).

    Solved as the TRANSPOSED [M, N] problem so the sequential augmentation count
    is M (the few GT slots), not N (the 100 proposals) — ~N/M fewer serialized
    Dijkstra rounds on TPU. Invalid GT rows get a constant cost (their arbitrary
    matches add the same constant to every assignment, leaving the real rows'
    optimum unchanged) and are masked out afterwards.

    Returns (gt_of_pred [N] int32 with -1 for unmatched, pred_of_gt [M] int32
    with -1 for invalid gt columns).
    """
    n_pred, m = cost.shape
    assert m <= n_pred, "expected num predictions >= max num GTs"
    t = jnp.where(col_valid[:, None], cost.T.astype(jnp.float32), 0.0)  # [M, N]
    pred_of_gt = hungarian(t)  # [M] every row matched
    pred_of_gt = jnp.where(col_valid, pred_of_gt, -1)
    gt_of_pred = jnp.full((n_pred,), -1, jnp.int32)
    gts = jnp.arange(m, dtype=jnp.int32)
    gt_of_pred = gt_of_pred.at[jnp.where(col_valid, pred_of_gt, n_pred)].set(
        jnp.where(col_valid, gts, -1), mode="drop"
    )
    return gt_of_pred, pred_of_gt


def focal_cls_cost(
    cls_logits: Array,
    gt_labels: Array,
    *,
    weight: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    eps: float = 1e-12,
) -> Array:
    """mmdet FocalLossCost: [N, C] logits x [M] labels -> [N, M]."""
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    neg_cost = -jnp.log(1.0 - scores + eps) * (1.0 - alpha) * scores**gamma
    pos_cost = -jnp.log(scores + eps) * alpha * (1.0 - scores) ** gamma
    diff = pos_cost - neg_cost  # [N, C]
    safe_labels = jnp.maximum(gt_labels, 0)
    return weight * diff[:, safe_labels]


def dice_cost(
    mask_logits: Array,
    gt_masks: Array,
    *,
    weight: float = 4.0,
    eps: float = 1e-3,
) -> Array:
    """DiceCost(pred_act=True): [N, H, W] logits x [M, H, W] -> [N, M].

    mask_hungarian_assigner.py:44-74 (sigmoid clamped to [0.001, 1]).
    """
    p = jnp.clip(jax.nn.sigmoid(mask_logits.astype(jnp.float32)), 0.001, 1.0)
    p = p.reshape(p.shape[0], -1)
    t = gt_masks.reshape(gt_masks.shape[0], -1).astype(jnp.float32)
    a = jnp.einsum("nh,mh->nm", p, t)
    b = jnp.sum(p * p, axis=1) + eps
    c = jnp.sum(t * t, axis=1) + eps
    d = (2.0 * a) / (b[:, None] + c[None, :])
    return weight * (-d)


def mask_cost(
    mask_logits: Array,
    gt_masks: Array,
    *,
    weight: float = 1.0,
) -> Array:
    """MaskCost(pred_act=True): -(pos agreement + neg agreement)/HW.

    mask_hungarian_assigner.py:90-114 (sigmoid clamped to [0.01, 1]).
    """
    p = jnp.clip(jax.nn.sigmoid(mask_logits.astype(jnp.float32)), 0.01, 1.0)
    t = gt_masks.astype(jnp.float32)
    hw = p.shape[-1] * p.shape[-2]
    p = p.reshape(p.shape[0], -1)
    t = t.reshape(t.shape[0], -1)
    pos = jnp.einsum("nh,mh->nm", p, t)
    # neg = sum (1-p)(1-t) expanded: HW - sum p - sum t + pos — saves the
    # second [N,HW]x[HW,M] matmul and the (1-p)/(1-t) materializations
    neg = hw - jnp.sum(p, axis=1)[:, None] - jnp.sum(t, axis=1)[None, :] + pos
    return weight * (-(pos + neg) / hw)


def hungarian_cost_matrix(
    mask_logits: Array,
    gt_masks: Array,
    cls_logits: Array | None,
    gt_labels: Array | None,
    *,
    cls_weight: float = 2.0,
    dice_weight: float = 4.0,
    mask_weight: float = 1.0,
) -> Array:
    """The K-Net matching cost: focal-cls*2 + dice*4 + mask*1 (release config).

    mask_logits: [N, H, W]; gt_masks: [M, H, W]; cls_logits: [N, C] or None.
    Returns [N, M] float32 cost.
    """
    cost = dice_cost(mask_logits, gt_masks, weight=dice_weight) + mask_cost(
        mask_logits, gt_masks, weight=mask_weight
    )
    if cls_logits is not None and gt_labels is not None and cls_weight != 0:
        cost = cost + focal_cls_cost(cls_logits, gt_labels, weight=cls_weight)
    return cost


def assign(
    mask_logits: Array,
    gt_masks: Array,
    gt_valid: Array,
    cls_logits: Array | None = None,
    gt_labels: Array | None = None,
    **cost_kwargs,
) -> tuple[Array, Array]:
    """One-image MaskHungarianAssigner.assign with fixed GT slots.

    Returns (gt_of_pred [N], pred_of_gt [M]) as in `pad_and_solve`.
    """
    cost = hungarian_cost_matrix(mask_logits, gt_masks, cls_logits, gt_labels, **cost_kwargs)
    return pad_and_solve(cost, gt_valid)
