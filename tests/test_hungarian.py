"""Hungarian matcher vs scipy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from video_knet_tpu.ops.hungarian import (
    assign,
    dice_cost,
    focal_cls_cost,
    hungarian,
    mask_cost,
    pad_and_solve,
)


@pytest.mark.parametrize("n", [1, 2, 5, 17, 64])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hungarian_square_matches_scipy(n, seed):
    rng = np.random.RandomState(seed)
    cost = rng.randn(n, n).astype(np.float32) * 10
    col_of_row = np.asarray(hungarian(jnp.asarray(cost)))
    rows, cols = linear_sum_assignment(cost)
    # same total cost (assignment may differ on ties)
    ours = cost[np.arange(n), col_of_row].sum()
    ref = cost[rows, cols].sum()
    assert np.allclose(ours, ref, atol=1e-4)
    # valid permutation
    assert sorted(col_of_row.tolist()) == list(range(n))


def test_hungarian_jit_vmap():
    rng = np.random.RandomState(0)
    costs = rng.randn(4, 16, 16).astype(np.float32)
    f = jax.jit(jax.vmap(hungarian))
    out = np.asarray(f(jnp.asarray(costs)))
    for b in range(4):
        rows, cols = linear_sum_assignment(costs[b])
        assert np.allclose(
            costs[b][np.arange(16), out[b]].sum(), costs[b][rows, cols].sum(), atol=1e-4
        )


@pytest.mark.parametrize("num_gt", [0, 1, 3, 8])
def test_pad_and_solve_rectangular(num_gt):
    n_pred, m_slots = 12, 8
    rng = np.random.RandomState(42 + num_gt)
    cost = rng.randn(n_pred, m_slots).astype(np.float32)
    valid = np.zeros(m_slots, bool)
    valid[:num_gt] = True
    gt_of_pred, pred_of_gt = jax.jit(pad_and_solve)(jnp.asarray(cost), jnp.asarray(valid))
    gt_of_pred, pred_of_gt = np.asarray(gt_of_pred), np.asarray(pred_of_gt)

    if num_gt == 0:
        assert (gt_of_pred == -1).all()
        assert (pred_of_gt == -1).all()
        return

    rows, cols = linear_sum_assignment(cost[:, :num_gt])
    ref_total = cost[rows, cols].sum()
    matched = gt_of_pred >= 0
    assert matched.sum() == num_gt
    ours_total = cost[np.arange(n_pred)[matched], gt_of_pred[matched]].sum()
    assert np.allclose(ours_total, ref_total, atol=1e-4)
    # inverse consistency
    for g in range(m_slots):
        if g < num_gt:
            assert gt_of_pred[pred_of_gt[g]] == g
        else:
            assert pred_of_gt[g] == -1


def test_knet_costs_match_reference_formulas():
    """Check the cost pieces against a direct numpy transcription of the formulas."""
    rng = np.random.RandomState(7)
    n, m, h, w, c = 6, 4, 8, 8, 5
    mask_logits = rng.randn(n, h, w).astype(np.float32)
    gt = (rng.rand(m, h, w) > 0.5).astype(np.float32)
    cls_logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, size=m)

    # dice
    p = np.clip(1 / (1 + np.exp(-mask_logits)), 0.001, 1.0).reshape(n, -1)
    t = gt.reshape(m, -1)
    a = p @ t.T
    d = 2 * a / ((p * p).sum(1)[:, None] + 1e-3 + (t * t).sum(1)[None] + 1e-3)
    np.testing.assert_allclose(
        np.asarray(dice_cost(jnp.asarray(mask_logits), jnp.asarray(gt), weight=1.0)),
        -d,
        rtol=2e-3,
    )

    # mask cost
    p2 = np.clip(1 / (1 + np.exp(-mask_logits)), 0.01, 1.0).reshape(n, -1)
    mc = -(p2 @ t.T + (1 - p2) @ (1 - t).T) / (h * w)
    np.testing.assert_allclose(
        np.asarray(mask_cost(jnp.asarray(mask_logits), jnp.asarray(gt), weight=1.0)),
        mc,
        rtol=2e-3,
    )

    # focal cls cost
    s = 1 / (1 + np.exp(-cls_logits))
    negc = -np.log(1 - s + 1e-12) * 0.75 * s**2
    posc = -np.log(s + 1e-12) * 0.25 * (1 - s) ** 2
    fc = (posc - negc)[:, labels]
    np.testing.assert_allclose(
        np.asarray(focal_cls_cost(jnp.asarray(cls_logits), jnp.asarray(labels), weight=1.0)),
        fc,
        rtol=2e-3, atol=1e-4,
    )


def test_assign_end_to_end():
    rng = np.random.RandomState(3)
    n, m, h, w, c = 10, 6, 16, 16, 4
    mask_logits = jnp.asarray(rng.randn(n, h, w).astype(np.float32))
    gt = jnp.asarray((rng.rand(m, h, w) > 0.7).astype(np.float32))
    valid = jnp.asarray(np.array([True, True, True, False, False, False]))
    cls_logits = jnp.asarray(rng.randn(n, c).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, c, size=m))
    gt_of_pred, pred_of_gt = jax.jit(assign)(mask_logits, gt, valid, cls_logits, labels)
    gt_of_pred = np.asarray(gt_of_pred)
    assert (gt_of_pred >= 0).sum() == 3
    assert set(gt_of_pred[gt_of_pred >= 0]) == {0, 1, 2}


def test_pad_and_solve_no_valid_gt():
    """A frame with zero GT instances: everything unmatched, no NaNs."""
    import jax.numpy as jnp
    from video_knet_tpu.ops.hungarian import pad_and_solve

    cost = jnp.zeros((10, 4))
    valid = jnp.zeros((4,), bool)
    g2p, p2g = jax.jit(pad_and_solve)(cost, valid)
    assert (np.asarray(g2p) == -1).all()
    assert (np.asarray(p2g) == -1).all()


def test_empty_gt_loss_finite():
    """knet_loss with an all-empty GT batch stays finite (background-only frame)."""
    import jax.numpy as jnp
    from video_knet_tpu.config import KNetConfig
    from video_knet_tpu.models.knet import KNet, knet_loss
    from video_knet_tpu.ops.targets import PanopticGT

    cfg = KNetConfig(max_insts=4)
    model = KNet(cfg, train=True)
    img = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    g, s, h, w = cfg.max_insts, cfg.num_stuff_classes, 16, 24
    gt = PanopticGT(
        masks=jnp.zeros((1, g, h, w)),
        labels=jnp.zeros((1, g), jnp.int32),
        valid=jnp.zeros((1, g), bool),
        instance_ids=jnp.full((1, g), -1, jnp.int32),
        sem_masks=jnp.zeros((1, s, h, w)),
        sem_valid=jnp.zeros((1, s), bool),
    )
    rpn_out, stage_outs = model.apply(variables, img, mutable=False)
    losses = jax.jit(lambda r, so: knet_loss(r, so, gt, cfg))(rpn_out, stage_outs)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
