"""Loss library vs torch/numpy oracles (reference semantics)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from video_knet_tpu.ops.losses import (
    binary_cross_entropy,
    dice_loss,
    l2_track_aux_loss,
    multi_pos_cross_entropy,
    rank_cross_entropy,
    sigmoid_focal_loss,
    softmax_cross_entropy,
)


def test_dice_matches_reference():
    rng = np.random.RandomState(0)
    p, h, w = 5, 8, 8
    logits = rng.randn(p, h, w).astype(np.float32)
    target = (rng.rand(p, h, w) > 0.5).astype(np.float32)

    # reference: knet/det/dice_loss.py:8-17 on sigmoid(pred), mean reduction
    tp = torch.sigmoid(torch.from_numpy(logits)).reshape(p, -1)
    tt = torch.from_numpy(target).reshape(p, -1)
    a = (tp * tt).sum(1)
    b = (tp * tp).sum(1) + 1e-3
    c = (tt * tt).sum(1) + 1e-3
    ref = (1 - 2 * a / (b + c)).mean().item()

    ours = float(dice_loss(jnp.asarray(logits), jnp.asarray(target), jnp.ones(p)))
    assert np.allclose(ours, ref, rtol=1e-5)

    # weighted: only first 3 valid
    w8 = np.array([1, 1, 1, 0, 0], np.float32)
    ref_w = (1 - 2 * a / (b + c))[:3].mean().item()
    ours_w = float(dice_loss(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(w8)))
    assert np.allclose(ours_w, ref_w, rtol=1e-5)


def test_bce_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 6, 6).astype(np.float32)
    target = (rng.rand(4, 6, 6) > 0.5).astype(np.float32)
    ref = TF.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target)
    ).item()
    ours = float(binary_cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    assert np.allclose(ours, ref, rtol=1e-5)

    w = np.array([1, 1, 0, 0], np.float32)
    ref_w = TF.binary_cross_entropy_with_logits(
        torch.from_numpy(logits[:2]), torch.from_numpy(target[:2])
    ).item()
    ours_w = float(binary_cross_entropy(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(w)))
    assert np.allclose(ours_w, ref_w, rtol=1e-5)


def test_focal_matches_mmdet_formula():
    rng = np.random.RandomState(2)
    p, c = 12, 5
    logits = rng.randn(p, c).astype(np.float32)
    labels = rng.randint(0, c + 1, size=p)  # c == background
    lw = np.ones(p, np.float32)

    # mmdet py_sigmoid_focal_loss with one_hot target (bg = all zeros)
    t = torch.zeros(p, c)
    for i, l in enumerate(labels):
        if l < c:
            t[i, l] = 1.0
    pr = torch.sigmoid(torch.from_numpy(logits))
    pt = (1 - pr) * t + pr * (1 - t)
    fw = (0.25 * t + 0.75 * (1 - t)) * pt.pow(2.0)
    bce = TF.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), t, reduction="none"
    )
    num_pos = max(float((labels < c).sum()), 1.0)
    ref = (bce * fw).sum().item() / num_pos * 2.0

    ours = float(
        sigmoid_focal_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(lw),
            num_classes=c, loss_weight=2.0,
        )
    )
    assert np.allclose(ours, ref, rtol=1e-4)


def test_softmax_ce_with_ignore():
    rng = np.random.RandomState(3)
    logits = rng.randn(7, 4).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 99, 99, 1])
    ref = TF.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), ignore_index=99
    ).item()
    ours = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ignore_index=99))
    assert np.allclose(ours, ref, rtol=1e-5)


def test_rank_ce():
    rng = np.random.RandomState(4)
    n, h, w = 6, 5, 5
    mask_logits = rng.randn(n, h, w).astype(np.float32)
    rank_target = rng.randint(0, n, size=(h, w))
    rank_target[0, :] = 255
    ref = (
        TF.cross_entropy(
            torch.from_numpy(mask_logits[None]),
            torch.from_numpy(rank_target[None]),
            ignore_index=255,
        ).item()
        * 0.1
    )
    ours = float(rank_cross_entropy(jnp.asarray(mask_logits), jnp.asarray(rank_target)))
    assert np.allclose(ours, ref, rtol=1e-5)


def _ref_multipos(pred, label):
    """Direct transcription of multipos_cross_entropy_loss.py:6-41."""
    pred = torch.from_numpy(pred)
    label = torch.from_numpy(label)
    pos_inds = label == 1
    neg_inds = label == 0
    pred_pos = pred * pos_inds.float()
    pred_neg = pred * neg_inds.float()
    pred_pos[neg_inds] = pred_pos[neg_inds] + float("inf")
    pred_neg[pos_inds] = pred_neg[pos_inds] + float("-inf")
    _pos_expand = torch.repeat_interleave(pred_pos, pred.shape[1], dim=1)
    _neg_expand = pred_neg.repeat(1, pred.shape[1])
    x = TF.pad((_neg_expand - _pos_expand), (0, 1), "constant", 0)
    return torch.logsumexp(x, dim=1).mean().item()


def test_multipos_ce_matches_reference():
    rng = np.random.RandomState(5)
    p, q = 4, 6
    sim = (rng.randn(p, q) * 3).astype(np.float32)
    label = rng.randint(0, 2, size=(p, q))
    label[0] = [1, 0, 0, 1, 0, 0]  # ensure mixed rows
    ref = _ref_multipos(sim, label)
    ours = float(multi_pos_cross_entropy(jnp.asarray(sim), jnp.asarray(label), jnp.ones(p)))
    assert np.allclose(ours, ref, rtol=1e-4)


def test_l2_aux_no_mining_path():
    rng = np.random.RandomState(6)
    sim = rng.rand(3, 4).astype(np.float32)
    tgt = np.array([[1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 0, 1]])
    # num_neg/num_pos+1 = 6/7 < 3 -> no mining; matches plain masked L2
    pred = np.clip(sim - 0.1 * (tgt == 0), 0, 1)
    ref = ((pred - (tgt == 1)) ** 2).mean()
    ours = float(l2_track_aux_loss(jnp.asarray(sim), jnp.asarray(tgt)))
    assert np.allclose(ours, ref, rtol=1e-4)


def test_l2_aux_hard_mining_caps_negatives():
    rng = np.random.RandomState(7)
    p, q = 2, 10
    sim = rng.rand(p, q).astype(np.float32)
    tgt = np.zeros((p, q), np.int64)
    tgt[0, 0] = 1  # 1 pos, 19 neg -> cap at 3 negatives
    ours = float(l2_track_aux_loss(jnp.asarray(sim), jnp.asarray(tgt)))

    pred = np.clip(sim - 0.1 * (tgt == 0), 0, 1)
    err = (pred - (tgt == 1)) ** 2
    neg_errs = np.sort(err[tgt == 0].ravel())[::-1][:3]
    ref = (err[tgt == 1].sum() + neg_errs.sum()) / 4
    assert np.allclose(ours, ref, rtol=1e-4)


def test_gathered_stage_loss_equals_dense():
    """The gathered-row mask/dice/rank stage losses must equal the dense
    all-rows formulation (both are weighted means over the same pairs)."""
    import dataclasses

    from video_knet_tpu.config import KNetConfig
    from video_knet_tpu.models.kernel_iter_head import StageOutput
    from video_knet_tpu.models.knet import _rank_loss_batched, stage_loss
    from video_knet_tpu.ops import losses as L
    from video_knet_tpu.ops.targets import (
        PanopticGT,
        build_rank_target,
        build_stage_targets,
    )

    cfg = KNetConfig(max_insts=4, num_proposals=10)
    rng = np.random.RandomState(0)
    # head-resolution masks at (hh, ww); GT and the dense reference live at
    # the assign resolution (h, w) = mask_upsample_stride x that — stage_loss
    # gathers rows at head res and upscales only those rows, which must equal
    # the dense formulation over the full upscaled tensor (resize and row
    # gather commute)
    up = cfg.head.mask_upsample_stride
    b, n_prop, s, hh, ww = 2, 10, cfg.num_stuff_classes, 16, 24
    h, w = hh * up, ww * up
    n_tot = n_prop + s
    g = cfg.max_insts
    gt = PanopticGT(
        masks=jnp.asarray((rng.rand(b, g, h, w) > 0.6).astype(np.float32)),
        labels=jnp.asarray(rng.randint(0, 2, (b, g)).astype(np.int32)),
        valid=jnp.asarray([[True, True, False, False], [True, True, True, False]]),
        instance_ids=jnp.asarray(rng.randint(0, 9, (b, g)).astype(np.int32)),
        sem_masks=jnp.asarray((rng.rand(b, s, h, w) > 0.8).astype(np.float32)),
        sem_valid=jnp.asarray(rng.rand(b, s) > 0.5),
    )
    # a plausible one-to-one assignment: gt 0 -> row 3, gt 1 -> row 7, ...
    gp = -np.ones((b, n_prop), np.int32)
    gp[0, 3], gp[0, 7] = 0, 1
    gp[1, 2], gp[1, 5], gp[1, 9] = 0, 1, 2
    gt_of_pred = jnp.asarray(gp)
    from video_knet_tpu.models.kernel_iter_head import upscale_masks

    mask_preds = jnp.asarray(rng.randn(b, n_tot, hh, ww).astype(np.float32))
    out = StageOutput(
        cls_score=jnp.asarray(rng.randn(b, n_tot, cfg.num_classes).astype(np.float32)),
        mask_preds=mask_preds,
        scaled_mask_preds=upscale_masks(mask_preds, up),
        object_feats=None,
    )
    got = stage_loss(out, gt_of_pred, gt, cfg, "s0")

    # dense reference (the pre-refactor formulation)
    tgt = build_stage_targets(
        gt_of_pred, gt,
        num_thing_classes=cfg.num_thing_classes,
        num_stuff_classes=cfg.num_stuff_classes,
    )
    hcfg = cfg.head
    sm = out.scaled_mask_preds
    flat = lambda x: x.reshape(b * n_tot, *x.shape[2:])
    want_mask = L.binary_cross_entropy(
        flat(sm), flat(tgt.mask_targets), tgt.mask_weights.reshape(-1),
        loss_weight=hcfg.loss_mask_weight,
    )
    want_dice = L.dice_loss(
        flat(sm), flat(tgt.mask_targets), tgt.mask_weights.reshape(-1),
        loss_weight=hcfg.loss_dice_weight,
    )
    np.testing.assert_allclose(float(got["s0_loss_mask"]), float(want_mask), rtol=1e-5)
    np.testing.assert_allclose(float(got["s0_loss_dice"]), float(want_dice), rtol=1e-5)
    if hcfg.loss_rank_weight > 0:
        rank_t = build_rank_target(tgt.mask_targets, tgt.mask_weights, ignore_label=255)
        want_rank = _rank_loss_batched(sm, rank_t, hcfg.loss_rank_weight)
        np.testing.assert_allclose(
            float(got["s0_loss_rank"]), float(want_rank), rtol=1e-5
        )
