"""End-to-end smoke tests for the image K-Net (forward, loss, panoptic decode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_knet_tpu.config import KNetConfig
from video_knet_tpu.models.knet import KNet, knet_loss, panoptic_decode
from video_knet_tpu.ops.targets import PanopticGT


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = KNetConfig(max_insts=8)
    model = KNet(cfg, train=True)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 64, 96, 3), jnp.float32)
    variables = model.init(rng, img)
    return cfg, model, variables, img


def _make_gt(cfg, b, hw):
    h, w = hw
    g, s = cfg.max_insts, cfg.num_stuff_classes
    rng = np.random.RandomState(0)
    masks = np.zeros((b, g, h, w), np.float32)
    masks[:, 0, : h // 2, : w // 2] = 1.0
    masks[:, 1, h // 2 :, :] = 1.0
    labels = np.zeros((b, g), np.int32)
    labels[:, 1] = 1
    valid = np.zeros((b, g), bool)
    valid[:, :2] = True
    sem = np.zeros((b, s, h, w), np.float32)
    sem[:, 0, : h // 4, :] = 1.0
    sem_valid = np.zeros((b, s), bool)
    sem_valid[:, 0] = True
    return PanopticGT(
        masks=jnp.asarray(masks),
        labels=jnp.asarray(labels),
        valid=jnp.asarray(valid),
        instance_ids=jnp.asarray(np.where(valid, np.arange(g)[None], -1)),
        sem_masks=jnp.asarray(sem),
        sem_valid=jnp.asarray(sem_valid),
    )


def test_forward_shapes(tiny_setup):
    cfg, model, variables, img = tiny_setup
    rpn_out, stage_outs = model.apply(variables, img, mutable=False)
    b = img.shape[0]
    n_tot = cfg.num_proposals + cfg.num_stuff_classes
    # stride-8 features
    assert rpn_out.x_feats.shape == (b, 8, 12, 256)
    assert rpn_out.mask_preds.shape == (b, n_tot, 8, 12)
    assert rpn_out.seg_preds.shape == (b, 8, 12, cfg.num_classes)
    assert len(stage_outs) == cfg.num_stages
    for so in stage_outs:
        assert so.cls_score.shape == (b, n_tot, cfg.num_classes)
        assert so.mask_preds.shape == (b, n_tot, 8, 12)
        assert so.scaled_mask_preds.shape == (b, n_tot, 16, 24)
        assert so.object_feats.shape == (b, n_tot, 1, 256)


def test_loss_finite_and_jittable(tiny_setup):
    cfg, model, variables, img = tiny_setup
    gt = _make_gt(cfg, img.shape[0], (16, 24))

    @jax.jit
    def loss_fn(params, img, gt):
        rpn_out, stage_outs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, img
        )
        losses = knet_loss(rpn_out, stage_outs, gt, cfg)
        return sum(losses.values()), losses

    total, losses = loss_fn(variables["params"], img, gt)
    expected_keys = {"loss_rpn_mask", "loss_rpn_dice", "loss_rpn_rank", "loss_rpn_seg"}
    for s in range(cfg.num_stages):
        expected_keys |= {f"s{s}_loss_cls", f"s{s}_loss_mask", f"s{s}_loss_dice"}
        if cfg.head.loss_rank_weight > 0:
            expected_keys |= {f"s{s}_loss_rank"}
    assert expected_keys <= set(losses.keys())
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert np.isfinite(float(total))


def test_loss_grads_flow(tiny_setup):
    cfg, model, variables, img = tiny_setup
    gt = _make_gt(cfg, img.shape[0], (16, 24))

    def loss_fn(params):
        rpn_out, stage_outs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, img
        )
        return sum(knet_loss(rpn_out, stage_outs, gt, cfg).values())

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    # init kernels and a head weight must receive gradient
    gk = grads["rpn_head"]["init_kernels"]
    assert float(jnp.abs(gk).sum()) > 0
    gh = grads["roi_head"]["mask_head_0"]["fc_mask"]["kernel"]
    assert float(jnp.abs(gh).sum()) > 0
    # frozen stem must NOT receive gradient
    gstem = grads["backbone"]["conv1"]["kernel"]
    assert float(jnp.abs(gstem).sum()) == 0
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_panoptic_decode(tiny_setup):
    cfg, model, variables, img = tiny_setup
    rpn_out, stage_outs = model.apply(variables, img[:1])
    pred = jax.jit(lambda r, s: panoptic_decode(r, s, cfg, out_hw=(64, 96)))(
        rpn_out, stage_outs
    )
    pan = np.asarray(pred.result.panoptic_seg)
    assert pan.shape == (64, 96)
    k = cfg.test.max_per_img + cfg.num_stuff_classes
    assert pred.result.keep.shape == (k,)
    assert pred.thing_kernels.shape == (cfg.test.max_per_img, 1, 256)
    # segment ids are dense 1..n over kept segments
    kept = np.asarray(pred.result.keep)
    ids = np.asarray(pred.result.seg_ids)
    assert set(ids[kept]) == set(range(1, kept.sum() + 1))
    assert (ids[~kept] == 0).all()
