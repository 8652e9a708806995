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


def test_instance_decode_and_coco_results(tmp_path):
    """COCO instance mode (VERDICT r2 item 8): the knet_s3_r50_fpn_ms-3x_coco
    config instantiates, trains a step, decodes top-k instances, and the
    results format into per-class segm2result lists + COCO segm json
    (kernel_update_head.py:443-483, kernel_iter_head.py:271-282)."""
    import dataclasses
    import json

    from video_knet_tpu.configs import get_config
    from video_knet_tpu.eval.coco_instance import (
        instances_to_coco_json,
        segm2result,
        write_coco_results,
    )
    from video_knet_tpu.models.knet import instance_decode

    cfg = get_config("knet_s3_r50_fpn_ms-3x_coco")
    assert cfg.num_thing_classes == 80 and cfg.num_stuff_classes == 0
    assert not cfg.rpn.cat_stuff_mask
    # tiny geometry for the smoke run
    cfg = dataclasses.replace(
        cfg, num_proposals=8, max_insts=4,
        num_thing_classes=5, num_stuff_classes=0,
        rpn=dataclasses.replace(
            cfg.rpn, num_proposals=8, num_classes=5, num_thing_classes=5,
        ),
        head=dataclasses.replace(
            cfg.head, num_classes=5, num_thing_classes=5, feedforward_channels=256,
        ),
        test=dataclasses.replace(cfg.test, max_per_img=6),
    )
    model = KNet(cfg, train=True)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    # train step with instance-only GT (no stuff rows)
    g = cfg.max_insts
    # image config: mask_assign_stride=4 -> GT at 16x24 for 64x96 inputs
    gt = PanopticGT(
        masks=jnp.zeros((1, g, 16, 24)).at[0, 0, :8, :12].set(1.0),
        labels=jnp.zeros((1, g), jnp.int32),
        valid=jnp.zeros((1, g), bool).at[0, 0].set(True),
        instance_ids=jnp.full((1, g), -1, jnp.int32).at[0, 0].set(0),
        sem_masks=jnp.zeros((1, 0, 16, 24)),
        sem_valid=jnp.zeros((1, 0), bool),
    )

    @jax.jit
    def loss_fn(params):
        rpn_out, stage_outs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, img
        )
        return sum(knet_loss(rpn_out, stage_outs, gt, cfg).values())

    assert np.isfinite(float(loss_fn(variables["params"])))

    infer = KNet(cfg, train=False)
    rpn_out, stage_outs = infer.apply(variables, img, mutable=False)
    pred = jax.jit(
        lambda r, s: instance_decode(r, s, cfg, out_hw=(64, 96))
    )(rpn_out, stage_outs)
    k = cfg.test.max_per_img
    assert pred.masks.shape == (k, 64, 96)
    assert pred.labels.shape == (k,) and pred.scores.shape == (k,)
    assert (np.asarray(pred.masks) >= 0).all() and (np.asarray(pred.masks) <= 1).all()
    # descending scores (top_k is sorted)
    s = np.asarray(pred.scores)
    assert (np.diff(s) <= 1e-6).all()

    bbox_r, segm_r = segm2result(
        np.asarray(pred.masks), np.asarray(pred.labels), s,
        num_classes=cfg.num_thing_classes,
    )
    assert len(bbox_r) == cfg.num_thing_classes
    assert sum(len(x) for x in segm_r) == k
    for cls in range(cfg.num_thing_classes):
        assert bbox_r[cls].shape[1] == 5
        assert len(segm_r[cls]) == len(bbox_r[cls])

    entries = instances_to_coco_json(
        7, np.asarray(pred.masks), np.asarray(pred.labels), s,
        cat_ids=list(range(1, cfg.num_thing_classes + 1)),
    )
    path = write_coco_results(entries, str(tmp_path))
    loaded = json.load(open(path))
    assert len(loaded) == k
    assert all(e["image_id"] == 7 for e in loaded)
    # RLE roundtrip on the first non-empty mask
    from video_knet_tpu.data.rle import decode_mask

    for e in loaded:
        m = decode_mask(e["segmentation"])
        assert m.shape == (64, 96)


def test_image_deformable_neck_config_and_forward():
    """COCO deformable release configs (configs/det/coco/knet_s3_r50_deformable
    _fpn_ms-3x_coco.py, knet_s3_swin-b_deformable_fpn_ms-3x_coco.py) are
    registered and the image model runs with the MSDeformAttnPixelDecoder neck
    (_base_/models/knet_s3_r50_deformable_fpn.py)."""
    import dataclasses

    from video_knet_tpu.configs import get_config

    cfg = get_config("knet_s3_r50_deformable_fpn_ms-3x_coco")
    assert cfg.neck_type == "msdeform_pixel_decoder"
    assert cfg.num_thing_classes == 80 and cfg.num_stuff_classes == 0
    swinb = get_config("knet_s3_swin-b_deformable_fpn_ms-3x_coco")
    assert swinb.backbone == "swin_base"
    assert swinb.neck_type == "msdeform_pixel_decoder"

    # tiny forward smoke through the deformable neck (image path)
    cfg = dataclasses.replace(
        cfg, num_proposals=8, max_insts=4, num_thing_classes=5,
        rpn=dataclasses.replace(
            cfg.rpn, num_proposals=8, num_classes=5, num_thing_classes=5,
        ),
        head=dataclasses.replace(
            cfg.head, num_classes=5, num_thing_classes=5,
            feedforward_channels=256,
        ),
    )
    model = KNet(cfg, train=False)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = KNet(cfg, train=True).init(jax.random.PRNGKey(0), img)
    assert "layer0" in variables["params"]["neck"]
    rpn_out, stage_outs = model.apply(variables, img, mutable=False)
    n_tot = cfg.num_proposals  # no stuff rows in instance mode
    assert stage_outs[-1].cls_score.shape == (1, n_tot, 5)
    assert np.isfinite(np.asarray(stage_outs[-1].mask_preds)).all()
