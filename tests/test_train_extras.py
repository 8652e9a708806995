"""Eval hook + VIS sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_data import _write_fake_kitti


def test_evaluate_vps_on_fake_data(tmp_path):
    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.data.datasets import KittiStepDVPS
    from video_knet_tpu.models.video.inference import VPSInferencePipeline
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.train.eval_hook import evaluate_vps

    _write_fake_kitti(tmp_path, n_seqs=1, n_frames=2, hw=(64, 96))
    ds = KittiStepDVPS(str(tmp_path), split="train")
    cfg = VideoKNetConfig(max_insts=8)
    model = VideoKNet(cfg, train=False)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img)
    pipe = VPSInferencePipeline(model, variables, cfg, out_hw=(64, 96))
    metrics = evaluate_vps(pipe, ds, size_hw=(64, 96), num_classes=cfg.num_classes)
    assert metrics["frames"] == 2
    for k in ("PQ", "STQ", "AQ", "IoU"):
        assert np.isfinite(metrics[k]), k


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multiple devices")
def test_vis_sharded_train_step():
    from tests.test_vis import _make_clip_gt, tiny_vis_cfg
    from video_knet_tpu.models.vis.knet_vis import KNetVIS
    from video_knet_tpu.parallel.mesh import make_mesh, shard_batch
    from video_knet_tpu.train.optim import make_optimizer
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vis import make_sharded_vis_train_step

    cfg = tiny_vis_cfg()
    model = KNetVIS(cfg, train=True)
    clip = jnp.zeros((2, 2, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), clip[:1])
    tx = make_optimizer(variables["params"], steps_per_epoch=100)
    state = create_train_state(variables, tx)
    mesh = make_mesh(n_data=2, n_model=1)
    step = make_sharded_vis_train_step(model, cfg, tx, mesh)
    gt = _make_clip_gt(cfg, 2, 2, (16, 24))
    clip, gt = shard_batch(mesh, (clip, gt))
    with mesh:
        state, losses = step(state, clip, gt)
    assert np.isfinite(float(losses["total_loss"]))


def test_freeze_detector_masks_all_but_track():
    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.train.optim import frozen_mask

    cfg = VideoKNetConfig(max_insts=4)
    model = VideoKNet(cfg, train=True)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img)
    mask = frozen_mask(variables["params"], freeze_detector=True)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    trainable = ["/".join(str(k) for k in p) for p, v in flat if v]
    assert trainable, "nothing trainable"
    assert all(
        ("track_embed" in t) or ("attention_previous" in t) or ("link_ffn" in t)
        for t in trainable
    )
    assert any("track_embed" in t for t in trainable)
    assert any("attention_previous" in t for t in trainable)


def test_bf16_train_step_matches_fp32():
    """bf16_train: loss close to fp32, grads/updates arrive fp32, step finite."""
    import dataclasses

    import optax

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vps import make_synthetic_batch, make_vps_loss_fn

    cfg32 = VideoKNetConfig(max_insts=4)
    cfg16 = dataclasses.replace(cfg32, bf16_train=True)
    model = VideoKNet(cfg32, train=True)
    batch = make_synthetic_batch(cfg32, 1, (64, 96))
    variables = model.init(jax.random.PRNGKey(0), batch.img, batch.ref_img)

    loss32 = make_vps_loss_fn(model, cfg32)
    loss16 = make_vps_loss_fn(VideoKNet(cfg16, train=True), cfg16)
    t32, _ = jax.jit(loss32)(variables["params"], variables["batch_stats"], batch)
    t16, _ = jax.jit(loss16)(variables["params"], variables["batch_stats"], batch)
    assert np.isfinite(float(t16))
    # bf16 forward must stay within a few percent of the fp32 loss
    assert abs(float(t16) - float(t32)) / float(t32) < 0.05, (float(t32), float(t16))

    tx = optax.adam(1e-4)
    state = create_train_state(variables, tx)
    grads = jax.jit(jax.grad(lambda p: loss16(p, state.batch_stats, batch)[0]))(
        state.params
    )
    dtypes = {x.dtype for x in jax.tree_util.tree_leaves(grads)}
    assert dtypes == {jnp.dtype(jnp.float32)}, dtypes  # masters + grads stay fp32
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_vis_bf16_train_step():
    import dataclasses

    import optax

    from tests.test_vis import _make_clip_gt, tiny_vis_cfg
    from video_knet_tpu.models.vis.knet_vis import KNetVIS
    from video_knet_tpu.train.vis import make_vis_loss_fn

    cfg32 = tiny_vis_cfg()
    cfg16 = dataclasses.replace(cfg32, bf16_train=True)
    model = KNetVIS(cfg32, train=True)
    clip = jnp.zeros((1, 2, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), clip)
    gt = _make_clip_gt(cfg32, 1, 2, (16, 24))
    t32, _ = jax.jit(make_vis_loss_fn(model, cfg32))(
        variables["params"], variables["batch_stats"], clip, gt
    )
    t16, _ = jax.jit(make_vis_loss_fn(KNetVIS(cfg16, train=True), cfg16))(
        variables["params"], variables["batch_stats"], clip, gt
    )
    assert np.isfinite(float(t16))
    assert abs(float(t16) - float(t32)) / float(t32) < 0.05


def test_swin_drop_path_train_step_rngs():
    """Stochastic-depth configs must train through make_sharded_train_step:
    the step folds the step counter into a dropout rng (deterministic per
    step). Before round 3 swin drop-path configs crashed here (no rngs)."""
    import dataclasses

    import optax
    from jax.sharding import Mesh

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vps import make_sharded_train_step, make_synthetic_batch

    cfg = VideoKNetConfig(
        max_insts=4, backbone="swin_tiny", backbone_drop_path_rate=0.2
    )
    model = VideoKNet(cfg, train=True)
    batch = make_synthetic_batch(cfg, 1, (64, 96), seed=0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch.img, batch.ref_img,
    )
    tx = optax.adam(1e-4)
    # the train step donates its input state, whose buffers are shared with
    # `variables` — copy per state so the second create sees live buffers
    fresh = lambda: create_train_state(
        jax.tree_util.tree_map(jnp.array, variables), tx
    )
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    step = make_sharded_train_step(model, cfg, tx, mesh)
    state, losses = step(fresh(), batch)
    assert np.isfinite(float(losses["total_loss"]))
    # determinism: same step counter -> same rng -> same loss
    _, losses2 = step(fresh(), batch)
    assert float(losses2["total_loss"]) == float(losses["total_loss"])
