"""SPMD train-step tests: data-parallel and data x spatial meshes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from video_knet_tpu.config import VideoKNetConfig
from video_knet_tpu.models.video.knet_vps import VideoKNet
from video_knet_tpu.parallel.mesh import make_mesh, shard_batch
from video_knet_tpu.train.optim import make_optimizer
from video_knet_tpu.train.train_state import create_train_state
from video_knet_tpu.train.vps import make_sharded_train_step, make_synthetic_batch

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def _setup():
    cfg = VideoKNetConfig(max_insts=4)
    model = VideoKNet(cfg, train=True)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img)
    tx = make_optimizer(variables["params"], steps_per_epoch=100)
    return cfg, model, tx, create_train_state(variables, tx)


def test_dp_mesh_step():
    cfg, model, tx, state = _setup()
    mesh = make_mesh(n_data=8, n_model=1)
    step = make_sharded_train_step(model, cfg, tx, mesh)
    batch = shard_batch(mesh, make_synthetic_batch(cfg, 8, (64, 96)))
    with mesh:
        state, losses = step(state, batch)
    assert np.isfinite(float(losses["total_loss"]))
    assert int(state.step) == 1


def test_dp_x_spatial_mesh_step():
    cfg, model, tx, state = _setup()
    mesh = make_mesh(n_data=4, n_model=2)
    step = make_sharded_train_step(model, cfg, tx, mesh)
    batch = shard_batch(mesh, make_synthetic_batch(cfg, 4, (64, 96)))
    with mesh:
        state, losses = step(state, batch)
    assert np.isfinite(float(losses["total_loss"]))


def test_dp_matches_single_device_loss():
    """The sharded loss must equal the unsharded loss on the same batch."""
    from video_knet_tpu.train.vps import make_vps_loss_fn

    cfg, model, tx, state = _setup()
    batch = make_synthetic_batch(cfg, 2, (64, 96))
    loss_fn = make_vps_loss_fn(model, cfg)
    total_single, _ = jax.jit(loss_fn)(state.params, state.batch_stats, batch)

    mesh = make_mesh(n_data=2, n_model=1)
    sharded = shard_batch(mesh, batch)
    total_sharded, _ = jax.jit(loss_fn)(state.params, state.batch_stats, sharded)
    np.testing.assert_allclose(
        float(total_single), float(total_sharded), rtol=2e-4
    )


def test_vis_clip_axis_sharding():
    """VIS train step with frames sharded over the model axis (clip parallel)."""
    from tests.test_vis import _make_clip_gt, tiny_vis_cfg
    from video_knet_tpu.models.vis.knet_vis import KNetVIS
    from video_knet_tpu.train.vis import make_sharded_vis_train_step

    cfg = tiny_vis_cfg()
    model = KNetVIS(cfg, train=True)
    clip = jnp.zeros((2, 2, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), clip[:1])
    tx = make_optimizer(variables["params"], steps_per_epoch=100)
    state = create_train_state(variables, tx)
    mesh = make_mesh(n_data=2, n_model=2)
    step = make_sharded_vis_train_step(model, cfg, tx, mesh)
    gt = _make_clip_gt(cfg, 2, 2, (16, 24))
    clip, gt = shard_batch(mesh, (clip, gt))
    with mesh:
        state, losses = step(state, clip, gt)
    assert np.isfinite(float(losses["total_loss"]))
