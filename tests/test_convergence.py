"""Tiny-synthetic overfit: the full VPS train step must drive its losses down.

SURVEY.md §4's test-pyramid plan: end-to-end convergence on a fixed synthetic
video pair — catches broken gradients, mis-wired losses, bad target building.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_knet_tpu.config import VideoKNetConfig
from video_knet_tpu.models.video.knet_vps import VideoKNet
from video_knet_tpu.train.optim import make_optimizer
from video_knet_tpu.train.train_state import create_train_state
from video_knet_tpu.train.vps import make_synthetic_batch, make_vps_loss_fn

import optax


@pytest.mark.slow
def test_vps_overfits_synthetic_pair():
    cfg = VideoKNetConfig(max_insts=4)
    model = VideoKNet(cfg, train=True)
    batch = make_synthetic_batch(cfg, 1, (64, 96), seed=0)
    variables = model.init(jax.random.PRNGKey(0), batch.img, batch.ref_img)
    # plain Adam w/o warmup so a short run makes visible progress
    tx = optax.adam(5e-4)
    state = create_train_state(variables, tx)
    loss_fn = make_vps_loss_fn(model, cfg)

    @jax.jit
    def step(state, batch):
        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state._replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt,
        ), total

    first = None
    total = None
    for i in range(25):
        state, total = step(state, batch)
        if first is None:
            first = float(total)
    final = float(total)
    assert np.isfinite(final)
    # overfitting one fixed pair must cut the loss substantially
    assert final < 0.7 * first, f"no convergence: {first:.3f} -> {final:.3f}"
