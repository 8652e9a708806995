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


@pytest.mark.slow
def test_mini_real_data_convergence(tmp_path):
    """50+ steps on a synthetic-PNG KITTI tree through the REAL pipeline
    (PNG decode -> Seq transforms -> GT packing -> jitted train step), then the
    eval hook scores PQ on the same tree. Catches loader/GT-packing bugs the
    pure-tensor overfit above cannot (VERDICT r1 item 10)."""
    from tests.test_data import _write_fake_kitti
    from video_knet_tpu.data.datasets import KittiStepDVPS
    from video_knet_tpu.data.loader import VPSTrainLoader
    from video_knet_tpu.models.video.inference import VPSInferencePipeline
    from video_knet_tpu.train.eval_hook import evaluate_vps

    hw = (64, 96)
    _write_fake_kitti(tmp_path, n_seqs=2, n_frames=4, hw=hw)
    cfg = VideoKNetConfig(max_insts=4)
    ds = KittiStepDVPS(str(tmp_path), split="train")
    loader = VPSTrainLoader(
        ds, cfg, batch_size=1, crop_hw=hw, seed=0, num_threads=2,
        process_index=0, process_count=1,
    )

    model = VideoKNet(cfg, train=True)
    batches = iter(loader)
    batch0 = next(batches)
    variables = model.init(jax.random.PRNGKey(0), batch0.img, batch0.ref_img)
    tx = optax.adam(1e-3)  # measured: PQ turns nonzero at ~150 steps at this lr
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

    history = []
    state, total = step(state, batch0)
    history.append(float(total))

    def train_to(n_steps):
        nonlocal state
        while len(history) < n_steps:
            for batch in loader:
                s2, total = step(state, batch)
                state = s2
                history.append(float(total))
                if len(history) >= n_steps:
                    break

    def eval_now():
        eval_model = VideoKNet(cfg, train=False)
        eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
        pipe = VPSInferencePipeline(eval_model, eval_vars, cfg, out_hw=hw)
        return evaluate_vps(pipe, ds, size_hw=hw)

    train_to(150)
    assert all(np.isfinite(history))
    head = np.mean(history[:8])
    tail = np.mean(history[-8:])
    assert tail < 0.6 * head, f"no convergence on real pipeline: {head:.3f} -> {tail:.3f}"

    # eval hook on the same tree: the full inference + metric path must produce
    # finite scores and find the overfitted layout (PQ > 0). The PQ-threshold
    # crossing sits near step 150 at this lr, so extend training in bounded
    # chunks rather than flaking on run-to-run numeric drift.
    metrics = eval_now()
    for _ in range(3):
        if metrics["PQ"] > 0:
            break
        train_to(len(history) + 50)
        metrics = eval_now()
    assert np.isfinite(metrics["PQ"]) and np.isfinite(metrics["STQ"])
    assert metrics["frames"] == 8
    assert metrics["PQ"] > 0, (
        f"eval hook scored zero PQ after {len(history)} overfit steps: {metrics}"
    )
