"""VIS trainer assembly: sharded clip train step.

Mirrors train/vps.py for the KNetVIS clip model: batch = clips [B, T, H, W, 3] +
fixed-slot ClipGT tubes; data parallelism over the mesh `data` axis."""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_knet_tpu.config_vis import VISConfig
from video_knet_tpu.models.vis.knet_vis import ClipGT, KNetVIS, knet_vis_loss
from video_knet_tpu.train.train_state import TrainState


def make_vis_loss_fn(model: KNetVIS, cfg: VISConfig):
    def loss_fn(params, batch_stats, clip, gt: ClipGT):
        variables = {"params": params, "batch_stats": batch_stats}
        outs = model.apply(variables, clip, mutable=False)
        losses = knet_vis_loss(outs, gt, cfg)
        total = sum(losses.values())
        return total, (losses, batch_stats)

    return loss_fn


def make_sharded_vis_train_step(model: KNetVIS, cfg: VISConfig,
                                tx: optax.GradientTransformation, mesh: Mesh):
    loss_fn = make_vis_loss_fn(model, cfg)

    def train_step(state: TrainState, clip, gt: ClipGT):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (loss_dict, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, clip, gt
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        loss_dict = dict(loss_dict)
        loss_dict["total_loss"] = total
        return TrainState(state.step + 1, new_params, new_bs, new_opt), loss_dict

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    gt_sh = ClipGT(data, data, data)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, gt_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
