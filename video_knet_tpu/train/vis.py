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
    """bf16_train: forward/backward in bfloat16 with fp32 master params and
    fp32 loss math (same contract as train/vps.py)."""

    if getattr(cfg, "bf16_train", False) and not cfg.norm_eval:
        raise ValueError(
            "bf16_train requires norm_eval=True (frozen BN stats): live BN "
            "stat updates would be accumulated in bfloat16"
        )

    def loss_fn(params, batch_stats, clip, gt: ClipGT, rng=None):
        # swin drop-path/dropout rngs (flax Dropout is rng-free at rate 0)
        rngs = None if rng is None else {"dropout": rng}
        if getattr(cfg, "bf16_train", False):
            import jax.numpy as jnp

            from video_knet_tpu.utils.precision import cast_variables

            variables = cast_variables(
                {"params": params, "batch_stats": batch_stats}
            )
            clip = clip.astype(jnp.bfloat16)
        else:
            variables = {"params": params, "batch_stats": batch_stats}
        # release configs freeze BN (norm_eval=True); from-scratch training
        # (tests) runs live BN and must thread updated batch_stats through
        mutable = ["batch_stats"] if (model.train and not cfg.norm_eval) else False
        if mutable:
            outs, updates = model.apply(
                variables, clip, mutable=mutable, rngs=rngs
            )
            new_bs = updates["batch_stats"]
        else:
            outs = model.apply(variables, clip, mutable=False, rngs=rngs)
            new_bs = batch_stats
        if getattr(cfg, "bf16_train", False):
            import jax.numpy as jnp

            outs = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if getattr(x, "dtype", None) == jnp.bfloat16 else x,
                outs,
            )
        losses = knet_vis_loss(outs, gt, cfg)
        total = sum(losses.values())
        return total, (losses, new_bs)

    return loss_fn


def make_sharded_vis_train_step(model: KNetVIS, cfg: VISConfig,
                                tx: optax.GradientTransformation, mesh: Mesh):
    """Data-parallel over `data`; with a non-trivial `model` axis the clip's
    FRAME axis additionally shards over it — the degenerate context parallelism
    of SURVEY.md §5.7 (per-frame backbone/head work splits across devices; the
    clip-level kernel fusion induces the cross-frame all-gather)."""
    loss_fn = make_vis_loss_fn(model, cfg)
    clip_parallel = "model" in mesh.axis_names and mesh.shape["model"] > 1
    stochastic = getattr(cfg, "backbone_drop_path_rate", 0.0) > 0.0
    base_rng = jax.random.PRNGKey(0)

    def train_step(state: TrainState, clip, gt: ClipGT):
        if clip_parallel:
            clip = jax.lax.with_sharding_constraint(
                clip, NamedSharding(mesh, P("data", "model"))
            )
            gt = gt._replace(
                masks=jax.lax.with_sharding_constraint(
                    gt.masks, NamedSharding(mesh, P("data", None, "model"))
                )
            )
        rng = jax.random.fold_in(base_rng, state.step) if stochastic else None
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (loss_dict, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, clip, gt, rng
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
