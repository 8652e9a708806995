"""Train state + sharded train step factory (data-parallel over a mesh).

Replaces the reference's EpochBasedRunner + MMDistributedDataParallel
(external/train.py:16-129): one jitted step holds forward, loss, grad, clip,
AdamW update, and BN stat sync — the gradient all-reduce over ICI is inserted by
XLA from the shardings.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(
    loss_fn: Callable[[Any, Any, Any], tuple[Array, tuple[dict, Any]]],
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
):
    """loss_fn(params, batch_stats, batch) -> (total, (loss_dict, new_batch_stats)).

    Returns a jitted train_step(state, batch) -> (state, loss_dict); when a mesh is
    given, state is replicated and the batch is sharded over the `data` axis.
    """

    def train_step(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (loss_dict, new_bs)), grads = grad_fn(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        loss_dict = dict(loss_dict)
        loss_dict["total_loss"] = total
        return (
            TrainState(state.step + 1, new_params, new_bs, new_opt),
            loss_dict,
        )

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
