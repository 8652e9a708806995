"""Optimizer / LR schedule matching the reference training recipe.

configs/det/_base_/schedules/schedule_1x.py: AdamW lr 1e-4, wd 0.05, backbone
lr_mult 0.25, grad-clip L2 max-norm 1, linear warmup 1000 iters ratio 1e-3, step
decay x0.1 at given epochs, 12 epochs. Frozen backbone stages (frozen_stages=1:
stem + layer1) are masked out of the optimizer entirely (they also get
stop_gradient in the forward), matching requires_grad=False semantics.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    *,
    decay_epochs: Sequence[int] = (9, 11),
    warmup_iters: int = 1000,
    warmup_ratio: float = 1e-3,
    gamma: float = 0.1,
):
    boundaries = jnp.asarray([e * steps_per_epoch for e in decay_epochs])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            step < warmup_iters,
            warmup_ratio + (1.0 - warmup_ratio) * step / max(warmup_iters, 1),
            1.0,
        )
        decays = jnp.sum((step >= boundaries).astype(jnp.float32))
        return base_lr * warm * gamma**decays

    return schedule


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def frozen_mask(params, frozen_stages: int = 1, freeze_detector: bool = False) -> Any:
    """True = trainable. Freezes backbone stem + layers 1..frozen_stages.

    freeze_detector=True is the non-joint two-phase mode of
    VideoKNetQuansiEmbedFC (knet/video/knet_quansi_dense_embed_fc.py:92-139):
    the whole detector is frozen and only the tracking pieces train — the
    association embedding head and the last-stage cross-frame linking layers."""
    frozen_names = ["conv1", "bn1"] + [f"layer{s}_" for s in range(1, frozen_stages + 1)]
    track_keys = ("track_embed", "attention_previous", "link_ffn", "link_update",
                  "track_update")

    def is_trainable(path, _):
        p = _path_str(path)
        if freeze_detector:
            return any(k in p for k in track_keys)
        if p.startswith("backbone/"):
            sub = p[len("backbone/") :]
            if any(sub.startswith(f) for f in frozen_names):
                return False
        return True

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def backbone_label(params) -> Any:
    def label(path, _):
        return "backbone" if _path_str(path).startswith("backbone/") else "rest"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    params,
    steps_per_epoch: int,
    *,
    base_lr: float = 1e-4,
    weight_decay: float = 0.05,
    backbone_lr_mult: float = 0.25,
    grad_clip: float = 1.0,
    decay_epochs: Sequence[int] = (9, 11),
    warmup_iters: int = 1000,
    frozen_stages: int = 1,
    freeze_detector: bool = False,
) -> optax.GradientTransformation:
    sched = make_lr_schedule(
        base_lr, steps_per_epoch, decay_epochs=decay_epochs, warmup_iters=warmup_iters
    )
    sched_backbone = lambda s: sched(s) * backbone_lr_mult

    def adamw(lr_schedule):
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(lr_schedule, b1=0.9, b2=0.999, weight_decay=weight_decay),
        )

    tx = optax.multi_transform(
        {"backbone": adamw(sched_backbone), "rest": adamw(sched)},
        backbone_label(params),
    )
    # mask out frozen params (no updates, no weight decay, no momentum state)
    trainable = frozen_mask(params, frozen_stages, freeze_detector)
    return optax.masked(tx, trainable)
