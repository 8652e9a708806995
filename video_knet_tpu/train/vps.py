"""VPS trainer assembly: batch container, loss function, and the sharded train step.

This is the TPU-native equivalent of the reference's `external/train.py:train_detector`
driving `VideoKNetQuansiEmbedFCJointTrain.forward_train`
(knet/video/knet_quansi_dense_embed_fc_joint_train.py:225): one jitted function holds
forward (key + ref branch), all losses, grads, clip, and the AdamW update; gradient
all-reduce over the data axis is inserted by XLA from the shardings.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_knet_tpu.config import KNetConfig, VideoKNetConfig
from video_knet_tpu.models.video.knet_vps import VideoKNet, video_knet_loss
from video_knet_tpu.ops.targets import PanopticGT
from video_knet_tpu.train.train_state import TrainState

Array = jax.Array


class VPSBatch(NamedTuple):
    """One key+ref training pair at fixed shapes.

    img / ref_img: [B, H, W, 3] normalized images.
    gt / ref_gt:   PanopticGT at mask-assign-stride resolution.
    """

    img: Array
    ref_img: Array
    gt: PanopticGT
    ref_gt: PanopticGT


def make_synthetic_gt(cfg: KNetConfig, b: int, hw: tuple[int, int], seed: int = 0,
                      ids_offset: int = 0) -> PanopticGT:
    """Deterministic synthetic GT used by tests, dryruns, and benchmarks."""
    h, w = hw
    g, s = cfg.max_insts, cfg.num_stuff_classes
    rng = np.random.RandomState(seed)
    masks = np.zeros((b, g, h, w), np.float32)
    n_real = min(4, g)
    for i in range(n_real):
        y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
        masks[:, i, y0 : y0 + h // 3, x0 : x0 + w // 3] = 1.0
    labels = rng.randint(0, cfg.num_thing_classes, size=(b, g)).astype(np.int32)
    valid = np.zeros((b, g), bool)
    valid[:, :n_real] = True
    ids = np.where(valid, np.arange(g)[None] + ids_offset, -1).astype(np.int32)
    sem = np.zeros((b, s, h, w), np.float32)
    sem[:, 0] = 1.0 - masks.max(axis=1)
    sem_valid = np.zeros((b, s), bool)
    sem_valid[:, 0] = True
    return PanopticGT(
        masks=jnp.asarray(masks),
        labels=jnp.asarray(labels),
        valid=jnp.asarray(valid),
        instance_ids=jnp.asarray(ids),
        sem_masks=jnp.asarray(sem),
        sem_valid=jnp.asarray(sem_valid),
    )


def make_synthetic_batch(cfg: VideoKNetConfig, b: int, hw: tuple[int, int],
                         seed: int = 0) -> VPSBatch:
    h, w = hw
    s = cfg.mask_assign_stride
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    ref_img = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    gt = make_synthetic_gt(cfg, b, (h // s, w // s), seed=seed)
    ref_gt = make_synthetic_gt(cfg, b, (h // s, w // s), seed=seed + 1)
    return VPSBatch(img, ref_img, gt, ref_gt)


def _cast_pytree(tree, src, dst):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dst) if getattr(x, "dtype", None) == src else x, tree
    )


def make_vps_loss_fn(model: VideoKNet, cfg: VideoKNetConfig):
    """loss_fn(params, batch_stats, batch) -> (total, (loss_dict, new_batch_stats)).

    cfg.bf16_train: the forward (and hence backward) runs in bfloat16 — params
    are cast at use so the fp32 master copies and optimizer state stay exact;
    model outputs are cast back to fp32 before the losses, so all loss math,
    Hungarian costs, and reductions stay fp32.
    """

    if cfg.bf16_train and not cfg.norm_eval:
        raise ValueError(
            "bf16_train requires norm_eval=True (frozen BN stats): live BN "
            "stat updates would be accumulated in bfloat16"
        )

    def loss_fn(params, batch_stats, batch: VPSBatch, rng=None):
        # stochastic-regularization rngs (swin drop-path/dropout; flax Dropout
        # needs no rng at rate 0, so r50 configs run rng-less as before)
        rngs = None if rng is None else {"dropout": rng}
        if cfg.bf16_train:
            from video_knet_tpu.utils.precision import cast_variables

            # bf16 params AND batch stats for the forward (fp32 norm params
            # would silently promote everything downstream back to fp32);
            # fp32 masters are untouched and grads arrive fp32 through the cast
            variables = cast_variables(
                {"params": params, "batch_stats": batch_stats}
            )
            batch = batch._replace(
                img=batch.img.astype(jnp.bfloat16),
                ref_img=batch.ref_img.astype(jnp.bfloat16),
            )
        else:
            variables = {"params": params, "batch_stats": batch_stats}
        # roi_gt_box track embeddings are RoIAligned at GT-mask boxes, so the
        # forward needs the GT masks (knet_quansi_dense_roi_gt_box_joint_train.py)
        gt_args = (
            (batch.gt.masks, batch.ref_gt.masks)
            if cfg.track_head_type == "roi_gt_box"
            else ()
        )
        mutable = ["batch_stats"] if (model.train and not cfg.norm_eval) else False
        if mutable:
            (key, ref, key_emb, ref_emb), updates = model.apply(
                variables, batch.img, batch.ref_img, *gt_args,
                mutable=mutable, rngs=rngs,
            )
            new_bs = updates["batch_stats"]
        else:
            key, ref, key_emb, ref_emb = model.apply(
                variables, batch.img, batch.ref_img, *gt_args,
                mutable=False, rngs=rngs,
            )
            new_bs = batch_stats
        if cfg.bf16_train:
            key, ref, key_emb, ref_emb = _cast_pytree(
                (key, ref, key_emb, ref_emb), jnp.bfloat16, jnp.float32
            )
        losses = video_knet_loss(
            (key, ref), (key_emb, ref_emb), batch.gt, batch.ref_gt, cfg
        )
        total = sum(losses.values())
        return total, (losses, new_bs)

    return loss_fn


def make_sharded_train_step(model: VideoKNet, cfg: VideoKNetConfig,
                            tx: optax.GradientTransformation, mesh: Mesh):
    """Jitted SPMD train step over `mesh`.

    Parallelism scheme (SURVEY.md §2.10 / §5.7): the batch axis shards over the
    `data` mesh axis (the reference's DDP, with XLA inserting the gradient
    all-reduce over ICI); when the mesh has a non-trivial `model` axis, image /
    GT spatial height additionally shards over it (spatial partitioning — XLA
    adds the conv halo exchanges), the TPU analogue of context parallelism for
    high-res frames. State is replicated."""
    loss_fn = make_vps_loss_fn(model, cfg)
    spatial = "model" in mesh.axis_names and mesh.shape["model"] > 1
    # swin configs use stochastic depth/dropout: derive a per-step rng from
    # the step counter (deterministic training, SURVEY.md §5.2)
    stochastic = getattr(cfg, "backbone_drop_path_rate", 0.0) > 0.0
    base_rng = jax.random.PRNGKey(0)

    def constrain(batch: VPSBatch) -> VPSBatch:
        if not spatial:
            return batch
        img_s = NamedSharding(mesh, P("data", "model"))
        mask_s = NamedSharding(mesh, P("data", None, "model"))
        c = jax.lax.with_sharding_constraint
        gt = batch.gt._replace(
            masks=c(batch.gt.masks, mask_s), sem_masks=c(batch.gt.sem_masks, mask_s)
        )
        ref_gt = batch.ref_gt._replace(
            masks=c(batch.ref_gt.masks, mask_s),
            sem_masks=c(batch.ref_gt.sem_masks, mask_s),
        )
        return VPSBatch(
            c(batch.img, img_s), c(batch.ref_img, img_s), gt, ref_gt
        )

    def train_step(state: TrainState, batch: VPSBatch):
        batch = constrain(batch)
        rng = jax.random.fold_in(base_rng, state.step) if stochastic else None
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (loss_dict, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        loss_dict = dict(loss_dict)
        loss_dict["total_loss"] = total
        return TrainState(state.step + 1, new_params, new_bs, new_opt), loss_dict

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    # every leaf of the batch is sharded on its leading (batch) axis
    gt_sh = PanopticGT(data, data, data, data, data, data)
    batch_sh = VPSBatch(data, data, gt_sh, gt_sh)
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
