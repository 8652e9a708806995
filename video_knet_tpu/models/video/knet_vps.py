"""Video K-Net for VPS: joint-trained detector + kernel linking + kernel-association
embedding (the model of the KITTI-STEP / VIP-Seg release configs).

Rebuild of VideoKNetQuansiEmbedFCJointTrain
(knet/video/knet_quansi_dense_embed_fc_joint_train.py) and VideoKernelIterHead /
VideoKernelUpdateHead (knet/video/kernel_iter_head.py, kernel_update_head.py):

train: key frame + one reference frame run the full K-Net with shared weights; the
key branch cross-attends its final-stage kernels with the ref branch's final kernels
("kernel linking", last stage only); final kernels of both branches are embedded by
embed_fcs -> fc_embed -> track MLP and supervised with MultiPosCE + L2 on
instance-id match targets.

test (online, stateful): per frame, carrying (prev obj_feats, prev x_feats,
prev scaled masks) as an explicit pytree; linking is *always* computed (against
zeros on the first frame) so one jitted graph serves every frame, and first-frame
semantics are restored by selecting unlinked kernels when `is_first`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.config import VideoKNetConfig
from video_knet_tpu.models.kernel_head import ConvKernelHead, RPNOutputs
from video_knet_tpu.models.kernel_iter_head import StageOutput, upscale_masks
from video_knet_tpu.models.kernel_update_head import KernelUpdateHead
from video_knet_tpu.models.knet import (
    PanopticPrediction,
    iter_head_losses,
    panoptic_decode,
    panoptic_decode_batch,
    rpn_loss,
)
from video_knet_tpu.models.resnet import FPN
from video_knet_tpu.ops import losses as L
import video_knet_tpu.ops.hungarian as hung
from video_knet_tpu.ops.targets import PanopticGT

Array = jax.Array


class BranchOutput(NamedTuple):
    rpn_out: RPNOutputs
    stage_outs: list[StageOutput]
    obj_feats_track: Array | None  # [B, N_tot, K*K, C] linked kernels (key branch)


class TrackEmbed(nn.Module):
    """embed_fcs (Linear no-bias -> LN -> ReLU) + fc_embed, then the track-head MLP
    (QuasiDenseMaskEmbedHeadGTMask with num_convs=0: num_fcs x Linear-ReLU ->
    fc_embed; num_fcs=2 release, 1 in the swin-l short_track_fc config).
    joint_train.py:114-126 + track_heads.py:634-642."""

    channels: int = 256
    num_fcs: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [..., C] kernel vectors
        y = nn.Dense(self.channels, use_bias=False, name="embed_fc0")(x)
        y = nn.LayerNorm(epsilon=1e-5, name="embed_ln0")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, name="fc_embed")(y)
        # track head MLP
        for i in range(self.num_fcs):
            y = nn.relu(nn.Dense(self.channels, name=f"track_fc{i}")(y))
        return nn.Dense(self.channels, name="track_fc_embed")(y)


class QueryTrackEmbed(nn.Module):
    """QueryTrackHead's per-kernel MLP (knet/video/track_heads.py:16-97, the
    VideoKNetFuseTrack ablation): num_fcs=2 -> Linear(C)+ReLU, Linear(1024).
    The correlation/match-score against the reference kernels is parameter-free
    and lives in the loss (`_query_match_loss_one`) / tracker."""

    channels: int = 256
    out_channels: int = 1024

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.relu(nn.Dense(self.channels, name="fc0")(x))
        return nn.Dense(self.out_channels, name="fc1")(y)


class VideoKNet(nn.Module):
    cfg: VideoKNetConfig
    train: bool = False

    def setup(self):
        cfg = self.cfg
        from video_knet_tpu.models.backbones import build_backbone, build_neck

        self.backbone = build_backbone(
            cfg.backbone,
            frozen_stages=cfg.frozen_stages,
            norm_eval=cfg.norm_eval,
            train=self.train,
            drop_path_rate=cfg.backbone_drop_path_rate,
            module_name=None,
        )
        self.neck = build_neck(
            getattr(cfg, "neck_type", "fpn"), cfg.backbone, name=None
        )
        self.rpn_head = ConvKernelHead(cfg.rpn)
        self.heads = [
            KernelUpdateHead(
                cfg.head,
                with_previous=(cfg.link_previous and s == cfg.num_stages - 1),
                previous_type=cfg.previous_type,
                previous_link=cfg.previous_link,
                name=f"mask_head_{s}",
            )
            for s in range(cfg.num_stages)
        ]
        if cfg.track_head_type == "query_fuse":
            self.track_embed = QueryTrackEmbed(
                cfg.track.in_channels, cfg.track.query_fc_out_channels
            )
        elif cfg.track_head_type == "roi_gt_box":
            from video_knet_tpu.models.video.roi_track_head import ROITrackHead

            self.roi_track_head = ROITrackHead(cfg.track.embed_channels)
            self.track_embed = None
        else:
            self.track_embed = TrackEmbed(
                cfg.track.embed_channels, num_fcs=cfg.track.num_fcs
            )

    def extract_feat(self, img: Array) -> Array:
        feats = self.backbone(img)
        return feats if self.neck is None else self.neck(feats)

    def _stages(
        self, rpn_out, previous_obj_feats: Array | None
    ) -> tuple[list, Array | None]:
        """The iterative kernel-update stages on one branch's RPN outputs."""
        cfg = self.cfg
        outs = []
        object_feats = rpn_out.proposal_feats
        mask_preds = rpn_out.mask_preds
        obj_track = None
        for s, head in enumerate(self.heads):
            prev = previous_obj_feats if s == cfg.num_stages - 1 else None
            cls_score, mask_preds, object_feats, track = head(
                rpn_out.x_feats, object_feats, mask_preds, previous_obj_feats=prev
            )
            scaled = upscale_masks(mask_preds, cfg.head.mask_upsample_stride)
            outs.append(StageOutput(cls_score, mask_preds, scaled, object_feats))
            if track is not None:
                obj_track = track
        return outs, obj_track

    def run_branch(
        self, img: Array, previous_obj_feats: Array | None = None
    ) -> BranchOutput:
        """Full K-Net on one frame; linking at the last stage when previous given."""
        fpn = self.extract_feat(img)
        rpn_out = self.rpn_head(fpn)
        outs, obj_track = self._stages(rpn_out, previous_obj_feats)
        return BranchOutput(rpn_out, outs, obj_track)

    def __call__(
        self,
        img: Array,
        ref_img: Array,
        gt_masks: Array | None = None,
        ref_gt_masks: Array | None = None,
    ) -> tuple[BranchOutput, BranchOutput, Array, Array]:
        """Joint train forward: ref branch plain, key branch linked to ref kernels.

        Returns (key, ref, key_embeds, ref_embeds); embeddings are computed for all
        proposals (the loss gathers the assigned ones, joint_train.py:426-452).
        With track_head_type='roi_gt_box' the embeddings are instead RoIAligned
        at GT-mask boxes and are GT-slot aligned [B, G, D]
        (knet_quansi_dense_roi_gt_box_joint_train.py:390-431) — `gt_masks` /
        `ref_gt_masks` [B, G, h, w] are required then.
        """
        # ONE batched backbone+neck+RPN pass over [ref; key]: identical math to
        # two per-branch passes (BN runs norm_eval/frozen in release configs),
        # but the backbone sees an effective batch of 2B (better MXU
        # utilization at b=1) and the traced program carries ONE backbone
        # graph instead of two — which also keeps the serialized HLO small
        # enough for the remote-compile transport on big backbones.
        b = img.shape[0]
        both = jnp.concatenate([ref_img, img], axis=0)
        rpn_both = self.rpn_head(self.extract_feat(both))

        def rpn_half(sl: slice) -> RPNOutputs:
            return RPNOutputs(
                proposal_feats=rpn_both.proposal_feats[sl],
                x_feats=rpn_both.x_feats[sl],
                mask_preds=rpn_both.mask_preds[sl],
                seg_preds=rpn_both.seg_preds[sl],
                thing_mask_preds=rpn_both.thing_mask_preds[sl],
                init_kernels=rpn_both.init_kernels,  # unbatched learned kernels
            )

        rpn_ref, rpn_key = rpn_half(slice(0, b)), rpn_half(slice(b, None))
        ref_outs, ref_track = self._stages(rpn_ref, None)
        ref = BranchOutput(rpn_ref, ref_outs, ref_track)
        # previous_detach defaults to False (kernel_update_head.py:53): gradients
        # flow through the ref-branch kernels into the linking attention.
        prev_obj = ref.stage_outs[-1].object_feats
        key_outs, key_track = self._stages(
            rpn_key, prev_obj if self.cfg.link_previous else None
        )
        key = BranchOutput(rpn_key, key_outs, key_track)
        n = self.cfg.num_proposals
        if self.cfg.track_head_type == "roi_gt_box":
            if gt_masks is None:  # init/shape-inference path
                s = self.cfg.mask_assign_stride
                gt_masks = jnp.zeros(
                    (img.shape[0], self.cfg.max_insts,
                     img.shape[1] // s, img.shape[2] // s), jnp.float32,
                )
                ref_gt_masks = gt_masks
            key_embeds = self._roi_embed(key.rpn_out.x_feats, gt_masks)
            ref_embeds = self._roi_embed(ref.rpn_out.x_feats, ref_gt_masks)
            return key, ref, key_embeds, ref_embeds
        key_src = key.obj_feats_track if key.obj_feats_track is not None else key.stage_outs[-1].object_feats
        key_embeds = self.embed(key_src[:, :n])
        ref_embeds = self.embed(ref.stage_outs[-1].object_feats[:, :n])
        return key, ref, key_embeds, ref_embeds

    def _roi_embed(self, x_feats: Array, masks: Array) -> Array:
        """RoIAlign track embeddings at mask-derived boxes.

        masks: [B, M, h, w] (GT slots at train time; sigmoid mask probs at test
        time). Boxes are in mask pixel coords; spatial_scale rescales to x_feats.
        """
        from video_knet_tpu.models.video.roi_track_head import masks_to_boxes_jax

        boxes = jax.vmap(masks_to_boxes_jax)(masks)
        scale = x_feats.shape[2] / masks.shape[-1]
        return self.roi_track_head(x_feats, boxes, scale)

    def embed(self, kernels: Array) -> Array:
        """Track embeddings from kernel vectors [..., K*K, C] (uses tap 0 = K=1)."""
        return self.track_embed(kernels[..., 0, :])

    def test_step(
        self,
        img: Array,
        prev_obj_feats: Array,
        is_first: Array,
    ) -> dict[str, Any]:
        """One online inference step (stateless module; caller carries memory).

        Always runs the linking branch (prev_obj_feats = zeros on first frame);
        `is_first` selects unlinked kernels for tracking, matching
        kernel_iter_head.py:479-480. `is_first` may be a scalar or a [B]
        per-stream vector (multi-stream serving: each stream resets
        independently; first-frame rows also zero their carried kernels).
        """
        cfg = self.cfg
        isf = jnp.asarray(is_first)
        if isf.ndim == 1:
            isf = isf[:, None, None, None]
            prev_obj_feats = jnp.where(
                isf, jnp.zeros_like(prev_obj_feats), prev_obj_feats
            )
        key = self.run_branch(img, prev_obj_feats if cfg.link_previous else None)
        last = key.stage_outs[-1]
        track_src = last.object_feats if key.obj_feats_track is None else jnp.where(
            isf, last.object_feats, key.obj_feats_track
        )
        if cfg.track_head_type == "roi_gt_box":
            # test-time ROI embeddings at predicted-mask boxes
            # (knet_quansi_dense_roi_gt_box_joint_train.py:584)
            probs = jax.nn.sigmoid(
                last.scaled_mask_preds[:, : cfg.num_proposals].astype(jnp.float32)
            )
            embeds = self._roi_embed(key.rpn_out.x_feats, probs)
        else:
            embeds = self.embed(track_src[:, : cfg.num_proposals])  # [B, N, D]
        return dict(
            rpn_out=key.rpn_out,
            stage_outs=key.stage_outs,
            track_obj_feats=track_src,
            track_embeds=embeds,
            new_obj_feats=last.object_feats,
        )


def _track_loss_one(
    key_emb: Array,  # [G, D] embeddings gathered at key GT slots
    ref_emb: Array,  # [G, D]
    key_valid: Array,  # [G] matched-and-valid
    ref_valid: Array,  # [G]
    key_ids: Array,  # [G] instance ids
    ref_ids: Array,  # [G]
    *,
    loss_track_weight: float,
    aux_weight: float,
    aux_neg_pos_ub: int,
    aux_neg_margin: float,
) -> tuple[Array, Array]:
    """Per-image MultiPosCE + L2-aux on GT-slot-aligned embeddings.

    Works in GT-slot space instead of the reference's gathered positive lists
    (track_heads.py:644-702): rows/cols are GT slots; invalid pairs get target -1.
    """
    pair_valid = key_valid[:, None] & ref_valid[None, :]
    same = (key_ids[:, None] == ref_ids[None, :]) & pair_valid
    targets = jnp.where(pair_valid, same.astype(jnp.int32), -1)
    weights = (jnp.sum(same, axis=1) > 0).astype(jnp.float32)

    dists = key_emb @ ref_emb.T
    loss_track = L.multi_pos_cross_entropy(
        dists, targets, weights,
        loss_weight=loss_track_weight, avg_factor=jnp.sum(weights),
    )
    loss_track = jnp.where(jnp.sum(weights) > 0, loss_track, 0.0)

    key_n = key_emb / jnp.maximum(jnp.linalg.norm(key_emb, axis=-1, keepdims=True), 1e-12)
    ref_n = ref_emb / jnp.maximum(jnp.linalg.norm(ref_emb, axis=-1, keepdims=True), 1e-12)
    cos = key_n @ ref_n.T
    loss_aux = L.l2_track_aux_loss(
        cos, targets,
        neg_pos_ub=aux_neg_pos_ub, neg_margin=aux_neg_margin, loss_weight=aux_weight,
    )
    loss_aux = jnp.where(jnp.any(pair_valid), loss_aux, 0.0)
    return loss_track, loss_aux


def _query_match_loss_one(
    key_emb_g: Array,  # [G, D] query embeddings gathered at key GT slots
    ref_emb_g: Array,  # [G, D]
    key_valid: Array,  # [G]
    ref_valid: Array,  # [G]
    key_ids: Array,  # [G]
    ref_ids: Array,  # [G]
    *,
    loss_weight: float,
) -> Array:
    """QueryTrackHead match-score CE (track_heads.py:78-137 + FuseTrack's
    track_head.loss): correlation of key vs ref embeddings with a leading
    all-zero "new object" column; target = matching ref slot + 1, or 0."""
    score = key_emb_g @ ref_emb_g.T  # [G, G]
    score = jnp.where(ref_valid[None, :], score, -1e9)
    score = jnp.concatenate(
        [jnp.zeros((score.shape[0], 1), score.dtype), score], axis=1
    )  # [G, 1+G]
    same = (key_ids[:, None] == ref_ids[None, :]) & ref_valid[None, :]
    target = jnp.where(jnp.any(same, axis=1), jnp.argmax(same, axis=1) + 1, 0)
    logp = jax.nn.log_softmax(score, axis=1)
    ce = -jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    w = key_valid.astype(jnp.float32)
    return loss_weight * jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def video_knet_loss(
    model_out: tuple[BranchOutput, BranchOutput],
    embeds: tuple[Array, Array],
    gt: PanopticGT,
    ref_gt: PanopticGT,
    cfg: VideoKNetConfig,
) -> dict[str, Array]:
    """All VPS losses: key rpn/iter, ref rpn/iter (suffix _ref), tracking.

    joint_train.py:341-468. `embeds` are (key_embeds, ref_embeds) [B, N, D]
    computed by VideoKNet.embed on (obj_feats_track, ref final obj_feats).
    """
    from video_knet_tpu.models.knet import branch_assignment_costs, solve_assignments

    key, ref = model_out
    n_prop = cfg.num_proposals
    key_last, ref_last = key.stage_outs[-1], ref.stage_outs[-1]

    def track_cost(branch_last: StageOutput, branch_gt: PanopticGT) -> Array:
        masks = jax.lax.stop_gradient(branch_last.scaled_mask_preds[:, :n_prop])
        cls = jax.lax.stop_gradient(
            branch_last.cls_score[:, :n_prop, : cfg.num_thing_classes]
        )
        return jax.vmap(
            lambda m, c, gm, gl: hung.hungarian_cost_matrix(
                m, gm, c, gl,
                cls_weight=cfg.assigner.cls_weight,
                dice_weight=cfg.assigner.dice_weight,
                mask_weight=cfg.assigner.mask_weight,
            )
        )(masks, cls, branch_gt.masks, branch_gt.labels)

    # ALL assignment problems of the step (key rpn+stages, ref rpn+stages, and
    # the two tracking assigns on the final outputs, joint_train.py:406-423) are
    # solved by ONE vmapped Hungarian — the lanes run lockstep instead of
    # serializing ~10 while-loops on the TPU scalar core.
    key_costs = branch_assignment_costs(key.rpn_out, key.stage_outs, gt, cfg)
    ref_costs = branch_assignment_costs(ref.rpn_out, ref.stage_outs, ref_gt, cfg)
    nk = len(key_costs)
    all_costs = key_costs + [track_cost(key_last, gt)] + ref_costs + [
        track_cost(ref_last, ref_gt)
    ]
    # gt.valid and ref_gt.valid can differ per lane: stack lane-wise
    l = len(all_costs)
    b = all_costs[0].shape[0]
    stacked = jnp.concatenate([c for c in all_costs], axis=0)
    valids = jnp.concatenate(
        [gt.valid] * (nk + 1) + [ref_gt.valid] * (nk + 1), axis=0
    )
    g2p, p2g = jax.vmap(hung.pad_and_solve)(stacked, valids)
    g2p = [g2p[i * b : (i + 1) * b] for i in range(l)]
    p2g = [p2g[i * b : (i + 1) * b] for i in range(l)]
    key_assigns, key_track_p2g = g2p[:nk], p2g[nk]
    ref_assigns, ref_track_p2g = g2p[nk + 1 : 2 * nk + 1], p2g[2 * nk + 1]

    losses = rpn_loss(key.rpn_out, gt, cfg, gt_of_pred=key_assigns[0])
    iter_losses, _ = iter_head_losses(
        key.rpn_out, key.stage_outs, gt, cfg, assignments=key_assigns[1:]
    )
    losses.update(iter_losses)
    ref_losses = rpn_loss(ref.rpn_out, ref_gt, cfg, gt_of_pred=ref_assigns[0])
    losses.update({f"{k}_ref_rpn": v for k, v in ref_losses.items()})
    ref_iter, _ = iter_head_losses(
        ref.rpn_out, ref.stage_outs, ref_gt, cfg, assignments=ref_assigns[1:]
    )
    losses.update({f"{k}_ref": v for k, v in ref_iter.items()})

    key_pred_of_gt = key_track_p2g  # [B, G]
    ref_pred_of_gt = ref_track_p2g

    key_emb, ref_emb = embeds  # [B, N, D] ([B, G, D] GT-slot aligned for roi_gt_box)

    t = cfg.track
    if cfg.track_head_type == "roi_gt_box":
        # GT-box mode: embeddings are already GT-slot aligned; no Hungarian gather
        from video_knet_tpu.models.video.roi_track_head import roi_track_loss

        losses.update(
            roi_track_loss(
                key_emb, ref_emb, gt.valid, ref_gt.valid,
                gt.instance_ids, ref_gt.instance_ids,
                loss_track_weight=t.loss_track_weight,
                aux_weight=t.loss_track_aux_weight,
            )
        )
        return losses

    def gather(emb, pred_of_gt):
        safe = jnp.maximum(pred_of_gt, 0)
        return jnp.take_along_axis(emb, safe[..., None], axis=1)

    key_emb_g = gather(key_emb, key_pred_of_gt)
    ref_emb_g = gather(ref_emb, ref_pred_of_gt)
    key_valid = (key_pred_of_gt >= 0) & gt.valid
    ref_valid = (ref_pred_of_gt >= 0) & ref_gt.valid

    if cfg.track_head_type == "query_fuse":
        loss_match = jax.vmap(
            lambda a, b, c_, d, e, f: _query_match_loss_one(
                a, b, c_, d, e, f, loss_weight=t.match_loss_weight
            )
        )(key_emb_g, ref_emb_g, key_valid, ref_valid,
          gt.instance_ids, ref_gt.instance_ids)
        losses["loss_match"] = jnp.mean(loss_match)
        return losses
    loss_track, loss_aux = jax.vmap(
        lambda a, b, c_, d, e, f: _track_loss_one(
            a, b, c_, d, e, f,
            loss_track_weight=t.loss_track_weight,
            aux_weight=t.loss_track_aux_weight,
            aux_neg_pos_ub=t.aux_neg_pos_ub,
            aux_neg_margin=t.aux_neg_margin,
        )
    )(key_emb_g, ref_emb_g, key_valid, ref_valid, gt.instance_ids, ref_gt.instance_ids)
    losses["loss_track"] = jnp.mean(loss_track)
    losses["loss_track_aux"] = jnp.mean(loss_aux)
    return losses


def vps_decode(
    rpn_out: RPNOutputs,
    stage_outs: list[StageOutput],
    track_obj_feats: Array,
    cfg: VideoKNetConfig,
    out_hw: tuple[int, int],
    batched: bool = False,
) -> PanopticPrediction:
    """Panoptic decode using the *linked* kernels for the thing-track handles.

    batched=True vmaps the decode over the batch axis (multi-stream online
    inference: one device step serves B independent video streams)."""
    last = stage_outs[-1]
    patched = [*stage_outs[:-1], StageOutput(
        last.cls_score, last.mask_preds, last.scaled_mask_preds, track_obj_feats
    )]
    fn = panoptic_decode_batch if batched else panoptic_decode
    return fn(rpn_out, patched, cfg, out_hw=out_hw)
