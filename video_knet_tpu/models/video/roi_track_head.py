"""ROI-align track embedding head (the ROI/GT-box ablation family).

Rebuild of TrackHeadWithROIAlign (knet/video/track_heads.py:182) as used by the
VideoKNetQuansiTrackROIGTBox{,JointTrain} ablation detectors
(knet/video/knet_quansi_dense_roi_gt_box*.py:48): instead of embedding the
refined kernel vectors, appearance features are RoIAligned from the fused
feature map at (GT or mask-derived) boxes, passed through conv+fc stacks and an
fc_embed. The mmcv RoIAlign CUDA op becomes ops.sampling.roi_align.

`roi_track_loss` wires it into the same MultiPosCE + L2 supervision as the
kernel-embedding path, with GT-slot-aligned boxes (one box per GT slot, the
"GT-box" mode) so no Hungarian gather is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from video_knet_tpu.ops.sampling import roi_align

Array = jax.Array


def masks_to_boxes_jax(masks: Array) -> Array:
    """[G, H, W] float masks -> [G, 4] xyxy boxes (zeros for empty masks)."""
    occ = masks > 0.5
    any_y = jnp.any(occ, axis=2)  # [G, H]
    any_x = jnp.any(occ, axis=1)  # [G, W]
    h, w = masks.shape[1:]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    big = 1e9
    y0 = jnp.min(jnp.where(any_y, ys[None], big), axis=1)
    y1 = jnp.max(jnp.where(any_y, ys[None], -big), axis=1) + 1
    x0 = jnp.min(jnp.where(any_x, xs[None], big), axis=1)
    x1 = jnp.max(jnp.where(any_x, xs[None], -big), axis=1) + 1
    empty = ~jnp.any(occ, axis=(1, 2))
    boxes = jnp.stack([x0, y0, x1, y1], axis=1)
    return jnp.where(empty[:, None], 0.0, boxes)


class ROITrackHead(nn.Module):
    """RoIAlign(7x7) -> num_convs x (3x3 conv+GN+ReLU) -> flatten -> num_fcs x
    (fc+ReLU) -> fc_embed."""

    embed_channels: int = 256
    num_convs: int = 4
    num_fcs: int = 1
    roi_size: int = 7

    @nn.compact
    def __call__(self, feats: Array, boxes: Array, spatial_scale: float) -> Array:
        """feats: [B, H, W, C]; boxes: [B, G, 4] xyxy in input-image coords.
        Returns [B, G, D]."""
        rois = jax.vmap(
            lambda f, b: roi_align(
                f, b, out_size=self.roi_size, spatial_scale=spatial_scale
            )
        )(feats, boxes)  # [B, G, 7, 7, C]
        y = rois
        for i in range(self.num_convs):
            y = nn.Conv(self.embed_channels, (3, 3), padding="SAME",
                        name=f"conv{i}")(y)
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"gn{i}")(y)
            y = nn.relu(y)
        y = y.mean(axis=(2, 3))  # [B, G, C]
        for i in range(self.num_fcs):
            y = nn.relu(nn.Dense(self.embed_channels, name=f"fc{i}")(y))
        return nn.Dense(self.embed_channels, name="fc_embed")(y)


def roi_track_loss(
    key_embeds: Array,  # [B, G, D] (GT-slot aligned)
    ref_embeds: Array,  # [B, G, D]
    key_valid: Array,  # [B, G]
    ref_valid: Array,  # [B, G]
    key_ids: Array,  # [B, G]
    ref_ids: Array,  # [B, G]
    *,
    loss_track_weight: float = 0.25,
    aux_weight: float = 1.0,
) -> dict[str, Array]:
    from video_knet_tpu.models.video.knet_vps import _track_loss_one

    loss_track, loss_aux = jax.vmap(
        lambda a, b, c, d, e, f: _track_loss_one(
            a, b, c, d, e, f,
            loss_track_weight=loss_track_weight,
            aux_weight=aux_weight,
            aux_neg_pos_ub=3,
            aux_neg_margin=0.1,
        )
    )(key_embeds, ref_embeds, key_valid, ref_valid, key_ids, ref_ids)
    return {
        "loss_track_roi": jnp.mean(loss_track),
        "loss_track_roi_aux": jnp.mean(loss_aux),
    }
