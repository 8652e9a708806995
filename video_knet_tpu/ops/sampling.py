"""Bilinear sampling ops: RoIAlign and multi-scale deformable attention core.

TPU-native replacements for the two CUDA ops the reference consumes from mmcv
(SURVEY.md §2.9): RoIAlign (track_heads.py:200 and the ROI-GT-box ablation
detectors) and MultiScaleDeformableAttention (knet/det/msdeformattn_decoder.py:14).
Both reduce to gather-based bilinear interpolation, expressed with static shapes
so XLA vectorizes the gathers; no scatter, no dynamic control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bilinear_sample(feat: Array, ys: Array, xs: Array) -> Array:
    """Sample feat [H, W, C] at float pixel coords ys/xs [...], zero padding
    outside. Returns [..., C]."""
    h, w, c = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        v = feat[yc, xc]
        return v * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def roi_align(
    feat: Array,
    rois: Array,
    *,
    out_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
    aligned: bool = True,
) -> Array:
    """RoIAlign over one image. feat: [H, W, C]; rois: [R, 4] xyxy (image coords).

    Matches mmcv RoIAlign(aligned=True) semantics: each output bin averages
    sampling_ratio^2 bilinear samples at regular sub-bin positions. Returns
    [R, out_size, out_size, C]. vmap over the batch for [B, ...] inputs.
    """
    offset = 0.5 if aligned else 0.0
    boxes = rois * spatial_scale - offset  # [R, 4]
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bh = jnp.maximum(y1 - y0, 1e-6)[:, None, None, None]
    bw = jnp.maximum(x1 - x0, 1e-6)[:, None, None, None]

    s = sampling_ratio
    # sub-sample grid positions within each bin: (bin + (k + 0.5)/s) / out_size
    bin_idx = jnp.arange(out_size, dtype=jnp.float32)
    sub_idx = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    grid = (bin_idx[:, None] + sub_idx[None, :]) / out_size  # [out, s]
    gy = grid.reshape(1, out_size, s, 1, 1)
    gx = grid.reshape(1, 1, 1, out_size, s)
    ys = y0[:, None, None, None, None] + bh[..., None] * gy
    xs = x0[:, None, None, None, None] + bw[..., None] * gx
    ys = jnp.broadcast_to(ys, (rois.shape[0], out_size, s, out_size, s))
    xs = jnp.broadcast_to(xs, (rois.shape[0], out_size, s, out_size, s))
    # torchvision/mmcv boundary semantics (bilinear_interpolate in the
    # roi_align kernel): a sample outside [-1, H]x[-1, W] contributes 0, but
    # one inside the window is CLAMPED to the map edges (full border-pixel
    # value) rather than zero-padded — do the same here.
    h, w, _ = feat.shape
    valid = (ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w)
    ysc = jnp.clip(ys, 0.0, h - 1.0)
    xsc = jnp.clip(xs, 0.0, w - 1.0)
    samples = bilinear_sample(feat, ysc, xsc)  # [R, out, s, out, s, C]
    samples = samples * valid[..., None]
    return samples.mean(axis=(2, 4))


def ms_deform_attn_core(
    value_levels: list[Array],
    sampling_locations: Array,
    attention_weights: Array,
) -> Array:
    """Multi-scale deformable attention sampling.

    value_levels: list of L tensors [B, H_l, W_l, M, D] (per-head split values).
    sampling_locations: [B, Q, M, L, P, 2] normalized (x, y) in [0, 1].
    attention_weights: [B, Q, M, L, P] (softmaxed over L*P).
    Returns [B, Q, M*D].
    """
    b, q, m, l, p, _ = sampling_locations.shape
    outs = []
    for li, v in enumerate(value_levels):
        h, w = v.shape[1:3]
        loc = sampling_locations[:, :, :, li]  # [B, Q, M, P, 2]
        xs = loc[..., 0] * w - 0.5
        ys = loc[..., 1] * h - 0.5

        # sample per (batch, head) feature plane
        vm = jnp.moveaxis(v, 3, 1)  # [B, M, H, W, D]
        ysm = jnp.moveaxis(ys, 2, 1)  # [B, M, Q, P]
        xsm = jnp.moveaxis(xs, 2, 1)
        sampled = jax.vmap(jax.vmap(bilinear_sample))(vm, ysm, xsm)  # [B, M, Q, P, D]
        outs.append(jnp.moveaxis(sampled, 1, 2))  # [B, Q, M, P, D]
    stacked = jnp.stack(outs, axis=3)  # [B, Q, M, L, P, D]
    out = jnp.einsum("bqmlpd,bqmlp->bqmd", stacked, attention_weights)
    return out.reshape(b, q, -1)
