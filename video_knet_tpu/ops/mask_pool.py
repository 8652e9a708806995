"""Mask-pooled feature gathering (the K-Net "group feature" op).

Reference: knet/det/kernel_update_head.py:190-195 — hard-threshold sigmoid masks then
einsum('bnhw,bchw->bnc', masks, feats). TPU-native version works on NHWC features and
maps to a single MXU matmul per image: [N, HW] x [HW, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def mask_pool(
    mask_logits: Array,
    feats: Array,
    *,
    hard_thr: float = 0.5,
    binary: bool = True,
) -> Array:
    """Pool features under (thresholded) sigmoid masks.

    mask_logits: [B, N, H, W] mask logits.
    feats:       [B, H, W, C] features (NHWC).
    Returns      [B, N, C].

    binary=True reproduces the reference's hard threshold (sigmoid > thr -> 1.0);
    binary=False uses soft * hard gating (kernel_head.py:242-247 use_binary=False).
    """
    s = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    hard = (s > hard_thr).astype(feats.dtype)
    m = hard if binary else hard * s.astype(feats.dtype)
    return jnp.einsum("bnhw,bhwc->bnc", m, feats)
