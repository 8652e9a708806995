"""Mask-pooled feature gathering (the K-Net "group feature" op).

Reference: knet/det/kernel_update_head.py:190-195 — hard-threshold sigmoid masks then
einsum('bnhw,bchw->bnc', masks, feats). TPU-native version works on NHWC features and
maps to a single MXU matmul per image: [N, HW] x [HW, C].

An optional Pallas fused kernel (`ops/pallas/mask_ops.py:fused_mask_pool`) keeps
the binarized [N, HW] mask in VMEM; enable with `set_pallas_enabled(True)` or
env VKNET_PALLAS=1. Measured on the real chip it ties XLA's own fusion (see
PARITY.md "Pallas"), so the jnp path is the default.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array

_PALLAS_ENABLED = os.environ.get("VKNET_PALLAS", "0") == "1"


def set_pallas_enabled(on: bool) -> None:
    """Toggle the Pallas fused mask-pool path.

    WARNING: the flag is read at TRACE time and jit caches are NOT keyed on
    it — any function already jit-compiled (e.g. an existing make_frame_step)
    silently keeps the path it was traced with. Toggle BEFORE building/jitting
    step functions, or rebuild them (new jit wrapper) after toggling."""
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = on


def pallas_enabled() -> bool:
    return _PALLAS_ENABLED and jax.default_backend() not in ("cpu",)


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
    if binary and pallas_enabled():
        from video_knet_tpu.ops.pallas.mask_ops import fused_mask_pool

        return fused_mask_pool(mask_logits, feats, hard_thr=hard_thr).astype(
            feats.dtype
        )
    s = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
    hard = (s > hard_thr).astype(feats.dtype)
    m = hard if binary else hard * s.astype(feats.dtype)
    return jnp.einsum("bnhw,bhwc->bnc", m, feats)
