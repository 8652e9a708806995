"""Pallas fused mask ops vs the reference jnp implementations (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_knet_tpu.ops.mask_pool import mask_pool
from video_knet_tpu.ops.pallas.mask_ops import fused_assemble_sigmoid, fused_mask_pool


def test_fused_mask_pool_matches_reference():
    rng = np.random.RandomState(0)
    masks = jnp.asarray(rng.randn(2, 12, 16, 24).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 16, 24, 64).astype(np.float32))
    ref = mask_pool(masks, feats, hard_thr=0.5, binary=True)
    out = fused_mask_pool(masks, feats, hard_thr=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_assemble_matches_reference():
    rng = np.random.RandomState(1)
    kernels = jnp.asarray(rng.randn(2, 12, 64).astype(np.float32) * 0.1)
    feats = jnp.asarray(rng.randn(2, 16, 24, 64).astype(np.float32))
    ref = jax.nn.sigmoid(jnp.einsum("bnc,bhwc->bnhw", kernels, feats))
    out = fused_assemble_sigmoid(kernels, feats, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
