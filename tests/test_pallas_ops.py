"""Pallas fused mask ops vs the reference jnp implementations.

Interpret-mode tests always run; the compiled-TPU tests need a real chip —
run them with `VKNET_TPU_TESTS=1 python -m pytest tests/test_pallas_ops.py`
(conftest then leaves the axon TPU backend selected).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_knet_tpu.ops.mask_pool import mask_pool, set_pallas_enabled
from video_knet_tpu.ops.pallas.mask_ops import fused_assemble_sigmoid, fused_mask_pool

needs_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="compiled Pallas path needs a TPU"
)


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


@needs_tpu
def test_fused_mask_pool_compiled_tpu():
    """Non-interpret (compiled) kernel at the K-Net release shape."""
    rng = np.random.RandomState(2)
    masks = jnp.asarray(rng.randn(1, 117, 48, 156).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 48, 156, 256).astype(np.float32))
    ref = mask_pool(masks, feats, hard_thr=0.5, binary=True)
    out = fused_mask_pool(masks, feats, hard_thr=0.5, interpret=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=3e-4)


@needs_tpu
def test_fused_assemble_compiled_tpu():
    rng = np.random.RandomState(3)
    kernels = jnp.asarray(rng.randn(1, 117, 256).astype(np.float32) * 0.1)
    feats = jnp.asarray(rng.randn(1, 48, 156, 256).astype(np.float32))
    ref = jax.nn.sigmoid(jnp.einsum("bnc,bhwc->bnhw", kernels, feats))
    out = fused_assemble_sigmoid(kernels, feats, interpret=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


@needs_tpu
def test_mask_pool_flag_dispatch_tpu():
    """set_pallas_enabled(True) routes mask_pool through the compiled kernel."""
    rng = np.random.RandomState(4)
    masks = jnp.asarray(rng.randn(2, 16, 32, 48).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 32, 48, 64).astype(np.float32))
    ref = mask_pool(masks, feats, hard_thr=0.5, binary=True)
    set_pallas_enabled(True)
    try:
        out = mask_pool(masks, feats, hard_thr=0.5, binary=True)
    finally:
        set_pallas_enabled(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=3e-4)
