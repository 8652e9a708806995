"""Mixed-precision helpers: bf16 inference/training casts.

The reference ships fp16 support via mmcv's Fp16OptimizerHook but no release
config enables it (SURVEY.md §2.10). On TPU, bfloat16 is the native fast path
(MXU runs bf16 at 2x fp32 throughput; no loss-scaling needed): cast params and
inputs to bf16, keep normalization parameters and statistics in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NORM_KEYS = ("scale", "bias", "mean", "var")


def cast_params(params, dtype=jnp.bfloat16, keep_norms_fp32: bool = True):
    """Cast float leaves to `dtype`; LayerNorm/BatchNorm/GN scales, biases and
    running stats stay fp32 when keep_norms_fp32 (numerical safety)."""

    def cast(path, leaf):
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        if keep_norms_fp32:
            last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if last in _NORM_KEYS:
                return leaf.astype(jnp.float32)
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def cast_variables(variables, dtype=jnp.bfloat16, keep_norms_fp32: bool = False):
    """Cast a full variables dict for bf16 inference.

    Note on flax dtype promotion: a norm layer whose scale/bias stay fp32
    promotes its output back to fp32, silently un-bf16ing everything downstream
    — so for inference the default casts norm params (and BN running stats) to
    bf16 as well. bf16 has fp32's exponent range, so running stats survive the
    cast; only mantissa precision is reduced."""
    out = dict(variables)
    out["params"] = cast_params(variables["params"], dtype, keep_norms_fp32)
    if "batch_stats" in out and not keep_norms_fp32:
        out["batch_stats"] = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            variables["batch_stats"],
        )
    return out
