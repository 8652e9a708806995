"""KernelUpdator: the adaptive kernel update gate block.

Rebuild of knet/kernel_updator.py:8-93 semantics, batched over [B, N] kernels:
  param_in/out   = dynamic_layer(pooled group feature) split in two
  input_in/out   = input_layer(kernel) split in two (per K*K tap)
  gates          = sigmoid(LN(gate_layer(input_in * param_in)))
  fused          = update_gate * LN(param_out) + input_gate * LN(input_out)
  out            = relu(LN(fc_layer(fused)))
"""

from __future__ import annotations

import jax
from flax import linen as nn

Array = jax.Array


class KernelUpdator(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    out_channels: int = 256

    @nn.compact
    def __call__(self, update_feature: Array, input_feature: Array) -> Array:
        """update_feature: [..., C_in] pooled feats; input_feature: [..., G, C_in]
        kernels (G = conv_kernel_size**2). Returns [..., G, C_out]."""
        F = self.feat_channels
        params = nn.Dense(2 * F, name="dynamic_layer")(update_feature)
        param_in, param_out = params[..., :F], params[..., F:]

        input_feats = nn.Dense(2 * F, name="input_layer")(input_feature)
        input_in, input_out = input_feats[..., :F], input_feats[..., F:]

        gate_feats = input_in * param_in[..., None, :]
        input_gate = nn.LayerNorm(epsilon=1e-5, name="input_norm_in")(
            nn.Dense(F, name="input_gate")(gate_feats)
        )
        update_gate = nn.LayerNorm(epsilon=1e-5, name="norm_in")(
            nn.Dense(F, name="update_gate")(gate_feats)
        )
        input_gate = nn.sigmoid(input_gate)
        update_gate = nn.sigmoid(update_gate)

        param_out = nn.LayerNorm(epsilon=1e-5, name="norm_out")(param_out)
        input_out = nn.LayerNorm(epsilon=1e-5, name="input_norm_out")(input_out)

        features = update_gate * param_out[..., None, :] + input_gate * input_out
        features = nn.Dense(self.out_channels, name="fc_layer")(features)
        features = nn.LayerNorm(epsilon=1e-5, name="fc_norm")(features)
        return nn.relu(features)
