"""KernelIterHead: the iterative refinement loop (pure forward).

Rebuild of knet/det/kernel_iter_head.py:118-331. The reference interleaves
forward / Hungarian-assign / loss per stage; assignment only consumes *detached*
previous-stage masks, so here the module is pure forward (returns every stage's
outputs) and the loss/assignment pipeline lives in models/knet.py — this keeps the
module jit/vmap-friendly and lets inference share the same code path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
from flax import linen as nn

from video_knet_tpu.config import KernelUpdateHeadConfig
from video_knet_tpu.models.kernel_update_head import KernelUpdateHead
from video_knet_tpu.models.layers import resize_mask_bilinear

Array = jax.Array


class StageOutput(NamedTuple):
    cls_score: Array  # [B, N_tot, C]
    mask_preds: Array  # [B, N_tot, H, W] (feature stride)
    scaled_mask_preds: Array  # [B, N_tot, Hs, Ws] (assign stride)
    object_feats: Array  # [B, N_tot, K*K, C]


def upscale_masks(mask_preds: Array, stride: int) -> Array:
    if stride <= 1:
        return mask_preds
    h, w = mask_preds.shape[-2:]
    return resize_mask_bilinear(mask_preds, (h * stride, w * stride))


class KernelIterHead(nn.Module):
    head_cfg: KernelUpdateHeadConfig
    num_stages: int = 3

    @nn.compact
    def __call__(
        self, x: Array, proposal_feats: Array, mask_preds: Array
    ) -> list[StageOutput]:
        outs = []
        object_feats = proposal_feats
        for stage in range(self.num_stages):
            cls_score, mask_preds, object_feats, _ = KernelUpdateHead(
                self.head_cfg, name=f"mask_head_{stage}"
            )(x, object_feats, mask_preds)
            scaled = upscale_masks(mask_preds, self.head_cfg.mask_upsample_stride)
            outs.append(StageOutput(cls_score, mask_preds, scaled, object_feats))
        return outs
