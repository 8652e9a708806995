"""Test-time augmentation: multi-scale / flip wrapper + semantic fusion.

Rebuild of mmtrack/pipelines/test_time_aug.py:11-108 (MultiScaleFlipAugVideo).
The reference wraps a transform pipeline and enumerates every (scale, flip)
variant into a dict-of-lists; fusing the variants is the detector's business
(the release VPS/VIS configs run single-scale/no-flip, so this is capability
parity — SURVEY.md §2.6 mmtrack pipelines row).

TPU note: each (scale, flip) variant is a distinct static shape, i.e. a
distinct compiled program. `tta_semantic_logits` therefore runs one jitted
seg-logits forward PER SCALE (flip reuses the same program — the flip happens
on host) and fuses on host: unflip, bilinear-resize the class logits to the
base grid, average, argmax. Fusion lives off-device because it is O(HW*C)
bytes once per variant and would otherwise pay one tunnel round-trip per
variant anyway.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from video_knet_tpu.data.transforms import (
    bilinear_resize,
    keep_ratio_resize_pad,
    nearest_resize,
)


class MultiScaleFlipAugVideo:
    """Enumerates (scale x flip) variants of a list of per-frame dicts.

    Interface parity with the reference (test_time_aug.py:47-108): exactly
    one of img_scale / scale_factor; `transforms` is a callable over the
    per-frame dict list returning a data dict; the output is a dict whose
    values are lists, one entry per augmentation, ordered scale-major with
    the un-flipped variant first (reference :87-102).
    """

    def __init__(
        self,
        transforms: Callable[[list[dict]], dict],
        img_scale=None,
        scale_factor=None,
        flip: bool = False,
        flip_direction: str | Sequence[str] = "horizontal",
    ):
        if (img_scale is None) == (scale_factor is None):
            raise ValueError("Must have but only one variable can be set")
        self.transforms = transforms
        if img_scale is not None:
            self.img_scale = (
                img_scale if isinstance(img_scale, list) else [img_scale]
            )
            self.scale_key = "scale"
        else:
            self.img_scale = (
                scale_factor if isinstance(scale_factor, list) else [scale_factor]
            )
            self.scale_key = "scale_factor"
        self.flip = flip
        self.flip_direction = (
            list(flip_direction)
            if isinstance(flip_direction, (list, tuple))
            else [flip_direction]
        )

    def __call__(self, results: list[dict]) -> dict:
        aug_data = []
        flip_args = [(False, None)]
        if self.flip:
            flip_args += [(True, d) for d in self.flip_direction]
        for scale in self.img_scale:
            for flip, direction in flip_args:
                variant = []
                for r in results:
                    r = dict(r)
                    r[self.scale_key] = scale
                    r["flip"] = flip
                    r["flip_direction"] = direction
                    variant.append(r)
                aug_data.append(self.transforms(variant))
        out = {key: [] for key in aug_data[0]}
        for data in aug_data:
            for key, val in data.items():
                out[key].append(val)
        return out


def default_video_transforms(variant: list[dict]) -> dict:
    """Minimal test transform stack for the wrapper: keep-ratio resize into
    the scale canvas + normalize + pad (Resize/RandomFlip/Normalize/Pad of the
    reference example config), stacking frames on a new time axis."""
    imgs, contents = [], []
    for r in variant:
        th, tw = r["scale"] if "scale" in r else (
            round(r["img"].shape[0] * r["scale_factor"]),
            round(r["img"].shape[1] * r["scale_factor"]),
        )
        x, content = keep_ratio_resize_pad(r["img"], (int(th), int(tw)))
        if r.get("flip"):
            if r.get("flip_direction") in (None, "horizontal"):
                x = x[:, ::-1]
            elif r["flip_direction"] == "vertical":
                x = x[::-1]
            else:  # diagonal
                x = x[::-1, ::-1]
        imgs.append(x)
        contents.append(content)
    return {
        "img": np.stack(imgs),
        "content_hw": contents,
        "flip": variant[0].get("flip", False),
        "flip_direction": variant[0].get("flip_direction"),
        "scale": variant[0].get("scale", variant[0].get("scale_factor")),
    }


def _round32(v: float) -> int:
    return max(32, int(round(v / 32)) * 32)


def make_tta_semantic_fn(model, variables, cfg, base_hw, scales, flip=True):
    """Multi-scale/flip semantic-logit fusion over the jitted VPS forward.

    Returns fn(rgb_uint8) -> [base_h, base_w] fused semantic label map (the
    argmax over variant-averaged seg logits). One compile per scale; the
    horizontally flipped variant reuses the same program (host-side flip of
    the input, host-side unflip of the logits).
    """
    import jax
    import jax.numpy as jnp

    from video_knet_tpu.models.video.knet_vps import VideoKNet

    n_tot = cfg.num_proposals + cfg.num_stuff_classes
    k = cfg.head.conv_kernel_size ** 2

    @jax.jit
    def seg_fwd(vars_, img):
        prev = jnp.zeros((1, n_tot, k, cfg.head.in_channels), img.dtype)
        out = model.apply(
            vars_, img, prev, jnp.asarray(True), method=VideoKNet.test_step
        )
        return out["rpn_out"].seg_preds[0]  # [h/4, w/4, C] class logits

    canvases = [( _round32(base_hw[0] * s), _round32(base_hw[1] * s))
                for s in scales]

    def fuse(rgb: np.ndarray) -> np.ndarray:
        acc = None
        for th, tw in canvases:
            x, (ch, cw) = keep_ratio_resize_pad(rgb, (th, tw))
            variants = [x] + ([x[:, ::-1].copy()] if flip else [])
            for vi, v in enumerate(variants):
                logits = np.asarray(seg_fwd(variables, v[None]), np.float32)
                if vi == 1:
                    logits = logits[:, ::-1]
                # crop padding at the logit grid, then resize to base
                gh = max(1, round(ch / th * logits.shape[0]))
                gw = max(1, round(cw / tw * logits.shape[1]))
                logits = bilinear_resize(logits[:gh, :gw], base_hw)
                acc = logits if acc is None else acc + logits
        return np.argmax(acc, axis=-1).astype(np.int32)

    return fuse


def things_first_to_dataset_lut(
    num_thing: int, num_stuff: int, thing_ids_in_orig=None
) -> np.ndarray:
    """LUT from the model's things-first class space to the dataset label
    space (same mapping as inference.semantic_map_from_panoptic: thing k ->
    thing_ids_in_orig[k]; stuff s -> its original index skipping thing
    slots; identity-shift when thing_ids_in_orig is None)."""
    lut = np.zeros(num_thing + num_stuff, np.int32)
    for k in range(num_thing):
        lut[k] = thing_ids_in_orig[k] if thing_ids_in_orig is not None else k
    for s in range(num_stuff):
        if thing_ids_in_orig is None:
            lut[num_thing + s] = num_thing + s
        else:
            cls = s
            for tid in thing_ids_in_orig:
                if cls >= tid:
                    cls += 1
            lut[num_thing + s] = cls
    return lut
