"""Panoptic merge, TPU-native.

The reference has three merge modes (knet/det/kernel_iter_head.py:386-524,
knet/video/kernel_iter_head.py:656-890). The release VPS/KITTI configs use the
*joint argmax* mode (merge_joint=True), which is fully vectorizable: every pixel
goes to the highest score*prob segment, then segments are kept if they retain
>= overlap_thr of their original area. The sequential thing-first and
stuff-first paste modes are provided as host-side numpy finalizers for parity
checks and the ordering ablation.

Static-shape output: per-segment arrays + keep mask instead of a python list of
segment dicts; `segments_to_host` converts at dump time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class PanopticResult(NamedTuple):
    panoptic_seg: Array  # [H, W] int32 segment ids (0 = void)
    keep: Array  # [K] bool
    seg_ids: Array  # [K] int32 segment id per candidate (0 if dropped)
    labels: Array  # [K] int32 class labels (thing: [0, T); stuff: [T, C))
    scores: Array  # [K] float
    isthing: Array  # [K] bool
    areas: Array  # [K] int32 (merged area)
    instance_idx: Array  # [K] int32 original candidate index (tracking handle)


def merge_joint(
    masks: Array,
    scores: Array,
    labels: Array,
    *,
    num_thing_classes: int,
    instance_score_thr: float = 0.25,
    overlap_thr: float = 0.6,
) -> PanopticResult:
    """Joint argmax panoptic merge over K candidate segments.

    masks:  [K, H, W] sigmoid probabilities (things: topk proposals; stuff rows).
    scores: [K] candidate scores; labels: [K] class labels.

    Mirrors merge_stuff_thing_stuff_joint (kernel_iter_head.py:467-524): pixels go
    to argmax(score * prob); a candidate is kept if its claimed area is > 0 and
    >= overlap_thr of its prob>=0.5 area (things additionally need
    score >= instance_score_thr). Segment ids are 1-based in descending score
    order over kept candidates — identical ids to the reference's sequential loop.
    """
    k = masks.shape[0]
    isthing = labels < num_thing_classes
    prob = scores[:, None, None] * masks
    winner = jnp.argmax(prob, axis=0)  # [H, W]

    idx = jnp.arange(k, dtype=jnp.int32)
    # claimed areas via a broadcast-compare reduction: on TPU this vectorized
    # one-hot sum beats a bincount scatter (scatters serialize on the VPU)
    claimed = winner[None] == idx[:, None, None]
    mask_area = jnp.sum(claimed, axis=(1, 2)).astype(jnp.float32)
    orig_area = jnp.sum(masks >= 0.5, axis=(1, 2)).astype(jnp.float32)

    keep = (mask_area > 0) & (orig_area > 0) & (mask_area / jnp.maximum(orig_area, 1.0) >= overlap_thr)
    keep = keep & jnp.where(isthing, scores >= instance_score_thr, True)

    # reference assigns ids by iterating candidates in descending-score order
    order = jnp.argsort(-scores)
    kept_in_order = jnp.take(keep, order)
    rank_in_order = jnp.cumsum(kept_in_order.astype(jnp.int32))  # id at each position
    ids_for_ordered = jnp.where(kept_in_order, rank_in_order, 0)
    seg_ids = jnp.zeros((k,), jnp.int32).at[order].set(ids_for_ordered)

    # pan[p] = seg_ids[winner[p]] if keep[winner[p]] else 0 — but NOT via
    # jnp.take(..., winner): an [HW]-indexed gather from a small table hits
    # XLA:TPU's serial gather emitter (~1.1 ms per gather at 96x312, measured
    # round 5 — it was the hidden majority of the serving step's post-model
    # time). The one-hot select-reduce over `claimed` (already materialized
    # for the areas) rides the VPU in ~50 us; each pixel matches exactly one
    # candidate row, so the sum IS the winner's value, bit-identically.
    vals = jnp.where(keep, seg_ids, 0)
    pan = jnp.sum(
        jnp.where(claimed, vals[:, None, None], 0), axis=0
    ).astype(jnp.int32)
    return PanopticResult(
        panoptic_seg=pan,
        keep=keep,
        seg_ids=seg_ids,
        labels=labels.astype(jnp.int32),
        scores=scores,
        isthing=isthing,
        areas=mask_area.astype(jnp.int32),
        instance_idx=idx,
    )


def segments_to_host(res: PanopticResult, num_thing_classes: int) -> tuple[np.ndarray, list[dict]]:
    """Convert a PanopticResult to (panoptic_seg numpy, segments_info list).

    Matches the reference's segments_info dicts (kernel_iter_head.py:508-522):
    stuff category_id is reported as (label - num_thing + 1).
    """
    keep = np.asarray(res.keep)
    seg_ids = np.asarray(res.seg_ids)
    labels = np.asarray(res.labels)
    scores = np.asarray(res.scores)
    isthing = np.asarray(res.isthing)
    areas = np.asarray(res.areas)
    inst = np.asarray(res.instance_idx)
    infos = []
    order = np.argsort(-scores)
    for k in order:
        if not keep[k]:
            continue
        if isthing[k]:
            infos.append(
                {
                    "id": int(seg_ids[k]),
                    "isthing": True,
                    "score": float(scores[k]),
                    "category_id": int(labels[k]),
                    "instance_id": int(inst[k]),
                }
            )
        else:
            infos.append(
                {
                    "id": int(seg_ids[k]),
                    "isthing": False,
                    "category_id": int(labels[k]) - num_thing_classes + 1,
                    "area": int(areas[k]),
                }
            )
    return np.asarray(res.panoptic_seg), infos


def merge_sequential_host(
    thing_masks: np.ndarray,
    thing_labels: np.ndarray,
    thing_scores: np.ndarray,
    stuff_masks: np.ndarray,
    stuff_labels: np.ndarray,
    stuff_scores: np.ndarray,
    *,
    instance_score_thr: float = 0.25,
    iou_thr: float = 0.5,
    stuff_max_area: int = 4096,
) -> tuple[np.ndarray, list[dict]]:
    """Sequential thing-paste + stuff-fill merge (host-side parity variant).

    Numpy transcription of merge_stuff_thing (kernel_iter_head.py:386-465);
    inputs are *boolean* masks (already thresholded).
    """
    h, w = thing_masks.shape[-2:]
    pan = np.zeros((h, w), np.int32)
    seg_id = 0
    infos: list[dict] = []
    for i in np.argsort(-thing_scores):
        score = float(thing_scores[i])
        if score < instance_score_thr:
            break
        mask = thing_masks[i].astype(bool)
        area = mask.sum()
        if area == 0:
            continue
        inter = (mask & (pan > 0)).sum()
        if inter / area > iou_thr:
            continue
        if inter > 0:
            mask = mask & (pan == 0)
        if mask.sum() == 0:
            continue
        seg_id += 1
        pan[mask] = seg_id
        infos.append(
            {"id": seg_id, "isthing": True, "score": score,
             "category_id": int(thing_labels[i]), "instance_id": int(i)}
        )
    processed = set()
    for j in np.argsort(-stuff_scores):
        lab = int(stuff_labels[j])
        if lab in processed:
            continue
        processed.add(lab)
        sem = stuff_masks[stuff_labels == lab].sum(0).astype(bool)
        mask = sem & (pan == 0)
        area = mask.sum()
        if area < stuff_max_area:
            continue
        seg_id += 1
        pan[mask] = seg_id
        infos.append({"id": seg_id, "isthing": False, "category_id": lab, "area": int(area)})
    return pan, infos


def merge_sequential_host_stuff_first(
    thing_masks: np.ndarray,
    thing_labels: np.ndarray,
    thing_scores: np.ndarray,
    stuff_masks: np.ndarray,
    stuff_labels: np.ndarray,
    stuff_scores: np.ndarray,
    *,
    instance_score_thr: float = 0.25,
    iou_thr: float = 0.5,
    stuff_max_area: int = 4096,
) -> tuple[np.ndarray, list[dict]]:
    """Stuff-first sequential merge (the ordering-ablation variant).

    Numpy transcription of merge_stuff_thing_stuff_first
    (knet/video/kernel_iter_head.py:743-830): stuff segments are painted
    FIRST (deduped by label in descending score order, kept when their free
    area >= stuff_max_area), then things paste one-by-one in descending score
    order with the same overlap rules as the thing-first variant — except the
    overlap is now measured against stuff too, so a thing mostly covered by an
    already-painted stuff region is dropped. Segment ids therefore number
    stuff 1..S before things. Inputs are *boolean* masks (already
    thresholded), same contract as merge_sequential_host.
    """
    h, w = thing_masks.shape[-2:]
    pan = np.zeros((h, w), np.int32)
    seg_id = 0
    infos: list[dict] = []
    processed = set()
    for j in np.argsort(-stuff_scores):
        lab = int(stuff_labels[j])
        if lab in processed:
            continue
        processed.add(lab)
        sem = stuff_masks[stuff_labels == lab].sum(0).astype(bool)
        mask = sem & (pan == 0)
        area = mask.sum()
        if area < stuff_max_area:
            continue
        seg_id += 1
        pan[mask] = seg_id
        infos.append(
            {"id": seg_id, "isthing": False, "category_id": lab,
             "area": int(area)}
        )
    for i in np.argsort(-thing_scores):
        score = float(thing_scores[i])
        if score < instance_score_thr:
            break
        mask = thing_masks[i].astype(bool)
        area = mask.sum()
        if area == 0:
            continue
        inter = (mask & (pan > 0)).sum()
        if inter / area > iou_thr:
            continue
        if inter > 0:
            mask = mask & (pan == 0)
        if mask.sum() == 0:
            continue
        seg_id += 1
        pan[mask] = seg_id
        infos.append(
            {"id": seg_id, "isthing": True, "score": score,
             "category_id": int(thing_labels[i]), "instance_id": int(i)}
        )
    return pan, infos
