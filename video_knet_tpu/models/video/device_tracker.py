"""QuasiDenseEmbedTracker on-device: the association math as a jitted pytree step.

TPU-native rebuild of knet/video/qdtrack/trackers/quasi_dense_embed_tracker.py:9-207
(the same algorithm as the host-side models/video/tracker.py, kept for oracle
tests). The tracklet memory lives on device as fixed-capacity arrays threaded
through the jitted frame step, so online serving never leaves the chip for
association:

- score sort + IoU duplicate removal (:146-156) — the reference's python loop
  checks each detection against ALL earlier (sorted) detections, which is a
  pure triangular reduction: fully vectorized, no scan;
- bisoftmax similarity vs the memo (:166-170) with category gating (:181-183)
  — masked softmax over valid memo slots;
- greedy argmax assignment with column suppression (:184-203) — a `lax.scan`
  over the score-sorted detections (the only true sequential dependency);
- new-id allocation — cumsum over the carried `next_id` counter (ids are
  device-side; the host never numbers tracklets);
- EMA memo update, expiry, slot allocation and the one-frame backdrop buffer
  (:47-102) — masked scatters into the fixed slots.

Fixed capacity `memo_capacity` replaces the reference's unbounded dict; slots
free up by expiry (memo_tracklet_frames), and on overflow the oldest-seen
tracklet is evicted (the reference never evicts — with the default capacity
128 >> live tracklets per KITTI/VIP-Seg sequence this is unreachable).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from video_knet_tpu.config import TrackerConfig

Array = jax.Array

_NEG = -1e9


class TrackerState(NamedTuple):
    """Device-carried tracklet memory (one stream; vmap for multi-stream)."""

    embeds: Array  # [M, D] EMA appearance embeddings
    labels: Array  # [M] int32
    boxes: Array  # [M, 5] xyxy + score
    ids: Array  # [M] int32 global tracklet ids
    last_frame: Array  # [M] int32
    valid: Array  # [M] bool
    bd_embeds: Array  # [K, D] last frame's backdrops
    bd_labels: Array  # [K] int32
    bd_boxes: Array  # [K, 5]
    bd_valid: Array  # [K] bool
    next_id: Array  # int32 scalar
    frame: Array  # int32 scalar


def init_tracker_state(cfg: TrackerConfig, num_dets: int, embed_dim: int,
                       dtype=jnp.float32) -> TrackerState:
    m = cfg.memo_capacity
    return TrackerState(
        embeds=jnp.zeros((m, embed_dim), dtype),
        labels=jnp.zeros((m,), jnp.int32),
        boxes=jnp.zeros((m, 5), dtype),
        ids=jnp.full((m,), -1, jnp.int32),
        last_frame=jnp.zeros((m,), jnp.int32),
        valid=jnp.zeros((m,), bool),
        bd_embeds=jnp.zeros((num_dets, embed_dim), dtype),
        bd_labels=jnp.zeros((num_dets,), jnp.int32),
        bd_boxes=jnp.zeros((num_dets, 5), dtype),
        bd_valid=jnp.zeros((num_dets,), bool),
        next_id=jnp.zeros((), jnp.int32),
        frame=jnp.zeros((), jnp.int32),
    )


def reset_state(state: TrackerState, is_first: Array) -> TrackerState:
    """Zero the memory where `is_first` (scalar bool) — sequence boundary."""
    zero = init_tracker_state_like(state)
    return jax.tree_util.tree_map(
        lambda z, s: jnp.where(is_first, z, s), zero, state
    )


def init_tracker_state_like(state: TrackerState) -> TrackerState:
    return TrackerState(
        embeds=jnp.zeros_like(state.embeds),
        labels=jnp.zeros_like(state.labels),
        boxes=jnp.zeros_like(state.boxes),
        ids=jnp.full_like(state.ids, -1),
        last_frame=jnp.zeros_like(state.last_frame),
        valid=jnp.zeros_like(state.valid),
        bd_embeds=jnp.zeros_like(state.bd_embeds),
        bd_labels=jnp.zeros_like(state.bd_labels),
        bd_boxes=jnp.zeros_like(state.bd_boxes),
        bd_valid=jnp.zeros_like(state.bd_valid),
        next_id=jnp.zeros_like(state.next_id),
        frame=jnp.zeros_like(state.frame),
    )


def thing_detections_from_decode(
    pan: Array,  # [h, w] int segment-id map at merge resolution
    seg_ids: Array,  # [K] 1-based ids of the thing candidates (0 = dropped)
    valid: Array,  # [K] keep & isthing
    scores: Array,  # [K]
    semantic_thing: Array,  # [h, w] bool stuff-argmax filter
    scale_yx: tuple[float, float],  # out_hw / merge_hw (static)
    num_pan_ids: int | None = None,  # static max pan value (total segments)
) -> Array:
    """Per-candidate xyxy+score boxes from the panoptic id map, on device.

    The host tracker path materializes [K, h, w] masks in numpy and loops
    masks_to_boxes (inference.py host `_finish_frame`); here each pixel is
    routed to its candidate row by a [num_pan_ids+1] lookup table and the
    boxes come out of masked min/max reductions over a fused [HW, K]
    candidate-membership compare (boxes in out_hw coordinates, matching the
    host's scale factors; empty segments give zero boxes like
    tracker.masks_to_boxes).

    TPU note (evolution, all measured on a v5e at 96x312, K=100):
    1. jax.ops.segment_min/max — O(HW) bytes, looks optimal — but XLA:TPU
       lowers segment reductions to scatters, whose emitter is effectively
       SERIAL: the five segment ops cost ~6 ms/frame, more than the whole
       rest of the serving graph (round-4 ablation).
    2. [HW, K] broadcast-compare membership + masked min/max reductions,
       with the pixel->candidate routing as a `lut[pan]` small-table gather.
       Round 4 believed this "microseconds"; that ablation was timed with
       block_until_ready on a small result, which the remote-TPU client can
       answer before execution (PARITY.md round 5, measurement pathology).
       Re-timed with a value-fetch sync the block is 3.2 ms/frame — HALF the
       serving step's post-model work. A finer bisect put almost none of it
       in the reductions: each [HW]-indexed gather from a small table costs
       ~0.9-1.1 ms on the serial TPU gather emitter (the `lut[pan]` here and
       the two `take(..., winner)` building `pan` in ops/panoptic.merge_joint).
    3. This form — gather-free: membership compares the id map against each
       candidate's unique seg id directly ([H, W, K] broadcast compare), the
       box extrema come from two-stage boolean any-reductions (over W ->
       rowhit [H, K], over H -> colhit [W, K]) with iota min/max on the tiny
       [H|W, K] stages, and merge_joint builds `pan` by one-hot select-reduce
       instead of winner-gathers. Bit-identical boxes; the serving step's
       post-model block drops 3.66 -> ~0.5 ms/frame."""
    h, w = pan.shape
    k = seg_ids.shape[0]
    del num_pan_ids  # retained for API compat; the LUT that needed it is gone
    ok = valid & (seg_ids > 0)
    # membership WITHOUT the pixel->candidate LUT gather: lut[pan] was a
    # third [HW]-indexed small-table gather (~0.9 ms, serial emitter — see
    # note 4 above); comparing the id map against each candidate's unique
    # 1-based seg id is the same predicate as `lut[pan] == j` and is a pure
    # broadcast compare. seg ids are distinct per kept candidate, so at most
    # one column matches per pixel.
    member = (
        (pan[:, :, None] == jnp.where(ok, seg_ids, -1))
        & semantic_thing[:, :, None]
    )  # [h, w, K]
    rowhit = jnp.any(member, axis=1)  # [h, K] candidate touches row y
    colhit = jnp.any(member, axis=0)  # [w, K] candidate touches col x
    big = jnp.float32(1e9)
    yi = jnp.arange(h, dtype=jnp.float32)[:, None]
    xi = jnp.arange(w, dtype=jnp.float32)[:, None]
    y0 = jnp.min(jnp.where(rowhit, yi, big), axis=0)
    y1 = jnp.max(jnp.where(rowhit, yi, -big), axis=0)
    x0 = jnp.min(jnp.where(colhit, xi, big), axis=0)
    x1 = jnp.max(jnp.where(colhit, xi, -big), axis=0)
    nonempty = jnp.any(rowhit, axis=0)
    sy, sx = scale_yx
    box = jnp.stack(
        [x0 * sx, y0 * sy, (x1 + 1) * sx, (y1 + 1) * sy], axis=1
    )
    box = jnp.where(nonempty[:, None], box, 0.0)
    return jnp.concatenate([box, scores[:, None]], axis=1)


def dataset_class_table(
    num_thing_classes: int,
    num_stuff_classes: int,
    thing_ids_in_orig: tuple[int, ...] | None,
):
    """[num_classes] numpy LUT: things-first label -> dataset label space
    (the static core of inference.semantic_map_from_panoptic)."""
    import numpy as np

    c = num_thing_classes + num_stuff_classes
    table = np.zeros((c,), np.int32)
    for label in range(c):
        if label < num_thing_classes:
            table[label] = (
                thing_ids_in_orig[label] if thing_ids_in_orig is not None else label
            )
        else:
            cat = label - num_thing_classes
            if thing_ids_in_orig is not None:
                offset = 0
                for tid in thing_ids_in_orig:
                    if cat + offset >= tid:
                        offset += 1
                table[label] = cat + offset
            else:
                table[label] = cat + num_thing_classes
    return table


def boxes_iou(a: Array, b: Array) -> Array:
    """IoU between [N, 4] and [M, 4] xyxy boxes (zeros for empty boxes)."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


def _masked_softmax(x: Array, mask: Array, axis: int) -> Array:
    x = jnp.where(mask, x, _NEG)
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x - m) * mask
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-12)


def _greedy_assign(
    sim: Array,  # [K, Mtot] gated similarities, rows in descending score order
    memo_ids: Array,  # [Mtot] tracklet id per memo column (-1 = backdrop/empty)
    survived: Array,  # [K] post-dedup validity (sorted order)
    dscore: Array,  # [K] detection scores (sorted order)
    cfg: TrackerConfig,
) -> Array:
    """Sequential-greedy assignment (reference :184-203) via prefix-commit
    rounds. Returns ids_sorted [K]: tracklet id, -1 unmatched, -2 suppressed.

    Equivalence to the one-detection-per-step loop: detection i's decision
    depends only on sim[i]'s argmax AFTER every higher-score assigned
    detection zeroed its claimed column. A round therefore commits exactly
    the detections up to (not including) the first active one whose argmax
    column is also the argmax of an earlier active assigning detection; every
    later detection waits, because the blocked one may claim a different
    column once its view updates. Each round is vectorized over all K rows;
    the first active row always commits, so the loop terminates in <= K
    rounds (typically 1-2: same-column argmax collisions are rare)."""
    k, m = sim.shape

    def cond(carry):
        _, active, _ = carry
        return jnp.any(active)

    def body(carry):
        sim_mat, active, ids = carry
        memo_ind = jnp.argmax(sim_mat, axis=1)  # [K]
        conf = jnp.take_along_axis(sim_mat, memo_ind[:, None], axis=1)[:, 0]
        tid = memo_ids[memo_ind]
        matchable = survived & (conf > cfg.match_score_thr) & (tid > -1)
        assign = matchable & (dscore > cfg.obj_score_thr)
        suppressed = matchable & ~assign & (conf > cfg.nms_conf_thr)
        out_id = jnp.where(assign, tid, jnp.where(suppressed, -2, -1))
        # claims[i, c] = 1 where active row i would assign column c
        claims = (
            jax.nn.one_hot(memo_ind, m, dtype=jnp.float32)
            * (active & assign)[:, None]
        )
        # conflict: an EARLIER active assigning row claims my argmax column
        ahead = jnp.cumsum(claims, axis=0) - claims  # exclusive prefix sum
        conflict = (
            jnp.take_along_axis(ahead, memo_ind[:, None], axis=1)[:, 0] > 0.5
        )
        # commit the prefix before the first conflicted active row
        blocked = jnp.cumsum((conflict & active).astype(jnp.int32)) > 0
        commit = active & ~blocked
        ids = jnp.where(commit, out_id, ids)
        still = active & ~commit
        claimed_cols = jnp.sum(claims * commit[:, None], axis=0) > 0.5  # [m]
        sim_mat = jnp.where(
            still[:, None] & claimed_cols[None, :], 0.0, sim_mat
        )
        return sim_mat, still, ids

    ids0 = jnp.full((k,), -1, jnp.int32)
    _, _, ids_sorted = jax.lax.while_loop(
        cond, body, (sim, jnp.ones((k,), bool), ids0)
    )
    return ids_sorted


def tracker_match(
    state: TrackerState,
    boxes5: Array,  # [K, 5] xyxy+score in a frame-stable coordinate space
    labels: Array,  # [K] int32
    embeds: Array,  # [K, D]
    det_valid: Array,  # [K] bool
    cfg: TrackerConfig,
) -> tuple[TrackerState, Array, Array]:
    """One frame of association. Returns (new_state, ids, survived):

    ids [K] aligned to the INPUT detection order — the global tracklet id
    (>= 0), or -1 (unassigned / dedup-removed / invalid), or -2 (low-score
    duplicate of a matched tracklet, quasi_dense_embed_tracker.py:197-199);
    survived [K]: the detection survived score-sort IoU dedup (the host
    tracker's `sel`)."""
    k = boxes5.shape[0]
    det_scores = jnp.where(det_valid, boxes5[:, 4], -jnp.inf)
    order = jnp.argsort(-det_scores)  # stable; invalid rows last
    b = boxes5[order]
    lab = labels[order]
    emb = embeds[order]
    dvalid = det_valid[order]
    dscore = b[:, 4]

    # ---- duplicate removal (reference :146-156): det i is dropped when any
    # EARLIER (higher-score) detection overlaps it above its threshold. The
    # reference compares against all earlier rows — a triangular reduction.
    ious = boxes_iou(b, b)
    thr = jnp.where(dscore < cfg.obj_score_thr,
                    cfg.nms_backdrop_iou_thr, cfg.nms_class_iou_thr)
    earlier = (jnp.arange(k)[None, :] < jnp.arange(k)[:, None])  # j < i
    dup = jnp.any((ious > thr[:, None]) & earlier & dvalid[None, :], axis=1)
    survived = dvalid & ~dup

    # ---- similarity vs memo (tracklets ++ backdrops), bisoftmax + gating
    memo_embeds = jnp.concatenate([state.embeds, state.bd_embeds], axis=0)
    memo_labels = jnp.concatenate([state.labels, state.bd_labels], axis=0)
    memo_ids = jnp.concatenate(
        [jnp.where(state.valid, state.ids, -1),
         jnp.full((state.bd_valid.shape[0],), -1, jnp.int32)], axis=0
    )
    memo_valid = jnp.concatenate([state.valid, state.bd_valid], axis=0)

    feats = emb @ memo_embeds.T  # [K, Mtot]
    pair_valid = survived[:, None] & memo_valid[None, :]
    if cfg.match_metric == "bisoftmax":
        d2t = _masked_softmax(feats, memo_valid[None, :], axis=1)
        t2d = _masked_softmax(feats, survived[:, None], axis=0)
        sim = (d2t + t2d) / 2.0
    elif cfg.match_metric == "softmax":
        sim = _masked_softmax(feats, memo_valid[None, :], axis=1)
    else:  # cosine
        en = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        mn = memo_embeds / jnp.maximum(
            jnp.linalg.norm(memo_embeds, axis=1, keepdims=True), 1e-12
        )
        sim = en @ mn.T
    if cfg.with_cats:
        sim = sim * (lab[:, None] == memo_labels[None, :])
    sim = jnp.where(pair_valid, sim, 0.0)

    # ---- greedy argmax with column suppression (:184-203). The reference
    # processes detections one by one (each claims its best remaining memo
    # column); a literal lax.scan over k=100 dets is latency-bound on TPU
    # (~70 us/iteration of tiny ops = ~7 ms/frame, measured — it doubled the
    # serving step). Instead each while_loop round commits the maximal
    # score-ordered PREFIX of still-active detections whose argmax columns
    # are pairwise unclaimed — bit-identical to the sequential greedy order
    # (a detection's decision reads only its own argmax; that argmax is
    # settled once no earlier active detection claims the same column), but
    # real frames resolve in 1-2 vectorized rounds instead of k steps.
    ids_sorted = _greedy_assign(sim, memo_ids, survived, dscore, cfg)

    # ---- new-id allocation (:200-203)
    new = (ids_sorted == -1) & (dscore > cfg.init_score_thr) & survived
    new_rank = jnp.cumsum(new.astype(jnp.int32)) - 1
    ids_sorted = jnp.where(new, state.next_id + new_rank, ids_sorted)
    next_id = state.next_id + jnp.sum(new.astype(jnp.int32))

    # ---- memo update (:47-102 update_memo)
    frame = state.frame
    has_id = ids_sorted >= 0
    # existing tracklets: EMA; match each det to its memo slot by id
    slot_of_det = jnp.argmax(
        (state.ids[None, :] == ids_sorted[:, None]) & state.valid[None, :], axis=1
    )
    found = (state.ids[slot_of_det] == ids_sorted) & state.valid[slot_of_det]
    is_update = has_id & found
    mom = cfg.memo_momentum
    # scatter EMA updates (each tracklet id appears at most once per frame)
    tgt = jnp.where(is_update, slot_of_det, state.embeds.shape[0])  # OOB = drop
    embeds_new = state.embeds.at[tgt].set(
        (1 - mom) * state.embeds[slot_of_det] + mom * emb,
        mode="drop",
    )
    boxes_new = state.boxes.at[tgt].set(b, mode="drop")
    labels_new = state.labels.at[tgt].set(lab, mode="drop")
    last_new = state.last_frame.at[tgt].set(frame, mode="drop")

    # expiry BEFORE insertion (frees slots; the reference pops after insert,
    # but expiry only reads last_frame, so freed-slot reuse is equivalent)
    alive = state.valid & (frame - last_new < cfg.memo_tracklet_frames)

    # insert new tracklets: j-th new det -> j-th free slot (invalid first,
    # then oldest last_frame — eviction only on overflow)
    is_insert = new  # new ids allocated above
    slot_key = jnp.where(alive, last_new, -1_000_000) * 2 + 1  # invalid slots first
    free_order = jnp.argsort(slot_key)  # [M] slots, most-reusable first
    ins_rank = jnp.cumsum(is_insert.astype(jnp.int32)) - 1  # rank among new dets
    ins_slot = free_order[jnp.clip(ins_rank, 0, free_order.shape[0] - 1)]
    tgt_ins = jnp.where(is_insert, ins_slot, state.embeds.shape[0])
    embeds_new = embeds_new.at[tgt_ins].set(emb, mode="drop")
    boxes_new = boxes_new.at[tgt_ins].set(b, mode="drop")
    labels_new = labels_new.at[tgt_ins].set(lab, mode="drop")
    last_new = last_new.at[tgt_ins].set(frame, mode="drop")
    ids_new = state.ids.at[tgt_ins].set(ids_sorted, mode="drop")
    valid_new = alive.at[tgt_ins].set(True, mode="drop")

    # ---- backdrops (:151-160): unmatched dets not overlapping any earlier
    # SURVIVING det above nms_backdrop_iou_thr; one-frame buffer (replace)
    bd_cand = survived & (ids_sorted == -1)
    bd_dup = jnp.any(
        (ious > cfg.nms_backdrop_iou_thr) & earlier & survived[None, :], axis=1
    )
    bd_keep = bd_cand & ~bd_dup

    new_state = TrackerState(
        embeds=embeds_new,
        labels=labels_new,
        boxes=boxes_new,
        ids=ids_new,
        last_frame=last_new,
        valid=valid_new,
        bd_embeds=jnp.where(bd_keep[:, None], emb, 0.0),
        bd_labels=jnp.where(bd_keep, lab, 0),
        bd_boxes=jnp.where(bd_keep[:, None], b, 0.0),
        bd_valid=bd_keep,
        next_id=next_id,
        frame=frame + 1,
    )
    # Reference fidelity: on a frame with NO detections, tracker.match is
    # never invoked (joint_train.py gates on kept things), so the memory —
    # including not-yet-pruned stale tracklets, which stay matchable until
    # the next detection frame's post-match pruning — must be left untouched.
    # Only the frame counter advances (the caller's frame_id always does).
    any_det = jnp.any(det_valid)
    new_state = jax.tree_util.tree_map(
        lambda n, o: jnp.where(any_det, n, o), new_state,
        state._replace(frame=frame + 1),
    )
    # scatter ids back to the input detection order
    ids_input = jnp.zeros((k,), jnp.int32).at[order].set(ids_sorted)
    survived_input = jnp.zeros((k,), bool).at[order].set(survived)
    return new_state, ids_input, survived_input
