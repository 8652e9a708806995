"""Online VPS inference: stateful per-frame loop (device step + host tracker).

Rebuild of VideoKNetQuansiEmbedFCJointTrain.simple_test
(knet_quansi_dense_embed_fc_joint_train.py:472-612) and tools/test_step.py: one
jitted device step per frame (forward + linking + panoptic decode + embeddings +
semantic filter); the tiny tracker bookkeeping runs on host. Memory carried across
frames: the previous frame's final kernels (device array) + tracker memo (host).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from video_knet_tpu.config import VideoKNetConfig
from video_knet_tpu.models.video.knet_vps import VideoKNet, vps_decode
from video_knet_tpu.models.video.tracker import (
    QuasiDenseEmbedTracker,
    masks_to_boxes,
)
from video_knet_tpu.ops.panoptic import segments_to_host

# max cached (is_first, do) device flag pairs per pipeline (ADVICE r04):
# steady serving sees only a handful of patterns, but adversarial stream
# resets could otherwise grow the cache (and its pinned device buffers)
# without bound
_WFLAG_CACHE_CAP = 64

# KITTI-STEP: the 2 thing classes sit at indices 11 (person) and 13 (car) of the
# 19-class cityscapes label space (external/dataset/dvps_pipelines/loading.py cherry
# =[11, 13]; joint_train.py:698-719).
KITTI_STEP_THING_IDS = (11, 13)


def _track_embed_dim(cfg: VideoKNetConfig) -> int:
    """Dimensionality of the test-time track embeddings."""
    if cfg.track_head_type == "query_fuse":
        return cfg.track.query_fc_out_channels
    return cfg.track.embed_channels


def make_device_tracker_frame_step(
    model: VideoKNet, variables, cfg: VideoKNetConfig, out_hw,
    thing_ids_in_orig=KITTI_STEP_THING_IDS, batched: bool = False,
):
    """Per-frame device step with the quasi-dense association ON DEVICE.

    Everything after the forward — panoptic decode, semantic filter, box
    extraction, bisoftmax association, id allocation, memo update, and the
    final track/semantic label maps — runs inside one jitted graph; the
    tracker memory is a device pytree threaded by the caller. The host only
    nearest-upsamples the three label maps and formats segments_info
    (north-star requirement; replaces the host `_finish_frame` mask loop).

    step(img, prev_obj_feats, track_state, is_first) ->
      dict(payload..., new_obj_feats, track_state). Requires fast_decode
    (the id maps are produced at merge resolution)."""
    from video_knet_tpu.models.video import device_tracker as dt

    assert cfg.test.fast_decode, "device tracker requires cfg.test.fast_decode"
    cls_table = jnp.asarray(
        dt.dataset_class_table(
            cfg.num_thing_classes, cfg.num_stuff_classes, thing_ids_in_orig
        )
    )
    kth = cfg.test.max_per_img

    def one_stream(pred, emb, semth, st, isf):
        res = pred.result
        pan = res.panoptic_seg
        valid = res.keep[:kth] & res.isthing[:kth]
        ktot = res.seg_ids.shape[0]
        sy = out_hw[0] / pan.shape[0]
        sx = out_hw[1] / pan.shape[1]
        boxes5 = dt.thing_detections_from_decode(
            pan, res.seg_ids[:kth], valid, res.scores[:kth], semth, (sy, sx),
            num_pan_ids=ktot,
        )
        det_emb = emb[pred.thing_mask_idx]  # [kth, D] source-proposal embeds
        st = dt.reset_state(st, isf)
        st, ids, survived = dt.tracker_match(
            st, boxes5, res.labels[:kth], det_emb, valid, cfg.tracker
        )
        # host id convention (tracker.match callers): +1, suppressed/-1 -> 0
        tid = jnp.maximum(ids + 1, 0) * survived.astype(jnp.int32)
        lut_t = jnp.zeros((ktot + 1,), jnp.int32).at[
            jnp.where(tid > 0, res.seg_ids[:kth], 0)
        ].set(tid)
        cls_of = jnp.take(cls_table, res.labels)
        lut_s = jnp.zeros((ktot + 1,), jnp.int32).at[
            jnp.where(res.keep, res.seg_ids, 0)
        ].set(jnp.where(res.keep, cls_of, 0))
        # the per-pixel payload is ONE id map; the host reconstructs the
        # track/semantic maps from the [ktot+1] LUTs (identical int gathers).
        # Shipping lut_t[pan]/lut_s[pan] as full maps tripled the bytes per
        # frame and made the fetch the serving bottleneck over slow links.
        pan_dtype = jnp.uint8 if ktot <= 255 else jnp.int16
        payload = dict(
            pan=pan.astype(pan_dtype),
            lut_track=lut_t,
            lut_sem=lut_s.astype(jnp.int16),
            keep=res.keep, seg_ids=res.seg_ids.astype(jnp.int16),
            labels=res.labels.astype(jnp.int16), scores=res.scores,
            isthing=res.isthing, areas=res.areas,
            instance_idx=res.instance_idx.astype(jnp.int16),
        )
        return payload, st

    def _frame(vars_, img, prev_obj_feats, track_state, is_first):
        isf = jnp.asarray(is_first)
        out = model.apply(
            vars_, img, prev_obj_feats, isf, method=VideoKNet.test_step
        )
        pred = vps_decode(
            out["rpn_out"], out["stage_outs"], out["track_obj_feats"], cfg,
            None, batched=batched,
        )
        seg = out["rpn_out"].seg_preds if batched else out["rpn_out"].seg_preds[0]
        sem_label = jnp.argmax(seg, axis=-1).astype(jnp.int32)
        pan_hw = tuple(pred.result.panoptic_seg.shape[-2:])
        shape = (seg.shape[0], *pan_hw) if batched else pan_hw
        semantic_thing = (
            jax.image.resize(sem_label, shape, method="nearest")
            < cfg.num_thing_classes
        )
        if batched:
            isf_vec = jnp.broadcast_to(isf, (img.shape[0],))
            payload, st = jax.vmap(one_stream)(
                pred, out["track_embeds"], semantic_thing, track_state, isf_vec
            )
        else:
            payload, st = one_stream(
                pred, out["track_embeds"][0], semantic_thing, track_state, isf
            )
        payload["new_obj_feats"] = out["new_obj_feats"]
        payload["track_state"] = st
        return payload

    # `variables` rides as a jit ARGUMENT, not a closure: closed-over device
    # arrays are embedded in the serialized program shipped to the compiler,
    # which both bloats the compile payload past what the remote-compile
    # transport accepts for large backbones (Swin-B ~0.5 GB fp32) and defeats
    # compile-cache reuse across checkpoints.
    @jax.jit
    def _step(vars_, img, prev_obj_feats, track_state, is_first):
        return _frame(vars_, img, prev_obj_feats, track_state, is_first)

    # windowed scan: W frames per dispatch — ONE execute call and ONE stacked
    # payload instead of W of each. Per-call overhead through the remote-TPU
    # tunnel is milliseconds (execute request serialization + result-future
    # bookkeeping scale with the argument/output count), so at W=8 it drops
    # from ~half the serving step to noise; on a local PCIe host it is still
    # W× fewer dispatches. `do` masks trailing pad frames of a short final
    # window — their forward runs but the carried recurrence (kernels +
    # tracker memory) is frozen, so padding never perturbs the sequence.
    @jax.jit
    def _scan(vars_, imgs, prev_obj_feats, track_state, is_firsts, do):
        def body(carry, x):
            prev, st = carry
            img, isf, d = x
            p = _frame(vars_, img, prev, st, isf)
            new_prev = p.pop("new_obj_feats")
            new_st = p.pop("track_state")
            prev = jnp.where(d, new_prev, prev)
            st = jax.tree_util.tree_map(
                lambda n, o: jnp.where(d, n, o), new_st, st
            )
            return (prev, st), p
        (prev, st), payloads = jax.lax.scan(
            body, (prev_obj_feats, track_state), (imgs, is_firsts, do)
        )
        payloads["new_obj_feats"] = prev
        payloads["track_state"] = st
        return payloads

    def step(img, prev_obj_feats, track_state, is_first):
        return _step(variables, img, prev_obj_feats, track_state, is_first)

    def scan_step(imgs, prev_obj_feats, track_state, is_firsts, do):
        return _scan(variables, imgs, prev_obj_feats, track_state, is_firsts, do)

    step.scan = scan_step
    return step


def make_frame_step(model: VideoKNet, variables, cfg: VideoKNetConfig, out_hw,
                    batched: bool = False, compact_host: bool = False):
    """Builds the jitted per-frame device function.

    batched=True serves B independent video streams per step (vmapped decode,
    per-stream embeddings/filters) — the multi-stream throughput mode for
    offline evaluation of many sequences at once.

    compact_host=True keeps the panoptic id map at the merge (mask) resolution
    and strips everything `_finish_frame` doesn't read — the payload drops from
    ~2.8 MB to ~0.1 MB per frame at 384x1248. The host nearest-upsamples the
    final label maps; with fast_decode the device would have nearest-upsampled
    the very same id map, so the id maps are identical. (Caveat: the semantic
    filter's argmax travels feature-res -> merge-res -> out_hw as two chained
    nearest resizes instead of one, so a few pixels exactly on stuff/thing
    boundaries can land differently than the single-resize path.) Only valid
    with cfg.test.fast_decode — bilinear pre-merge upsampling (fast_decode=
    False) genuinely changes boundary labels and must decode on device."""

    # weights as a jit argument (see make_device_tracker_frame_step)
    def _frame(vars_, img, prev_obj_feats, is_first):
        out = model.apply(
            vars_, img, prev_obj_feats, is_first, method=VideoKNet.test_step
        )
        decode_hw = None if compact_host else out_hw
        pred = vps_decode(
            out["rpn_out"], out["stage_outs"], out["track_obj_feats"], cfg,
            decode_hw, batched=batched,
        )
        # semantic filter (joint_train.py:546-553): argmax over seg logits; the
        # argmax is taken at feature resolution and nearest-upsampled (identical
        # label map away from boundaries, ~19x less resize traffic)
        seg = out["rpn_out"].seg_preds if batched else out["rpn_out"].seg_preds[0]
        sem_label = jnp.argmax(seg, axis=-1).astype(jnp.int32)
        pan_hw = tuple(pred.result.panoptic_seg.shape[-2:])
        shape = (seg.shape[0], *pan_hw) if batched else pan_hw
        sem_label = jax.image.resize(sem_label, shape, method="nearest")
        # bool on the wire (4x fewer bytes to host); _finish_frame re-floats it
        semantic_thing = sem_label < cfg.num_thing_classes
        if compact_host:
            res = pred.result
            emb = out["track_embeds"] if batched else out["track_embeds"][0]
            return dict(
                pan=res.panoptic_seg.astype(jnp.int16),  # ids < 2^15 always
                keep=res.keep, seg_ids=res.seg_ids.astype(jnp.int16),
                labels=res.labels.astype(jnp.int16), scores=res.scores,
                isthing=res.isthing, areas=res.areas,
                instance_idx=res.instance_idx.astype(jnp.int16),
                thing_mask_idx=pred.thing_mask_idx.astype(jnp.int16),
                # bf16 on the wire: halves the largest remaining payload; the
                # host re-floats and the ~0.4% dot-product noise is far below
                # the tracker's match thresholds
                embeds=emb.astype(jnp.bfloat16),
                semantic_thing=semantic_thing,
                new_obj_feats=out["new_obj_feats"],
            )
        return dict(
            pred=pred,
            embeds=out["track_embeds"] if batched else out["track_embeds"][0],
            semantic_thing=semantic_thing,
            new_obj_feats=out["new_obj_feats"],
        )

    @jax.jit
    def _step(vars_, img, prev_obj_feats, is_first):
        return _frame(vars_, img, prev_obj_feats, is_first)

    # windowed scan over the carried kernels (see the device-tracker factory
    # for why: one dispatch + one stacked payload per window)
    @jax.jit
    def _scan(vars_, imgs, prev_obj_feats, is_firsts, do):
        def body(prev, x):
            img, isf, d = x
            p = _frame(vars_, img, prev, isf)
            new_prev = p.pop("new_obj_feats")
            return jnp.where(d, new_prev, prev), p
        prev, payloads = jax.lax.scan(
            body, prev_obj_feats, (imgs, is_firsts, do)
        )
        payloads["new_obj_feats"] = prev
        return payloads

    def step(img, prev_obj_feats, is_first):
        return _step(variables, img, prev_obj_feats, is_first)

    def scan_step(imgs, prev_obj_feats, is_firsts, do):
        return _scan(variables, imgs, prev_obj_feats, is_firsts, do)

    step.scan = scan_step
    return step


@dataclass
class VPSResult:
    panoptic_seg: np.ndarray
    segments_info: list
    semantic_map: np.ndarray
    track_map: np.ndarray


def semantic_map_from_panoptic(
    pan: np.ndarray,
    segments_info: list,
    *,
    num_thing_classes: int,
    num_stuff_classes: int,
    thing_ids_in_orig: tuple[int, ...] | None = KITTI_STEP_THING_IDS,
) -> np.ndarray:
    """Panoptic ids -> dataset-label-space semantic map (joint_train.py:698-722).

    thing_ids_in_orig given (KITTI-STEP style): thing k -> thing_ids_in_orig[k];
    stuff (1-based cat) -> its original index skipping thing slots.
    None: the dataset space IS the repo's things-first space (VIP-Seg after the
    vip2hb-equivalent decode): thing -> cat; stuff -> cat - 1 + num_thing.
    """
    # segment-id -> class lookup table, then one gather over the id map
    # (a per-segment `pan == id` compare is O(K*HW) and dominated run_frame)
    max_id = max((seg["id"] for seg in segments_info), default=0)
    lut = np.zeros(max_id + 1, np.int32)
    for seg in segments_info:
        if seg["isthing"]:
            if thing_ids_in_orig is not None:
                cls = thing_ids_in_orig[seg["category_id"]]
            else:
                cls = seg["category_id"]
        else:
            cat = seg["category_id"] - 1
            if thing_ids_in_orig is not None:
                offset = 0
                for tid in thing_ids_in_orig:
                    if cat + offset >= tid:
                        offset += 1
                cls = cat + offset
            else:
                cls = cat + num_thing_classes
        lut[seg["id"]] = cls
    return lut[np.minimum(pan, max_id)]


class VPSInferencePipeline:
    """Carries per-video state; call run_frame for each frame in order.

    tracker_type selects the association strategy:
      'quasi_dense' — the release tracker (QuasiDenseEmbedTracker), run
                      ON DEVICE inside the jitted frame step (the default
                      serving path; models/video/device_tracker.py);
      'quasi_dense_host' — the same tracker on host (numpy oracle path,
                      models/video/tracker.py);
      'unitrack'    — the K-Net + UniTrack baseline (Kalman + appearance,
                      knet/video/knet_uni_track.py:13);
      'tao'         — the TAO long-tail ablation tracker
                      (qdtrack/trackers/tao_tracker.py:19);
      'simple' / 'overlap' — the GIoU / mask-IoU greedy matchers
                      (knet/video/tracker.py:14).
    """

    def __init__(self, model: VideoKNet, variables, cfg: VideoKNetConfig, out_hw,
                 thing_ids_in_orig=KITTI_STEP_THING_IDS,
                 tracker_type: str = "quasi_dense", step_fn=None,
                 appearance_fn=None):
        self.cfg = cfg
        self.out_hw = out_hw
        self.thing_ids_in_orig = thing_ids_in_orig
        self.tracker_type = tracker_type
        # UniTrack baseline: a frozen appearance encoder over the raw frame
        # (models/video/appearance.py, unitrack/mask.py:25) replaces the
        # learned track-head embeddings for association
        self.appearance_fn = appearance_fn
        # the device tracker needs the compact/fast decode (id maps at merge
        # resolution); fall back to the host tracker when fast_decode is off
        self.device_tracker = (
            tracker_type == "quasi_dense" and cfg.test.fast_decode
        )
        # compact payload: id maps cross to the host at merge resolution and
        # are nearest-upsampled there (identical labels; ~25x fewer bytes).
        # Gated on fast_decode: with fast_decode=False the config asks for
        # bilinear mask upsampling BEFORE the merge (the reference's order,
        # kernel_iter_head.py:616-655), which the compact path cannot honor —
        # the full payload (decode at out_hw on device) is used instead.
        # step_fn lets MultiStreamVPSPipeline share ONE jitted batched step
        # across its per-stream host states. Such stream objects are
        # _finish_frame containers only: their step takes [B,...] rounds, so
        # the single-stream run paths must never pick up its scan attribute
        # (guarded via _own_step in run_sequence, ADVICE r04).
        self._own_step = step_fn is None
        if step_fn is not None:
            self.step = step_fn
        elif self.device_tracker:
            self.step = make_device_tracker_frame_step(
                model, variables, cfg, out_hw, thing_ids_in_orig
            )
        else:
            self.step = make_frame_step(
                model, variables, cfg, out_hw, compact_host=cfg.test.fast_decode
            )
        n_tot = cfg.num_proposals + cfg.num_stuff_classes
        k = cfg.head.conv_kernel_size**2
        self._zero_obj = jnp.zeros((1, n_tot, k, cfg.head.in_channels), jnp.float32)
        # device-resident is_first flags, created ONCE: a fresh
        # jnp.asarray(bool) per frame is a host->device transfer that
        # serializes against the step over the remote-TPU tunnel (~6 ms/frame
        # — measured as the r04 device_step_fps halving vs r03's loop that
        # kept the flag on device)
        self._flag = {
            False: jnp.asarray(False),
            True: jnp.asarray(True),
        }
        # per-window (is_firsts, do) flag pairs, device-resident and cached by
        # value pattern — only (True, False, ...) / all-False / short-final
        # patterns occur, so the cache stays tiny
        self._wflag_cache: dict = {}
        self.reset()

    def _make_tracker(self):
        if self.device_tracker:
            return None  # association state lives on device (track_state)
        if self.tracker_type in ("quasi_dense", "quasi_dense_host"):
            return QuasiDenseEmbedTracker(self.cfg.tracker)
        if self.tracker_type == "tao":
            from video_knet_tpu.models.video.tao_tracker import TaoTracker

            return TaoTracker()
        if self.tracker_type == "unitrack":
            from video_knet_tpu.models.video.unitrack import MaskAssociationTracker

            return MaskAssociationTracker()
        from video_knet_tpu.models.video.tracker_variants import (
            OverlapTracker,
            SimpleMaskTracker,
        )

        if self.tracker_type == "overlap":
            return OverlapTracker()
        if self.tracker_type == "simple":
            return SimpleMaskTracker()
        raise ValueError(self.tracker_type)

    def reset(self):
        self.tracker = self._make_tracker()
        self.prev_obj_feats = self._zero_obj
        self.frame_id = 0
        if self.device_tracker:
            from video_knet_tpu.models.video.device_tracker import (
                init_tracker_state,
            )

            self.track_state = init_tracker_state(
                self.cfg.tracker, self.cfg.test.max_per_img,
                _track_embed_dim(self.cfg),
            )

    def _step(self, img, is_first):
        """One device step (either tracker path); updates carried state."""
        flag = self._flag[bool(is_first)]
        if self.device_tracker:
            out = self.step(
                img, self.prev_obj_feats, self.track_state, flag
            )
            self.track_state = out["track_state"]
        else:
            out = self.step(img, self.prev_obj_feats, flag)
        self.prev_obj_feats = out["new_obj_feats"]
        payload = {
            k: v for k, v in out.items()
            if k not in ("new_obj_feats", "track_state")
        }
        if self.appearance_fn is not None and self.tracker_type == "unitrack":
            # rides the same windowed device_get as the rest of the payload
            payload["app_feat"] = self.appearance_fn(img)
        return payload

    def run_frame(self, img: jnp.ndarray, is_first: bool) -> VPSResult:
        if is_first:
            self.reset()
        payload = self._step(img, is_first)
        # ONE device->host transfer for everything the host needs (separate
        # np.asarray pulls would pay one device round-trip each — ruinous over
        # the remote-TPU tunnel, and still wasteful over PCIe)
        return self._finish_frame(jax.device_get(payload))

    def _scan_window(self, buf, window: int):
        """Enqueue ONE scanned device call for the buffered [(img, is_first)]
        frames (padded to `window` with do=False rows); returns the stacked
        payload handle and the real frame count."""
        imgs = [b[0] for b in buf]
        isfs = tuple(bool(b[1]) for b in buf)
        n = len(imgs)
        key = (isfs, window)
        fl = self._wflag_cache.get(key)
        if fl is None:
            pad = window - n
            fl = (
                jnp.asarray(np.array(list(isfs) + [False] * pad)),
                jnp.asarray(np.array([True] * n + [False] * pad)),
            )
            # bounded FIFO (ADVICE r04): each entry pins two device buffers;
            # steady serving only ever sees a handful of patterns, so
            # rebuilding a rare evicted one costs a ~16-byte transfer
            if len(self._wflag_cache) >= _WFLAG_CACHE_CAP:
                self._wflag_cache.pop(next(iter(self._wflag_cache)))
            self._wflag_cache[key] = fl
        isf_arr, do_arr = fl
        stacked = jnp.stack(imgs + [imgs[-1]] * (window - n))
        if self.device_tracker:
            out = self.step.scan(
                stacked, self.prev_obj_feats, self.track_state, isf_arr, do_arr
            )
            self.track_state = out.pop("track_state")
        else:
            out = self.step.scan(stacked, self.prev_obj_feats, isf_arr, do_arr)
        self.prev_obj_feats = out.pop("new_obj_feats")
        return out, n

    def run_sequence(self, frames, is_first_flags=None, window: int = 8,
                     depth: int = 1, stats: list | None = None):
        """Pipelined online inference over an iterable of frames.

        Yields one VPSResult per frame. `window` frames go to the device as
        ONE scanned call (the per-frame recurrence — kernels + tracker memory
        — is the scan carry) and come back as ONE stacked payload, so both the
        dispatch overhead and the device→host round-trip amortize across the
        window while the NEXT window computes. window=1 degrades gracefully to
        per-frame latency mode (no scan graph); the tracker sees every frame
        strictly in order either way.

        depth: windows kept in flight before the oldest is fetched (depth=1 =
        classic double buffering; >1 rides out tunnel-RTT jitter at the cost
        of latency). stats: optional list; one dict per drained window is
        appended — {'fetch_s': device_get wall (device wait + transfer),
        'host_s': host-side _finish_frame wall, 'frames': n} — so serving
        regressions can be attributed to the wire vs the host.

        The drain (fetch + host finishing) of window t runs on worker threads
        while the main thread keeps enqueuing window t+1: the device never
        waits for the host, and the host-side work overlaps device compute.
        The on-device tracker leaves _finish_frame order-independent (pure
        payload formatting), so two windows may finish concurrently; host
        tracker paths serialize on one worker (the tracker is stateful)."""
        import collections
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        # the unitrack ablation rides a per-frame appearance_fn payload; keep
        # it on the per-frame path rather than teaching the scan about it
        use_scan = (
            self._own_step and hasattr(self.step, "scan") and window > 1
            and self.appearance_fn is None
        )
        pending: collections.deque = collections.deque()  # of Futures
        buf: list = []

        def drain(item):
            if use_scan:
                payload, n = item
                t0 = _time.perf_counter()
                host = jax.device_get(payload)
                t1 = _time.perf_counter()
                results = [
                    self._finish_frame(
                        jax.tree_util.tree_map(lambda v: v[i], host)
                    )
                    for i in range(n)
                ]
            else:
                t0 = _time.perf_counter()
                hosts = jax.device_get(item)
                t1 = _time.perf_counter()
                results = [self._finish_frame(h) for h in hosts]
            if stats is not None:
                stats.append({
                    "fetch_s": t1 - t0,
                    "host_s": _time.perf_counter() - t1,
                    "frames": len(results),
                })
            return results

        pool = ThreadPoolExecutor(
            max_workers=2 if self.device_tracker else 1
        )
        try:
            def flush_buf(buf):
                item = self._scan_window(buf, window) if use_scan else buf
                pending.append(pool.submit(drain, item))

            for i, img in enumerate(frames):
                is_first = (
                    (i == 0) if is_first_flags is None else is_first_flags[i]
                )
                if is_first and i > 0:
                    # sequence boundary: flush everything (the host-side state
                    # below is only reset once all in-flight windows finished)
                    if buf:
                        flush_buf(buf)
                        buf = []
                    while pending:
                        yield from pending.popleft().result()
                if is_first:
                    self.reset()
                buf.append(
                    (img, is_first) if use_scan else self._step(img, is_first)
                )
                if len(buf) >= max(window, 1):
                    flush_buf(buf)
                    buf = []
                    while len(pending) > max(depth, 1):
                        yield from pending.popleft().result()
            if buf:
                flush_buf(buf)
            while pending:
                yield from pending.popleft().result()
        finally:
            pool.shutdown(wait=True)

    def _finish_frame(self, host: dict) -> VPSResult:
        """Host-side tracker + map construction on the compact fetched payload.

        The panoptic id map arrives at merge resolution; all per-segment work
        (mask extraction, boxes, semantic map) runs there, and only the final
        label maps are nearest-upsampled to out_hw — the same upsample the
        device's fast_decode path would have applied, so labels are identical.
        """
        from video_knet_tpu.data.transforms import nearest_resize
        from video_knet_tpu.ops.panoptic import PanopticResult

        if "lut_track" in host:  # device-tracker payload: id map + LUTs
            pan_ids = np.asarray(host["pan"], np.int32)
            res = PanopticResult(
                panoptic_seg=pan_ids,
                keep=np.asarray(host["keep"]),
                seg_ids=np.asarray(host["seg_ids"], np.int32),
                labels=np.asarray(host["labels"], np.int32),
                scores=np.asarray(host["scores"]),
                isthing=np.asarray(host["isthing"]),
                areas=np.asarray(host["areas"]),
                instance_idx=np.asarray(host["instance_idx"], np.int32),
            )
            pan, segments_info = segments_to_host(res, self.cfg.num_thing_classes)
            oh, ow = self.out_hw
            # NO frame_id increment here: on the device-tracker payload path
            # association already happened on device, _finish_frame is pure
            # payload formatting and may run CONCURRENTLY on two drain
            # workers (run_sequence uses a 2-worker pool) — a self.frame_id
            # += 1 here would be a data race (ADVICE r04). frame_id is only
            # consumed by the host-tracker paths, which serialize on one
            # worker. Note stats entries may likewise append out of window
            # order on this path.
            # ONE upsample of the id map, then the LUT gathers at out res —
            # nearest resize commutes with pointwise LUTs, so this equals the
            # device-side lut[pan] maps upsampled (3 resizes -> 1)
            if pan.shape != (oh, ow):
                pan = nearest_resize(pan, (oh, ow))
            pan_c = np.minimum(pan, len(host["lut_sem"]) - 1)
            sem = np.asarray(host["lut_sem"], np.int32)[pan_c]
            track_map = np.asarray(host["lut_track"], np.int32)[pan_c]
            return VPSResult(pan, segments_info, sem, track_map)

        if "pred" in host:  # full payload (fast_decode=False: decoded at out_hw)
            p = host["pred"]
            res = PanopticResult(*[np.asarray(x) for x in p.result])
            res = res._replace(
                panoptic_seg=res.panoptic_seg.astype(np.int32),
                seg_ids=res.seg_ids.astype(np.int32),
                labels=res.labels.astype(np.int32),
                instance_idx=res.instance_idx.astype(np.int32),
            )
            thing_mask_idx = np.asarray(p.thing_mask_idx, np.int32)
        else:
            res = PanopticResult(
                panoptic_seg=np.asarray(host["pan"], np.int32),
                keep=np.asarray(host["keep"]),
                seg_ids=np.asarray(host["seg_ids"], np.int32),
                labels=np.asarray(host["labels"], np.int32),
                scores=np.asarray(host["scores"]),
                isthing=np.asarray(host["isthing"]),
                areas=np.asarray(host["areas"]),
                instance_idx=np.asarray(host["instance_idx"], np.int32),
            )
            thing_mask_idx = np.asarray(host["thing_mask_idx"], np.int32)
        pan, segments_info = segments_to_host(res, self.cfg.num_thing_classes)
        semantic_thing = np.asarray(host["semantic_thing"], dtype=np.float32)
        embeds = np.asarray(host["embeds"], dtype=np.float32)
        oh, ow = self.out_hw
        sy, sx = oh / pan.shape[0], ow / pan.shape[1]

        # collect kept things (joint_train.py:541-567)
        keep = res.keep
        isthing = res.isthing
        thing_sel = np.nonzero(keep & isthing)[0]
        track_map = np.zeros(pan.shape, np.float64)
        if len(thing_sel) > 0:
            masks = np.stack([pan == int(res.seg_ids[k]) for k in thing_sel])
            labels = res.labels[thing_sel]
            scores = res.scores[thing_sel]
            # candidate k indexes the topk thing list; its embedding comes from its
            # source proposal (thing_mask_idx)
            inst = res.instance_idx[thing_sel]
            det_embeds = embeds[thing_mask_idx[inst]]
            filt = masks * semantic_thing[None]
            if self.tracker_type in ("quasi_dense", "quasi_dense_host", "tao"):
                # boxes in out_hw coords (scale-consistent with prior frames)
                boxes = masks_to_boxes(filt) * np.array([sx, sy, sx, sy])
                bboxes5 = np.concatenate([boxes, scores[:, None]], axis=1)
                sel, _, ids = self.tracker.match(
                    bboxes5, labels, det_embeds, self.frame_id
                )
                ids = ids + 1
                ids[ids == -1] = 0  # suppressed (-2 + 1) -> 0
            elif self.tracker_type == "unitrack":
                if "app_feat" in host:
                    # frozen appearance features, mask-pooled on the merge-
                    # resolution candidate masks (unitrack/mask.py:22-46)
                    from video_knet_tpu.models.video.unitrack import (
                        mask_pool_embeddings,
                    )

                    det_embeds = mask_pool_embeddings(
                        np.asarray(host["app_feat"][0], np.float32),
                        filt > 0.5,
                    )
                ids = self.tracker.step(filt.astype(bool), det_embeds, scores)
                sel = np.arange(len(ids))
            else:  # simple / overlap
                ids = self.tracker.step(filt.astype(bool), scores)
                sel = np.arange(len(ids))
            for src, tid in zip(sel, ids):
                if tid > 0:
                    track_map[masks[src].astype(bool)] = tid

        sem = semantic_map_from_panoptic(
            pan, segments_info,
            num_thing_classes=self.cfg.num_thing_classes,
            num_stuff_classes=self.cfg.num_stuff_classes,
            thing_ids_in_orig=self.thing_ids_in_orig,
        )
        self.frame_id += 1
        if pan.shape != (oh, ow):
            pan = nearest_resize(pan, (oh, ow))
            sem = nearest_resize(sem, (oh, ow))
            track_map = nearest_resize(track_map, (oh, ow))
        return VPSResult(pan, segments_info, sem, track_map)



class MultiStreamVPSPipeline:
    """Online VPS over B independent video streams with ONE batched device step.

    The serving configuration: frame t of every stream runs in one jitted call
    (batched backbone/heads/decode), per-stream trackers run on host. Streams
    reset independently via the per-stream `is_first` flags — first-frame rows
    zero their carried kernels inside the device step.
    """

    def __init__(self, model: VideoKNet, variables, cfg: VideoKNetConfig, out_hw,
                 n_streams: int, thing_ids_in_orig=KITTI_STEP_THING_IDS,
                 tracker_type: str = "quasi_dense", host_workers: int = 0):
        self.cfg = cfg
        self.n = n_streams
        # >0: per-stream _finish_frame runs on a thread pool (streams are
        # independent; numpy releases the GIL for the heavy gathers). The
        # 1-core dev box can't show the win — a real TPU host has many cores.
        self._pool = None
        if host_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=host_workers)
        self.device_tracker = (
            tracker_type == "quasi_dense" and cfg.test.fast_decode
        )
        if self.device_tracker:
            from video_knet_tpu.models.video.device_tracker import (
                init_tracker_state,
            )

            self.step = make_device_tracker_frame_step(
                model, variables, cfg, out_hw, thing_ids_in_orig, batched=True
            )
            one = init_tracker_state(
                cfg.tracker, cfg.test.max_per_img, _track_embed_dim(cfg)
            )
            self.track_state = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n_streams, *x.shape)), one
            )
        else:
            self.step = make_frame_step(model, variables, cfg, out_hw,
                                        batched=True,
                                        compact_host=cfg.test.fast_decode)
        # per-stream host state (tracker, frame counter) shares the one step
        self.streams = [
            VPSInferencePipeline(
                model, variables, cfg, out_hw,
                thing_ids_in_orig=thing_ids_in_orig,
                tracker_type=tracker_type, step_fn=self.step,
            )
            for _ in range(n_streams)
        ]
        n_tot = cfg.num_proposals + cfg.num_stuff_classes
        k = cfg.head.conv_kernel_size**2
        self.prev_obj = jnp.zeros(
            (n_streams, n_tot, k, cfg.head.in_channels), jnp.float32
        )
        # steady-state flags, device-resident once (see VPSInferencePipeline
        # _flag: a per-round host->device bool transfer serializes against the
        # step through the remote tunnel)
        self._all_false = jnp.zeros((n_streams,), bool)
        # per-window scanned-round flag cache (see VPSInferencePipeline)
        self._wflag_cache: dict = {}

    @staticmethod
    def _slice(host: dict, i: int) -> dict:
        # tree_map (not dict values) so a full payload's PanopticPrediction
        # NamedTuple is sliced leaf-wise, not tuple-indexed
        return jax.tree_util.tree_map(lambda v: v[i], host)

    def _finish_round(self, host: dict, flags) -> list[VPSResult]:
        for i in range(self.n):
            if flags[i]:
                self.streams[i].tracker = self.streams[i]._make_tracker()
                self.streams[i].frame_id = 0
        if self._pool is not None:
            return list(
                self._pool.map(
                    lambda i: self.streams[i]._finish_frame(self._slice(host, i)),
                    range(self.n),
                )
            )
        return [
            self.streams[i]._finish_frame(self._slice(host, i))
            for i in range(self.n)
        ]

    def _step(self, imgs, flags):
        dflags = self._all_false if not np.any(flags) else jnp.asarray(flags)
        if self.device_tracker:
            out = self.step(
                imgs, self.prev_obj, self.track_state, dflags
            )
            self.track_state = out["track_state"]
        else:
            out = self.step(imgs, self.prev_obj, dflags)
        self.prev_obj = out["new_obj_feats"]
        return {
            k: v for k, v in out.items()
            if k not in ("new_obj_feats", "track_state")
        }

    def run_frames(self, imgs, is_first_flags) -> list[VPSResult]:
        """imgs: [B, H, W, 3]; is_first_flags: [B] bools. One result per stream."""
        flags = np.asarray(is_first_flags, bool)
        payload = self._step(imgs, flags)
        return self._finish_round(jax.device_get(payload), flags)

    def _scan_rounds(self, buf, window: int):
        """ONE scanned device call for the buffered [(imgs, flags)] rounds
        (padded with do=False rows); returns (stacked payload, real count,
        per-round flags)."""
        imgs = [b[0] for b in buf]
        keys = tuple(tuple(bool(f) for f in b[1]) for b in buf)
        n = len(imgs)
        key = (keys, window)
        fl = self._wflag_cache.get(key)
        if fl is None:
            pad = window - n
            rows = [list(k) for k in keys] + [[False] * self.n] * pad
            fl = (
                jnp.asarray(np.array(rows, bool)),
                jnp.asarray(np.array([True] * n + [False] * pad)),
            )
            # bounded FIFO (ADVICE r04): with streams resetting at arbitrary
            # offsets the key space is 2^(B*window) — unbounded caching would
            # pin device buffers forever
            if len(self._wflag_cache) >= _WFLAG_CACHE_CAP:
                self._wflag_cache.pop(next(iter(self._wflag_cache)))
            self._wflag_cache[key] = fl
        isf_arr, do_arr = fl
        stacked = jnp.stack(imgs + [imgs[-1]] * (window - n))
        if self.device_tracker:
            out = self.step.scan(
                stacked, self.prev_obj, self.track_state, isf_arr, do_arr
            )
            self.track_state = out.pop("track_state")
        else:
            out = self.step.scan(stacked, self.prev_obj, isf_arr, do_arr)
        self.prev_obj = out.pop("new_obj_feats")
        return out, n, [b[1] for b in buf]

    def run_batched_sequence(self, rounds, flags_per_round=None,
                             depth: int = 2, stats: list | None = None,
                             window: int = 4):
        """Pipelined serving loop: `rounds` yields [B, H, W, 3] frame batches.

        Yields a list of B VPSResults per round. `window` rounds go to the
        device as ONE scanned call and return one stacked payload (see
        run_sequence — dispatch and fetch amortize across window*B frames);
        up to `depth` windows stay in flight, and each drain (fetch + all
        per-stream host finishing) runs on a worker thread so host work
        overlaps device compute. stats: optional list, appended one
        {'fetch_s','host_s','frames'} dict per drained window."""
        import collections
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        use_scan = hasattr(self.step, "scan") and window > 1
        pending: collections.deque = collections.deque()  # Futures
        buf: list = []

        def drain(item):
            if use_scan:
                payload, nr, flag_rows = item
                t0 = _time.perf_counter()
                host = jax.device_get(payload)
                t1 = _time.perf_counter()
                out = [
                    self._finish_round(
                        jax.tree_util.tree_map(lambda v: v[t], host),
                        flag_rows[t],
                    )
                    for t in range(nr)
                ]
            else:
                payload, pflags = item
                t0 = _time.perf_counter()
                host = jax.device_get(payload)
                t1 = _time.perf_counter()
                out = [self._finish_round(host, pflags)]
            if stats is not None:
                stats.append({
                    "fetch_s": t1 - t0,
                    "host_s": _time.perf_counter() - t1,
                    "frames": len(out) * self.n,
                })
            return out

        # Drain workers: with the on-device tracker, _finish_round is pure
        # payload formatting (per-stream host trackers are None), so two
        # windows may finish concurrently; host-tracker paths mutate
        # per-stream tracker state and must finish strictly in order
        pool = ThreadPoolExecutor(max_workers=2 if self.device_tracker else 1)
        try:
            for t, imgs in enumerate(rounds):
                flags = (
                    np.full((self.n,), t == 0, bool)
                    if flags_per_round is None
                    else np.asarray(flags_per_round[t], bool)
                )
                if use_scan:
                    buf.append((imgs, flags))
                    if len(buf) >= window:
                        pending.append(
                            pool.submit(drain, self._scan_rounds(buf, window))
                        )
                        buf = []
                else:
                    pending.append(
                        pool.submit(drain, (self._step(imgs, flags), flags))
                    )
                while len(pending) > max(depth, 1):
                    yield from pending.popleft().result()
            if buf:
                pending.append(pool.submit(drain, self._scan_rounds(buf, window)))
            while pending:
                yield from pending.popleft().result()
        finally:
            pool.shutdown(wait=True)
