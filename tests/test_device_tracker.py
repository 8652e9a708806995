"""On-device QuasiDenseEmbedTracker vs the host oracle (VERDICT r2 item 1).

The device tracker (models/video/device_tracker.py) must produce IDENTICAL id
assignments to the host tracker (models/video/tracker.py, itself the oracle
rebuild of quasi_dense_embed_tracker.py:9-207) on synthetic detection streams
covering: matching, new-id allocation, IoU dedup, low-score suppression (-2),
backdrops, category gating, tracklet expiry, and sequence resets.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_knet_tpu.config import TrackerConfig
from video_knet_tpu.models.video.device_tracker import (
    init_tracker_state,
    reset_state,
    tracker_match,
)
from video_knet_tpu.models.video.tracker import QuasiDenseEmbedTracker

K, D = 12, 16


def _rand_frame(rng, n_valid, n_classes=3, drift=None):
    """Synthetic detections: well-separated boxes + distinct embeddings."""
    boxes = np.zeros((K, 5), np.float32)
    labels = np.zeros((K,), np.int64)
    embeds = np.zeros((K, D), np.float32)
    valid = np.zeros((K,), bool)
    for i in range(n_valid):
        cx = 40.0 + 90.0 * i + rng.uniform(-6, 6)
        cy = 50.0 + rng.uniform(-6, 6)
        w, h = rng.uniform(22, 34), rng.uniform(22, 34)
        boxes[i] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
                    rng.uniform(0.45, 0.95)]
        labels[i] = i % n_classes
        base = np.zeros(D)
        base[i % D] = 4.0
        embeds[i] = base + 0.15 * rng.randn(D) + (drift[i] if drift is not None else 0)
        valid[i] = True
    return boxes, labels, embeds, valid


def _host_ids(tracker, boxes, labels, embeds, valid, frame_id):
    """Run the host tracker on the valid rows; return ids in INPUT order."""
    sel_in = np.nonzero(valid)[0]
    out = np.full((K,), -1, np.int64)
    if len(sel_in) == 0:
        return out
    sel, _, ids = tracker.match(
        boxes[sel_in], labels[sel_in], embeds[sel_in], frame_id
    )
    out[sel_in[sel]] = ids
    return out


def _run_both(frames, cfg, resets=None):
    """frames: list of (boxes, labels, embeds, valid). Returns (host, dev) id
    arrays [T, K] (input order; -1 where not assigned/survived)."""
    host_tracker = QuasiDenseEmbedTracker(cfg)
    state = init_tracker_state(cfg, K, D)
    step = jax.jit(lambda s, b, l, e, v: tracker_match(s, b, l, e, v, cfg))
    host_all, dev_all = [], []
    frame_id = 0
    for t, (boxes, labels, embeds, valid) in enumerate(frames):
        if resets and t in resets:
            host_tracker = QuasiDenseEmbedTracker(cfg)
            state = reset_state(state, jnp.asarray(True))
            frame_id = 0
        h = _host_ids(host_tracker, boxes, labels, embeds, valid, frame_id)
        state, ids, survived = step(
            state, jnp.asarray(boxes), jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(embeds), jnp.asarray(valid),
        )
        d = np.where(np.asarray(survived), np.asarray(ids), -1)
        host_all.append(h)
        dev_all.append(d)
        frame_id += 1
    return np.stack(host_all), np.stack(dev_all)


def test_basic_tracking_and_new_ids():
    cfg = TrackerConfig()
    rng = np.random.RandomState(0)
    frames = [_rand_frame(np.random.RandomState(7), 4) for _ in range(6)]
    host, dev = _run_both(frames, cfg)
    np.testing.assert_array_equal(host, dev)
    # ids persist across frames
    assert (host[0, :4] >= 0).all()
    np.testing.assert_array_equal(host[0, :4], host[5, :4])


def test_expiry_reassigns_new_ids():
    """Expiry is pruned post-match on DETECTION frames only (the reference
    never calls the tracker on empty frames): objects A,B at frame 0, an
    unrelated object C on frames 1-3 (prunes A,B once 2 frames stale), then
    A,B return at frame 4 -> fresh ids."""
    cfg = TrackerConfig(memo_tracklet_frames=2)
    mk = lambda n: _rand_frame(np.random.RandomState(3), n)

    def other():  # far-away object with a distinct embedding + class
        boxes = np.zeros((K, 5), np.float32)
        labels = np.full((K,), 2, np.int64)
        embeds = np.zeros((K, D), np.float32)
        valid = np.zeros((K,), bool)
        boxes[0] = [400, 200, 440, 240, 0.9]
        embeds[0, D - 1] = 4.0
        valid[0] = True
        return boxes, labels, embeds, valid

    frames = [mk(2), other(), other(), other(), mk(2)]
    host, dev = _run_both(frames, cfg)
    np.testing.assert_array_equal(host, dev)
    assert (host[4, :2] >= 0).all()
    assert (host[4, :2] != host[0, :2]).all()  # expired -> fresh ids


def test_empty_frames_keep_stale_memo_matchable():
    """No-detection frames must NOT advance pruning (reference semantics):
    after 3 empty frames the old tracklets are still rematched."""
    cfg = TrackerConfig(memo_tracklet_frames=2)
    mk = lambda n: _rand_frame(np.random.RandomState(3), n)
    empty = (np.zeros((K, 5), np.float32), np.zeros((K,), np.int64),
             np.zeros((K, D), np.float32), np.zeros((K,), bool))
    frames = [mk(2), empty, empty, empty, mk(2)]
    host, dev = _run_both(frames, cfg)
    np.testing.assert_array_equal(host, dev)
    np.testing.assert_array_equal(host[4, :2], host[0, :2])  # rematched


def test_sequence_resets():
    cfg = TrackerConfig()
    mk = lambda seed, n: _rand_frame(np.random.RandomState(seed), n)
    frames = [mk(3, 3), mk(3, 3), mk(4, 2), mk(4, 2), mk(5, 4), mk(5, 4)]
    host, dev = _run_both(frames, cfg, resets={2, 4})
    np.testing.assert_array_equal(host, dev)
    # after each reset, ids restart from 0
    assert host[2, :2].min() == 0 and host[4, :4].min() == 0


def test_iou_dedup_and_suppression():
    cfg = TrackerConfig()
    rng = np.random.RandomState(2)
    b, l, e, v = _rand_frame(rng, 3)
    # duplicate of det 0 with lower score -> removed by dedup
    b[3] = b[0]
    b[3, 4] = b[0, 4] - 0.2
    l[3] = l[0]
    e[3] = e[0] + 0.01 * rng.randn(D)
    v[3] = True
    frames = [(b, l, e, v), (b.copy(), l.copy(), e.copy(), v.copy())]
    host, dev = _run_both(frames, cfg)
    np.testing.assert_array_equal(host, dev)
    assert host[0, 3] == -1  # dedup-removed


def test_low_score_duplicate_marked_suppressed():
    cfg = TrackerConfig()
    rng = np.random.RandomState(4)
    b, l, e, v = _rand_frame(rng, 2)
    frames = [(b, l, e, v)]
    # frame 2: object 0 is GONE; a LOW-score far-away det carries object 0's
    # embedding -> its tracklet column is unclaimed, the det matches it with
    # high confidence but score < obj_score_thr -> suppressed (-2)
    b2 = np.zeros((K, 5), np.float32)
    l2 = np.zeros((K,), np.int64)
    e2 = np.zeros((K, D), np.float32)
    v2 = np.zeros((K,), bool)
    b2[0], l2[0], e2[0], v2[0] = b[1], l[1], e[1], True  # object 1 persists
    b2[1] = [300, 40, 330, 70, 0.2]  # below obj_score_thr=0.3
    l2[1] = l[0]
    e2[1] = e[0]
    v2[1] = True
    frames.append((b2, l2, e2, v2))
    host, dev = _run_both(frames, cfg)
    np.testing.assert_array_equal(host, dev)
    assert host[1, 1] == -2  # conf > nms_conf_thr but low det score


def test_category_gating():
    cfg = TrackerConfig(with_cats=True)
    rng = np.random.RandomState(5)
    b, l, e, v = _rand_frame(rng, 2)
    frames = [(b, l, e, v)]
    # same embedding, different class -> gated out, becomes a new id
    b2, l2, e2, v2 = b.copy(), l.copy(), e.copy(), v.copy()
    l2[0] = (l[0] + 1) % 3
    frames.append((b2, l2, e2, v2))
    host, dev = _run_both(frames, cfg)
    np.testing.assert_array_equal(host, dev)
    assert host[1, 0] != host[0, 0]


@pytest.mark.parametrize("metric", ["bisoftmax", "softmax", "cosine"])
def test_match_metrics(metric):
    cfg = dataclasses.replace(TrackerConfig(), match_metric=metric)
    frames = [_rand_frame(np.random.RandomState(11), 3) for _ in range(4)]
    host, dev = _run_both(frames, cfg)
    np.testing.assert_array_equal(host, dev)


def test_long_stream_with_churn():
    """30 frames with objects appearing/disappearing + 3 resets: the full
    'identical over >=3 resets/expiries' bar from the round-2 verdict."""
    cfg = TrackerConfig(memo_tracklet_frames=3)
    frames = []
    for t in range(30):
        seed = 13 + (t // 5)
        n = 2 + (t % 4)
        frames.append(_rand_frame(np.random.RandomState(seed), n,
                                  drift=0.05 * np.random.RandomState(t).randn(K, D)))
    host, dev = _run_both(frames, cfg, resets={10, 17, 24})
    np.testing.assert_array_equal(host, dev)
    assert host.max() > 0


def _sequential_greedy_oracle(sim, memo_ids, survived, dscore, cfg):
    """Numpy transcription of the reference's one-detection-at-a-time greedy
    (quasi_dense_embed_tracker.py:184-203): each score-ordered detection reads
    its best remaining memo column; an assignment zeroes that column for
    everyone after it."""
    sim = np.array(sim, np.float64)
    k = sim.shape[0]
    ids = np.full((k,), -1, np.int64)
    for i in range(k):
        j = int(np.argmax(sim[i]))
        conf = sim[i, j]
        tid = int(memo_ids[j])
        matchable = bool(survived[i]) and conf > cfg.match_score_thr and tid > -1
        assign = matchable and dscore[i] > cfg.obj_score_thr
        if assign:
            ids[i] = tid
            sim[np.arange(k) != i, j] = 0.0
        elif matchable and conf > cfg.nms_conf_thr:
            ids[i] = -2
    return ids


def test_greedy_assign_prefix_commit_equals_sequential():
    """The while_loop prefix-commit rounds must be bit-equivalent to the
    sequential greedy for dense conflict patterns (many detections whose
    argmax lands on the same column, forcing multi-round resolution)."""
    from video_knet_tpu.models.video.device_tracker import _greedy_assign

    cfg = TrackerConfig()
    k, m = 24, 40
    for seed in range(30):
        rng = np.random.RandomState(seed)
        sim = rng.rand(k, m).astype(np.float32)
        # force collisions: a few "hot" columns attract many rows' argmax
        hot = rng.randint(0, m, size=3)
        rows = rng.rand(k) < 0.6
        sim[rows][:, hot] += 0  # (copy guard)
        sim[np.ix_(np.where(rows)[0], hot)] += rng.rand(rows.sum(), 3) * 2.0
        memo_ids = np.where(rng.rand(m) < 0.7, np.arange(m), -1).astype(np.int32)
        survived = rng.rand(k) < 0.85
        dscore = np.sort(rng.rand(k).astype(np.float32))[::-1].copy()
        # zero invalid rows like tracker_match does (sim gated on pair_valid)
        sim[~survived] = 0.0
        want = _sequential_greedy_oracle(sim, memo_ids, survived, dscore, cfg)
        got = np.asarray(
            _greedy_assign(
                jnp.asarray(sim), jnp.asarray(memo_ids),
                jnp.asarray(survived), jnp.asarray(dscore), cfg
            )
        )
        np.testing.assert_array_equal(got, want, err_msg=f"seed={seed}")
