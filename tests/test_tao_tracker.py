"""TaoTracker oracle tests: hand-transcribed reference behavior on synthetic
detections (knet/video/qdtrack/trackers/tao_tracker.py:19-327).

Each case pins one branch of the reference algorithm with hand-computed
expectations: distractor NMS indexing, masked-exponential bisoftmax scores,
the obj-score-diff gate, greedy column zeroing, score/embed momenta, and
memo expiry.
"""

import numpy as np
import pytest

from video_knet_tpu.models.video.tao_tracker import TaoTracker, TaoTrackerConfig


def box(x1, y1, x2, y2, s):
    return np.array([x1, y1, x2, y2, s], np.float32)


def unit(*v):
    a = np.asarray(v, np.float32)
    return a / np.linalg.norm(a)


def test_distractor_nms_low_score_same_class_dropped():
    """tao_tracker.py:139-148: only dets below distractor_score_thr are NMS
    candidates, suppressed only by LOWER-INDEX same-class overlaps."""
    t = TaoTracker(TaoTrackerConfig(distractor_score_thr=0.5,
                                    distractor_nms_thr=0.3))
    bboxes = np.stack([
        box(0, 0, 10, 10, 0.9),   # high score: never a candidate
        box(0, 0, 10, 10, 0.4),   # low, overlaps det0, same class -> dropped
        box(0, 0, 10, 10, 0.4),   # low, overlaps det0 but class differs -> kept
        box(50, 50, 60, 60, 0.4), # low, no overlap -> kept
    ])
    labels = np.array([0, 0, 1, 0])
    embeds = np.stack([unit(1, 0), unit(1, 0), unit(0, 1), unit(1, 1)])
    sel, out_labels, ids = t.match(bboxes, labels, embeds, frame_id=0)
    np.testing.assert_array_equal(sel, [0, 2, 3])
    np.testing.assert_array_equal(out_labels, [0, 1, 0])
    # first frame: all survivors above init_score_thr get fresh ids in order
    np.testing.assert_array_equal(ids, [0, 1, 2])


def test_low_score_det_survives_if_overlap_is_later_indexed():
    """The reference checks ious[i, :ind] — an overlap at a HIGHER original
    index does not suppress (input order matters, not score order)."""
    t = TaoTracker(TaoTrackerConfig())
    bboxes = np.stack([box(0, 0, 10, 10, 0.4), box(0, 0, 10, 10, 0.9)])
    labels = np.array([0, 0])
    embeds = np.stack([unit(1, 0), unit(1, 0)])
    sel, _, ids = t.match(bboxes, labels, embeds, frame_id=0)
    np.testing.assert_array_equal(sel, [0, 1])  # det0 kept: no earlier overlap
    np.testing.assert_array_equal(ids, [0, 1])


def test_bisoftmax_scores_match_hand_formula_and_assignment():
    """One det vs two memo entries: scores must equal the reference's masked
    exp / (sum + 1e-6) bisoftmax averaged with category-masked cosine."""
    cfg = TaoTrackerConfig(match_score_thr=0.5, memo_frames=10)
    t = TaoTracker(cfg)
    # frame 0: two tracklets, same class, distinct embeddings
    e0, e1 = unit(1.0, 0.0), unit(0.0, 1.0)
    b0 = np.stack([box(0, 0, 10, 10, 0.9), box(20, 20, 30, 30, 0.8)])
    t.match(b0, np.array([0, 0]), np.stack([e0, e1]), frame_id=0)

    # frame 1: one det near e0
    d = unit(0.9, 0.1)
    bboxes = box(1, 1, 11, 11, 0.85)[None]
    sel, _, ids = t.match(bboxes, np.array([0]), d[None], frame_id=1)
    assert ids[0] == 0  # matched the e0 tracklet

    # hand formula on the pre-match memory (memo order = insertion order)
    memo = np.stack([e0, e1])
    sims = d @ memo.T
    exps = np.exp(sims)  # cat_same = all True here
    d2t = exps / (exps.sum() + 1e-6)
    t2d = exps / (exps + 1e-6)  # single det: column sums are the entries
    scores = (d2t + t2d) / 2.0
    cos = d @ memo.T
    scores = (scores + cos) / 2.0
    assert scores[0] > cfg.match_score_thr  # the assignment we asserted
    assert scores[0] > scores[1]


def test_obj_score_diff_gate_blocks_match():
    """tao_tracker.py:183-195: |det score - memo score| >= obj_score_diff_thr
    forbids the match even at high similarity."""
    cfg = TaoTrackerConfig(obj_score_diff_thr=0.2)
    t = TaoTracker(cfg)
    e = unit(1.0, 0.0)
    t.match(box(0, 0, 10, 10, 0.95)[None], np.array([0]), e[None], frame_id=0)
    # same embedding, but score 0.3: diff 0.65 >= 0.2 -> new id
    _, _, ids = t.match(
        box(0, 0, 10, 10, 0.3)[None], np.array([0]), e[None], frame_id=1
    )
    assert ids[0] == 1


def test_greedy_column_zeroing_first_det_wins():
    """Two dets both best-matching one memo entry: the lower-indexed det takes
    it; the other's column is zeroed and it starts a new tracklet."""
    t = TaoTracker(TaoTrackerConfig(distractor_score_thr=0.0))  # disable NMS
    e = unit(1.0, 0.0)
    t.match(box(0, 0, 10, 10, 0.9)[None], np.array([0]), e[None], frame_id=0)
    bboxes = np.stack([box(0, 0, 10, 10, 0.9), box(40, 0, 50, 10, 0.9)])
    _, _, ids = t.match(bboxes, np.array([0, 0]), np.stack([e, e]), frame_id=1)
    assert ids[0] == 0 and ids[1] == 1


def test_score_and_embed_momenta():
    """Matched det score blends with momentum_obj_score into the stored bbox;
    the memo embed EMA weights the NEW embedding by momentum_embed."""
    cfg = TaoTrackerConfig(momentum_obj_score=0.5, momentum_embed=0.8,
                           obj_score_diff_thr=1.0)
    t = TaoTracker(cfg)
    e_old = unit(1.0, 0.0)
    t.match(box(0, 0, 10, 10, 0.9)[None], np.array([0]), e_old[None], 0)
    e_new = unit(0.8, 0.6)
    t.match(box(0, 0, 10, 10, 0.7)[None], np.array([0]), e_new[None], 1)
    tr = t.tracklets[0]
    # stored score: m*det + (1-m)*memo = 0.5*0.7 + 0.5*0.9
    assert tr["bboxes"][-1][-1] == pytest.approx(0.8, abs=1e-6)
    np.testing.assert_allclose(
        tr["embed"], 0.2 * e_old + 0.8 * e_new, atol=1e-6
    )


def test_memo_expiry_after_memo_frames():
    """A tracklet unseen for memo_frames is popped; a later identical det
    starts a fresh id (tao_tracker.py:90-96)."""
    cfg = TaoTrackerConfig(memo_frames=3)
    t = TaoTracker(cfg)
    e = unit(1.0, 0.0)
    t.match(box(0, 0, 10, 10, 0.9)[None], np.array([0]), e[None], frame_id=0)
    # empty frames advance time only through subsequent match() calls with dets
    _, _, ids = t.match(
        box(50, 50, 60, 60, 0.9)[None], np.array([1]), unit(0, 1)[None], 3
    )
    assert 0 not in t.tracklets  # expired: 3 - 0 >= memo_frames
    _, _, ids = t.match(
        box(0, 0, 10, 10, 0.9)[None], np.array([0]), e[None], frame_id=4
    )
    assert ids[0] == 2  # new id, not the expired 0


def test_category_gating_blocks_cross_class_match():
    t = TaoTracker(TaoTrackerConfig())
    e = unit(1.0, 0.0)
    t.match(box(0, 0, 10, 10, 0.9)[None], np.array([0]), e[None], frame_id=0)
    _, _, ids = t.match(
        box(0, 0, 10, 10, 0.9)[None], np.array([1]), e[None], frame_id=1
    )
    assert ids[0] == 1  # same embedding, different class -> new tracklet


def test_pipeline_accepts_tao_tracker_type():
    """tracker_type='tao' is constructible from the serving pipeline."""
    from video_knet_tpu.models.video.inference import VPSInferencePipeline

    # construct without a model: only exercise _make_tracker via a stub
    pipe = object.__new__(VPSInferencePipeline)
    pipe.tracker_type = "tao"
    pipe.device_tracker = False
    pipe.cfg = None
    tracker = VPSInferencePipeline._make_tracker(pipe)
    assert isinstance(tracker, TaoTracker)
