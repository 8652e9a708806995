"""Alternative trackers: SimpleMaskTracker / OverlapTracker / UniTrack baseline."""

import numpy as np

from video_knet_tpu.models.video.tracker_variants import (
    OverlapTracker,
    SimpleMaskTracker,
    generalized_box_iou,
    mask_iou_matrix,
)
from video_knet_tpu.models.video.unitrack import (
    KalmanFilter,
    MaskAssociationTracker,
    mask_pool_embeddings,
)


def _mask(y0, x0, h=10, w=10, hw=(32, 32)):
    m = np.zeros(hw, np.uint8)
    m[y0 : y0 + h, x0 : x0 + w] = 1
    return m


def test_giou_identity_and_disjoint():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    g = generalized_box_iou(a, b)
    assert g[0, 0] == 1.0
    assert g[0, 1] < 0  # disjoint boxes have negative GIoU


def test_simple_mask_tracker_keeps_ids():
    tr = SimpleMaskTracker(score_thresh=0.3)
    m1 = np.stack([_mask(0, 0), _mask(20, 20)])
    ids1 = tr.step(m1, np.array([0.9, 0.8]))
    assert sorted(ids1.tolist()) == [1, 2]
    # next frame: objects moved slightly -> same ids
    m2 = np.stack([_mask(2, 2), _mask(18, 18)])
    ids2 = tr.step(m2, np.array([0.9, 0.8]))
    assert ids2.tolist() == ids1.tolist()
    # low score filtered
    ids3 = tr.step(np.stack([_mask(3, 3)]), np.array([0.1]))
    assert ids3.tolist() == [0]


def test_overlap_tracker():
    tr = OverlapTracker()
    ids1 = tr.step(np.stack([_mask(0, 0)]), np.array([0.9]))
    ids2 = tr.step(np.stack([_mask(1, 1)]), np.array([0.9]))
    assert ids1[0] == ids2[0]
    # far-away detection -> new id
    ids3 = tr.step(np.stack([_mask(20, 20)]), np.array([0.9]))
    assert ids3[0] != ids1[0]


def test_kalman_filter_converges():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([10.0, 10.0, 1.0, 10.0]))
    for i in range(5):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, np.array([10.0 + i, 10.0, 1.0, 10.0]))
    assert abs(mean[4] - 1.0) < 0.7  # learned ~1 px/frame x-velocity


def test_unitrack_association():
    rng = np.random.RandomState(0)
    tr = MaskAssociationTracker()
    e1 = rng.randn(2, 16).astype(np.float32)
    m1 = np.stack([_mask(0, 0), _mask(20, 20)])
    ids1 = tr.step(m1, e1, np.array([0.9, 0.9]))
    assert sorted(ids1.tolist()) == [1, 2]
    # same embeddings, slightly moved -> same ids
    m2 = np.stack([_mask(1, 1), _mask(19, 19)])
    ids2 = tr.step(m2, e1 + 0.01 * rng.randn(2, 16).astype(np.float32), np.array([0.9, 0.9]))
    assert ids2.tolist() == ids1.tolist()


def test_mask_pool_embeddings():
    feats = np.zeros((8, 8, 4), np.float32)
    feats[:4] = [1, 0, 0, 0]
    feats[4:] = [0, 1, 0, 0]
    masks = np.stack([_mask(0, 0, 8, 16, hw=(16, 16)), _mask(8, 0, 8, 16, hw=(16, 16))])
    emb = mask_pool_embeddings(feats, masks)
    assert emb[0, 0] == 1.0 and emb[1, 1] == 1.0


def test_roi_track_head_and_loss():
    import jax
    import jax.numpy as jnp
    from video_knet_tpu.models.video.roi_track_head import (
        ROITrackHead,
        masks_to_boxes_jax,
        roi_track_loss,
    )

    masks = jnp.zeros((3, 16, 16)).at[0, 2:8, 4:10].set(1.0).at[1, 8:14, 0:6].set(1.0)
    boxes = masks_to_boxes_jax(masks)
    assert boxes[0].tolist() == [4.0, 2.0, 10.0, 8.0]
    assert boxes[2].tolist() == [0.0, 0.0, 0.0, 0.0]  # empty

    head = ROITrackHead(embed_channels=32, num_convs=1)
    feats = jnp.ones((1, 8, 8, 16))
    variables = head.init(jax.random.PRNGKey(0), feats, boxes[None] / 2.0, 1.0)
    emb = head.apply(variables, feats, boxes[None] / 2.0, 1.0)
    assert emb.shape == (1, 3, 32)

    valid = jnp.array([[True, True, False]])
    ids = jnp.array([[1, 2, -1]])
    losses = roi_track_loss(emb, emb, valid, valid, ids, ids)
    assert np.isfinite(float(losses["loss_track_roi"]))
