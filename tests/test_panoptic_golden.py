"""Golden test: vectorized joint-argmax merge vs a direct numpy transcription of
the reference's sequential loop (kernel_iter_head.py:467-524)."""

import jax.numpy as jnp
import numpy as np

from video_knet_tpu.ops.panoptic import merge_joint, segments_to_host


def reference_merge(masks, scores, labels, num_thing, instance_score_thr, overlap_thr):
    """Numpy transcription of merge_stuff_thing_stuff_joint's decision process."""
    h, w = masks.shape[-2:]
    pan = np.zeros((h, w), np.int32)
    prob = scores[:, None, None] * masks
    winner = prob.argmax(0)
    seg_id = 0
    infos = []
    for k in np.argsort(-scores):
        isthing = labels[k] < num_thing
        if isthing and scores[k] < instance_score_thr:
            continue
        mask = winner == k
        area = mask.sum()
        orig = (masks[k] >= 0.5).sum()
        if area > 0 and orig > 0:
            if area / orig < overlap_thr:
                continue
            seg_id += 1
            pan[mask] = seg_id
            infos.append(
                dict(id=seg_id, isthing=bool(isthing),
                     category_id=int(labels[k]) if isthing
                     else int(labels[k]) - num_thing + 1)
            )
    return pan, infos


def test_merge_joint_matches_reference_loop():
    rng = np.random.RandomState(0)
    for trial in range(8):
        k, h, w = 12, 24, 32
        num_thing = 5
        masks = rng.rand(k, h, w).astype(np.float32)
        # sharpen some masks so thresholds trigger on both sides
        masks[: k // 2] = (masks[: k // 2] > 0.5).astype(np.float32) * 0.9
        scores = rng.rand(k).astype(np.float32)
        labels = np.concatenate(
            [rng.randint(0, num_thing, k // 2),
             num_thing + np.arange(k - k // 2)]
        ).astype(np.int32)

        ref_pan, ref_infos = reference_merge(
            masks, scores, labels, num_thing, 0.25, 0.6
        )
        res = merge_joint(
            jnp.asarray(masks), jnp.asarray(scores), jnp.asarray(labels),
            num_thing_classes=num_thing, instance_score_thr=0.25, overlap_thr=0.6,
        )
        pan, infos = segments_to_host(res, num_thing)
        np.testing.assert_array_equal(pan, ref_pan, err_msg=f"trial {trial}")
        assert [i["id"] for i in infos] == [i["id"] for i in ref_infos]
        assert [i["category_id"] for i in infos] == [
            i["category_id"] for i in ref_infos
        ]
