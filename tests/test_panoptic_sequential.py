"""Sequential panoptic merge variants vs reference-loop transcription oracles.

Covers ops/panoptic.py:merge_sequential_host (thing-first,
knet/video/kernel_iter_head.py:656-741) and
merge_sequential_host_stuff_first (stuff-first, :743-830). The oracles below
re-transcribe the reference's torch loops independently (per-candidate
iteration order, break-vs-continue on the score threshold, progressive
`pan == 0` trimming), so a transcription slip in the implementation can't
cancel against an identical slip here. A hand-computed case pins the
behavioral difference between the two orderings: a thing mostly covered by an
already-painted stuff region survives thing-first but is dropped stuff-first.
"""

import numpy as np

from video_knet_tpu.ops.panoptic import (
    merge_sequential_host,
    merge_sequential_host_stuff_first,
)


def _oracle(things, t_labels, t_scores, stuffs, s_labels, s_scores,
            thr, iou_thr, stuff_max_area, stuff_first):
    h, w = things.shape[-2:]
    pan = np.zeros((h, w), np.int32)
    seg_id = 0
    infos = []

    def paste_stuff():
        nonlocal seg_id
        done = []
        for j in np.argsort(-s_scores):
            lab = int(s_labels[j])
            if lab in done:
                continue
            done.append(lab)
            sem = np.zeros((h, w), bool)
            for jj in range(len(s_labels)):
                if int(s_labels[jj]) == lab:
                    sem |= stuffs[jj].astype(bool)
            mask = sem & (pan == 0)
            if mask.sum() < stuff_max_area:
                continue
            seg_id += 1
            pan[mask] = seg_id
            infos.append(("stuff", lab, seg_id))

    def paste_things():
        nonlocal seg_id
        for i in np.argsort(-t_scores):
            if float(t_scores[i]) < thr:
                break  # reference uses break, not continue
            mask = things[i].astype(bool)
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
            infos.append(("thing", int(t_labels[i]), seg_id))

    if stuff_first:
        paste_stuff()
        paste_things()
    else:
        paste_things()
        paste_stuff()
    return pan, infos


def _random_case(rng, h=20, w=28, nt=6, ns=5, n_stuff_labels=3):
    things = rng.rand(nt, h, w) > 0.6
    t_labels = rng.randint(0, 5, nt)
    t_scores = rng.rand(nt).astype(np.float32)
    stuffs = rng.rand(ns, h, w) > 0.45
    s_labels = rng.randint(0, n_stuff_labels, ns)
    s_scores = rng.rand(ns).astype(np.float32)
    return things, t_labels, t_scores, stuffs, s_labels, s_scores


def _infos_key(infos):
    return [
        (i["isthing"], i["category_id"], i["id"]) for i in infos
    ]


def test_thing_first_matches_oracle():
    rng = np.random.RandomState(1)
    for trial in range(10):
        case = _random_case(rng)
        pan, infos = merge_sequential_host(
            *case, instance_score_thr=0.3, iou_thr=0.5, stuff_max_area=40
        )
        ref_pan, ref_infos = _oracle(
            *case, thr=0.3, iou_thr=0.5, stuff_max_area=40, stuff_first=False
        )
        np.testing.assert_array_equal(pan, ref_pan, err_msg=f"trial {trial}")
        assert [("thing" if k[0] else "stuff", k[1], k[2])
                for k in _infos_key(infos)] == [
            (kind, lab, sid) for kind, lab, sid in ref_infos
        ]


def test_stuff_first_matches_oracle():
    rng = np.random.RandomState(2)
    for trial in range(10):
        case = _random_case(rng)
        pan, infos = merge_sequential_host_stuff_first(
            *case, instance_score_thr=0.3, iou_thr=0.5, stuff_max_area=40
        )
        ref_pan, ref_infos = _oracle(
            *case, thr=0.3, iou_thr=0.5, stuff_max_area=40, stuff_first=True
        )
        np.testing.assert_array_equal(pan, ref_pan, err_msg=f"trial {trial}")
        assert [("thing" if k[0] else "stuff", k[1], k[2])
                for k in _infos_key(infos)] == [
            (kind, lab, sid) for kind, lab, sid in ref_infos
        ]


def test_ordering_changes_outcome_hand_case():
    """Fixed golden: an 8x8 image; stuff covers the left 6 columns; a thing
    (score 0.9) occupies a 4x6 block overlapping stuff by 5/6 of its area.

    - Thing-first: the thing pastes first (nothing beneath it), stuff fills
      the remaining free left-region pixels. Thing keeps all 24 pixels.
    - Stuff-first: stuff paints 48 pixels first; the thing then overlaps
      painted area by 20/24 > iou_thr=0.5 and is DROPPED entirely.
    """
    h = w = 8
    thing = np.zeros((1, h, w), bool)
    thing[0, 2:6, 1:7] = True  # 24 px, columns 1..6 (col 6 outside stuff)
    stuff = np.zeros((1, h, w), bool)
    stuff[0, :, :6] = True  # 48 px
    t_labels = np.array([0])
    t_scores = np.array([0.9], np.float32)
    s_labels = np.array([7])
    s_scores = np.array([0.5], np.float32)

    pan_tf, infos_tf = merge_sequential_host(
        thing, t_labels, t_scores, stuff, s_labels, s_scores,
        instance_score_thr=0.25, iou_thr=0.5, stuff_max_area=10,
    )
    pan_sf, infos_sf = merge_sequential_host_stuff_first(
        thing, t_labels, t_scores, stuff, s_labels, s_scores,
        instance_score_thr=0.25, iou_thr=0.5, stuff_max_area=10,
    )

    # thing-first: thing = id 1 (24 px), stuff = id 2 on the 28 remaining px
    assert [i["isthing"] for i in infos_tf] == [True, False]
    assert (pan_tf == 1).sum() == 24 and (pan_tf == 2).sum() == 48 - 20
    # stuff-first: stuff = id 1 (all 48 px), thing dropped (20/24 > 0.5)
    assert [i["isthing"] for i in infos_sf] == [False]
    assert (pan_sf == 1).sum() == 48 and pan_sf.max() == 1


def test_stuff_first_trims_partial_overlap():
    """A thing overlapping stuff by less than iou_thr survives stuff-first
    but is trimmed to the free pixels (reference :806-811)."""
    h = w = 8
    thing = np.zeros((1, h, w), bool)
    thing[0, 0:4, 4:8] = True  # 16 px, 2 columns over stuff (8 px = 0.5)
    stuff = np.zeros((1, h, w), bool)
    stuff[0, :, :6] = True
    pan, infos = merge_sequential_host_stuff_first(
        thing, np.array([2]), np.array([0.8], np.float32),
        stuff, np.array([9]), np.array([0.4], np.float32),
        instance_score_thr=0.25, iou_thr=0.6, stuff_max_area=10,
    )
    assert [i["isthing"] for i in infos] == [False, True]
    assert (pan == 2).sum() == 8  # trimmed to the free right columns
    assert infos[1]["category_id"] == 2 and infos[1]["id"] == 2
