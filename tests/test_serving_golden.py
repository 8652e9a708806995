"""Golden regression for the default (device-tracker) serving path.

The serving pipeline became the default in round 3 and only the host/device
id-equivalence suite guarded it (VERDICT r3 item 5). This freezes one
synthetic sequence + seeded weights and asserts the full per-frame output —
panoptic id map, semantic map, track map, segments_info — is bit-identical
to a committed golden file, for BOTH tracker paths. Any serving refactor
that changes outputs fails here.

Regenerate after an INTENTIONAL output change with:
  VKNET_REGEN_GOLDEN=1 python -m pytest tests/test_serving_golden.py -q
(the test then writes the new golden and fails, so the regeneration is
always a conscious, reviewed act — commit the updated .npz with the change.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "serving_r50_64x96.npz")
N_FRAMES = 4
HW = (64, 96)


def _setup():
    import dataclasses

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet

    base = VideoKNetConfig(max_insts=8)
    # zero the score gates so the random-init model actually KEEPS and TRACKS
    # things — otherwise the golden freezes an empty track map and guards
    # nothing about association
    cfg = dataclasses.replace(
        base,
        test=dataclasses.replace(base.test, instance_score_thr=0.0),
        tracker=dataclasses.replace(
            base.tracker, init_score_thr=0.0, obj_score_thr=0.0,
            match_score_thr=0.05,
        ),
    )
    model = VideoKNet(cfg, train=False)
    img = jnp.zeros((1, *HW, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img)
    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.randn(1, *HW, 3).astype(np.float32))
              for _ in range(N_FRAMES)]
    return cfg, model, variables, frames


def _run(cfg, model, variables, frames, tracker_type):
    from video_knet_tpu.models.video.inference import VPSInferencePipeline

    pipe = VPSInferencePipeline(model, variables, cfg, out_hw=HW,
                                tracker_type=tracker_type)
    out = []
    for t, f in enumerate(frames):
        out.append(pipe.run_frame(f, is_first=(t == 0)))
    return out


@pytest.fixture(scope="module")
def serving_outputs():
    cfg, model, variables, frames = _setup()
    return (
        _run(cfg, model, variables, frames, "quasi_dense"),
        _run(cfg, model, variables, frames, "quasi_dense_host"),
    )


def _flatten(results) -> dict:
    arrs = {}
    for t, r in enumerate(results):
        arrs[f"pan_{t}"] = np.asarray(r.panoptic_seg, np.int32)
        arrs[f"sem_{t}"] = np.asarray(r.semantic_map, np.int32)
        arrs[f"trk_{t}"] = np.asarray(r.track_map, np.int64)
        segs = sorted(r.segments_info, key=lambda s: s["id"])
        arrs[f"seg_ids_{t}"] = np.array([s["id"] for s in segs], np.int64)
        arrs[f"seg_cat_{t}"] = np.array(
            [s["category_id"] for s in segs], np.int64
        )
        arrs[f"seg_isthing_{t}"] = np.array(
            [bool(s["isthing"]) for s in segs], bool
        )
        arrs[f"seg_score_{t}"] = np.array(
            [float(s.get("score", 0.0)) for s in segs], np.float32
        )
    return arrs


def test_device_tracker_serving_matches_golden(serving_outputs):
    dev, _ = serving_outputs
    arrs = _flatten(dev)
    if os.environ.get("VKNET_REGEN_GOLDEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **arrs)
        pytest.fail(
            f"golden (re)generated at {GOLDEN} — review and commit it, "
            "then re-run without VKNET_REGEN_GOLDEN"
        )
    gold = np.load(GOLDEN)
    assert set(gold.files) == set(arrs), "serving output surface changed"
    for k in gold.files:
        if k.startswith("seg_score_"):
            np.testing.assert_allclose(arrs[k], gold[k], atol=1e-4,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(arrs[k], gold[k], err_msg=k)


def test_host_tracker_serving_matches_golden(serving_outputs):
    """The host-tracker oracle path must produce the SAME outputs (id-level
    equivalence of the two serving paths, frozen against the same golden)."""
    _, host = serving_outputs
    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated yet")
    arrs = _flatten(host)
    gold = np.load(GOLDEN)
    for k in gold.files:
        if k.startswith("seg_score_"):
            np.testing.assert_allclose(arrs[k], gold[k], atol=1e-4,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(arrs[k], gold[k], err_msg=k)


def test_run_to_run_determinism(serving_outputs):
    """A second pass over the same frames with a fresh pipeline (fresh model
    construction, same seeds) is bit-identical: no hidden host state, no
    nondeterministic ordering."""
    dev, _ = serving_outputs
    cfg, model, variables, frames = _setup()
    rerun = _run(cfg, model, variables, frames, "quasi_dense")
    for t in range(N_FRAMES):
        np.testing.assert_array_equal(
            np.asarray(rerun[t].panoptic_seg, np.int32),
            np.asarray(dev[t].panoptic_seg, np.int32),
        )
        np.testing.assert_array_equal(
            np.asarray(rerun[t].track_map, np.int64),
            np.asarray(dev[t].track_map, np.int64),
        )


def test_golden_is_not_vacuous():
    """The frozen sequence must actually exercise tracking: at least one
    frame with things and nonzero track ids."""
    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated yet")
    gold = np.load(GOLDEN)
    assert any(gold[f"seg_isthing_{t}"].any() for t in range(N_FRAMES))
    assert any((gold[f"trk_{t}"] > 0).any() for t in range(N_FRAMES))
