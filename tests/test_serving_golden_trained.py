"""TRAINED-weights serving golden at RELEASE thresholds (VERDICT r04 item 6).

The random-init golden (test_serving_golden.py) bit-freezes serving plumbing
but must zero every score gate to see instances; the decode behavior release
weights exercise — real score distributions crossing instance_score_thr=0.25
(kernel_iter_head.py:591-640) and the tracker's init/obj/match thresholds
(quasi_dense_embed_tracker.py:137-207), memo expiry after
memo_tracklet_frames=5 absent frames, mid-sequence track birth — was only
statistically guarded. This golden runs the committed TRAINED tiny
checkpoint (tests/golden/serving_trained_tiny_fp16.npz, built by
scripts/gen_serving_golden_trained.py) over a 12-frame instance-lifecycle
sequence with ALL thresholds at their release defaults and freezes the full
output surface for both tracker paths.

Regenerate after an INTENTIONAL output change with:
  VKNET_REGEN_GOLDEN_TRAINED=1 python -m pytest \
      tests/test_serving_golden_trained.py -q
(writes the new golden and fails so regeneration stays a reviewed act).
Retrain the checkpoint itself only when the model's parameter surface
changes: python scripts/gen_serving_golden_trained.py
"""

import os
import tempfile
from pathlib import Path

import numpy as np
import pytest

import trained_golden_common as tg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "serving_trained_tiny_64x96.npz")


@pytest.fixture(scope="module")
def frames():
    with tempfile.TemporaryDirectory() as d:
        tg.write_sequence(Path(d))
        yield tg.eval_frames(Path(d))


@pytest.fixture(scope="module")
def serving_outputs(frames):
    variables = tg.load_weights()
    return (
        tg.run_pipeline(variables, frames, "quasi_dense"),
        tg.run_pipeline(variables, frames, "quasi_dense_host"),
    )


def _compare(arrs, gold):
    assert set(gold.files) == set(arrs), "serving output surface changed"
    for k in gold.files:
        if k.startswith("seg_score_"):
            np.testing.assert_allclose(arrs[k], gold[k], atol=1e-4,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(arrs[k], gold[k], err_msg=k)


def test_device_tracker_matches_golden(serving_outputs):
    dev, _ = serving_outputs
    arrs = tg.flatten_results(dev)
    if (os.environ.get("VKNET_REGEN_GOLDEN_TRAINED") == "1"
            or not os.path.exists(GOLDEN)):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **arrs)
        pytest.fail(
            f"golden (re)generated at {GOLDEN} — review and commit it, "
            "then re-run without VKNET_REGEN_GOLDEN_TRAINED"
        )
    _compare(arrs, np.load(GOLDEN))


def test_host_tracker_matches_golden(serving_outputs):
    """Device/host tracker id-level equivalence, frozen on TRAINED weights
    at release thresholds (real matches, spawns, and expiries — not the
    zero-gate regime of the random-init golden)."""
    _, host = serving_outputs
    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated yet")
    _compare(tg.flatten_results(host), np.load(GOLDEN))


def test_golden_exercises_release_paths():
    """Non-vacuity: the frozen outputs must contain every lifecycle the
    sequence was scripted to force. If a regeneration loses one (e.g. a
    threshold regression stops the late spawn), this fails even though the
    bit-compare above would happily freeze the regression."""
    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated yet")
    arrs = dict(np.load(GOLDEN).items())
    spans = tg.track_id_spans(arrs)
    assert len(spans) >= 3, f"need >=3 distinct track ids, got {spans}"
    assert any(n >= 8 and f0 <= 1 for f0, _, n in spans.values()), (
        f"no long-lived track (release match_score_thr crossings): {spans}"
    )
    assert any(f1 <= tg.B_FRAMES[1] + 2 for _, f1, _ in spans.values()), (
        f"no track ended early (memo expiry never exercised): {spans}"
    )
    assert any(f0 >= tg.C_FRAMES[0] - 1 for f0, _, _ in spans.values()), (
        f"no mid-sequence spawn (init_score_thr crossing): {spans}"
    )
    # every frame tracked: the trained model detects at release gates
    for t in range(tg.N_FRAMES):
        assert (arrs[f"trk_{t}"] > 0).any(), f"frame {t} lost all tracks"
    # scores live in the real regime, not the zero-gate one
    smax = max(float(arrs[f"seg_score_{t}"].max(initial=0.0))
               for t in range(tg.N_FRAMES))
    assert smax > 0.35, f"max segment score {smax} never crossed the gates"
