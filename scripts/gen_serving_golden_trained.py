"""Train + commit the tiny checkpoint behind the TRAINED serving golden.

Produces tests/golden/serving_trained_tiny_fp16.npz (VERDICT r04 item 6):
a short blob-overfit of the 6.9 M-param tiny VideoKNet (same recipe as
tests/test_association_learning.py's 420-step onset loop) on the 12-frame
lifecycle sequence of tests/trained_golden_common.py, trained until the
ONLINE pipeline at RELEASE thresholds exhibits every lifecycle the golden is
meant to freeze:

  - a track surviving the whole sequence (match_score_thr=0.5 crossings),
  - a track whose instance disappears and whose memo entry expires
    (memo_tracklet_frames=5),
  - a brand-new track spawning mid-sequence (init_score_thr=0.35).

The weights are then fp16-rounded, RELOADED, and the criteria re-verified on
the rounded model — the committed artifact is the model under test, not an
approximation of it. Afterwards run

  VKNET_REGEN_GOLDEN_TRAINED=1 python -m pytest \
      tests/test_serving_golden_trained.py -q

to freeze the golden outputs through the test's own code path, and commit
both .npz files together.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import trained_golden_common as tg  # noqa: E402


def criteria(arrs) -> dict:
    """Which frozen-path criteria the pipeline output satisfies."""
    spans = tg.track_id_spans(arrs)
    per_frame_ids = [
        set(np.unique(arrs[f"trk_{t}"])) - {0} for t in range(tg.N_FRAMES)
    ]
    return {
        "every_frame_tracked": all(len(s) > 0 for s in per_frame_ids),
        "three_ids": len(spans) >= 3,
        "long_lived": any(n >= 8 and f0 <= 1
                          for f0, _, n in spans.values()),
        "expired": any(f1 <= tg.B_FRAMES[1] + 2 for _, f1, _ in spans.values()),
        "late_spawn": any(f0 >= tg.C_FRAMES[0] - 1
                          for f0, _, _ in spans.values()),
    }


def main():
    from video_knet_tpu.data.datasets import KittiStepDVPS
    from video_knet_tpu.data.loader import VPSTrainLoader
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vps import make_vps_loss_fn

    tmp = Path(tempfile.mkdtemp())
    tg.write_sequence(tmp)
    cfg = tg.tiny_cfg()
    ds = KittiStepDVPS(str(tmp), split="train", ref_seq_index=[-1, 1])
    loader = VPSTrainLoader(ds, cfg, batch_size=1, crop_hw=tg.HW, seed=0,
                            num_threads=2, process_index=0, process_count=1)
    model = VideoKNet(cfg, train=True)
    b0 = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(0), b0.img, b0.ref_img)
    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)
    loss_fn = make_vps_loss_fn(model, cfg)

    @jax.jit
    def step(state, batch):
        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state._replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs,
            opt_state=new_opt,
        ), total

    frames = tg.eval_frames(tmp)

    def check(vars_):
        arrs = tg.flatten_results(tg.run_pipeline(vars_, frames))
        return criteria(arrs), arrs

    n, total = 0, None
    for chunk in range(12):
        target = 300 * (chunk + 1)
        while n < target:
            for batch in loader:
                state, total = step(state, batch)
                n += 1
                if n >= target:
                    break
        assert np.isfinite(float(total)), f"loss diverged at step {n}"
        vars_ = {"params": state.params}
        if state.batch_stats:
            vars_["batch_stats"] = state.batch_stats
        crit, _ = check(vars_)
        print(f"step {n}: loss {float(total):.3f} criteria {crit}",
              flush=True)
        if all(crit.values()):
            break
    else:
        raise SystemExit(f"criteria never satisfied: {crit}")

    tg.save_weights(vars_)
    reloaded = tg.load_weights()
    crit, arrs = check(reloaded)
    print("after fp16 round-trip:", crit, flush=True)
    if not all(crit.values()):
        raise SystemExit("fp16 rounding broke a criterion — train longer")
    spans = tg.track_id_spans(arrs)
    print(f"saved {tg.WEIGHTS} "
          f"({os.path.getsize(tg.WEIGHTS) / 1e6:.1f} MB); id spans: {spans}")
    print("now: VKNET_REGEN_GOLDEN_TRAINED=1 python -m pytest "
          "tests/test_serving_golden_trained.py -q && commit both .npz")


if __name__ == "__main__":
    main()
