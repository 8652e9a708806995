"""Benchmark: Video K-Net VPS (R-50) on one chip — inference AND training.

Emits the result JSON line INCREMENTALLY: the headline line is printed and
flushed as soon as the mandatory end-to-end inference section finishes, and an
enriched line is re-printed after every further section. The driver parses the
LAST line, so each re-print upgrades the record and a mid-run kill can no
longer erase the whole round's numbers (BENCH_r03 was rc=124 with zero output
because the old script printed only at the very end). A SIGTERM/SIGINT handler
and an atexit hook emit whatever has been measured so far.

The headline metric is the *end-to-end* online VPS throughput at KITTI-STEP
resolution (384 x 1248): `run_sequence` with the ON-DEVICE quasi-dense tracker,
including the host-side segments_info assembly, LUT map construction and
upsample — i.e. frames/sec a user actually gets, not just the jitted device
step. It is measured as the median over pipeline windows (the remote-TPU
tunnel's transfer latency is too noisy for best-of-N full passes — VERDICT r03).
Subsidiary numbers ride in "extra":

  e2e_device_tracker_fps  — the headline (repeated for the A/B record)
  e2e_host_tracker_fps    — same pipeline with the host-tracker oracle path,
                            measured in the same run / same tunnel weather
  e2e_fetch_ms / e2e_host_ms — per-frame device_get wall and host-finish wall
                            (medians over windows) for the headline path
  device_step_fps         — the serving device graph alone (per-frame of the
                            windowed lax.scan step; device tracker INCLUDED
                            since round 4, scanned windows since round 4's
                            scan-window serving change)
  multi_stream_device_fps — batched 8-stream device step throughput
  multi_stream_e2e_fps    — 8-stream serving end to end (depth-2 pipeline,
                            threaded host finishing) + its fetch/host ms
  train_step_s            — steady-state VPS train step (b1, fp32 — the
                            reference-comparable baseline)
  train_flops             — XLA cost-analysis FLOPs of that compiled step
  train_mfu               — train_flops / (train_step_s * chip bf16 peak)
  train_bf16_step_s/_mfu  — the PRODUCTION path: bf16 fwd/bwd over fp32
                            masters (cfg.bf16_train)
  train_scaling           — {batch: {ms_per_sample, mfu}} for b in 1,2,4,8,
                            measured on the bf16 path (train_scaling_dtype)
  vis_clip_fps            — whole-clip VIS decode frames/sec @360x640, T=5
  vis_train_step_s/_mfu   — VIS train step (b1, 5-frame clip) + its MFU
  swinb_vipseg_*          — the Swin-B VIP-Seg flagship @736x1280: e2e fps,
                            device-step fps, train step s, train MFU
  section_s               — wall seconds per section (budget audit trail)

EVERY section (mandatory ones included) is budget-gated BEFORE its first
compile: once `VKNET_BENCH_BUDGET_S` (default 1080 s — the driver's kill
timeout was observed to be well under the old 2100 s budget) is spent, the
remaining sections are recorded as skipped instead of risking a silent kill.
A cold compile cache is detected from the first section's compile wall; when
cold, the compile-heavy optional sections (train/VIS/Swin-B) require a larger
remaining-budget margin before starting.

SECTION ORDER IS ADAPTIVE (VERDICT r04 item 1): at startup the newest existing
`BENCH_r*.json` is read, and any section whose signature key is absent from it
FRONT-RUNS right after the headline e2e_device section (cheapest first: vis,
then swinb), demoting the already-recorded sections behind it. The r04 budget
arithmetic starved the Swin-B/VIS rows on every cold cache because the fixed
order spent ~610 s on sections whose numbers already lived in BENCH_r04;
front-running missing rows makes each round fill a different hole instead of
re-measuring the same ones. `section_order` in "extra" records the decision.

`vs_baseline` divides the headline e2e fps by a 10-fps V100 estimate for this
model class (the reference publishes no throughput; SURVEY.md §6 — the torch
inference loop is python- and CPU-sync-bound at ~0.5 MP).
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vknet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V100_BASELINE_FPS = 10.0
H, W = 384, 1248
WARMUP = 3
ITERS = 20
USE_BF16 = os.environ.get("VKNET_BENCH_BF16", "1") == "1"
RUN_TRAIN = os.environ.get("VKNET_BENCH_TRAIN", "1") == "1"
RUN_SCALING = os.environ.get("VKNET_BENCH_SCALING", "1") == "1"
RUN_VIS = os.environ.get("VKNET_BENCH_VIS", "1") == "1"
RUN_SWINB = os.environ.get("VKNET_BENCH_SWINB", "1") == "1"
BUDGET_S = float(os.environ.get("VKNET_BENCH_BUDGET_S", "1080"))
_T0 = time.monotonic()

RESULT = {
    "metric": "vps_e2e_online_fps_r50_384x1248",
    "value": 0.0,
    "unit": "frames/sec/chip (incl. host tracker + decode)",
    "vs_baseline": 0.0,
    "extra": {"status": "starting", "section_s": {}},
}


def emit():
    print(json.dumps(RESULT), flush=True)


def _on_signal(signum, frame):  # pragma: no cover - driver kill path
    RESULT["extra"]["status"] = f"killed by signal {signum}"
    emit()
    os._exit(124)


signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGINT, _on_signal)
atexit.register(emit)


def _elapsed() -> float:
    return time.monotonic() - _T0


# signature key per section: present in the newest BENCH artifact => the row
# already has a driver-recorded number and the section can be demoted.
# vis/swinb are split into (headline fps) and (train) sections since round 5:
# a cold cache cannot fit every compile inside the budget, so each section
# must bank ONE row — coarse sections made swinb's e2e row hostage to vis's
# train compile in the r05 validation run.
SECTION_SIG = {
    "e2e_device": "e2e_device_tracker_fps",
    "e2e_host": "e2e_host_tracker_fps",
    "multi_stream": "multi_stream_e2e_fps",
    "train": "train_step_s",
    "swinb_vipseg": "swinb_vipseg_e2e_fps",
    "swinb_train": "swinb_vipseg_train_step_s",
    "vis": "vis_clip_fps",
    "vis_train": "vis_train_step_s",
}


def _prev_bench_extra() -> dict:
    """parsed.extra of the newest BENCH_r*.json next to this script (driver
    artifact format: {"n": .., "parsed": {"extra": {...}}})."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best, best_n = {}, -1
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m or int(m.group(1)) <= best_n:
            continue
        try:
            with open(p) as f:
                d = json.load(f)
            parsed = d.get("parsed") or {}
            extra = parsed.get("extra") or {}
            if isinstance(extra, dict):
                best, best_n = extra, int(m.group(1))
        except Exception:
            continue
    return best


def _gate(name: str, extra_margin_s: float = 0.0) -> bool:
    """True if the section must be skipped (and records why)."""
    if _elapsed() + extra_margin_s > BUDGET_S:
        RESULT["extra"][f"{name}_skipped"] = "time budget"
        return True
    return False


# chip peak dense bf16 FLOP/s by device kind (public figures)
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16.items():
        if k.lower() in kind.lower():
            return v
    return 197e12  # default: v5e


def _median_window_fps(pipe_run, window: int, n_windows: int, per_window_frames):
    """Consume a run_sequence/run_batched_sequence generator; return
    (fps, fetch_ms_per_frame, host_ms_per_frame) from median window timings.

    The first two windows absorb compile + pipeline fill and are dropped."""
    marks = []
    count = 0
    gen, stats = pipe_run()
    for _ in gen:
        count += 1
        if count % per_window_frames == 0:
            marks.append(time.perf_counter())
    durs = [b - a for a, b in zip(marks, marks[1:])][2:]
    if not durs:  # degenerate tiny run
        durs = [b - a for a, b in zip(marks, marks[1:])] or [float("nan")]
    med = statistics.median(durs)
    fps = per_window_frames / med
    s_tail = stats[2:] if len(stats) > 2 else stats
    fetch_ms = statistics.median(
        [s["fetch_s"] / per_window_frames * 1e3 for s in s_tail]
    )
    host_ms = statistics.median(
        [s["host_s"] / per_window_frames * 1e3 for s in s_tail]
    )
    return fps, fetch_ms, host_ms


def _fast_random_init(model, rngs, *args):
    """Shape-faithful pseudo-random variables WITHOUT compiling model.init.

    `jax.eval_shape` traces init abstractly (no device compute, no remote
    compile), then each leaf is filled host-side: conv/dense kernels ~N(0,
    0.02), BN/LN scales and running vars = 1, biases/means = 0. Used for the
    Swin-B section only: its real init forward is a multi-minute cold compile
    through the remote tunnel, and the bench measures THROUGHPUT of random
    weights either way — the fill just has to be finite and non-degenerate.
    """
    shapes = jax.eval_shape(lambda r: model.init(r, *args), rngs)
    rs = np.random.RandomState(0)

    def fill(path, s):
        name = jax.tree_util.keystr(path)
        if name.endswith("'scale']") or name.endswith("'var']"):
            return jnp.ones(s.shape, s.dtype)
        if name.endswith("'bias']") or name.endswith("'mean']"):
            return jnp.zeros(s.shape, s.dtype)
        return jnp.asarray(
            rs.randn(*s.shape).astype(np.float32) * 0.02, dtype=s.dtype
        )

    return jax.tree_util.tree_map_with_path(fill, shapes)


class Ctx:
    """Shared model/weights across inference sections (one init)."""

    def __init__(self):
        from video_knet_tpu.config import VideoKNetConfig
        from video_knet_tpu.models.video.knet_vps import VideoKNet
        from video_knet_tpu.utils.precision import cast_variables

        self.cfg = VideoKNetConfig(max_insts=8)
        self.model = VideoKNet(self.cfg, train=False)
        img = jnp.zeros((1, H, W, 3), jnp.float32)
        self.variables = self.model.init(jax.random.PRNGKey(0), img, img)
        if USE_BF16:
            self.variables = cast_variables(self.variables)
        self.dt = jnp.bfloat16 if USE_BF16 else jnp.float32
        rng = np.random.RandomState(0)
        self.frames = [
            jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32), dtype=self.dt)
            for _ in range(4)
        ]
        self.rng = rng
        self.cold = False  # set by the first section from its compile wall


def _measure_pipe(pipe, frames, window=8, n_windows=6):
    def run():
        stats: list = []
        seq = [frames[i % len(frames)] for i in range(window * (n_windows + 2))]
        return pipe.run_sequence(seq, window=window, stats=stats), stats

    return _median_window_fps(run, window, n_windows, window)


def sec_e2e_device(ctx: Ctx):
    """Headline: e2e online VPS with the on-device tracker (default path)."""
    from video_knet_tpu.models.video.inference import VPSInferencePipeline

    pipe = VPSInferencePipeline(ctx.model, ctx.variables, ctx.cfg, out_hw=(H, W))
    t0 = time.monotonic()
    fps, fetch_ms, host_ms = _measure_pipe(pipe, ctx.frames)
    ctx.cold = time.monotonic() - t0 > 90.0
    RESULT["value"] = round(fps, 3)
    RESULT["vs_baseline"] = round(fps / V100_BASELINE_FPS, 3)
    RESULT["extra"].update(
        e2e_device_tracker_fps=round(fps, 3),
        e2e_fetch_ms=round(fetch_ms, 3),
        e2e_host_ms=round(host_ms, 3),
        cold_cache=ctx.cold,
    )
    RESULT["extra"]["status"] = "headline measured"

    # device throughput, SAME compiled scan graph (no extra compile): keep
    # enqueuing windows without fetching; the recurrence (kernels + tracker
    # state) threads on device so this is the pure chip throughput of the
    # serving graph (per-frame of the windowed scan — serving's unit of work)
    buf = [(ctx.frames[i % len(ctx.frames)], False) for i in range(8)]
    out = None
    for _ in range(WARMUP):
        out, _ = pipe._scan_window(buf, 8)
    jax.block_until_ready(out["pan"])
    t0 = time.perf_counter()
    nw = max(ITERS // 4, 3)
    for _ in range(nw):
        out, _ = pipe._scan_window(buf, 8)
    jax.block_until_ready(out["pan"])
    RESULT["extra"]["device_step_fps"] = round(
        8 * nw / (time.perf_counter() - t0), 3
    )
    # schema marker (ADVICE r04): since round 4 device_step_fps measures
    # per-frame throughput of the WINDOWED SCAN graph (dispatch amortized),
    # not the single-step graph of BENCH_r01-r03 — comparisons across that
    # boundary conflate removed dispatch overhead with chip throughput
    RESULT["extra"]["device_step_fps_scanned"] = True


def sec_e2e_host(ctx: Ctx):
    """A/B: the host-tracker oracle serving path, same run / same tunnel."""
    from video_knet_tpu.models.video.inference import VPSInferencePipeline

    pipe = VPSInferencePipeline(
        ctx.model, ctx.variables, ctx.cfg, out_hw=(H, W),
        tracker_type="quasi_dense_host",
    )
    fps, fetch_ms, host_ms = _measure_pipe(pipe, ctx.frames)
    RESULT["extra"].update(
        e2e_host_tracker_fps=round(fps, 3),
        e2e_host_tracker_fetch_ms=round(fetch_ms, 3),
        e2e_host_tracker_host_ms=round(host_ms, 3),
    )


def sec_multi_stream(ctx: Ctx):
    """8-stream serving: batched device step + per-stream host finishing."""
    from video_knet_tpu.models.video.inference import MultiStreamVPSPipeline

    b = 8
    msp = MultiStreamVPSPipeline(
        ctx.model, ctx.variables, ctx.cfg, out_hw=(H, W), n_streams=b,
        host_workers=min(8, os.cpu_count() or 1),
    )
    rounds = [
        jnp.asarray(
            ctx.rng.randn(b, H, W, 3).astype(np.float32), dtype=ctx.dt
        )
        for _ in range(2)
    ]
    win = 4  # rounds per scanned device call
    n_windows = 8

    def run():
        stats: list = []
        seq = [rounds[i % 2] for i in range(win * (n_windows + 2))]
        return (
            msp.run_batched_sequence(seq, depth=2, stats=stats, window=win),
            stats,
        )

    # one "window" = `win` scanned rounds of b frames each
    fps, fetch_ms, host_ms = _median_window_fps(run, win, n_windows, win)
    RESULT["extra"].update(
        multi_stream_e2e_fps=round(fps * b, 3),
        multi_stream_fetch_ms=round(fetch_ms / b, 3),
        multi_stream_host_ms=round(host_ms / b, 3),
    )

    # batched device-only throughput, same compiled scan graph
    flags = np.zeros((b,), bool)
    buf = [(rounds[i % 2], flags) for i in range(win)]
    out = None
    for _ in range(WARMUP):
        out, _, _ = msp._scan_rounds(buf, win)
    jax.block_until_ready(out["pan"])
    nw = 6
    t0 = time.perf_counter()
    for _ in range(nw):
        out, _, _ = msp._scan_rounds(buf, win)
    jax.block_until_ready(out["pan"])
    RESULT["extra"]["multi_stream_device_fps"] = round(
        b * win * nw / (time.perf_counter() - t0), 3
    )


# chip HBM bandwidth (bytes/s) by device kind — roofline denominator
HBM_BW = {
    "TPU v4": 1.23e12,
    "TPU v5 lite": 8.19e11,
    "TPU v5e": 8.19e11,
    "TPU v5p": 2.77e12,
    "TPU v6 lite": 1.64e12,
    "TPU v6e": 1.64e12,
}


def _hbm_bw() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_BW.items():
        if k.lower() in kind.lower():
            return v
    return 8.19e11  # default: v5e


def _time_train_step(train_step, state, *batch, iters=10, roofline: dict | None = None):
    cost = train_step.lower(state, *batch).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    if roofline is not None:
        # memory-side roofline estimate. XLA's whole-graph "bytes accessed"
        # counts every operand of every op — fusion-internal and cache-
        # resident traffic included — so it is an UPPER BOUND on physical HBM
        # traffic (BENCH_r04's mem/step ratio exceeded 1.0 exactly because of
        # this; VERDICT r04 weak-1). It is emitted under *_ub names; the
        # per-block attribution that CAN name the bound lives in
        # scripts/profile_train.py + the PARITY.md roofline table.
        byts = float(cost.get("bytes accessed", float("nan")))
        roofline["bytes"] = byts
        roofline["mem_s_ideal"] = byts / _hbm_bw()
        roofline["compute_s_ideal"] = flops / _peak_flops()
    # TWO warmup steps: the first call's output state carries the sharded/
    # donated layout, so the second call compiles a second signature — both
    # must be compiled before the timed region
    for _ in range(2):
        state, losses = train_step(state, *batch)
        jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = train_step(state, *batch)
    jax.block_until_ready(losses)
    step_s = (time.perf_counter() - t0) / iters
    mfu = flops / (step_s * _peak_flops()) if flops == flops else float("nan")
    return step_s, flops, mfu


def sec_train(ctx: Ctx):
    """Steady-state VPS train step (b1 @ 384x1248) + batch-scaling curve."""
    import optax
    from jax.sharding import Mesh

    from video_knet_tpu.config import VideoKNetConfig
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vps import (
        make_sharded_train_step,
        make_synthetic_batch,
    )

    cfg = VideoKNetConfig(max_insts=8)
    model = VideoKNet(cfg, train=True)
    batch = make_synthetic_batch(cfg, 1, (H, W))
    variables = model.init(jax.random.PRNGKey(0), batch.img, batch.ref_img)
    tx = optax.adamw(1e-4, weight_decay=5e-2)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    # the jitted step donates its input state; state buffers alias `variables`,
    # so every create_train_state gets a fresh copy
    def fresh_state():
        return create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), tx
        )

    # scaling-only mode: when the newest artifact already holds the fp32 b1
    # baseline and this section front-ran only to fill the b8 scaling hole,
    # skip the fp32 compile entirely — one compile less between the budget
    # and the missing point (VERDICT r04 item 2)
    scaling_only = "train_step_s" in _prev_bench_extra()
    if scaling_only:
        RESULT["extra"]["train_fp32_skipped"] = "in previous artifact"
    else:
        train_step = make_sharded_train_step(model, cfg, tx, mesh)
        roof: dict = {}
        step_s, flops, mfu = _time_train_step(
            train_step, fresh_state(), batch, roofline=roof
        )
        RESULT["extra"].update(
            train_step_s=round(step_s, 4),
            train_flops=flops,
            train_mfu=round(mfu, 4),
            train_bytes_ub=roof.get("bytes"),
            # ideal-time walls (seconds): compute from FLOPs/peak, memory
            # from the bytes UPPER BOUND / HBM bandwidth — mem wall is an
            # upper bound, so it may exceed the measured step; ratios vs
            # step_s are intentionally NOT emitted (BENCH_r04's >1.0
            # membw_util proved nothing). Per-block attribution:
            # PARITY.md roofline table.
            train_compute_ideal_s=round(roof["compute_s_ideal"], 4)
            if roof.get("compute_s_ideal") == roof.get("compute_s_ideal")
            else None,
            train_mem_ideal_s_ub=round(roof["mem_s_ideal"], 4)
            if roof.get("mem_s_ideal") == roof.get("mem_s_ideal")
            else None,
        )
        emit()

    # the PRODUCTION train path: bf16 forward/backward over fp32 masters
    # (cfg.bf16_train; fp32 row above is the reference-comparable baseline —
    # the reference trains fp32, mmcv fp16 hooks unused in release configs)
    import dataclasses

    cfg16 = dataclasses.replace(cfg, bf16_train=True)
    model16 = VideoKNet(cfg16, train=True)
    step16 = make_sharded_train_step(model16, cfg16, tx, mesh)
    scaling = {}
    if not _gate("train_bf16", extra_margin_s=240.0 if ctx.cold else 0.0):
        roof16: dict = {}
        s16, _, mfu16 = _time_train_step(
            step16, fresh_state(), batch, roofline=roof16
        )
        RESULT["extra"].update(
            train_bf16_step_s=round(s16, 4), train_bf16_mfu=round(mfu16, 4),
            train_bf16_mem_ideal_s_ub=round(roof16["mem_s_ideal"], 4)
            if roof16.get("mem_s_ideal") == roof16.get("mem_s_ideal")
            else None,
        )
        scaling[1] = {"ms_per_sample": round(s16 * 1e3, 2),
                      "mfu": round(mfu16, 4)}
        RESULT["extra"]["train_scaling_dtype"] = "bf16"
        RESULT["extra"]["train_scaling"] = {
            str(k): v for k, v in scaling.items()
        }
        emit()

        # structural A/B (VERDICT r04 item 8): coarse assignment costs —
        # the detached Hungarian mask/dice costs computed at head resolution
        # against avg-pooled GT instead of on x4-upsampled masks
        # (cfg.assigner.coarse_costs; together with stage_loss's gather-
        # then-upscale this DCEs every full-res stage mask tensor). Same
        # weights, same batch, same run as the bf16 baseline above.
        if not _gate("train_coarse_assign",
                     extra_margin_s=120.0 if ctx.cold else 0.0):
            cfgc = dataclasses.replace(
                cfg16,
                assigner=dataclasses.replace(
                    cfg16.assigner, coarse_costs=True
                ),
            )
            stepc = make_sharded_train_step(
                VideoKNet(cfgc, train=True), cfgc, tx, mesh
            )
            s_c, _, mfu_c = _time_train_step(stepc, fresh_state(), batch)
            RESULT["extra"].update(
                train_bf16_coarse_assign_step_s=round(s_c, 4),
                train_bf16_coarse_assign_mfu=round(mfu_c, 4),
            )
            emit()

    if RUN_SCALING and scaling:
        # b8 first: it is the scaling point BENCH_r04 never captured
        # (VERDICT r04 item 2) — bank it before the budget can run out; then
        # b2 (the r04 anomaly point), then b4
        sizes = [8, 2, 4]
        # each larger batch is a fresh compile on a cold cache; the margin is
        # deliberately small — every point emits as soon as it is measured,
        # so starting a point near the edge risks only that point
        margin = 120.0 if ctx.cold else 0.0
        for j, b in enumerate(sizes):
            if _elapsed() + margin > BUDGET_S:
                for rest in sizes[j:]:
                    scaling[rest] = {"skipped": "time budget"}
                break
            try:
                bb = make_synthetic_batch(cfg, b, (H, W))
                st = fresh_state()
                s_s, _, s_mfu = _time_train_step(step16, st, bb, iters=6)
                scaling[b] = {
                    "ms_per_sample": round(s_s / b * 1e3, 2),
                    "mfu": round(s_mfu, 4),
                }
            except Exception as e:  # OOM at large b: record and stop scaling
                scaling[b] = {"error": type(e).__name__}
                for rest in sizes[j + 1:]:
                    scaling[rest] = {"skipped": f"after {type(e).__name__}"}
                break
            RESULT["extra"]["train_scaling"] = {
                str(k): v for k, v in scaling.items()
            }
            emit()
    RESULT["extra"]["train_scaling"] = {str(k): v for k, v in scaling.items()}


VIS_HW_T = (360, 640, 5)


def _vis_state(ctx: Ctx):
    """Shared (cfg, train variables) for the VIS sections; host-side
    shape-faithful fill — a real KNetVIS init forward is a ~10-minute remote
    compile that no cache layer retains across runs (measured in the round-5
    validation runs: the vis section cost ~630 s twice in a row, dominated by
    init, while the swinb section that already fills host-side took 98 s)."""
    if getattr(ctx, "vis_state", None) is None:
        from video_knet_tpu.config_vis import youtube_vis_2019_config
        from video_knet_tpu.models.vis.knet_vis import KNetVIS

        vh, vw, t = VIS_HW_T
        cfg = youtube_vis_2019_config()
        clip = jnp.zeros((1, t, vh, vw, 3), jnp.float32)
        variables = _fast_random_init(
            KNetVIS(cfg, train=True), jax.random.PRNGKey(0), clip
        )
        ctx.vis_state = (cfg, variables)
    return ctx.vis_state


def sec_vis(ctx: Ctx):
    """VIS whole-clip decode fps (device), @360x640 T=5."""
    from video_knet_tpu.models.vis.knet_vis import KNetVIS, vis_decode
    from video_knet_tpu.utils.precision import cast_variables

    vh, vw, t = VIS_HW_T
    cfg, variables = _vis_state(ctx)
    model = KNetVIS(cfg, train=False)
    infer_vars = cast_variables(variables) if USE_BF16 else variables

    # the feedback scalar chains each iteration on the previous one's result:
    # without a data dependency the N identical enqueues through the remote
    # tunnel returned absurd fps (r04 observed 200k) because nothing forces
    # the executions to be distinct/serialized. The scalar is UN-ZEROED
    # (max score) and scaled by 1e-30 at the point of use — a multiply by a
    # non-zero constant of an unknown value cannot be constant-folded, unlike
    # the old `scores * 0` whose survival relied on XLA's NaN semantics
    # blocking the x*0→0 rewrite (ADVICE r04)
    @jax.jit
    def decode(c, fb):
        out = vis_decode(
            model.apply(
                infer_vars, c + (fb * 1e-30).astype(c.dtype), mutable=False
            ),
            cfg,
            out_hw=(vh, vw),
        )
        return out, jnp.max(out.scores).astype(jnp.float32)

    dt_ = jnp.bfloat16 if USE_BF16 else jnp.float32
    c = jnp.zeros((1, t, vh, vw, 3), dt_)
    fb = jnp.zeros((), jnp.float32)
    out = None
    for _ in range(WARMUP):
        out, fb = decode(c, fb)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out, fb = decode(c, fb)
    jax.block_until_ready(out)
    RESULT["extra"]["vis_clip_fps"] = round(
        t * ITERS / (time.perf_counter() - t0), 3
    )


def sec_vis_train(ctx: Ctx):
    """VIS train step + MFU (b1, 5-frame clip, 2 valid tubes)."""
    import optax
    from jax.sharding import Mesh

    from video_knet_tpu.models.vis.knet_vis import ClipGT, KNetVIS
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vis import make_sharded_vis_train_step

    vh, vw, t = VIS_HW_T
    cfg, variables = _vis_state(ctx)
    tmodel = KNetVIS(cfg, train=True)
    s = cfg.mask_assign_stride
    g = cfg.max_insts
    masks = np.zeros((1, g, t, vh // s, vw // s), np.float32)
    masks[:, 0, :, : vh // (2 * s), : vw // (2 * s)] = 1.0
    masks[:, 1, :, vh // (2 * s):, :] = 1.0
    valid = np.zeros((1, g), bool)
    valid[:, :2] = True
    gt = ClipGT(
        masks=jnp.asarray(masks),
        labels=jnp.zeros((1, g), jnp.int32),
        valid=jnp.asarray(valid),
    )
    tclip = jnp.zeros((1, t, vh, vw, 3), jnp.float32)
    tx = optax.adamw(1e-4, weight_decay=5e-2)
    state = create_train_state(variables, tx)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    step = make_sharded_vis_train_step(tmodel, cfg, tx, mesh)
    step_s, _, mfu = _time_train_step(step, state, tclip, gt, iters=6)
    RESULT["extra"].update(
        vis_train_step_s=round(step_s, 4), vis_train_mfu=round(mfu, 4)
    )


SWINB_HW = (736, 1280)  # short-side-720 rounded to the stride-32 pad


def _swinb_state(ctx: Ctx):
    """Shared (cfg, fp32 variables) for the Swin-B sections. Shape-faithful
    host-side init: a real Swin-B init forward at 736x1280 is its own
    multi-minute cold remote compile; skipping it is what lets these
    sections fit the budget (VERDICT r04 item 1)."""
    if getattr(ctx, "swinb_state", None) is None:
        import dataclasses

        from video_knet_tpu.configs import get_config
        from video_knet_tpu.models.video.knet_vps import VideoKNet

        vh, vw = SWINB_HW
        cfg = dataclasses.replace(
            get_config("video_knet_vipseg_swin_b"), max_insts=8
        )
        img = jnp.zeros((1, vh, vw, 3), jnp.float32)
        variables = _fast_random_init(
            VideoKNet(cfg, train=True),
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            img, img,
        )
        ctx.swinb_state = (cfg, variables)
    return ctx.swinb_state


def sec_swinb(ctx: Ctx):
    """The 5th BASELINE config on chip: Swin-B VPS at VIP-Seg resolution
    (short side 720): e2e fps + device fps."""
    from video_knet_tpu.models.video.inference import VPSInferencePipeline
    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.utils.precision import cast_variables

    vh, vw = SWINB_HW
    cfg, variables = _swinb_state(ctx)
    model = VideoKNet(cfg, train=False)
    infer_vars = cast_variables(variables) if USE_BF16 else variables
    dt_ = jnp.bfloat16 if USE_BF16 else jnp.float32

    pipe = VPSInferencePipeline(
        model, infer_vars, cfg, out_hw=(vh, vw), thing_ids_in_orig=None
    )
    frames = [
        jnp.asarray(
            ctx.rng.randn(1, vh, vw, 3).astype(np.float32), dtype=dt_
        )
        for _ in range(2)
    ]
    fps, fetch_ms, host_ms = _measure_pipe(pipe, frames, window=6, n_windows=4)
    RESULT["extra"].update(
        swinb_vipseg_e2e_fps=round(fps, 3),
        swinb_vipseg_fetch_ms=round(fetch_ms, 3),
        swinb_vipseg_host_ms=round(host_ms, 3),
    )
    emit()

    # device throughput only (same compiled scan graph — no extra compile)
    buf = [(frames[i % len(frames)], False) for i in range(6)]
    out = None
    for _ in range(WARMUP):
        out, _ = pipe._scan_window(buf, 6)
    jax.block_until_ready(out["pan"])
    nw = 3
    t0 = time.perf_counter()
    for _ in range(nw):
        out, _ = pipe._scan_window(buf, 6)
    jax.block_until_ready(out["pan"])
    RESULT["extra"]["swinb_vipseg_device_fps"] = round(
        6 * nw / (time.perf_counter() - t0), 3
    )


def sec_swinb_train(ctx: Ctx):
    """Swin-B VIP-Seg train step + MFU (b1, joint two-branch forward)."""
    import optax
    from jax.sharding import Mesh

    from video_knet_tpu.models.video.knet_vps import VideoKNet
    from video_knet_tpu.train.train_state import create_train_state
    from video_knet_tpu.train.vps import (
        make_sharded_train_step,
        make_synthetic_batch,
    )

    vh, vw = SWINB_HW
    cfg, variables = _swinb_state(ctx)
    tmodel = VideoKNet(cfg, train=True)
    batch = make_synthetic_batch(cfg, 1, (vh, vw))
    tx = optax.adamw(1e-4, weight_decay=5e-2)
    state = create_train_state(variables, tx)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    train_step = make_sharded_train_step(tmodel, cfg, tx, mesh)
    step_s, _, mfu = _time_train_step(train_step, state, batch, iters=6)
    RESULT["extra"].update(
        swinb_vipseg_train_step_s=round(step_s, 4),
        swinb_vipseg_train_mfu=round(mfu, 4),
    )


def main():
    t_setup = time.monotonic()
    ctx = Ctx()
    RESULT["extra"]["setup_s"] = round(time.monotonic() - t_setup, 1)
    # name -> (fn, enabled, extra budget margin when the cache is cold).
    # Margins for the optional sections are small on purpose: since round 4
    # every section re-emits the enriched JSON line, so a driver kill mid-
    # section only loses THAT section — the gate's job is merely to prefer
    # cheap sections over doomed ones near the budget edge, not to guarantee
    # completion (the 420 s swinb margin of r04 guaranteed starvation).
    defs = {
        "e2e_device": (sec_e2e_device, True, 0.0),
        "e2e_host": (sec_e2e_host, True, 120.0),
        "multi_stream": (sec_multi_stream, True, 120.0),
        "train": (sec_train, RUN_TRAIN, 240.0),
        "swinb_vipseg": (sec_swinb, RUN_SWINB, 60.0),
        "swinb_train": (sec_swinb_train, RUN_SWINB, 240.0),
        "vis": (sec_vis, RUN_VIS, 60.0),
        "vis_train": (sec_vis_train, RUN_VIS, 120.0),
    }
    base_order = [
        "e2e_device", "e2e_host", "multi_stream", "train",
        "swinb_vipseg", "swinb_train", "vis", "vis_train",
    ]
    # adaptive order: front-run sections with no row in the newest BENCH
    # artifact, demoting already-recorded sections behind them. Priority
    # inside the missing set: the two never-recorded config HEADLINES first
    # (vis decode ~3 min cold banks a row before swinb's larger serving
    # compile), then the train scaling curve (the b8 hole), then the
    # secondary train steps — one row per section since round 5, so a cold
    # cache banks each config's headline before ANY train compile starts
    prev = _prev_bench_extra()
    # swinb before vis: measured in the r05 validation runs, the Swin-B
    # serving sections cost ~100 s (nn.scan keeps the program small) while
    # the VIS section cost ~630 s — the r04 assumption was backwards
    frontrun_priority = ["swinb_vipseg", "vis", "train", "vis_train",
                         "swinb_train", "e2e_host", "multi_stream"]

    def _recorded(s: str) -> bool:
        if SECTION_SIG[s] not in prev:
            return False
        if s == "train":
            # the row exists but the scaling curve is incomplete (b8 was
            # budget-skipped in r04) -> still front-run ahead of sections
            # whose numbers the newest artifact already holds
            b8 = (prev.get("train_scaling") or {}).get("8") or {}
            return "ms_per_sample" in b8
        return True

    missing = [s for s in frontrun_priority if not _recorded(s)]
    order = ["e2e_device"] + missing + [
        s for s in base_order[1:] if s not in missing
    ]
    RESULT["extra"]["section_order"] = order
    sections = [(name, *defs[name]) for name in order]
    for name, fn, enabled, cold_margin in sections:
        if not enabled:
            continue
        if _gate(name, extra_margin_s=cold_margin if ctx.cold else 0.0):
            emit()
            continue
        t0 = time.monotonic()
        try:
            fn(ctx)
        except Exception as e:  # record, keep the rest of the run alive
            RESULT["extra"][f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
        RESULT["extra"]["section_s"][name] = round(time.monotonic() - t0, 1)
        emit()
    RESULT["extra"]["status"] = "complete"
    emit()


if __name__ == "__main__":
    main()
