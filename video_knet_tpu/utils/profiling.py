"""Profiling / benchmarking harness (SURVEY.md §5.1 TPU plan).

The reference has no in-repo profiler (only FLOPs counting + progress bars); the
TPU-native plan is jax.profiler traces viewable in Perfetto/TensorBoard plus a
block_until_ready timing harness with compile-time separation.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('/tmp/jaxtrace'): step()` — open in
    TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class BenchResult:
    compile_s: float
    mean_s: float
    p50_s: float
    p99_s: float
    iters: int

    @property
    def per_sec(self) -> float:
        return 1.0 / self.mean_s if self.mean_s > 0 else float("inf")


def benchmark(fn, *args, warmup: int = 3, iters: int = 20) -> BenchResult:
    """Time a jitted callable with compile separated from steady state."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    mean = sum(times) / len(times)
    return BenchResult(
        compile_s=compile_s,
        mean_s=mean,
        p50_s=times[len(times) // 2],
        p99_s=times[min(int(len(times) * 0.99), len(times) - 1)],
        iters=iters,
    )


def device_memory_stats() -> dict:
    """Per-device memory stats (bytes) when the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = {}
    return stats
