"""Test config: force CPU with 8 virtual devices to emulate a multi-chip mesh.

Must set env vars before jax is imported anywhere.
"""

import os

# VKNET_TPU_TESTS=1 opts out of the CPU forcing so TPU-gated tests (e.g. the
# compiled Pallas kernels in test_pallas_ops.py) run against the real chip.
_USE_TPU = os.environ.get("VKNET_TPU_TESTS", "0") == "1"

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The environment's sitecustomize registers a remote TPU ("axon") backend and
# force-selects jax_platforms="axon,cpu" in EVERY python process, overriding the
# JAX_PLATFORMS env var. Tests must run on the local host CPU (with the virtual
# 8-device mesh), so re-force the platform at config level and drop any
# already-initialized backends.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb  # noqa: E402

        if _xb.backends_are_initialized():
            from jax.extend.backend import clear_backends  # noqa: E402

            clear_backends()
    except Exception:
        pass
# Persistent compilation cache: model-test compiles are the dominant suite cost
# on this 1-CPU host; caching XLA executables across pytest runs amortizes it.
jax.config.update("jax_compilation_cache_dir", "/tmp/vknet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
