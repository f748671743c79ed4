"""Tracing / profiling hooks.

Reference parity: the reference's only observability is the Keras
TensorBoard callback (SURVEY.md §5 "Tracing / profiling"). TPU-native
equivalent: `jax.profiler` traces (viewable in TensorBoard's profile tab
or Perfetto) with named step annotations, plus a debug-NaN toggle for CI
(SURVEY.md §5 "Race detection / sanitizers" — JAX's functional purity
leaves NaN detection as the useful sanitizer).

Usage:
    with trace("logs/profile"):          # capture a device trace
        for step in range(10):
            with step_annotation("train_step", step):
                state, m = train_step(state, batch, rng)

    enable_debug_nans()                   # CI: fail fast on NaN
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


def honor_platform_env() -> None:
    """Re-assert JAX_PLATFORMS=cpu through jax.config.

    This image's sitecustomize pins the experimental 'axon' TPU plugin
    via jax.config, so the environment variable alone is silently
    ignored — `JAX_PLATFORMS=cpu python trainer.py` would still run on
    the TPU (and some paths, e.g. jax.export lowering, hang over the
    axon tunnel). Every CLI entry point calls this before first backend
    use; tests/conftest.py and bench.py apply the same recipe.
    """
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")


def enable_persistent_compile_cache(directory: Optional[str] = None) -> None:
    """Point XLA's persistent compilation cache at a local directory.

    Every CLI entry point calls this before its first jit: the SSD train
    step costs ~1-4 min to compile on the TPU (and the checkpoint
    pack_state ops a few seconds more), but the compiled executables are
    process-independent — a second run with the same jax/XLA version
    loads them from disk in under a second (measured on the axon TPU
    backend: 5.6 s compile -> 0.29 s warm). A key miss (version or flag
    change) silently falls back to a cold compile, so this is pure
    amortization with no correctness surface.

    Resolution order: explicit arg > $JAX_COMPILATION_CACHE_DIR (jax
    reads it natively; we leave it alone) > ~/.cache/tfssd_tpu/xla.

    Also re-asserts JAX_PLATFORMS=cpu (honor_platform_env): every CLI
    calls this before its first backend touch, which makes it the one
    place that reliably fixes the sitecustomize platform pin.
    """
    honor_platform_env()
    if directory is None:
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # jax already configured from the environment
        directory = os.path.expanduser("~/.cache/tfssd_tpu/xla")
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler device+host trace into `log_dir`."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_annotation(name: str, step: Optional[int] = None) -> Iterator[None]:
    """Named region in the profiler timeline (StepTraceAnnotation when a
    step number is given, TraceAnnotation otherwise)."""
    if step is not None:
        with jax.profiler.StepTraceAnnotation(name, step_num=step):
            yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield


def enable_debug_nans(enable: bool = True) -> None:
    """Fail fast on NaN production anywhere in jitted code (CI toggle)."""
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats() -> dict:
    """Per-device memory usage (bytes) where the backend reports it."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
