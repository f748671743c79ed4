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
