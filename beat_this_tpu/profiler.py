"""Profiling and throughput observability.

The reference has no tracing/profiling support (SURVEY.md §5.1); here:
  * `maybe_trace(...)`: context manager that captures a `jax.profiler` trace
    (viewable in TensorBoard/XProf) whenever `BEAT_THIS_TRACE_DIR` is set or
    a directory is passed explicitly.
  * `Throughput`: wall-clock audio-seconds/second counter used by the CLI
    and benchmarks (the BASELINE.json headline metric).
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None = None):
    trace_dir = trace_dir or os.environ.get("BEAT_THIS_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def maybe_enable_compilation_cache(default_dir: str | None = None):
    """Enable JAX's persistent compilation cache when
    BEAT_THIS_COMPILE_CACHE points at a directory — repeat CLI invocations
    then skip recompilation of the bucketed graphs entirely.

    `default_dir` makes caching opt-out instead of opt-in for heavy entry
    points (bench.py, the TPU kernel gate): the fused Pallas kernels cost
    minutes of Mosaic compile time per executable, so those tools pass a
    machine-local default and BEAT_THIS_COMPILE_CACHE= (empty) disables."""
    cache_dir = os.environ.get("BEAT_THIS_COMPILE_CACHE")
    if cache_dir is None:
        cache_dir = default_dir
    if not cache_dir:
        return
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


class Throughput:
    """Accumulates processed audio seconds against wall-clock time."""

    def __init__(self):
        self.audio_seconds = 0.0
        self.t0 = time.perf_counter()

    def add(self, audio_seconds: float):
        self.audio_seconds += audio_seconds

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def x_realtime(self) -> float:
        return self.audio_seconds / max(self.elapsed, 1e-9)

    def summary(self) -> str:
        return (
            f"{self.audio_seconds:.1f} s audio in {self.elapsed:.1f} s "
            f"({self.x_realtime:.1f}x real-time)"
        )
