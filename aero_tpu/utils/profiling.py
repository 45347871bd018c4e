"""Profiling helpers around jax.profiler (the observability the reference
lacks; SURVEY.md §5 'use JAX profiler/xprof')."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture an xprof trace of the enclosed block:

        with trace_to("/tmp/aero-trace"):
            station.process(block)

    View with xprof/tensorboard."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RateMeter:
    """Samples/s + realtime-factor meter for streaming loops."""

    def __init__(self, sample_rate: float):
        self.sample_rate = sample_rate
        self.samples = 0
        self.t0 = time.perf_counter()

    def update(self, n_samples: int):
        self.samples += n_samples

    @property
    def samples_per_s(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.samples / dt if dt > 0 else 0.0

    @property
    def realtime_factor(self) -> float:
        return self.samples_per_s / self.sample_rate


def enable_compile_cache(path: str, min_compile_secs: float = 0.5) -> None:
    """Persistent XLA compilation cache: restarts skip the first-compile
    cost.  One place for the policy; all three CLIs call this."""
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
