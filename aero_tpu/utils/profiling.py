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
