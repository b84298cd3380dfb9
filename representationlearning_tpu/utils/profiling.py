"""Profiling / throughput instrumentation — the systematic replacement for the
reference's ad-hoc ETA timers and commented-out FLOPs probes (SURVEY.md §5): wraps
`jax.profiler` traces and provides a step-rate meter printing images/sec like
WaveCAM's `imps` (`step/train_cam.py:96-100`)."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepRate:
    """images/sec + step-time meter with warmup skip."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.n_steps = 0
        self.n_items = 0
        self.t0 = None

    def update(self, n_items: int):
        self.n_steps += 1
        if self.n_steps == self.warmup:
            self.t0 = time.perf_counter()
            self.n_items = 0
        elif self.n_steps > self.warmup:
            self.n_items += n_items

    @property
    def imps(self) -> float:
        if self.t0 is None or self.n_items == 0:
            return 0.0
        return self.n_items / (time.perf_counter() - self.t0)

    @property
    def step_ms(self) -> float:
        steps = self.n_steps - self.warmup
        if self.t0 is None or steps <= 0:
            return 0.0
        return (time.perf_counter() - self.t0) / steps * 1000.0


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them (replaces the commented
    CUDA max-memory probes)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
