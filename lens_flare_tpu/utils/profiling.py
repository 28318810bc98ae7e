"""Profiling helpers (SURVEY §5.1: the reference has only wall-clock timers).

Wraps ``jax.profiler`` for device traces plus a simple scoped wall-clock
timer that mirrors the reference's ``CGL::Timer`` usage around BVH build and
rendering (raytraced_renderer.cpp:381-397, 683-709).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """start/stop/duration timer (CGL/include/CGL/timer.h:12-41)."""

    def __init__(self):
        self._t0 = 0.0
        self.duration = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        self.duration = time.perf_counter() - self._t0
        return self.duration

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
