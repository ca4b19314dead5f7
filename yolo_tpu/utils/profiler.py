"""Tracing / timing utilities (SURVEY.md §5).

Reference has only time_synchronized (cuda.synchronize + time,
utils/torch_utils.py:43-45); the TPU build adds jax.profiler traces."""

from __future__ import annotations

import contextlib
import time

import jax


def time_synchronized() -> float:
    """Wall time after draining pending device work."""
    try:
        jax.effects_barrier()
    except Exception:
        pass
    return time.time()


class StepTimer:
    """Lightweight rolling step timer for the train loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0


@contextlib.contextmanager
def trace(logdir: str = '/tmp/jax-trace'):
    """jax.profiler trace context: view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
