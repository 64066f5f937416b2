"""Tracing / profiling utilities.

The reference has no profiling beyond debug_log tensor censuses and ad-hoc
datetime deltas (SURVEY §5). Here tracing is first-class:

  * `trace(logdir)` — context manager around jax.profiler for TensorBoard-
    viewable device traces;
  * `StepTimer` — wall-clock step timing with device-sync fencing (an
    explicit host fetch: block_until_ready does not reliably fence through
    tunneled backends), rolling mean, and tokens/sec / audio-hours-per-hour
    derivations.
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "out/jax-trace"):
    """Device trace context (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Fence on device work by fetching one leaf to host."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[-1])


class StepTimer:
    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def mean_s(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    def throughput(self, units_per_step: float) -> float:
        """units/sec given units processed per step."""
        return units_per_step / self.mean_s if self.times else float("nan")

    def audio_hours_per_hour(self, audio_seconds_per_step: float) -> float:
        return self.throughput(audio_seconds_per_step)
