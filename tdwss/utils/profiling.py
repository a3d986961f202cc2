"""Profiling helpers (SURVEY.md §5 tracing parity).

The reference reports SCN's global FLOP counters and wall-clock deltas per
epoch (train.py:50-52,83-89); the MAdds analogue lives in
:mod:`tdwss.utils.flops`.  This module adds the TPU-side tooling: a
``jax.profiler`` trace context for capturing device timelines (viewable in
TensorBoard / Perfetto) and a tiny step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "exp/profile") -> Iterator[None]:
    """Capture a jax.profiler device trace around a block.

    Usage::

        with profiling.trace("exp/run1/profile"):
            state, aux = train_step(state, batch)
            jax.block_until_ready(state.params)

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timer (train.py:52,88 parity)."""

    def __init__(self) -> None:
        self._t0: Optional[float] = None
        self.history: list = []

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() before start()")
        dt = time.perf_counter() - self._t0
        self.history.append(dt)
        self._t0 = None
        return dt

    @property
    def mean(self) -> float:
        return sum(self.history) / max(len(self.history), 1)
