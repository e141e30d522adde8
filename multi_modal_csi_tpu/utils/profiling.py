"""Profiling/tracing hooks.

The reference only has wall-clock timers (SURVEY.md §5.1). Here:
  - `trace(dir)`: context manager around jax.profiler for XProf traces;
  - `step_timer`: per-step timing accumulator with device sync;
  - `nan_guard`: enables jax debug-NaN mode for a scope (the reference's
    closest analogue is nothing; SURVEY.md §5.2 prescribes this instead of
    sanitizers).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_guard():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Accumulates per-step wall-clock with an optional device barrier."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if self.sync and result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np
        arr = np.asarray(self.times)
        return {"mean_s": float(arr.mean()), "p50_s": float(np.median(arr)),
                "p95_s": float(np.percentile(arr, 95)),
                "total_s": float(arr.sum()), "steps": len(arr)}
