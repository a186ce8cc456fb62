"""Tracing / observability (SURVEY.md §5).

The reference requests FULL_TRACE RunOptions but discards the metadata
(example.py:116) and only logs wall clock per scene (eval_pointcloud.py:395).
Here: real jax.profiler traces on demand plus structured stage timers.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace (TensorBoard/XPlane format) when logdir is given."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock stage timer with JSON export.

    Note: on async backends wrap the timed region so it ends with a host-visible
    result (scalar device_get); enqueue time is not execution time.
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_s": v / self.counts[k]}
            for k, v in self.totals.items()
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
