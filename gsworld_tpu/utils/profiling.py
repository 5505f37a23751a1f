"""Tracing / profiling (SURVEY.md §5.a — first-class here, vs the
reference's wall-clock FPS print at gsworld_rand_action_tabletop.py:107-133).

- ``trace(dir)``: context manager around jax.profiler for TensorBoard-
  viewable device traces of the fused step+render program.
- ``StepTimer``: per-phase wall-clock stats with FPS summary (the
  reference-compatible counter, plus percentiles).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gsworld_trace"):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-phase timings; phases nest freely."""

    def __init__(self):
        self._acc: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append(time.perf_counter() - t0)

    def fps(self, name: str, per_call_items: int = 1) -> float:
        ts = self._acc.get(name, [])
        total = sum(ts)
        return len(ts) * per_call_items / total if total else 0.0

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, ts in self._acc.items():
            arr = np.asarray(ts)
            out[name] = {
                "count": len(arr),
                "total_s": float(arr.sum()),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
            }
        return out

    def print_summary(self):
        for name, s in sorted(self.summary().items()):
            print(f"{name:30s} n={s['count']:5d} mean={s['mean_ms']:8.2f}ms "
                  f"p95={s['p95_ms']:8.2f}ms total={s['total_s']:7.2f}s")
