"""Lightweight per-stage timing + frames/s reporting.

Replaces the reference's ad-hoc ``clock()`` spans (``depth_estimate.cpp:54``,
``test_optimizer.cpp:89-92``) with a structured report object, and exposes
``jax.profiler`` traces for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimer:
    """Accumulates wall-clock spans per stage; blocks on device results."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def add(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in sorted(self.totals)
        }

    def __str__(self):
        lines = ["stage                     count   mean ms    total s"]
        for name, r in self.report().items():
            lines.append(f"{name:24s} {r['count']:6d} {r['mean_ms']:9.2f} {r['total_s']:9.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
