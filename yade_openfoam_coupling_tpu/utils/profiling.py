"""Profiling hooks: jax.profiler traces + phase timers.

The reference's only profiling is the per-step ExecutionTime print
(`icoFoamYade.C:144-146`); here we expose XLA-level traces (op breakdown,
HBM/ICI utilization in TensorBoard/xprof) and a lightweight host-side phase
timer for the non-jitted path.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block:

        with profiling.trace('/tmp/yofc-trace'):
            state, _ = step(state)
            jax.block_until_ready(state)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Host-side accumulating timer for coarse phase breakdowns."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[k]
            tot = self.totals[k]
            lines.append(f"{k:30s} {tot:9.3f}s total  {tot / n * 1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)
