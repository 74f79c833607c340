"""Profiling helpers: XLA traces + per-stage wall timers.

The reference only logs per-sequence wall time (test.py:131, 236-239); this
adds the TPU-native story: `trace(...)` wraps a region in a jax.profiler
trace viewable in TensorBoard/XProf, and StageTimer aggregates named
per-stage latencies (device-synchronized) so codec bottlenecks (NN stages
vs host rANS) are separable.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock accumulators with optional device sync."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None and self.sync:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in sorted(self.totals)
        }
