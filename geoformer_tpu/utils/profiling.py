"""Profiling / step timing utilities.

TPU-native replacement for InferenceProfiler (reference:
model/loftr_src/utils/profiler.py:7-39): honest device timings via
block_until_ready fences, context-manager block accounting, and xprof traces
through jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class BlockProfiler:
    """Accumulates wall times per named block, fencing the device queue the
    way the reference wraps blocks in cuda.synchronize."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def profile(self, name: str, fence=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if fence is not None:
            jax.block_until_ready(fence)
        self.times[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        rows = sorted(self.times.items(), key=lambda kv: -kv[1])
        lines = [f"{'block':<32} {'total_s':>9} {'calls':>6} {'mean_ms':>9}"]
        for name, total in rows:
            n = self.counts[name]
            lines.append(f"{name:<32} {total:>9.3f} {n:>6} "
                         f"{1e3 * total / max(n, 1):>9.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """Capture an xprof/tensorboard trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
