"""Profiling hooks: jax.profiler traces + per-stage wall timing.

The reference has no instrumentation at all (SURVEY.md §5); these wrap
``jax.profiler`` so any pipeline call can emit an XLA trace, plus a
lightweight stage timer for host-visible breakdowns.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA/TPU profiler trace around a block (viewable in TensorBoard /
    xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock stage timer with block_until_ready fencing."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        import jax
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("out", result)
            if out is not None:
                jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:30s} {total * 1000:9.2f} ms total  "
                         f"{total / n * 1000:8.2f} ms/call  x{n}")
        return "\n".join(lines)


def profile_callable(fn, *args, iters: int = 20, warmup: int = 1):
    """(p50_ms, mean_ms, throughput_per_s) of a jitted callable."""
    import jax
    import numpy as np
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        lat.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    thr = iters / (time.perf_counter() - t0)
    return float(np.percentile(lat, 50) * 1000), float(np.mean(lat) * 1000), float(thr)
