"""Timing / profiling utilities (rebuild of mapanything/utils/timing.py:16-139
plus TPU-native profiler hooks — SURVEY.md §5.1).

The reference has wall-time block timers only (no kernel-level tracing); here
the same Timer/BlockTimer surface is kept and extended with:
  * device-honest timing (a host fetch as the completion barrier — required
    because block_until_ready is unreliable over the axon tunnel);
  * jax.profiler trace capture producing Perfetto-compatible traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


class Timer:
    """Accumulating wall-clock timer (reference timing.py Timer)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self):
        assert self._t0 is not None, "Timer.stop() before start()"
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.count += 1
        self._t0 = None
        return dt

    @property
    def avg(self):
        return self.total / max(self.count, 1)


class BlockTimeManager:
    """Aggregates named block timings (reference timing.py BlockTimeManager)."""

    def __init__(self):
        self.timers: Dict[str, Timer] = defaultdict(Timer)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": t.total, "count": t.count, "avg_s": t.avg}
            for name, t in self.timers.items()
        }

    def __str__(self):
        return "  ".join(
            f"{k}: {v.avg * 1000:.1f}ms(x{v.count})"
            for k, v in self.timers.items()
        )


_default_manager = BlockTimeManager()


@contextlib.contextmanager
def block_timer(name: str, manager: Optional[BlockTimeManager] = None,
                verbose: bool = False):
    """Context manager timing a host-side block (reference BlockTimer)."""
    mgr = manager or _default_manager
    t = mgr.timers[name].start()
    try:
        yield t
    finally:
        dt = mgr.timers[name].stop()
        if verbose:
            print(f"[{name}] {dt * 1000:.2f} ms")


def device_time(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Honest per-call device seconds for a jitted fn: a scalar host fetch is
    the completion barrier (block_until_ready no-ops over the axon tunnel)."""
    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf))

    for _ in range(warmup):
        fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        fetch(fn(*args))
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
