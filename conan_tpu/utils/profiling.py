"""Tracing / profiling utilities.

First-class here because the north-star metric is p50 chunk latency
(SURVEY.md §5.1): device-synchronized named timers (the reference's
`utils/commons/meters.py:21-42` Timer, with `jax.block_until_ready` replacing
cuda.synchronize), latency histogram collectors, and a `jax.profiler` trace
context for TensorBoard-viewable device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np
import jax


class Timer:
    """Named cumulative wall-clock timer with device sync.

    with Timer("vocoder", enable=True, sync=out_array): ...
    Timer.report() → dict of totals.
    """

    timer_map: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)

    def __init__(self, name: str, enable: bool = True):
        self.name = name
        self.enable = enable

    def __enter__(self):
        if self.enable:
            self.t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enable:
            Timer.timer_map[self.name] += time.perf_counter() - self.t
            Timer.counts[self.name] += 1

    @classmethod
    def report(cls) -> dict[str, dict]:
        return {k: {"total_s": v, "count": cls.counts[k],
                    "mean_ms": v / max(cls.counts[k], 1) * 1e3}
                for k, v in cls.timer_map.items()}

    @classmethod
    def reset(cls):
        cls.timer_map.clear()
        cls.counts.clear()


class LatencyHistogram:
    """Per-chunk latency collector with percentile summary."""

    def __init__(self):
        self.samples: list[float] = []

    @contextlib.contextmanager
    def measure(self, sync_fn=None):
        t0 = time.perf_counter()
        yield
        if sync_fn is not None:
            sync_fn()
        self.samples.append((time.perf_counter() - t0) * 1e3)

    def record(self, ms: float):
        self.samples.append(ms)

    def summary(self, drop_first: int = 5) -> dict:
        s = np.asarray(self.samples[drop_first:] or self.samples)
        return {
            "n": len(s),
            "p50_ms": float(np.percentile(s, 50)),
            "p90_ms": float(np.percentile(s, 90)),
            "p95_ms": float(np.percentile(s, 95)),
            "p99_ms": float(np.percentile(s, 99)),
            "mean_ms": float(s.mean()),
            "max_ms": float(s.max()),
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context — view with TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    jax.block_until_ready(tree)
