"""Profiling / observability — the gap SURVEY.md §5 says must be filled
properly: jax.profiler traces plus host-side step timers.

Usage:
    with trace("gs://bucket/traces" or "/tmp/trace"):
        run_steps()

    timer = StepTimer()
    with timer.step():
        train_step(...)
    timer.summary()  # p50/p90 step time, steps/s
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (view in TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("profile trace written to %s", log_dir)


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage in GB (CUDA max-mem analogue in
    MetricLogger.log_every, cf. logger.py:130-192)."""
    out = {}
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        out[str(d.id)] = stats.get("bytes_in_use", 0) / 1e9
    return out


class StepTimer:
    def __init__(self, window: int = 200):
        self.times: List[float] = []
        self.window = window

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return dict(p50=float(np.percentile(arr, 50)),
                    p90=float(np.percentile(arr, 90)),
                    mean=float(arr.mean()),
                    steps_per_s=float(1.0 / max(arr.mean(), 1e-9)))


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
