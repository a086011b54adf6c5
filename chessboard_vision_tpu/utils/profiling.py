"""Profiling: FPS counters and per-stage latency percentiles.

Replaces the reference's ad-hoc HUD FPS counters (game_session.py:116-121,
frame_enhancer.py:212-215) with recorded metrics: a windowed FPS counter
and a StageTimer that collects per-stage wall times (with
jax.block_until_ready for device stages) and reports p50/p95 — the
BASELINE per-stage latency metrics.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List

import numpy as np


@contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace scope — the framework's tracing hook (write the
    result dir into TensorBoard's profile plugin, or parse the
    .trace.json.gz directly; see PERF.md for the op-level workflow)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FpsCounter:
    """Windowed FPS: update() per frame; .fps refreshes every ``window`` s."""

    def __init__(self, window: float = 1.0):
        self.window = window
        self._count = 0
        self._start = time.time()
        self.fps = 0.0

    def update(self) -> float:
        self._count += 1
        elapsed = time.time() - self._start
        if elapsed >= self.window:
            self.fps = self._count / elapsed
            self._count = 0
            self._start = time.time()
        return self.fps


class StageTimer:
    """Collects wall-time samples per named stage; reports percentiles."""

    def __init__(self, sync=None):
        self._samples: Dict[str, List[float]] = defaultdict(list)
        self._sync = sync  # e.g. jax.block_until_ready on the stage output

    @contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if self._sync is not None and sync_value is not None:
            self._sync(sync_value)
        self._samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self._samples[name].append(seconds)

    def percentile(self, name: str, q: float) -> float:
        s = self._samples.get(name)
        return float(np.percentile(s, q)) if s else float("nan")

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, s in self._samples.items():
            arr = np.asarray(s)
            out[name] = {
                "n": len(s),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
                "mean_ms": float(arr.mean() * 1e3),
            }
        return out

    def reset(self):
        self._samples.clear()
