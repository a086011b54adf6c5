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
    .trace.json.gz directly with aggregate_device_op_ms; see PERF.md for
    the op-level workflow)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def aggregate_device_op_ms(
    trace_dir: str,
    stage_of: Dict[str, str] = None,
    per: int = 1,
    exclude_sources: tuple = (),
) -> Dict[str, float]:
    """Aggregate DEVICE-lane op durations from a jax.profiler trace dir,
    grouped by the op's source module — the per-stage attribution used by
    bench.py's ``per_stage_ms`` extras (PERF.md's op-level workflow).

    ``stage_of`` maps source-path suffixes to stage names (unmatched ops
    land in "other"); ``per`` divides the totals (e.g. the number of
    chained steps in the traced call); ``exclude_sources`` drops
    whole-module wrapper spans attributed to the jit callsite, which
    would double-count op time. Only the TPU backend emits per-op
    ``long_name``/``source`` metadata — on CPU traces this returns {}.
    """
    import glob as _glob
    import gzip
    import json

    stage_of = stage_of or {}
    paths = sorted(
        _glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    )
    if not paths:
        return {}
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    pid_names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, nm in pid_names.items()
        if "TPU" in nm or "/device" in nm.lower()
    }
    tot: Dict[str, float] = defaultdict(float)
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        a = e.get("args", {})
        if not a.get("long_name"):
            continue  # lane/module wrappers would double-count op time
        src = a.get("source", "").rsplit(":", 1)[0]  # strip the :line
        if any(src.endswith(x) for x in exclude_sources):
            continue
        stage = "other"
        for suffix, name in stage_of.items():
            if src.endswith(suffix):
                stage = name
                break
        tot[stage] += e.get("dur", 0) / 1e3
    return {
        k: round(v / per, 4)
        for k, v in sorted(tot.items(), key=lambda kv: -kv[1])
    }


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
