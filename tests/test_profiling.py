"""Tests: utils/profiling — the tracing/metrics subsystem (SURVEY §5).

aggregate_device_op_ms is validated against a synthetic trace file laid
out exactly like a TPU jax.profiler capture (device pid metadata + X
events carrying long_name/source args) — only the TPU backend emits the
per-op metadata, so a real capture can't be made in the CPU test env.
"""

import gzip
import json
import time

import numpy as np

from chessboard_vision_tpu.utils.profiling import (
    FpsCounter,
    StageTimer,
    aggregate_device_op_ms,
)


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _meta(pid, name):
    return {"ph": "M", "pid": pid, "name": "process_name", "args": {"name": name}}


def _op(pid, dur_us, source, long_name="fusion.1"):
    return {
        "ph": "X", "pid": pid, "tid": 1, "ts": 0, "dur": dur_us,
        "name": "op",
        "args": {"long_name": long_name, "source": f"{source}:42"},
    }


class TestAggregateDeviceOpMs:
    STAGES = {"ops/canny.py": "hough", "ops/color.py": "color"}

    def test_groups_by_stage_and_divides(self, tmp_path):
        td = _write_trace(tmp_path, [
            _meta(1, "/device:TPU:0"),
            _meta(2, "/host:CPU"),
            _op(1, 4000, "chessboard_vision_tpu/ops/canny.py"),
            _op(1, 1000, "chessboard_vision_tpu/ops/canny.py"),
            _op(1, 2000, "chessboard_vision_tpu/ops/color.py"),
            _op(1, 500, "chessboard_vision_tpu/ops/warp.py"),  # -> other
            _op(2, 9000, "chessboard_vision_tpu/ops/canny.py"),  # host pid: dropped
        ])
        got = aggregate_device_op_ms(td, stage_of=self.STAGES, per=2)
        assert got == {"hough": 2.5, "color": 1.0, "other": 0.25}
        # ordering: largest stage first
        assert list(got) == ["hough", "color", "other"]

    def test_excludes_callsite_wrappers_and_unnamed(self, tmp_path):
        td = _write_trace(tmp_path, [
            _meta(1, "TPU lanes"),
            _op(1, 1000, "chessboard_vision_tpu/ops/canny.py"),
            _op(1, 8000, "chessboard_vision_tpu/models/pipeline.py"),
            # module/lane wrapper spans carry no long_name: dropped
            {"ph": "X", "pid": 1, "tid": 1, "ts": 0, "dur": 7000,
             "name": "jit_step", "args": {}},
        ])
        got = aggregate_device_op_ms(
            td, stage_of=self.STAGES, exclude_sources=("models/pipeline.py",)
        )
        assert got == {"hough": 1.0}

    def test_empty_and_cpu_traces(self, tmp_path):
        assert aggregate_device_op_ms(str(tmp_path)) == {}  # no capture
        td = _write_trace(tmp_path, [
            _meta(2, "/host:CPU"),
            _op(2, 9000, "chessboard_vision_tpu/ops/canny.py"),
        ])
        assert aggregate_device_op_ms(td, stage_of=self.STAGES) == {}


class TestCounters:
    def test_fps_counter_window(self):
        c = FpsCounter(window=0.0)  # every update refreshes
        c.update()
        time.sleep(0.01)
        assert c.update() > 0

    def test_stage_timer_percentiles_and_report(self):
        t = StageTimer()
        for ms in (1.0, 2.0, 3.0):
            t.record("infer", ms / 1e3)
        assert np.isclose(t.percentile("infer", 50), 2e-3)
        rep = t.report()
        assert rep["infer"]["n"] == 3
        assert np.isclose(rep["infer"]["p50_ms"], 2.0)
        assert np.isnan(t.percentile("missing", 50))
        with t.stage("timed"):
            pass
        assert t.report()["timed"]["n"] == 1
        t.reset()
        assert t.report() == {}


class TestProfileStepTool:
    def test_cpu_backend_graceful(self):
        """tools/profile_step on a CPU backend prints the no-metadata
        message and exits 1 instead of an empty table (per-op source
        attribution only exists in TPU traces)."""
        from chessboard_vision_tpu.tools import profile_step

        rc = profile_step.main(
            ["--width", "320", "--height", "192", "--steps", "1"]
        )
        assert rc == 1
