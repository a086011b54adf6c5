"""Op-level device profile of one pipeline step: the PERF.md workflow as a CLI.

Builds the bench pipeline (synthetic 1080p board), runs N chained steps
under a jax.profiler trace, and prints the top device ops with source
attribution plus per-file totals — the exact measurement loop behind
PERF.md's optimization log (every "X -> Y us" claim in it came from this
table). Run on the TPU; on CPU backends XLA emits no per-op metadata and
the tool says so instead of printing an empty table.

Usage:
    python -m chessboard_vision_tpu.tools.profile_step [--enhance]
        [--steps N] [--top K] [--width W --height H]

The per-stage (bucketed) variant of this attribution ships in bench.py's
``per_stage_ms`` extras (utils/profiling.aggregate_device_op_ms); this
tool keeps the op granularity for kernel work.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import tempfile
from collections import defaultdict


def _device_op_rows(trace_dir: str):
    """(name, source, long_name, ms) rows for device-lane ops."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        return []
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {
        p for p, nm in pid_names.items()
        if "TPU" in nm or "/device" in nm.lower()
    }
    rows = []
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        a = e.get("args", {})
        if not a.get("long_name"):
            continue  # lane/module wrapper spans double-count op time
        rows.append((
            e.get("name", "?"),
            a.get("source", "?"),
            a.get("long_name", ""),
            e.get("dur", 0) / 1e3,
        ))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--enhance", action="store_true",
                    help="profile the with_enhancer pipeline")
    ap.add_argument("--steps", type=int, default=10,
                    help="chained steps inside the trace")
    ap.add_argument("--top", type=int, default=25, help="ops to print")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    # bench.py owns the synthetic-board + pipeline-build recipe
    import importlib.util
    import os

    bench_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "bench.py")
    spec = importlib.util.spec_from_file_location("benchmod", bench_path)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from chessboard_vision_tpu.ops.static_resample import to_planar

    h, w = args.height, args.width
    rng = np.random.default_rng(0)
    frame, (x0, y0, bs) = bench.synth_frame(rng, h, w)
    corners = np.array(
        [[x0, y0], [x0 + bs, y0], [x0, y0 + bs], [x0 + bs, y0 + bs]])
    pipe = bench.build((w, h), corners, with_enhancer=args.enhance)
    state = pipe.init_state()
    fd = jnp.asarray(to_planar(frame))
    state = pipe.capture_reference(state, fd)
    state, out = pipe.step(state, fd)
    jax.block_until_ready(out)

    tdir = tempfile.mkdtemp(prefix="profile_step_")
    jax.profiler.start_trace(tdir)
    for _ in range(args.steps):
        state, out = pipe.step(state, fd)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    rows = _device_op_rows(tdir)
    if not rows:
        print("no per-op device metadata in the trace — run on the TPU "
              "backend (CPU traces carry no op source attribution)")
        return 1

    n = args.steps
    per_op = defaultdict(float)
    per_file = defaultdict(float)
    long_of = {}
    for name, source, long_name, ms in rows:
        src = source.rsplit(":", 1)[0].split("/")[-1] or "?"
        key = (name, source[-48:])
        per_op[key] += ms / n
        per_file[src] += ms / n
        long_of.setdefault(key, long_name)

    total = sum(per_op.values())
    print(f"device total {total:.3f} ms/step over {n} chained steps "
          f"({'enhanced' if args.enhance else 'plain'}, {w}x{h})")
    print("\nper source file (ms/step):")
    for src, ms in sorted(per_file.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:8.4f}  {src}")
    print(f"\ntop {args.top} ops (ms/step):")
    for (name, src), ms in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {ms:8.4f}  {name:<44} {src}")
        if src == "?"[-48:] or not src.strip("?"):
            print(f"            {long_of[(name, src)][:140]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
