"""Measured floor ablations for the enhanced-path Mosaic kernels.

Pins the enhanced-path floor evidence with per-kernel ablation numbers
(PERF.md round 5): how much of each kernel's time is irreducible data
movement vs arithmetic that a rewrite could still attack. Variants are
the PRODUCTION kernels with trace-time ``_ablate`` gates
(ops/pallas/bilateral.py, ops/pallas/clahe_apply.py) — structurally
identical outside the gated expressions, so differences are attributable
to exactly the gated work.

Methodology (PERF.md): every datapoint is a chained state-threaded scan
on the live chip — same-input loops are cached by this environment's TPU
tunnel and lie badly (CLAUDE.md), so each iteration's input is the
previous iteration's output. The per-pass host overhead (async dispatch
cost + the final sync's tunnel RTT, ~26 ms) is measured once with a
tiny-op chain of the same shape and subtracted.

Shapes default to the bench's enhanced production shape: at 1080p the
warped color board is (3, 980, 980) (bench.py synth_frame:
bs = min(h, w) - 100) and CLAHE pads its L channel to 984^2
(th = tw = 123, 8x8 tiles).

Prints the table to stderr and ONE JSON line to stdout.

Usage:
    python -m chessboard_vision_tpu.tools.ablate_enhanced
        [--size 980] [--scan 64] [--dispatches 16] [--passes 3]
        [--only bilateral,hist,apply,mid,copy]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _device_probe(q):
    """Child-process device enumeration (spawn target must live in an
    importable module — bench.py's probe can't be pickled from a
    spec-loaded copy, so this tool carries its own)."""
    import jax

    q.put(repr(jax.devices()))


def _check_backend():
    """Fail fast (rc 3) instead of hanging when the TPU tunnel relay is
    dead (bench.py _check_backend, single-attempt form: this is an
    interactive measurement tool, not the round's artifact capture)."""
    import multiprocessing as mp
    import queue as _queue

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_device_probe, args=(q,), daemon=True)
    p.start()
    p.join(timeout=120.0)
    if p.is_alive():
        p.terminate()
        p.join()
        log("FATAL: jax.devices() did not return within 120s (dead relay?)")
        sys.exit(3)
    if p.exitcode != 0:
        log(f"FATAL: probe child died (exitcode {p.exitcode})")
        sys.exit(3)
    try:
        log(f"devices: {q.get(timeout=5)}")
    except _queue.Empty:
        log("FATAL: probe child exited cleanly but returned no result")
        sys.exit(3)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--size", type=int, default=980,
                    help="board edge in px (bench 1080p -> 980)")
    ap.add_argument("--scan", type=int, default=64,
                    help="chained iterations per device dispatch")
    ap.add_argument("--dispatches", type=int, default=16,
                    help="async dispatches per timed pass (one sync at the end)")
    ap.add_argument("--passes", type=int, default=3, help="timed passes (min wins)")
    ap.add_argument("--only", default="",
                    help="comma-separated group filter: bilateral,hist,apply,mid,copy")
    args = ap.parse_args(argv)
    groups = set(filter(None, args.only.split(","))) or {
        "bilateral", "hist", "apply", "mid", "copy"}

    _check_backend()  # rc 3 instead of hanging on a dead relay

    import numpy as np
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        log("the Mosaic kernels under ablation need the TPU backend "
            f"(got {jax.default_backend()!r}); nothing to measure here")
        return 2

    from chessboard_vision_tpu.models.pipeline import nested_scan
    from chessboard_vision_tpu.ops.enhance import clahe_luts_from_hist
    from chessboard_vision_tpu.ops.pallas.bilateral import bilateral_planar_pallas
    from chessboard_vision_tpu.ops.pallas.clahe_apply import (
        clahe_apply_pallas_v2,
        clahe_hist_pallas_v3,
    )

    B = args.size
    tiles = 8
    th = tw = -(-B // tiles)
    Hp = th * tiles
    area = th * tw
    clip_abs = max(int(3.0 * area / 256), 1)
    band = 16 if th >= 16 else 8  # production hist band (ops/enhance.clahe)

    rng = np.random.default_rng(0)
    img3 = jnp.asarray(rng.integers(0, 256, (3, B, B), np.uint8))
    padL = jnp.asarray(rng.integers(0, 256, (Hp, Hp), np.uint8))
    luts = jnp.asarray(
        rng.integers(0, 256, (tiles * tiles, 256)).astype(np.float32))
    hist0 = jnp.asarray(
        rng.integers(0, clip_abs + 40, (tiles * tiles, 256)).astype(np.int32))

    iters = args.scan * args.dispatches
    xs = jnp.zeros((args.scan,), jnp.int32)

    def timed_chain(fn, y0):
        """min over passes of wall/iters in ms; raw, no overhead
        subtraction (done by the caller against the calibration chain).

        The kernel INPUT is perturbed by an ever-incrementing counter
        each iteration: plain output->input chaining is not enough here —
        e.g. repeated bilateral smoothing converges to a fixpoint image,
        after which every execution has identical input and the tunnel's
        execution cache serves it without running the kernel (measured:
        0.3 us/iter for a 300 us kernel). The perturbation is one
        elementwise broadcast-add per iter, identical across variants
        (and measured alone as copy/u8)."""
        def body(c, _):
            y, k = c
            y = y + k.astype(y.dtype)
            return (fn(y), k + 1), None

        step = jax.jit(
            lambda c: nested_scan(body, c, xs, args.scan)[0])

        def drain(c):
            # block_until_ready through this environment's tunnel returns
            # before remote execution completes (measured: 0.3 us/iter
            # for a 300 us kernel); only a D2H of a KERNEL-DEPENDENT
            # value awaits the chain. One scalar: the whole dispatch
            # chain must execute to produce it.
            return float(jax.device_get(jnp.ravel(c[0])[0]))

        c = step((y0, jnp.int32(1)))
        drain(c)  # compile + warm
        best = float("inf")
        for _ in range(args.passes):
            t0 = time.perf_counter()
            for _ in range(args.dispatches):
                c = step(c)
            drain(c)
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    # Host-overhead calibration: same scan/dispatch structure around a
    # near-free device op. Subtracting it isolates device time per iter.
    tiny = jnp.zeros((8, 128), jnp.int32)
    overhead_ms = timed_chain(lambda y: y + 1, tiny)
    log(f"host overhead: {overhead_ms * 1e3:.2f} us/iter "
        f"({args.scan}-scan x {args.dispatches} dispatches, one sync/pass)")

    results = {}

    def measure(name, fn, y0):
        raw = timed_chain(fn, y0)
        dev = max(raw - overhead_ms, 0.0)
        results[name] = round(dev * 1e3, 2)  # us/iter
        log(f"  {name:<22} {dev * 1e3:9.1f} us/iter  (raw {raw * 1e3:9.1f})")

    if "bilateral" in groups:
        log(f"bilateral d=9 on (3, {B}, {B}) u8:")
        for m in ("", "noexp", "cdonly", "shifts"):
            measure(
                f"bilateral/{m or 'full'}",
                lambda y, m=m: bilateral_planar_pallas(y, 9, 75.0, 75.0, _ablate=m),
                img3,
            )

    if "hist" in groups:
        log(f"clahe hist v3 on ({Hp}, {Hp}) u8 (band {band}):")
        for m in ("", "matonly"):
            def hist_fn(y, m=m):
                h = clahe_hist_pallas_v3(y, th, tw, tiles, band=band, _ablate=m)
                return y + (h[0, 0] % 2).astype(jnp.uint8)
            measure(f"hist/{m or 'full'}", hist_fn, padL)

    if "apply" in groups:
        log(f"clahe apply v2 on ({Hp}, {Hp}) u8:")
        for m in ("", "matonly", "blendonly"):
            measure(
                f"apply/{m or 'full'}",
                lambda y, m=m: clahe_apply_pallas_v2(
                    y, luts, th, tw, tiles, _ablate=m),
                padL,
            )

    if "mid" in groups:
        log("clahe mid phase (clip/redistribute/CDF, (64, 256) XLA):")
        def mid_fn(h):
            l = clahe_luts_from_hist(h, area, clip_abs)
            return jnp.abs(h - l.astype(jnp.int32))
        measure("mid/full", mid_fn, hist0)

    if "copy" in groups:
        log(f"elementwise u8 pass over ({Hp}, {Hp}) (image re-read bound):")
        measure("copy/u8", lambda y: y + jnp.uint8(1), padL)

    print(json.dumps({
        "metric": "enhanced_floor_ablations",
        "unit": "us_per_iter",
        "size": B,
        "overhead_us_per_iter": round(overhead_ms * 1e3, 2),
        "values": results,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
