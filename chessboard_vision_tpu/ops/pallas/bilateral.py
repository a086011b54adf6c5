"""Pallas bilateral filter: one HBM pass, VMEM-resident 81-tap stencil.

The bilateral (d=9, sigma 75/75 — reference frame_enhancer.py:122-131) is
the enhancement pipeline's heaviest stencil: 69 circle-masked taps, each
needing a per-pixel color-distance exp weight. The XLA form re-reads the
padded input per tap through HBM-staged fusions.

Kernel structure (what measured fastest on v5e):
- rows are processed in 8-divisible bands DMA'd into VMEM with halo;
- the NINE dx lane-shifted f32 copies of the band are materialized ONCE
  into a (9, 3, Bp, W) scratch — lane-offset reads are whole-buffer
  relayouts on TPU, so they must be hoisted out of the tap loop (a
  previous version sliced per tap: 69 relayouts/band, slower than XLA;
  another used pltpu.roll with loop-carried shifts: ~10x slower);
- the unrolled tap loop reads each neighborhood by static sublane offset
  (plain addressing, free) and accumulates num/den in LOCALS — per-dy
  partial sums folded into one running sum — which keeps the Mosaic
  stack bounded (only the running sums stay live) while avoiding the
  per-tap VMEM ref RMW that cost ~30% of the kernel;
- space weights (incl. the circle mask as exact zeros) come from a
  precomputed (9, 9) SMEM table.

Arithmetic matches ops/enhance.bilateral_planar (same f32 exp weights,
same round) up to exp-evaluation ulps and f32 sum reassociation (the
local tree vs the XLA form's linear order): measured max diff <= 1 level
at frac ~1e-5 on TPU v5e (tests/test_pallas_bilateral.py), and cv2
within 1 level.

Shapes: planar (3, H, W) u8, any H/W: the band height adapts to W so the
shifted-copy scratch fits VMEM, padding H with the reflect-101
continuation when it has no band divisor and slicing the pad back off.
Production call site: models/enhancer.bilateral (the Pallas-else-XLA
backend seam; 'auto' picks this kernel on TPU).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_cap(w: int) -> int:
    """Largest band keeping the whole scoped footprint under ~48 MB.

    Per band-pixel (lanes rounded up to 128): the (9, 3, Bp, W) f32
    shifted scratch is 108 B, the unrolled tap loop's Mosaic stack
    temporaries measure ~420 B (16.97 MB at band=48, 640 lanes), plus
    16 B of accumulators — ~550 B/px. pallas_call raises
    vmem_limit_bytes to 64 MB to make room (v5e has 128 MB/core)."""
    wq = ((max(w, 1) + 127) // 128) * 128
    cap = int(48e6 / (560 * wq)) // 8 * 8
    return max(8, min(128, cap))


def _pick_band(h: int, lo: int, hi: int):
    """Largest row-band b in [lo, hi] with b % 8 == 0 and h % b == 0.

    Mosaic requires the output block's sublane dim to be 8-divisible (or
    equal to the full array dim), so only 8-multiples qualify."""
    for b in range(hi - hi % 8, lo - 1, -8):
        if h % b == 0:
            return b
    return None


def _pick_pad_band(h: int, w: int):
    """Smallest padded height hp >= h with a valid band; returns (hp, band).

    Any h works: padding at most lo-1 rows reaches a multiple of some
    8-multiple band (worst case hp = next multiple of lo)."""
    hi = _band_cap(w)
    lo = min(32, hi)
    hp = max(h, lo)
    while True:
        b = _pick_band(hp, lo, hi)
        if b is not None:
            return hp, b
        hp += 1


@partial(jax.jit, static_argnames=("d", "sigma_color", "sigma_space", "_ablate"))
def bilateral_planar_pallas(
    img: jnp.ndarray,
    d: int = 9,
    sigma_color: float = 75.0,
    sigma_space: float = 75.0,
    _ablate: str = "",
) -> jnp.ndarray:
    """Drop-in for ops.enhance.bilateral_planar on (3, H, W) u8.

    _ablate selects MEASUREMENT-ONLY trace-time variants for the floor
    table (tools/ablate_enhanced.py; PERF.md round 5) — never set in
    production, output values are meaningless for != "":
      "noexp"  — exp(x) replaced by x (isolates the transcendental cost);
      "cdonly" — taps accumulate the color distance and raw neighborhood
                 only (no weight math: the irreducible load+|nb-center|
                 floor of the 69-tap stencil);
      "shifts" — no tap loop at all (DMA + the 9 lane-shifted f32 copies
                 + output write: the kernel's fixed data-movement floor).
    The variants share every line of the production kernel except the
    gated expressions, so differences are attributable."""
    C, H, W = img.shape
    # Pad H up to the nearest height with an 8-divisible row band (Mosaic
    # needs the output block's sublane dim 8-divisible); extra rows carry
    # the reflect-101 continuation so valid rows see exact neighborhoods,
    # and are sliced off at the end.
    Hq, band = _pick_pad_band(H, W)
    radius = d // 2
    span = 2 * radius + 1
    gc = -0.5 / (sigma_color * sigma_color)
    gs = -0.5 / (sigma_space * sigma_space)
    # DMA slices need the minor dim 128-aligned: round the padded width up.
    Wp = ((W + 2 * radius + 127) // 128) * 128
    Bp = band + 2 * radius

    # Space-weight table with the circle mask baked in as exact zeros
    # (taps outside the d//2 disk contribute nothing, matching the XLA
    # form's skip).
    sw_tab = np.zeros((span, span), np.float32)
    for dy in range(span):
        for dx in range(span):
            r2 = (dy - radius) ** 2 + (dx - radius) ** 2
            if np.sqrt(r2) <= radius:
                sw_tab[dy, dx] = np.exp(r2 * gs)

    # Reflect-101 halo around the frame (cheap XLA pad, done once), plus
    # zero fill out to the aligned width.
    padded = jnp.pad(
        img, ((0, 0), (radius, radius + Hq - H), (radius, radius)), mode="reflect"
    )
    padded = jnp.pad(padded, ((0, 0), (0, 0), (0, Wp - (W + 2 * radius))))

    grid = Hq // band

    def kernel(in_hbm, out_ref):
        i = pl.program_id(0)

        def body(band_ref, shifted_ref, sem):
            cp = pltpu.make_async_copy(
                in_hbm.at[:, pl.ds(i * band, Bp), :], band_ref, sem
            )
            cp.start()
            cp.wait()
            # Hoisted lane shifts: 9 dx-offset f32 copies, built once.
            # (Mosaic has no direct u8->f32 cast; hop through int32.)
            for dx in range(span):
                shifted_ref[dx] = (
                    band_ref[:, :, dx : dx + W].astype(jnp.int32).astype(jnp.float32)
                )
            center = shifted_ref[radius, :, radius : radius + band, :]

            # Static unrolled taps over the prebuilt shifted copies: the dy
            # row offset is a static (unaligned) sublane slice — a cheap
            # masked read, unlike the lane relayouts hoisted above (Mosaic
            # also rejects *dynamic* sublane offsets it cannot prove
            # 8-aligned, so a dy fori_loop is not lowerable here).
            # num/den accumulate in LOCALS (per-dy partials folded into a
            # running sum), not VMEM refs: the ref RMW per tap was ~30% of
            # the kernel (0.464 -> 0.334 ms at 984^2 measured). Only the
            # running sums stay live, so the Mosaic stack stays bounded.
            if _ablate == "shifts":
                res = jnp.clip(jnp.round(center), 0, 255)
                out_ref[:] = res.astype(jnp.int32).astype(jnp.uint8)
                return
            num = None
            den = None
            for dy in range(span):
                rn = None
                rd = None
                for dx in range(span):
                    sw = float(sw_tab[dy, dx])
                    if sw == 0.0:
                        continue
                    nb = shifted_ref[dx, :, dy : dy + band, :]
                    cd = jnp.sum(jnp.abs(nb - center), axis=0)
                    if _ablate == "cdonly":
                        t, w = nb, cd
                    else:
                        cw = cd * cd * jnp.float32(gc)
                        if _ablate != "noexp":
                            cw = jnp.exp(cw)
                        w = jnp.float32(sw) * cw
                        t = w[None] * nb
                    rn = t if rn is None else rn + t
                    rd = w if rd is None else rd + w
                num = rn if num is None else num + rn
                den = rd if den is None else den + rd
            res = jnp.clip(jnp.round(num / den[None]), 0, 255)
            out_ref[:] = res.astype(jnp.int32).astype(jnp.uint8)

        pl.run_scoped(
            body,
            band_ref=pltpu.VMEM((C, Bp, Wp), jnp.uint8),
            shifted_ref=pltpu.VMEM((span, C, Bp, W), jnp.float32),
            sem=pltpu.SemaphoreType.DMA,
        )

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (C, band, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, Hq, W), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(padded)
    return out if Hq == H else out[:, :H, :]


def pallas_supported(h: int, w: int, d: int = 9) -> bool:
    """Whether the Mosaic kernel's reflect pad is expressible: jnp.pad
    mode='reflect' needs every pad width <= dim-1, and the bottom pad is
    radius + (Hq - h) after band alignment — tiny crops fall back to XLA."""
    radius = d // 2
    if h <= radius or w <= radius:
        return False
    hq, _ = _pick_pad_band(h, w)
    return (radius + hq - h) <= h - 1


def bilateral_planar_best(img, d: int = 9, sigma_color: float = 75.0, sigma_space: float = 75.0):
    """Pallas kernel on TPU (when the shape supports it), XLA fallback."""
    from chessboard_vision_tpu.ops.enhance import bilateral_planar

    C, H, W = img.shape
    if jax.default_backend() == "tpu" and pallas_supported(H, W, d):
        return bilateral_planar_pallas(img, d, sigma_color, sigma_space)
    return bilateral_planar(img, d, sigma_color, sigma_space)
