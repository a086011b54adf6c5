"""Pallas bilateral filter: one HBM pass, VMEM-resident 81-tap stencil.

The bilateral (d=9, sigma 75/75 — reference frame_enhancer.py:122-131) is
the enhancement pipeline's heaviest stencil: 69 circle-masked taps, each
needing a per-pixel color-distance exp weight. The XLA form re-reads the
padded input per tap through HBM-staged fusions; this kernel DMAs each
row band (plus halo) into VMEM once, converts to f32 once, and runs the
whole tap loop out of VMEM — the arithmetic matches
ops/enhance.bilateral_planar (same f32 exp weights, same round) up to
exp-evaluation ulps: <=1 intensity level on <0.01% of pixels (measured on
TPU v5e at 620^2 and 720p), and cv2 within 1 level. Measured 4.3x faster
than the XLA 81-tap form at 720p (0.029 vs 0.124 ms), equal at 620^2.

Shapes: planar (3, H, W) u8, any H/W: rows are processed in 8-divisible
bands (Mosaic block constraint), padding H with the reflect-101
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


def _pick_band(h: int, lo: int = 32, hi: int = 128):
    """Largest row-band b in [lo, hi] with b % 8 == 0 and h % b == 0.

    Mosaic requires the output block's sublane dim to be 8-divisible (or
    equal to the full array dim), so only 8-multiples qualify."""
    for b in range(hi - hi % 8, lo - 1, -8):
        if h % b == 0:
            return b
    return None


def _pick_pad_band(h: int, lo: int = 32, hi: int = 128):
    """Smallest padded height hp >= h with a valid band; returns (hp, band).

    Any h works: padding at most lo-1 rows reaches a multiple of some
    8-multiple band (worst case hp = next multiple of lo)."""
    hp = max(h, lo)
    while True:
        b = _pick_band(hp, lo, hi)
        if b is not None:
            return hp, b
        hp += 1


def _taps(d: int):
    radius = d // 2
    taps = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if np.sqrt(dy * dy + dx * dx) <= radius:
                taps.append((dy, dx))
    return taps, radius


@partial(jax.jit, static_argnames=("d", "sigma_color", "sigma_space"))
def bilateral_planar_pallas(
    img: jnp.ndarray, d: int = 9, sigma_color: float = 75.0, sigma_space: float = 75.0
) -> jnp.ndarray:
    """Drop-in for ops.enhance.bilateral_planar on (3, H, W) u8."""
    C, H, W = img.shape
    # Pad H up to the nearest height with an 8-divisible row band (Mosaic
    # needs the output block's sublane dim 8-divisible); extra rows carry
    # the reflect-101 continuation so valid rows see exact neighborhoods,
    # and are sliced off at the end.
    Hq, band = _pick_pad_band(H)
    taps, radius = _taps(d)
    gc = -0.5 / (sigma_color * sigma_color)
    gs = -0.5 / (sigma_space * sigma_space)
    # DMA slices need the minor dim 128-aligned: round the padded width up.
    Wp = ((W + 2 * radius + 127) // 128) * 128
    Bp = band + 2 * radius

    # Reflect-101 halo around the frame (cheap XLA pad, done once), plus
    # zero fill out to the aligned width.
    padded = jnp.pad(
        img, ((0, 0), (radius, radius + Hq - H), (radius, radius)), mode="reflect"
    )
    padded = jnp.pad(padded, ((0, 0), (0, 0), (0, Wp - (W + 2 * radius))))

    grid = Hq // band

    def kernel(in_hbm, out_ref):
        i = pl.program_id(0)

        def body(band_ref, sem):
            cp = pltpu.make_async_copy(
                in_hbm.at[:, pl.ds(i * band, Bp), :], band_ref, sem
            )
            cp.start()
            cp.wait()
            # Mosaic has no direct u8->f32 cast; hop through int32.
            x = band_ref[:].astype(jnp.int32).astype(jnp.float32)  # (3, Bp, Wp)
            center = x[:, radius : radius + band, radius : radius + W]

            # Tap loop as fori (not unrolled): Mosaic stack-allocates the
            # temporaries of every unrolled step, so 69 unrolled taps OOM VMEM;
            # a fori body reuses one iteration's buffers. Neighborhood
            # shifts via circular rolls — the halo guarantees wrapped
            # elements never reach the sliced interior.
            span = 2 * radius + 1

            def tap(t, carry):
                num, den = carry
                dy = t // span - radius
                dx = t % span - radius
                r2 = dy * dy + dx * dx
                in_circle = (r2 <= radius * radius).astype(jnp.float32)
                # Both shifts as circular rolls (Pallas TPU lowers neither
                # dynamic_slice-of-value nor pl.ds on values); the halo
                # guarantees wrapped elements never reach the sliced
                # interior. pltpu.roll wants non-negative shifts.
                xs = pltpu.roll(x, (-dy) % Bp, axis=1)
                xs = pltpu.roll(xs, (-dx) % Wp, axis=2)
                nb = xs[:, radius : radius + band, radius : radius + W]
                sw = jnp.exp(r2.astype(jnp.float32) * jnp.float32(gs)) * in_circle
                cd = jnp.sum(jnp.abs(nb - center), axis=0)
                w = sw * jnp.exp(cd * cd * jnp.float32(gc))
                return num + w[None] * nb, den + w

            num0 = jnp.zeros((C, band, W), jnp.float32)
            den0 = jnp.zeros((band, W), jnp.float32)
            num, den = jax.lax.fori_loop(0, span * span, tap, (num0, den0))
            res = jnp.clip(jnp.round(num / den[None]), 0, 255)
            out_ref[:] = res.astype(jnp.int32).astype(jnp.uint8)

        pl.run_scoped(
            body,
            band_ref=pltpu.VMEM((C, Bp, Wp), jnp.uint8),
            sem=pltpu.SemaphoreType.DMA,
        )

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (C, band, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, Hq, W), jnp.uint8),
    )(padded)
    return out if Hq == H else out[:, :H, :]


def bilateral_planar_best(img, d: int = 9, sigma_color: float = 75.0, sigma_space: float = 75.0):
    """Pallas kernel on TPU, XLA fallback elsewhere."""
    from chessboard_vision_tpu.ops.enhance import bilateral_planar

    if jax.default_backend() == "tpu":
        return bilateral_planar_pallas(img, d, sigma_color, sigma_space)
    return bilateral_planar(img, d, sigma_color, sigma_space)
