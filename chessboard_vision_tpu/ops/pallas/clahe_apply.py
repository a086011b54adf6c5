"""Pallas CLAHE LUT application: the enhanced path's dominant cost.

CLAHE (reference frame_enhancer.py:101-120: clip 3.0, 8x8 tiles on LAB-L)
has two phases: per-tile histogram -> clipped CDF -> LUTs (cheap, stays
XLA — ops/enhance.clahe), and the per-pixel bilinear mix of the 4
neighbor-tile LUTs (expensive). TPU gathers serialize, so the mix must be
matmul-shaped; the XLA form (weights (P, 64) @ luts (64, 256), reduced
against a pixel-value one-hot) streams ~1 KB of f32 intermediates per
pixel through HBM — and its f32 matmul goes through the MXU's bf16
multi-pass decomposition, which costs it ~10% off-by-one pixels vs cv2.

This kernel keeps everything in VMEM and the value lookup exact:
- per row band, the value one-hot (256, band*Wq) is built in bf16 by
  static per-row writes (no relayout; integers 0..255 are EXACT in bf16
  and each column has one nonzero, so the MXU product is exact);
- E[t, p] = luts[t][val[p]] for ALL 64 tiles with ONE matmul
  (64, 256) @ (256, band*Wq);
- each band row r has a single tile-row pair (ty0, ty0+1): its two
  (8, Wq) tile-row slices of E are read by *dynamic sublane offset*
  ty0c*8 — provably 8-aligned via pl.multiple_of, which Mosaic requires
  — blended with the scalar fy, then collapsed across tile columns with
  a per-column wx weight image (static in x, built once per band).

HBM traffic: one u8 read + one u8 write. Parity: measured 0.02%
off-by-one pixels vs cv2 at 620^2 (f32 4-term rounding ties), an order
of magnitude closer than the XLA form on TPU (see
tests/test_pallas_clahe.py, TPU-only).

Production call site: ops/enhance.clahe (backend seam, 'auto' = this
kernel on TPU when tiles == 8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_band(wpad: int) -> int:
    """Largest row band B (8-multiple) keeping the one-hot under ~6 MB."""
    budget = 6 * 1024 * 1024
    b = (budget // (256 * wpad * 2)) // 8 * 8
    return max(8, min(32, b))


def _pick_band_hist(wpad: int) -> int:
    """Hist band: larger than the apply band (its loop body is just the
    one-hot + membership writes, no per-row blend unroll) — measured at
    984²: 0.518 ms @ band 8, 0.477 @ 16, 0.452 @ 32. Capped at 16: the
    band-32 unroll pushed the enhanced chunk-scan compile past 10 min on
    this environment's remote compiler for a 0.025 ms gain."""
    budget = 12 * 1024 * 1024
    b = (budget // (256 * wpad * 2)) // 8 * 8
    return max(8, min(16, b))


@partial(jax.jit, static_argnames=("th", "tw", "tiles"))
def clahe_hist_pallas(
    pad_img: jnp.ndarray, th: int, tw: int, tiles: int
) -> jnp.ndarray:
    """Per-tile 256-bin histograms of a padded (Hp, Wp) u8 image.

    Replaces the XLA one-hot compare-reduce (a (n_tiles, area, 256) i32
    materialization, ~0.9 ms at 620^2): per row band, build the value
    one-hot (256, band*Wq) bf16 and a tile-membership matrix
    (band*Wq, n_tiles) bf16, then hist_partial = onehot @ membership on
    the MXU, accumulated across sequential grid steps. Counts are exact
    (0/1 products, f32 accumulation, area < 2^24).

    Returns (n_tiles, 256) i32. Pixels in the Wq/Hq alignment padding get
    tile indices >= n_tiles and match no membership column.
    """
    Hp, Wp = pad_img.shape
    n_tiles = tiles * tiles
    Wq = ((Wp + 127) // 128) * 128
    band = _pick_band_hist(Wq)
    Hq = ((Hp + band - 1) // band) * band
    x_pad = jnp.pad(pad_img, ((0, Hq - Hp), (0, Wq - Wp)), constant_values=255)
    grid = Hq // band
    P = band * Wq

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)

        def body(oh_ref, m_ref):
            vals = x_ref[:].astype(jnp.int32)  # (band, Wq)
            vbin = jax.lax.broadcasted_iota(jnp.int32, (256, Wq), 0)
            # Column tile index (static per column; >= tiles beyond Wp,
            # matching no membership column).
            xs = jax.lax.broadcasted_iota(jnp.int32, (Wq, 1), 0)
            # Padded columns (x >= Wp) get a sentinel far outside
            # [0, n_tiles): a plain x // tw would alias them into the
            # NEXT tile row's first tile (ty*tiles + tiles).
            txc = jnp.where(xs < Wp, xs // tw, jnp.int32(1 << 20))  # (Wq, 1)
            tbin = jax.lax.broadcasted_iota(jnp.int32, (Wq, n_tiles), 1)
            for r in range(band):
                oh_ref[:, r * Wq : (r + 1) * Wq] = (
                    vbin == vals[r : r + 1, :]
                ).astype(jnp.bfloat16)
                # Row tile index: dynamic scalar; rows in the Hq padding
                # get ty >= tiles -> no match.
                ty = (i * band + r) // th
                m_ref[r * Wq : (r + 1) * Wq, :] = (
                    tbin == ty * tiles + txc
                ).astype(jnp.bfloat16)

            part = jnp.dot(
                oh_ref[:], m_ref[:], preferred_element_type=jnp.float32
            )  # (256, n_tiles)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            out_ref[:] = out_ref[:] + part

        pl.run_scoped(
            body,
            oh_ref=pltpu.VMEM((256, P), jnp.bfloat16),
            m_ref=pltpu.VMEM((P, n_tiles), jnp.bfloat16),
        )

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((band, Wq), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (256, n_tiles), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((256, n_tiles), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
    )(x_pad)
    return out.T.astype(jnp.int32)  # (n_tiles, 256)


# A v2 kernel (nibble-factorized 32x8 value split) lived here between v1
# and v3; it measured SLOWER than v1 — its (P, 64) membership operand
# forced a per-row lane->sublane relayout — and was removed. v3's
# balanced 64/64 split with both operands (64, P) is the live fast path.

@partial(jax.jit, static_argnames=("th", "tw", "tiles", "band", "_ablate"))
def clahe_hist_pallas_v3(
    pad_img: jnp.ndarray,
    th: int,
    tw: int,
    tiles: int,
    band: int = 16,
    _ablate: str = "",
) -> jnp.ndarray:
    """Balanced-split per-tile histograms: ~2.5x less VPU issue than v1.

    v1 builds a 256-row value one-hot plus a 64-col tile membership
    (320 compare+writes per pixel — the kernel is VPU-issue-bound, not
    HBM-bound). v3 splits the histogram coordinate (t, v) into two
    64-wide one-hots and lets the MXU take the product:

      A [(g, hi), p]  = [tile-row-group(p) == g][v(p) >> 3 == hi]  (64, P)
      Bt[(lo, txc), p] = [v(p) & 7 == lo][x(p) // tw == txc]       (64, P)

    where g in {0, 1} indexes the band's (ty0, ty1) tile-row pair (a band
    spans at most two tile rows). part = A @ Bt^T — dot_general with the
    CONTRACTION ON DIM 1 OF BOTH operands, which the MXU takes natively —
    is (64, 64); its g-halves accumulate into the (ty*32 .. +32) row
    blocks of a (256, 64) output with rows (ty, hi) and cols (lo, txc).
    128 compare+writes per pixel, all LANE-aligned (both one-hots compare
    a row vector against a sublane iota), and the matmul shrinks 4x.

    v2 (nibble split with a (P, 64) membership operand) measured SLOWER
    than v1: its per-row (1, Wq) -> (Wq, 1) value transpose is a Mosaic
    relayout. Keeping both operands (64, P) removes every transpose:
    measured 477 -> 129 us at 984^2 (v1 -> v3), bit-identical.

    Requires th >= band and tiles == 8. Returns (n_tiles, 256) i32,
    bit-identical to clahe_hist_pallas (exact 0/1 bf16 products, f32
    accumulation).

    _ablate (MEASUREMENT-ONLY, tools/ablate_enhanced.py / PERF.md round
    5; output is garbage for != ""): "matonly" skips the per-row one-hot
    build loop and runs the dot + accumulation on whatever the scratch
    holds — full minus matonly is the one-hot build (compare+write)
    share the round-4 notes call compare-issue-bound.
    """
    Hp, Wp = pad_img.shape
    n_tiles = tiles * tiles
    assert tiles == 8, "v3 layout assumes 8x8 tiles"
    assert th >= band, "band must not span more than two tile rows"
    Wq = ((Wp + 127) // 128) * 128
    Hq = ((Hp + band - 1) // band) * band
    x_pad = jnp.pad(pad_img, ((0, Hq - Hp), (0, Wq - Wp)))
    grid = Hq // band
    P = band * Wq

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)
        SENT = jnp.int32(1 << 20)  # built in-kernel (no closure capture)
        ty0c = jnp.minimum((i * band) // th, tiles - 1)
        ty1c = jnp.minimum((i * band + band - 1) // th, tiles - 1)

        def body(a_ref, bt_ref):
            vals = x_ref[:].astype(jnp.int32)  # (band, Wq)
            abin = jax.lax.broadcasted_iota(jnp.int32, (64, Wq), 0)
            xs_row = jax.lax.broadcasted_iota(jnp.int32, (1, Wq), 1)
            # Static column-tile index; padded columns (x >= Wp) match no
            # Bt row.
            txc = jnp.where(xs_row < Wp, xs_row // tw, SENT)
            for r in range(band) if _ablate != "matonly" else range(0):
                ty_r = (i * band + r) // th
                # Row group within the band's tile-row pair; Hq-padding
                # rows (ty_r >= tiles) match no A row.
                grp = jnp.where(ty_r == ty0c, 0, 32)
                grp = jnp.where(ty_r < tiles, grp, SENT)
                hi = vals[r : r + 1, :] >> 3  # (1, Wq)
                a_ref[:, r * Wq : (r + 1) * Wq] = (abin == grp + hi).astype(
                    jnp.bfloat16
                )
                lo = vals[r : r + 1, :] & 7  # (1, Wq)
                bt_ref[:, r * Wq : (r + 1) * Wq] = (
                    abin == lo * 8 + txc
                ).astype(jnp.bfloat16)

            part = jax.lax.dot_general(
                a_ref[:], bt_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (64, 64): rows (g, hi), cols (lo, txc)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            r0 = pl.ds(pl.multiple_of(ty0c * 32, 8), 32)
            out_ref[r0, :] = out_ref[r0, :] + part[:32]
            r1 = pl.ds(pl.multiple_of(ty1c * 32, 8), 32)
            out_ref[r1, :] = out_ref[r1, :] + part[32:]

        pl.run_scoped(
            body,
            a_ref=pltpu.VMEM((64, P), jnp.bfloat16),
            bt_ref=pltpu.VMEM((64, P), jnp.bfloat16),
        )

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((band, Wq), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((256, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 64), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
    )(x_pad)
    # rows (ty, hi), cols (lo, txc) -> hist[t = ty*8+txc, v = hi*8+lo]
    out = out.reshape(tiles, 32, 8, tiles)  # [ty, hi, lo, txc]
    out = out.transpose(0, 3, 1, 2).reshape(n_tiles, 256)
    return out.astype(jnp.int32)


@partial(jax.jit, static_argnames=("th", "tw", "tiles", "band", "_ablate"))
def clahe_apply_pallas_v2(
    pad_img: jnp.ndarray,
    luts: jnp.ndarray,
    th: int,
    tw: int,
    tiles: int,
    band: int = 8,
    _ablate: str = "",
) -> jnp.ndarray:
    """Parity-split, tile-row-sliced LUT mix: bit-identical to
    clahe_apply_pallas with ~5x less MXU work and half the one-hot build.

    Two independent factorizations compose:

    1. **Value parity split.** v1's matmul is (64, 256) @ (256, P): two
       K-passes at M = 64, behind a 256-row one-hot build. Splitting the
       pixel value as v = 2j + s (j = v >> 1, s = v & 1) halves both: the
       one-hot becomes OH[j, p] = [v(p) >> 1 == j] (128 rows), and each
       LUT contributes two packed rows (its even and its odd columns).
       The row loop picks the right half per pixel with the parity bit (a
       (1, Wq) select over two 8-row slices).
    2. **Tile-row slicing.** A row band of 8 spans at most two LUT tile
       rows (ty0, ty0+1 with band <= th), so with the y-blend neighbor at
       most THREE of the 8 tile rows are ever read. A is laid out with
       each tile row's 16 packed rows contiguous ([even tiles ty*8..+8;
       odd same]), and the kernel matmuls only the 48-row window starting
       at t_lo = clip(floor(first_row/th - .5), 0, tiles-3) * 16 — a
       16-aligned dynamic sublane slice. M drops 128 -> 48 and the E slab
       shrinks 2.7x (measured: Mosaic matmul time at K=128 scales ~linearly
       in M down to M~48, floor below that).

    Every product is still a single nonzero times an integer-valued bf16
    LUT entry accumulated in f32, so the selected value equals v1's
    exactly; the blend math is untouched — output is bit-identical
    (tests/test_pallas_clahe.py, TPU-only).

    _ablate (MEASUREMENT-ONLY, tools/ablate_enhanced.py / PERF.md round
    5; output is garbage for != ""): "matonly" keeps the one-hot build +
    E matmul and writes E rows straight out (no bilinear blend);
    "blendonly" skips the one-hot and matmul and blends whatever the E
    scratch holds (the per-row wx/fy mix floor).
    """
    Hp, Wp = pad_img.shape
    n_tiles = tiles * tiles
    assert luts.shape == (n_tiles, 256)
    assert tiles == 8, "pallas clahe apply requires 8x8 tiles"
    assert band % 8 == 0 and band <= th, "band must be 8-aligned and <= th"

    Wq = ((Wp + 127) // 128) * 128
    Hq = ((Hp + band - 1) // band) * band
    x_pad = jnp.pad(pad_img, ((0, Hq - Hp), (0, Wq - Wp)))
    # (128, 128) interleaved per tile row: rows t*16..+8 = even LUT
    # columns of tiles (t*8..t*8+8), rows t*16+8..+16 = odd.
    even = luts[:, 0::2].reshape(tiles, tiles, 128)
    odd = luts[:, 1::2].reshape(tiles, tiles, 128)
    a_mat = (
        jnp.concatenate([even, odd], axis=1)
        .reshape(2 * n_tiles, 128)
        .astype(jnp.bfloat16)
    )
    grid = Hq // band
    P = band * Wq

    def kernel(x_ref, a_ref, out_ref):
        i = pl.program_id(0)
        th_f = jnp.float32(th)
        tw_f = jnp.float32(tw)
        # Lowest tile row the band (plus its y-blend neighbor) can touch.
        t_lo = jnp.clip(
            jnp.floor((i * band).astype(jnp.float32) / th_f - 0.5), 0, tiles - 3
        ).astype(jnp.int32)

        def body(oh_ref, e_ref):
            vals = x_ref[:].astype(jnp.int32)  # (band, Wq)

            if _ablate != "blendonly":
                # Half-value one-hot (128 rows): static lane offsets per row.
                jbin = jax.lax.broadcasted_iota(jnp.int32, (128, Wq), 0)
                for r in range(band):
                    oh_ref[:, r * Wq : (r + 1) * Wq] = (
                        jbin == (vals[r : r + 1, :] >> 1)
                    ).astype(jnp.bfloat16)

                # E[(t-t_lo, s), p] = luts[t][2*(v>>1) + s] for the 3 live
                # tile rows: one (48, 128) @ (128, P) MXU pass.
                a_sl = a_ref[pl.ds(pl.multiple_of(t_lo * 16, 8), 48), :]
                e_ref[:] = jnp.dot(
                    a_sl, oh_ref[:], preferred_element_type=jnp.float32
                )

            if _ablate == "matonly":
                for r in range(band):
                    row = pl.ds(r * Wq, Wq)
                    res = jnp.clip(jnp.round(e_ref[0:1, row]), 0, 255)
                    out_ref[r : r + 1, :] = res.astype(jnp.int32).astype(
                        jnp.uint8
                    )
                return

            # Per-column x-weights (identical to v1).
            xs = jax.lax.broadcasted_iota(jnp.int32, (1, Wq), 1).astype(
                jnp.float32
            )
            txf = xs / tw_f - 0.5
            tx0 = jnp.floor(txf)
            fx = txf - tx0
            tx0c = jnp.clip(tx0, 0, tiles - 1).astype(jnp.int32)
            tx1c = jnp.clip(tx0 + 1, 0, tiles - 1).astype(jnp.int32)
            cbin = jax.lax.broadcasted_iota(jnp.int32, (tiles, Wq), 0)
            wx = jnp.where(cbin == tx0c, 1.0 - fx, 0.0) + jnp.where(
                cbin == tx1c, fx, 0.0
            )  # (tiles, Wq) f32

            for r in range(band):
                y = (i * band + r).astype(jnp.float32)
                tyf = y / th_f - 0.5
                ty0 = jnp.floor(tyf)
                fy = tyf - ty0
                ty0c = jnp.clip(ty0, 0, tiles - 1).astype(jnp.int32)
                ty1c = jnp.clip(ty0 + 1, 0, tiles - 1).astype(jnp.int32)
                d0 = ty0c - t_lo  # in {0, 1, 2} by construction
                d1 = ty1c - t_lo
                row = pl.ds(r * Wq, Wq)
                par = (vals[r : r + 1, :] & 1) == 1  # (1, Wq)
                # Even/odd halves at 16-aligned local tile-row offsets.
                e0a = e_ref[pl.ds(pl.multiple_of(d0 * 16, 8), tiles), row]
                e0b = e_ref[pl.ds(pl.multiple_of(d0 * 16 + 8, 8), tiles), row]
                e1a = e_ref[pl.ds(pl.multiple_of(d1 * 16, 8), tiles), row]
                e1b = e_ref[pl.ds(pl.multiple_of(d1 * 16 + 8, 8), tiles), row]
                e0 = jnp.where(par, e0b, e0a)
                e1 = jnp.where(par, e1b, e1a)
                ey = (1.0 - fy) * e0 + fy * e1  # (tiles, Wq)
                res = jnp.sum(wx * ey, axis=0, keepdims=True)  # (1, Wq)
                res = jnp.clip(jnp.round(res), 0, 255)
                out_ref[r : r + 1, :] = res.astype(jnp.int32).astype(jnp.uint8)

        pl.run_scoped(
            body,
            oh_ref=pltpu.VMEM((128, P), jnp.bfloat16),
            e_ref=pltpu.VMEM((48, P), jnp.float32),
        )

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((band, Wq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, Wq), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hq, Wq), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
    )(x_pad, a_mat)
    return out[:Hp, :Wp]


@partial(jax.jit, static_argnames=("th", "tw", "tiles"))
def clahe_apply_pallas(
    pad_img: jnp.ndarray, luts: jnp.ndarray, th: int, tw: int, tiles: int
) -> jnp.ndarray:
    """Bilinear 4-LUT mix for CLAHE on a padded (Hp, Wp) u8 image.

    pad_img: (Hp, Wp) u8 with Hp = th*tiles, Wp = tw*tiles (the caller's
    reflect pad). luts: (tiles*tiles, 256) f32 integer-valued LUTs.
    Returns (Hp, Wp) u8. Requires tiles == 8 (the ty0c*tiles sublane
    offsets must be provably 8-aligned); the caller falls back to the
    XLA form otherwise.
    """
    Hp, Wp = pad_img.shape
    n_tiles = tiles * tiles
    assert luts.shape == (n_tiles, 256)
    assert tiles == 8, "pallas clahe apply requires 8x8 tiles"

    Wq = ((Wp + 127) // 128) * 128
    band = _pick_band(Wq)
    Hq = ((Hp + band - 1) // band) * band
    x_pad = jnp.pad(pad_img, ((0, Hq - Hp), (0, Wq - Wp)))
    luts_bf = luts.astype(jnp.bfloat16)
    grid = Hq // band
    P = band * Wq

    def kernel(x_ref, luts_ref, out_ref):
        i = pl.program_id(0)
        th_f = jnp.float32(th)
        tw_f = jnp.float32(tw)

        def body(oh_ref, e_ref):
            vals = x_ref[:].astype(jnp.int32)  # (band, Wq)

            # Value one-hot, built row-by-row into (256, band*Wq) — static
            # lane offsets, no relayout. Mosaic iota is integer-only.
            vbin = jax.lax.broadcasted_iota(jnp.int32, (256, Wq), 0)
            for r in range(band):
                oh_ref[:, r * Wq : (r + 1) * Wq] = (
                    vbin == vals[r : r + 1, :]
                ).astype(jnp.bfloat16)

            # E[t, p] = luts[t][val[p]] for every tile, one MXU matmul
            # (exact: one nonzero per one-hot column, integer values).
            e_ref[:] = jnp.dot(
                luts_ref[:], oh_ref[:], preferred_element_type=jnp.float32
            )

            # Per-column x-weights: wx[c, x] = (1-fx)[c==tx0c] + fx[c==tx1c]
            # — static in x, one (tiles, Wq) image per band. True f32
            # division so fx matches the XLA form bit-for-bit.
            xs = jax.lax.broadcasted_iota(jnp.int32, (1, Wq), 1).astype(
                jnp.float32
            )
            txf = xs / tw_f - 0.5
            tx0 = jnp.floor(txf)
            fx = txf - tx0
            tx0c = jnp.clip(tx0, 0, tiles - 1).astype(jnp.int32)
            tx1c = jnp.clip(tx0 + 1, 0, tiles - 1).astype(jnp.int32)
            cbin = jax.lax.broadcasted_iota(jnp.int32, (tiles, Wq), 0)
            wx = jnp.where(cbin == tx0c, 1.0 - fx, 0.0) + jnp.where(
                cbin == tx1c, fx, 0.0
            )  # (tiles, Wq) f32

            # Row loop: each band row has one (ty0, ty0+1) tile-row pair;
            # slice the two (tiles, Wq) tile-rows of E at dynamic sublane
            # offset ty0c*8 (8-aligned by construction), blend with the
            # scalar fy, collapse tile columns with wx.
            for r in range(band):
                y = (i * band + r).astype(jnp.float32)
                tyf = y / th_f - 0.5
                ty0 = jnp.floor(tyf)
                fy = tyf - ty0
                ty0c = jnp.clip(ty0, 0, tiles - 1).astype(jnp.int32)
                ty1c = jnp.clip(ty0 + 1, 0, tiles - 1).astype(jnp.int32)
                row = pl.ds(r * Wq, Wq)
                e0 = e_ref[pl.ds(pl.multiple_of(ty0c * tiles, 8), tiles), row]
                e1 = e_ref[pl.ds(pl.multiple_of(ty1c * tiles, 8), tiles), row]
                ey = (1.0 - fy) * e0 + fy * e1  # (tiles, Wq)
                res = jnp.sum(wx * ey, axis=0, keepdims=True)  # (1, Wq)
                res = jnp.clip(jnp.round(res), 0, 255)
                out_ref[r : r + 1, :] = res.astype(jnp.int32).astype(jnp.uint8)

        pl.run_scoped(
            body,
            oh_ref=pltpu.VMEM((256, P), jnp.bfloat16),
            e_ref=pltpu.VMEM((n_tiles, P), jnp.float32),
        )

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((band, Wq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, Wq), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hq, Wq), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
    )(x_pad, luts_bf)
    return out[:Hp, :Wp]
