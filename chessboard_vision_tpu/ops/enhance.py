"""Enhancement kernels: CLAHE and bilateral filter (TPU-native).

The reference's enhancement pipeline (frame_enhancer.py:101-181) applies
CLAHE (clip 3.0, 8x8 tiles) to the LAB L channel, a bilateral filter
(d=9, sigma 75/75), a 3x3 sharpen, and min-max normalization. Parity:
within 1 intensity level of OpenCV (tie-rounding in LUT/weight math);
structure and constants match exactly.

TPU notes: per-tile histograms are vmapped scatter-adds (fast); the LUT
application avoids per-pixel table gathers (serialized on TPU) by mixing
the 4 neighbor-tile LUTs per pixel with an MXU matmul and reducing against
a one-hot of the pixel value. The bilateral is an 81-tap shifted
accumulation with on-the-fly Gaussian weights.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------


def clahe_luts_from_hist(
    hist: jnp.ndarray, area: int, clip_abs: int
) -> jnp.ndarray:
    """(n_tiles, 256) i32 histograms -> (n_tiles, 256) f32 integer-valued
    LUTs: clip + OpenCV's two-phase excess redistribution + scaled CDF
    (the CLAHE mid phase shared by every backend; split out so the floor
    ablation tool can time it through the production path)."""
    n_tiles = hist.shape[0]
    excess = jnp.sum(jnp.maximum(hist - clip_abs, 0), axis=-1)
    hist = jnp.minimum(hist, clip_abs)
    batch = excess // 256
    resid = excess - batch * 256
    hist = hist + batch[:, None]
    step = jnp.maximum(256 // jnp.maximum(resid, 1), 1)
    bins = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, 256), 1)
    bump = ((bins % step[:, None]) == 0) & ((bins // step[:, None]) < resid[:, None])
    hist = hist + bump.astype(jnp.int32)

    cdf = jnp.cumsum(hist, axis=-1)
    scale = jnp.float32(255.0 / area)
    return jnp.clip(jnp.round(cdf.astype(jnp.float32) * scale), 0, 255)


@partial(jax.jit, static_argnames=("clip_limit", "tiles", "backend"))
def clahe(
    img: jnp.ndarray, clip_limit: float = 3.0, tiles: int = 8, backend: str = "auto"
) -> jnp.ndarray:
    """cv2.createCLAHE(clip, (tiles, tiles)).apply for u8 (H, W) images.

    backend selects both heavy phases (per-tile histograms and the LUT
    application): 'pallas' = the VMEM-resident one-hot-matmul kernels
    (ops/pallas/clahe_apply.py), 'xla' = compare-reduce histograms + the
    strip-mapped matmul apply, 'auto' = pallas on TPU (8x8 tiles). The
    clip/redistribute/CDF phase (64x256) is shared XLA.
    """
    H, W = img.shape
    th = -(-H // tiles)
    tw = -(-W // tiles)
    Hp, Wp = th * tiles, tw * tiles
    pad = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="reflect")

    area = th * tw
    clip_abs = max(int(clip_limit * area / 256), 1)
    n_tiles = tiles * tiles

    if backend == "auto":
        backend = (
            "pallas"
            if jax.default_backend() == "tpu" and tiles == 8
            else "xla"
        )

    if backend == "pallas":
        from chessboard_vision_tpu.ops.pallas.clahe_apply import (
            clahe_hist_pallas,
            clahe_hist_pallas_v3,
        )

        # v3 = balanced-split one-hot matmul (bit-identical to v1,
        # 477 -> 129 us at 984^2); its layout assumes 8x8 tiles and needs
        # th >= band (a band spans at most two tile rows). Tiny images
        # (th < 8) and explicit backend='pallas' with tiles != 8 keep the
        # tiles-generic v1.
        if th >= 8 and tiles == 8:
            hist = clahe_hist_pallas_v3(pad, th, tw, tiles, band=16 if th >= 16 else 8)
        else:
            hist = clahe_hist_pallas(pad, th, tw, tiles)
    else:
        # Per-tile histograms: (tiles, th, tiles, tw) -> (n_tiles, area).
        # One-hot compare+reduce instead of scatter-add (TPU serializes
        # scatters: the scatter histogram alone cost ~8 ms/frame at 720p;
        # the fused compare-reduce runs at VPU speed).
        tiled = (
            pad.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3).reshape(n_tiles, area)
        )
        bins = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
        hist = jnp.sum(
            (tiled.astype(jnp.int32)[:, :, None] == bins).astype(jnp.int32), axis=1
        )

    luts = clahe_luts_from_hist(hist, area, clip_abs)  # (n_tiles, 256) f32

    if backend == "pallas":
        from chessboard_vision_tpu.ops.pallas.clahe_apply import (
            clahe_apply_pallas,
            clahe_apply_pallas_v2,
        )

        # v2 = parity-split + tile-row-sliced matmul (bit-identical to
        # v1, 0.298 -> 0.159 ms at 984^2); requires 8x8 tiles and
        # band <= th like the hist v3. Fall back to the generic v1
        # otherwise.
        if th >= 8 and tiles == 8:
            return clahe_apply_pallas_v2(pad, luts, th, tw, tiles)[:H, :W]
        return clahe_apply_pallas(pad, luts, th, tw, tiles)[:H, :W]

    # Per-pixel bilinear mix of 4 neighbor-tile LUTs, gather-free:
    # row-strip chunks of [weights (Pb, n_tiles) @ luts (n_tiles, 256)] on
    # the MXU, reduced against the pixel-value one-hot (bounded memory).
    ys = jax.lax.broadcasted_iota(jnp.float32, (Hp, Wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Hp, Wp), 1)
    tyf = ys / th - 0.5
    txf = xs / tw - 0.5
    ty0 = jnp.floor(tyf)
    tx0 = jnp.floor(txf)
    fy = tyf - ty0
    fx = txf - tx0
    ty0c = jnp.clip(ty0, 0, tiles - 1).astype(jnp.int32)
    ty1c = jnp.clip(ty0 + 1, 0, tiles - 1).astype(jnp.int32)
    tx0c = jnp.clip(tx0, 0, tiles - 1).astype(jnp.int32)
    tx1c = jnp.clip(tx0 + 1, 0, tiles - 1).astype(jnp.int32)

    pairs = [
        (ty0c * tiles + tx0c, (1 - fy) * (1 - fx)),
        (ty0c * tiles + tx1c, (1 - fy) * fx),
        (ty1c * tiles + tx0c, fy * (1 - fx)),
        (ty1c * tiles + tx1c, fy * fx),
    ]
    tile_idx = jnp.stack([p[0] for p in pairs])  # (4, Hp, Wp)
    tile_w = jnp.stack([p[1] for p in pairs])  # (4, Hp, Wp) f32

    # Strip rows so the (Pb, 256) intermediates stay small.
    strip = max(1, (1 << 22) // max(Wp * 256, 1))  # ~4M f32 per strip
    n_strips = -(-Hp // strip)
    Hs = n_strips * strip
    padr = lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, Hs - Hp), (0, 0)])
    v_s = padr(pad.astype(jnp.int32)).reshape(n_strips, strip * Wp)
    ti_s = padr(tile_idx).transpose(1, 2, 0).reshape(Hs, Wp, 4)
    ti_s = ti_s.reshape(n_strips, strip * Wp, 4)
    tw_s = padr(tile_w).transpose(1, 2, 0).reshape(Hs, Wp, 4).reshape(n_strips, strip * Wp, 4)

    def strip_apply(args):
        vals, tids, ws = args  # (Pb,), (Pb, 4), (Pb, 4)
        Pb = vals.shape[0]
        tid_iota = jax.lax.broadcasted_iota(jnp.int32, (Pb, n_tiles), 1)
        Wmat = jnp.zeros((Pb, n_tiles), jnp.float32)
        for k in range(4):
            Wmat = Wmat + (tid_iota == tids[:, k : k + 1]) * ws[:, k : k + 1]
        mixed = jnp.dot(Wmat, luts, preferred_element_type=jnp.float32)
        vbin = jax.lax.broadcasted_iota(jnp.int32, (Pb, 256), 1)
        onehot = (vbin == vals[:, None]).astype(jnp.float32)
        return jnp.sum(mixed * onehot, axis=-1)

    res = jax.lax.map(strip_apply, (v_s, ti_s, tw_s)).reshape(Hs, Wp)[:Hp]
    return jnp.clip(jnp.round(res), 0, 255).astype(jnp.uint8)[:H, :W]


# ---------------------------------------------------------------------------
# Bilateral filter
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("d", "sigma_color", "sigma_space"))
def bilateral_planar(
    img: jnp.ndarray, d: int = 9, sigma_color: float = 75.0, sigma_space: float = 75.0
) -> jnp.ndarray:
    """cv2.bilateralFilter for u8 planar (3, H, W) images (81-tap form).

    Space weights on the disk of radius d//2; color weight from the L1
    color distance, exp computed on the VPU (OpenCV tabulates the same
    function; parity within 1 level from ulp differences).
    """
    radius = d // 2
    gc = -0.5 / (sigma_color * sigma_color)
    gs = -0.5 / (sigma_space * sigma_space)

    C, H, W = img.shape
    pad = jnp.pad(img, ((0, 0), (radius, radius), (radius, radius)), mode="reflect")
    center = img.astype(jnp.float32)

    num = jnp.zeros((C, H, W), jnp.float32)
    den = jnp.zeros((H, W), jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            rr = dy * dy + dx * dx
            if np.sqrt(rr) > radius:
                continue
            sw = float(np.exp(rr * gs))
            nb = pad[:, radius + dy : radius + dy + H, radius + dx : radius + dx + W].astype(
                jnp.float32
            )
            cd = jnp.sum(jnp.abs(nb - center), axis=0)
            w = sw * jnp.exp(cd * cd * gc)
            num = num + w[None] * nb
            den = den + w
    out = num / den[None]
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
