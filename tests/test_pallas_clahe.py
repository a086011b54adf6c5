"""Pallas CLAHE kernels: histogram + LUT-apply parity.

Both Mosaic kernels (ops/pallas/clahe_apply.py) need a TPU; on CPU we
verify the backend seam resolves to the XLA form. The TPU parity tests
compare against cv2.createCLAHE (the reference oracle,
frame_enhancer.py:101-120) and a numpy histogram.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chessboard_vision_tpu.ops.enhance import clahe


@pytest.mark.skipif(jax.default_backend() == "tpu", reason="auto = pallas on TPU")
def test_auto_is_xla_on_cpu(rng):
    x = jnp.asarray(rng.integers(0, 256, (128, 160), np.uint8))
    assert np.array_equal(
        np.asarray(clahe(x, backend="auto")), np.asarray(clahe(x, backend="xla"))
    )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel needs TPU")
@pytest.mark.parametrize("shape", [(620, 620), (720, 1280)])
def test_hist_matches_numpy_on_tpu(rng, shape):
    from chessboard_vision_tpu.ops.pallas.clahe_apply import clahe_hist_pallas

    H, W = shape
    tiles = 8
    th, tw = -(-H // tiles), -(-W // tiles)
    pad = np.pad(
        rng.integers(0, 256, (H, W), np.uint8),
        ((0, th * tiles - H), (0, tw * tiles - W)),
        mode="reflect",
    )
    hist = np.asarray(clahe_hist_pallas(jnp.asarray(pad), th, tw, tiles))
    ref = np.stack(
        [
            np.bincount(
                pad[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw].ravel(),
                minlength=256,
            )
            for ty in range(tiles)
            for tx in range(tiles)
        ]
    )
    assert np.array_equal(hist, ref)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel needs TPU")
@pytest.mark.parametrize("shape", [(620, 620), (984, 984), (80, 128)])
def test_apply_v2_bit_identical_on_tpu(rng, shape):
    """The parity-split + tile-row-sliced apply (v2) must equal v1 bit for
    bit: same one-hot products, same blend arithmetic, only the matmul
    factorization differs."""
    from chessboard_vision_tpu.ops.pallas.clahe_apply import (
        clahe_apply_pallas,
        clahe_apply_pallas_v2,
    )

    H, W = shape
    tiles = 8
    th, tw = H // tiles, W // tiles
    img = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    luts = jnp.asarray(
        np.sort(rng.integers(0, 256, (64, 256)), axis=1).astype(np.float32)
    )
    v1 = np.asarray(clahe_apply_pallas(img, luts, th, tw, tiles))
    v2 = np.asarray(clahe_apply_pallas_v2(img, luts, th, tw, tiles))
    assert np.array_equal(v1, v2)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel needs TPU")
@pytest.mark.parametrize("shape", [(620, 620), (720, 1280), (77, 77)])
def test_pallas_clahe_matches_cv2_on_tpu(rng, shape):
    """Full pallas path (hist + apply) vs the cv2 oracle: <=1 level, and
    an order of magnitude fewer tie pixels than the XLA-on-TPU form (whose
    f32 matmul goes through the MXU's bf16 decomposition)."""
    cv2 = pytest.importorskip("cv2")

    x = rng.integers(0, 256, shape, np.uint8)
    ref = cv2.createCLAHE(3.0, (8, 8)).apply(x)
    out = np.asarray(clahe(jnp.asarray(x), backend="pallas")).astype(int)
    d = np.abs(out - ref.astype(int))
    assert d.max() <= 1
    assert (d > 0).mean() < 1e-3


def test_ablate_gate_variants_trace():
    """The measurement-only _ablate gates (tools/ablate_enhanced.py /
    PERF.md round-5 floor table) must keep the kernels traceable with
    unchanged output shape/dtype; eval_shape exercises every gated trace
    path without a TPU."""
    from chessboard_vision_tpu.ops.pallas.clahe_apply import (
        clahe_apply_pallas_v2,
        clahe_hist_pallas_v3,
    )

    pad = jnp.zeros((984, 984), jnp.uint8)
    luts = jnp.zeros((64, 256), jnp.float32)
    for m in ("", "matonly"):
        s = jax.eval_shape(
            lambda p, m=m: clahe_hist_pallas_v3(p, 123, 123, 8, band=16, _ablate=m),
            pad,
        )
        assert (s.shape, s.dtype) == ((64, 256), jnp.int32)
    for m in ("", "matonly", "blendonly"):
        s = jax.eval_shape(
            lambda p, m=m: clahe_apply_pallas_v2(p, luts, 123, 123, 8, _ablate=m),
            pad,
        )
        assert (s.shape, s.dtype) == ((984, 984), jnp.uint8)
