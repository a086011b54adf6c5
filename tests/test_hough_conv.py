"""Conv (MXU) circle-detector backend: decision agreement vs the exact
voting backend. Small square sizes keep the CPU conv cheap; the full-scale
calibration (the 3-clip regression set at 77px squares) lives in
tests/test_regression_clip.py::test_exact_vs_conv_backend_agreement."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from chessboard_vision_tpu.ops import hough as hough_ops
from chessboard_vision_tpu.ops import hough_conv as hc

from fixtures import make_square


def test_conv_backend_agrees_with_exact(rng):
    size = 48
    h = np.full(64, size)
    params, bounds = hough_ops.HoughParams.from_geometry(h, h)
    plan, dims = hc.ConvHoughPlan.build(h, h)

    imgs = []
    for i in range(64):
        if i % 4 == 3:
            imgs.append(make_square(rng, radius=None, noise=int(rng.integers(1, 10)), size=size))
        else:
            imgs.append(
                make_square(
                    rng,
                    radius=int(rng.integers(11, 24)),
                    contrast=int(rng.integers(45, 110)),
                    noise=int(rng.integers(2, 10)),
                    off=(int(rng.integers(-5, 6)), int(rng.integers(-5, 6))),
                    size=size,
                )
            )
    imgs = jnp.asarray(np.stack(imgs))

    circ = hough_ops.hough_circles(imgs, params, bounds)
    ef, _, _, _, _ = hough_ops.best_circle_near_center(
        circ, jnp.full((64,), size), jnp.full((64,), size)
    )
    cc = hc.find_circle(imgs, plan, dims)
    agree = (np.asarray(cc.found) == np.asarray(ef)).sum()
    assert agree >= 58, f"conv-vs-exact agreement {agree}/64"


def test_conv_scores_separate_cleanly(rng):
    size = 48
    h = np.full(64, size)
    plan, dims = hc.ConvHoughPlan.build(h, h)
    clean = np.stack(
        [make_square(rng, radius=16, contrast=90, noise=3, size=size) for _ in range(32)]
        + [make_square(rng, radius=None, noise=3, size=size) for _ in range(32)]
    )
    cc = hc.find_circle(jnp.asarray(clean), plan, dims)
    scores = np.asarray(cc.score)
    assert scores[:32].min() > 50  # strong circles (proposal stage)
    assert scores[32:].max() < 30  # flat squares
    votes = np.asarray(cc.votes)
    assert votes[:32].min() > 25  # verification: cv2-semantics ray votes
    assert votes[32:].max() <= 25
    found = np.asarray(cc.found)
    assert found[:32].all() and not found[32:].any()


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel needs TPU")
def test_score_matmul_pallas_matches_xla_dot(rng):
    """TPU score path parity: the Pallas basis matmul vs the XLA dot it
    replaces (same bf16 operands, f32 accumulation)."""
    Mq, K = 2 * hc._SCORE_MBLOCK, 384
    basis = jnp.asarray(
        rng.standard_normal((Mq, K)).astype(np.float32), jnp.bfloat16
    )
    pf = jnp.asarray(rng.standard_normal((64, K)).astype(np.float32), jnp.bfloat16)
    got = np.asarray(hc._score_matmul_pallas(basis, pf.T))
    want = np.asarray(
        jax.lax.dot_general(
            basis, pf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    )
    # bf16 products accumulated in f32; ordering may differ between the
    # two lowerings — tolerance covers reassociation only.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel needs TPU")
def test_score_matmul_vmap_fold_bitexact(rng):
    """The custom_vmap stream-folding rule (one kernel call over the
    folded (K, S*64) column block — parallel/multistream's batched tick)
    is BIT-identical to per-stream kernel calls: each output column is
    the same f32-accumulated dot regardless of its neighbors."""
    Mq, K, S = 2 * hc._SCORE_MBLOCK, 384, 4
    basis = jnp.asarray(
        rng.standard_normal((Mq, K)).astype(np.float32), jnp.bfloat16
    )
    pf_t = jnp.asarray(
        rng.standard_normal((S, K, 64)).astype(np.float32), jnp.bfloat16
    )
    per_stream = np.stack(
        [np.asarray(hc._score_matmul_pallas(basis, pf_t[i])) for i in range(S)]
    )
    folded = np.asarray(
        jax.jit(jax.vmap(hc._score_matmul_tpu, in_axes=(None, 0)))(basis, pf_t)
    )
    np.testing.assert_array_equal(per_stream, folded)
