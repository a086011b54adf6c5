"""Pallas bilateral kernel: parity vs the XLA implementation.

The kernel itself needs a TPU (Mosaic); on CPU we run it in interpreter
mode on a small image to validate the lowering-independent semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chessboard_vision_tpu.ops.enhance import bilateral_planar
from chessboard_vision_tpu.ops.pallas import bilateral as pb


def test_band_picker():
    assert pb._pick_band(720) == 120
    assert pb._pick_band(620) == 124
    assert 32 <= pb._pick_band(1080) <= 128
    assert pb._pick_band(719) is None  # prime -> XLA fallback


def test_best_falls_back_on_cpu(rng):
    x = jnp.asarray(rng.integers(0, 256, (3, 64, 128), np.uint8))
    out = pb.bilateral_planar_best(x)  # CPU -> XLA path
    ref = bilateral_planar(x)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel needs TPU")
def test_pallas_matches_xla_on_tpu(rng):
    x = jnp.asarray(rng.integers(0, 256, (3, 720, 1280), np.uint8))
    a = np.asarray(pb.bilateral_planar_pallas(x)).astype(int)
    b = np.asarray(bilateral_planar(x)).astype(int)
    d = np.abs(a - b)
    assert d.max() <= 1
    assert (d > 0).mean() < 1e-4
