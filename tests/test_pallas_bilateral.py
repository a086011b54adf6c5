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
    # bands must be 8-divisible (Mosaic output-block sublane constraint)
    assert pb._pick_band(720, 32, 128) == 120
    assert pb._pick_band(620, 32, 128) is None  # no 8-divisible divisor
    assert pb._pick_band(719, 32, 128) is None  # prime

    # the band cap shrinks with width (scoped-VMEM budget) but stays >= 8
    for w in (77, 620, 1280, 1920, 4096):
        cap = pb._band_cap(w)
        assert cap % 8 == 0 and 8 <= cap <= 128

    # the pad picker always succeeds: hp >= h, hp % band == 0
    for h, w in ((620, 620), (719, 1280), (77, 77), (33, 620), (1080, 1920)):
        hp, band = pb._pick_pad_band(h, w)
        assert hp >= h and hp % band == 0 and band % 8 == 0 and 8 <= band <= 128
        assert band <= pb._band_cap(w)
    # no pad when h already has a fitting band
    assert pb._pick_pad_band(720, 1280)[0] == 720


def test_best_falls_back_on_cpu(rng):
    x = jnp.asarray(rng.integers(0, 256, (3, 64, 128), np.uint8))
    out = pb.bilateral_planar_best(x)  # CPU -> XLA path
    ref = bilateral_planar(x)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_enhancer_seam_selects_xla_on_cpu(rng):
    """models/enhancer.bilateral: the production seam (auto = XLA off-TPU)."""
    from chessboard_vision_tpu.models.enhancer import bilateral

    x = jnp.asarray(rng.integers(0, 256, (3, 64, 128), np.uint8))
    assert np.array_equal(np.asarray(bilateral(x, "auto")), np.asarray(bilateral(x, "xla")))
    with pytest.raises(ValueError):
        bilateral(x, "cuda")


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="Mosaic kernel needs TPU")
@pytest.mark.parametrize("shape", [(3, 720, 1280), (3, 620, 620), (3, 77, 77)])
def test_pallas_matches_xla_on_tpu(rng, shape):
    # 620 exercises the pad-to-624 path; 77 the tiny-pad path.
    x = jnp.asarray(rng.integers(0, 256, shape, np.uint8))
    a = np.asarray(pb.bilateral_planar_pallas(x)).astype(int)
    b = np.asarray(bilateral_planar(x)).astype(int)
    d = np.abs(a - b)
    assert d.max() <= 1
    assert (d > 0).mean() < 1e-4


def test_ablate_gate_variants_trace():
    """The measurement-only _ablate gates (tools/ablate_enhanced.py /
    PERF.md round-5 floor table) must keep the kernel traceable with
    unchanged output shape/dtype; eval_shape exercises every gated trace
    path without a TPU."""
    img = jnp.zeros((3, 980, 980), jnp.uint8)
    for m in ("", "noexp", "cdonly", "shifts"):
        s = jax.eval_shape(
            lambda y, m=m: pb.bilateral_planar_pallas(y, 9, 75.0, 75.0, _ablate=m),
            img,
        )
        assert (s.shape, s.dtype) == ((3, 980, 980), jnp.uint8)
