"""Otsu thresholding matching cv2.threshold(THRESH_BINARY + THRESH_OTSU).

Used by the reference's prepare_analysis stage (frame_enhancer.py:148-159).
OpenCV scans thresholds t=0..255 maximizing between-class variance and keeps
the FIRST maximum (strict '>' comparison) — reproduced here exactly; the
binary image is (x > t) * 255.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def otsu_threshold(x: jnp.ndarray) -> jnp.ndarray:
    """Return the Otsu threshold (float32 scalar) of a u8 image."""
    # one-hot compare+reduce histogram (TPU serializes scatter-adds)
    flat = x.reshape(-1).astype(jnp.int32)
    bins = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    hist = jnp.sum((flat[:, None] == bins).astype(jnp.float32), axis=0)
    levels = jnp.arange(256, dtype=jnp.float32)
    n = jnp.sum(hist)
    q1 = jnp.cumsum(hist)  # counts <= t
    s1 = jnp.cumsum(hist * levels)
    total = s1[-1]
    q2 = n - q1
    m1 = s1 / jnp.maximum(q1, 1e-38)
    m2 = (total - s1) / jnp.maximum(q2, 1e-38)
    var = q1 * q2 * (m1 - m2) ** 2
    var = jnp.where((q1 == 0) | (q2 == 0), -1.0, var)
    # argmax returns the first maximum, matching OpenCV's '>' scan.
    return jnp.argmax(var).astype(jnp.float32)


def otsu_binarize(x: jnp.ndarray):
    """(threshold, binary) like cv2.threshold(x, 0, 255, BINARY+OTSU)."""
    t = otsu_threshold(x)
    binary = (x.astype(jnp.float32) > t).astype(jnp.uint8) * jnp.uint8(255)
    return t, binary
