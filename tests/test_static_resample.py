"""Static-resample (gather-free warp) parity: bit-identical to the XLA
gather path and to the composed warp+extract+gray preprocess."""

import numpy as np
import jax.numpy as jnp

from chessboard_vision_tpu import geometry as geo
from chessboard_vision_tpu.ops import static_resample as sr
from chessboard_vision_tpu.ops import warp as W
from chessboard_vision_tpu.ops.color import bgr2gray
from chessboard_vision_tpu.ops.filters import gaussian_blur_valid
from chessboard_vision_tpu.models.pipeline import VisionPipeline

CORNERS = np.array([[173, 133], [1100, 110], [150, 650], [1131, 680]])


def test_resample_matches_warp_bilinear(rng):
    frame = rng.integers(0, 256, (720, 1280, 3), np.uint8)
    g = geo.BoardGeometry.from_calibration(CORNERS)
    dg = W.DeviceGeometry.from_host(g)

    # reference: gather path (warp board then extract padded squares)
    board = np.asarray(W.frame_to_board(jnp.asarray(frame), dg))
    ref = np.asarray(W.extract_squares(jnp.asarray(board), dg))  # (64,Hp,Wp,3)

    qx, qy = g.square_query_coords()
    plan = sr.ResamplePlan.build(qx, qy, g.src_h, g.src_w)
    planar = jnp.asarray(sr.to_planar(frame))
    b, gg, r = sr.resample_bgr(planar, plan, g.src_w)
    got = np.stack(
        [np.asarray(b), np.asarray(gg), np.asarray(r)], axis=-1
    ).reshape(ref.shape)
    assert np.array_equal(got, ref)


def test_pipeline_planar_matches_hwc(rng):
    """The planar fast path (gray-first matmul resample) matches the exact
    HWC path up to per-channel u8 rounding order: <=1 level, rare."""
    frame = rng.integers(0, 256, (720, 1280, 3), np.uint8)
    g = geo.BoardGeometry.from_calibration(CORNERS)
    pipe = VisionPipeline(g)
    gray_hwc = np.asarray(
        pipe._preprocess_j(jnp.asarray(frame), pipe._consts)
    ).astype(int)
    gray_planar = np.asarray(
        pipe._preprocess_j(jnp.asarray(sr.to_planar(frame)), pipe._consts)
    ).astype(int)
    d = np.abs(gray_hwc - gray_planar)
    assert d.max() <= 1
    assert (d > 0).mean() < 0.12  # pre-blur rounding ties, smoothed by blur


def test_resample_flipped_geometry(rng):
    frame = rng.integers(0, 256, (720, 1280, 3), np.uint8)
    g = geo.BoardGeometry.from_calibration(CORNERS, orientation_flipped=True)
    dg = W.DeviceGeometry.from_host(g)
    board = np.asarray(W.frame_to_board(jnp.asarray(frame), dg))
    ref = np.asarray(W.extract_squares(jnp.asarray(board), dg))
    qx, qy = g.square_query_coords()
    plan = sr.ResamplePlan.build(qx, qy, g.src_h, g.src_w)
    b, gg, r = sr.resample_bgr(jnp.asarray(sr.to_planar(frame)), plan, g.src_w)
    got = np.stack([np.asarray(b), np.asarray(gg), np.asarray(r)], -1).reshape(ref.shape)
    assert np.array_equal(got, ref)
