"""Synthetic board/square fixtures for parity tests.

make_square: one 77x77 chess-square-like image (optionally with a circular
piece, noise, off-center placement). make_board_frame: a full 1280x720
camera-like frame containing a perspective-projected board rendered from an
occupancy grid — lets the vision path be driven end-to-end without a camera.
"""

from __future__ import annotations

import cv2
import numpy as np

DEFAULT_CORNERS = np.array([[260, 80], [1020, 95], [240, 640], [1035, 655]])


def make_square(rng, radius=None, contrast=80, noise=8, off=(0, 0), size=77, base=120, blur=True):
    img = np.full((size, size), float(base))
    if radius:
        yy, xx = np.mgrid[:size, :size]
        m = (yy - size // 2 - off[1]) ** 2 + (xx - size // 2 - off[0]) ** 2 <= radius**2
        img[m] += contrast
    img += rng.normal(0, noise, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    if blur:
        img = cv2.GaussianBlur(img, (5, 5), 0)
    return img


def render_board_image(
    occupancy,
    rng=None,
    board_px=800,
    light=(181, 217, 240),
    dark=(99, 136, 181),
    white_piece=(235, 235, 245),
    black_piece=(40, 36, 30),
    noise=3.0,
    piece_colors=None,
):
    """Top-down BGR board image from an (8, 8) [file, rank] occupancy grid.

    Pieces are filled circles (the physical pieces the reference detects are
    round-based; README and piece_detector.py:1-10). Rank 8 is the top row.
    """
    occ = np.asarray(occupancy, dtype=bool).reshape(8, 8)
    sq = board_px // 8
    img = np.zeros((board_px, board_px, 3), np.float64)
    for row in range(8):  # row 0 = rank 8
        for col in range(8):
            color = light if (row + col) % 2 == 0 else dark
            img[row * sq : (row + 1) * sq, col * sq : (col + 1) * sq] = color
    for f in range(8):
        for r in range(8):
            if occ[f, r]:
                row, col = 7 - r, f
                cx = col * sq + sq // 2
                cy = row * sq + sq // 2
                if piece_colors is not None and piece_colors[f, r] is not None:
                    pc = piece_colors[f, r]
                else:
                    pc = white_piece if r <= 3 else black_piece
                cv2.circle(img, (cx, cy), int(sq * 0.36), pc, -1)
                cv2.circle(img, (cx, cy), int(sq * 0.36), (20, 20, 20), 2)
    if rng is not None and noise > 0:
        img = img + rng.normal(0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_board_frame(
    occupancy,
    rng=None,
    corners=DEFAULT_CORNERS,
    frame_size=(720, 1280),
    bg=60,
    **render_kw,
):
    """Project a rendered board into a 1280x720 'camera' frame at ``corners``.

    corners order: TL, TR, BL, BR (same convention as calibration clicks).
    """
    board = render_board_image(occupancy, rng=rng, **render_kw)
    bp = board.shape[0]
    src = np.float32([[0, 0], [bp, 0], [0, bp], [bp, bp]])
    dst = np.float32(np.asarray(corners, np.float64))
    M = cv2.getPerspectiveTransform(src, dst)
    frame = np.full((*frame_size, 3), bg, np.uint8)
    warped = cv2.warpPerspective(board, M, (frame_size[1], frame_size[0]))
    mask = (
        cv2.warpPerspective(np.full((bp, bp), 255, np.uint8), M, (frame_size[1], frame_size[0]))
        > 127
    )
    frame[mask] = warped[mask]
    if rng is not None:
        frame = np.clip(
            frame.astype(np.float64) + rng.normal(0, 2.0, frame.shape), 0, 255
        ).astype(np.uint8)
    return frame


def initial_occupancy():
    occ = np.zeros((8, 8), bool)
    occ[:, :2] = True
    occ[:, 6:] = True
    return occ


def render_board_image_hard(
    occupancy,
    rng,
    board_px=800,
    t=0.0,
    light=(150, 190, 215),
    dark=(70, 105, 150),
    white_piece=(228, 230, 238),
    black_piece=(48, 44, 38),
    piece_colors=None,
):
    """A 'hard' board render: photographic-texture stand-in for recorded
    footage (no camera in this environment). Adds the failure modes VERDICT
    item 8 asks the decision boundary to be calibrated against:

    - wood-grain square texture (two sine fields per square, random phase)
    - radially shaded pieces with per-frame center jitter (+-3 px) and
      radius jitter spanning 30-36% of the square (near the 20%/55% Hough
      band interior but off the clean fixture's fixed 36%)
    - a directional shadow ramp and a drifting specular glare blob,
      parameterized by ``t`` so clips can move light across frames
    - heavier sensor noise (sigma 4)
    """
    occ = np.asarray(occupancy, dtype=bool).reshape(8, 8)
    sq = board_px // 8
    yy, xx = np.mgrid[:board_px, :board_px]
    img = np.zeros((board_px, board_px, 3), np.float64)

    gy, gx = np.mgrid[:sq, :sq]
    for row in range(8):
        for col in range(8):
            base = np.array(light if (row + col) % 2 == 0 else dark, float)
            phase = rng.uniform(0, 2 * np.pi) if rng is not None else 1.0
            grain = 6.0 * np.sin(gx / 3.5 + phase) + 4.0 * np.sin(
                (gx + 2 * gy) / 9.0 + 1.7 * phase
            )
            img[row * sq : (row + 1) * sq, col * sq : (col + 1) * sq] = (
                base[None, None, :] + grain[..., None]
            )

    for f in range(8):
        for r in range(8):
            if not occ[f, r]:
                continue
            row, col = 7 - r, f
            if rng is not None:
                jx, jy = int(rng.integers(-3, 4)), int(rng.integers(-3, 4))
                rad = int(sq * (0.30 + 0.06 * rng.random()))
            else:
                jx = jy = 0
                rad = int(sq * 0.33)
            cx = col * sq + sq // 2 + jx
            cy = row * sq + sq // 2 + jy
            if piece_colors is not None and piece_colors[f, r] is not None:
                pc = piece_colors[f, r]
            else:
                pc = white_piece if r <= 3 else black_piece
            d2 = (xx - cx) ** 2 + (yy - cy) ** 2
            m = d2 <= rad * rad
            shade = 1.0 - 0.25 * np.sqrt(np.clip(d2, 0, rad * rad)) / max(rad, 1)
            img[m] = np.asarray(pc, float) * shade[m][:, None]
            cv2.circle(img, (cx, cy), rad, (25, 25, 25), 2, lineType=cv2.LINE_AA)

    ang = 0.4 + 0.2 * t
    ramp = 0.78 + 0.22 * (
        (xx * np.cos(ang) + yy * np.sin(ang)) / (board_px * 1.5) + 0.5
    )
    img *= np.clip(ramp, 0.0, 1.05)[..., None]
    gx0 = board_px * (0.30 + 0.25 * np.sin(t))
    gy0 = board_px * (0.35 + 0.20 * np.cos(0.7 * t))
    sigma = board_px / 7.0
    glare = 55.0 * np.exp(-((xx - gx0) ** 2 + (yy - gy0) ** 2) / (2 * sigma * sigma))
    img += glare[..., None]
    if rng is not None:
        img += rng.normal(0, 4.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_hard_board_frame(
    occupancy, rng, corners=DEFAULT_CORNERS, frame_size=(720, 1280), bg=60, t=0.0, **kw
):
    """make_board_frame with the hard renderer (see render_board_image_hard)."""
    board = render_board_image_hard(occupancy, rng, t=t, **kw)
    bp = board.shape[0]
    src = np.float32([[0, 0], [bp, 0], [0, bp], [bp, bp]])
    dst = np.float32(np.asarray(corners, np.float64))
    M = cv2.getPerspectiveTransform(src, dst)
    frame = np.full((*frame_size, 3), bg, np.uint8)
    warped = cv2.warpPerspective(board, M, (frame_size[1], frame_size[0]))
    mask = (
        cv2.warpPerspective(np.full((bp, bp), 255, np.uint8), M, (frame_size[1], frame_size[0]))
        > 127
    )
    frame[mask] = warped[mask]
    if rng is not None:
        frame = np.clip(
            frame.astype(np.float64) + rng.normal(0, 2.0, frame.shape), 0, 255
        ).astype(np.uint8)
    return frame
