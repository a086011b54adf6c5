"""MultiStreamSession e2e: 4 independent games on one batched pipeline,
each playing a different move, all detected and committed."""

import numpy as np
import pytest

from chessboard_vision_tpu import geometry as geo
from chessboard_vision_tpu.parallel.session import MultiStreamSession
from chessboard_vision_tpu.ops.static_resample import to_planar

from fixtures import make_board_frame, initial_occupancy, DEFAULT_CORNERS

MOVES = {
    0: ("e2e4", (4, 1), (4, 3)),
    1: ("d2d4", (3, 1), (3, 3)),
    2: ("g1f3", (6, 0), (5, 2)),
    3: ("c2c4", (2, 1), (2, 3)),
}


@pytest.mark.slow
def test_four_streams_detect_different_moves(rng):
    g = geo.BoardGeometry.from_calibration(DEFAULT_CORNERS)
    n = 4
    sess = MultiStreamSession(g, n_streams=n)
    sess.MOVE_COOLDOWN = 0.0

    occ0 = initial_occupancy()

    def planar_frames(occs):
        return np.stack([to_planar(make_board_frame(o, rng)) for o in occs])

    sess.capture_reference(planar_frames([occ0] * n))

    # settle on the initial position
    for _ in range(3):
        moves = sess.on_frames(planar_frames([occ0] * n))
        assert all(m is None for m in moves)

    occs = []
    for i in range(n):
        o = occ0.copy()
        _, src, dst = MOVES[i]
        o[src] = False
        o[dst] = True
        occs.append(o)

    committed = [None] * n
    for _ in range(40):
        moves = sess.on_frames(planar_frames(occs))
        for i, m in enumerate(moves):
            if m is not None:
                assert committed[i] is None, f"stream {i} double-committed"
                committed[i] = m
        if all(committed):
            break
    for i in range(n):
        assert committed[i] is not None, f"stream {i} never committed"
        assert committed[i].uci() == MOVES[i][0]
        assert sess.streams[i].game.board.peek().uci() == MOVES[i][0]
