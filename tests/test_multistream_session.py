"""MultiStreamSession e2e: 4 independent games on one batched pipeline,
each playing a different move, all detected and committed; plus the
shared-inference castling fix (round-2 verdict weak #1)."""

import numpy as np
import pytest

from chessboard_vision_tpu import geometry as geo
from chessboard_vision_tpu.parallel.session import MultiStreamSession, _StreamState
from chessboard_vision_tpu.ops.static_resample import to_planar

from fixtures import make_board_frame, initial_occupancy, DEFAULT_CORNERS

CASTLE_READY_FEN = "r1bqkbnr/pppp1ppp/2n5/4p3/4P3/5N1B/PPPPQPPP/RNB1K2R w KQkq - 0 1"


def occ_grid(game):
    """(8, 8) [file, rank] occupancy grid from a GameState."""
    occ = np.zeros((8, 8), bool)
    for f, r in game.get_board_occupancy():
        occ[f, r] = True
    return occ


def test_multistream_infer_move_resolves_castling():
    """MultiStreamSession uses the shared castling-first inference: a
    2v/2a castling diff must resolve to O-O, not be dropped as ambiguous
    (which the reference's pair matching always does —
    /root/reference/game_session.py:227-265)."""
    sess = MultiStreamSession.__new__(MultiStreamSession)
    from chessboard_vision_tpu.utils.logging import get_logger

    sess.log = get_logger("test-msession")
    st = _StreamState()
    st.game.set_fen(CASTLE_READY_FEN)
    move = sess._infer_move(st, {(4, 0), (7, 0)}, {(6, 0), (5, 0)}, set())
    assert move is not None and move.uci() == "e1g1"

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


@pytest.mark.slow
def test_stream_castles_while_other_moves(rng):
    """Vision path: stream 0 castles kingside while stream 1 plays a
    normal pawn push; both must commit (the forked inference in round 2
    silently dropped stream-0's castle)."""
    g = geo.BoardGeometry.from_calibration(DEFAULT_CORNERS)
    sess = MultiStreamSession(g, n_streams=2)
    sess.MOVE_COOLDOWN = 0.0
    sess.streams[0].game.set_fen(CASTLE_READY_FEN)

    start_occs = [occ_grid(st.game) for st in sess.streams]

    def planar_frames(occs):
        return np.stack([to_planar(make_board_frame(o, rng)) for o in occs])

    sess.capture_reference(planar_frames(start_occs))
    for _ in range(3):
        moves = sess.on_frames(planar_frames(start_occs))
        assert all(m is None for m in moves)

    # stream 0: e1g1 (king e1->g1, rook h1->f1); stream 1: e2e4
    after0 = start_occs[0].copy()
    after0[(4, 0)] = False
    after0[(7, 0)] = False
    after0[(6, 0)] = True
    after0[(5, 0)] = True
    after1 = start_occs[1].copy()
    after1[(4, 1)] = False
    after1[(4, 3)] = True
    occs = [after0, after1]

    committed = [None, None]
    for _ in range(40):
        moves = sess.on_frames(planar_frames(occs))
        for i, m in enumerate(moves):
            if m is not None:
                assert committed[i] is None, f"stream {i} double-committed"
                committed[i] = m
        if all(committed):
            break
    assert committed[0] is not None and committed[0].uci() == "e1g1"
    assert committed[1] is not None and committed[1].uci() == "e2e4"
    assert sess.streams[0].game.board.peek().uci() == "e1g1"
