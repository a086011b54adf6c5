"""Piece-TYPE classification (rules/piece_types.py): radius-centroid model
calibrated on the initial position, upgrading colored FEN to full FEN.

The reference's fen_generator waits for exactly this classifier
(fen_generator.py:5-10; SURVEY.md orphan) — these tests drive it end to
end through the vision pipeline on renders with per-type base radii
(fixtures.PIECE_RADIUS_FRAC, modeled on reference piece_stats.txt).
"""

import numpy as np
import pytest

from chessboard_vision_tpu import geometry as geo
from chessboard_vision_tpu.models.pipeline import VisionPipeline
from chessboard_vision_tpu.rules import chess, classify_piece_colors
from chessboard_vision_tpu.rules.piece_types import (
    PieceTypeClassifier,
    average_radii,
    occupancy_to_full_fen,
)

from fixtures import DEFAULT_CORNERS, board_render_maps, make_board_frame

MIDGAME_FEN = "r1bqkbnr/pppp1ppp/2n5/4p3/4P3/5N2/PPPP1PPP/RNBQKB1R w KQkq - 4 3"


def test_calibrate_and_classify_synthetic():
    board = chess.Board()
    radius = np.zeros(64)
    base = {1: 18, 2: 21, 3: 24, 4: 26, 5: 29, 6: 32}  # PAWN..KING px
    for sq in range(64):
        p = board.piece_at(sq)
        if p is not None:
            radius[sq] = base[p.piece_type] + (0.5 if p.color else -0.5)
    clf = PieceTypeClassifier()
    cents = clf.calibrate(radius, board)
    assert len(cents) == 12  # all (color, type) classes seen

    # Same radii, occupancy/colors from the board -> exact round trip.
    occ = np.zeros(64, bool)
    colors = np.full(64, -1, np.int8)
    for sq in range(64):
        p = board.piece_at(sq)
        if p is not None:
            occ[sq] = True
            colors[sq] = 1 if p.color else 0
    chars = clf.classify(radius, occ, colors)
    for sq in range(64):
        p = board.piece_at(sq)
        assert chars[sq] == (p.symbol() if p else "")


def test_unresolved_square_degrades_to_placeholder():
    clf = PieceTypeClassifier()
    clf.centroids = {(1, 1): 18.0}
    occ = np.zeros(64, bool)
    occ[0] = occ[1] = True
    colors = np.zeros(64, np.int8)
    colors[0] = 1
    colors[1] = 0  # dark: no centroids for color 0 -> '?'
    radius = np.zeros(64)
    radius[0] = 18
    chars = clf.classify(radius, occ, colors)
    assert chars[0] == "P" and chars[1] == "?"
    mask = np.zeros((8, 8), bool)
    mask[0, 0] = mask[1, 0] = True
    fen = occupancy_to_full_fen(mask, chars, piece_colors=colors)
    assert fen.split()[0].endswith("/Pp6")  # '?' degraded by color


@pytest.mark.slow
def test_full_fen_through_vision(rng):
    """Initial-position calibration -> mid-game full-FEN readout, entirely
    through the fused pipeline (radius + occupancy + color outputs)."""
    g = geo.BoardGeometry.from_calibration(DEFAULT_CORNERS)
    pipe = VisionPipeline(g)
    all_squares = {(f, r) for f in range(8) for r in range(8)}

    AVG_FRAMES = 4  # radius jitters a few px/frame; average like the
    # session's 20-frame stability window does (see piece_types.average_radii)

    def stepped_radii(state, occ_m, col_m, rad_m):
        rads = []
        out = None
        for _ in range(AVG_FRAMES):
            # use_delta=False: full re-detect — the delta cache would hold
            # stale radii for visually-unchanged squares.
            state, out = pipe.step(
                state,
                make_board_frame(occ_m, rng, piece_colors=col_m, piece_radii=rad_m),
                squares_to_check=all_squares, use_delta=False,
            )
            rads.append(np.asarray(out.radius))
        return state, average_radii(np.stack(rads)), out

    start = chess.Board()
    occ0, col0, rad0 = board_render_maps(start)
    f0 = make_board_frame(occ0, rng, piece_colors=col0, piece_radii=rad0)
    state = pipe.capture_reference(pipe.init_state(), f0)
    state, radii0, _ = stepped_radii(state, occ0, col0, rad0)
    clf = PieceTypeClassifier()
    cents = clf.calibrate(radii0, start)
    assert len(cents) == 12, f"only {len(cents)} classes resolved: {cents}"

    target = chess.Board(MIDGAME_FEN)
    occ1, col1, rad1 = board_render_maps(target)
    frame1 = make_board_frame(occ1, rng, piece_colors=col1, piece_radii=rad1)
    # fresh reference on the new position so every circle re-resolves
    state = pipe.capture_reference(state, frame1)
    state, radii1, out1 = stepped_radii(state, occ1, col1, rad1)
    occ = np.asarray(out1.occupancy)
    colors = classify_piece_colors(
        np.asarray(out1.center_mean), occ, np.asarray(out1.corner_mean)
    )
    chars = clf.classify(radii1, occ, colors)
    mask = occ.reshape(8, 8).T
    got = occupancy_to_full_fen(mask, chars, piece_colors=colors).split()[0]
    want = target.fen().split()[0]
    assert got == want, f"\ngot  {got}\nwant {want}\nchars={chars.reshape(8, 8)}"


@pytest.mark.slow
def test_session_full_fen_and_verify(rng):
    """Live-session surface: calibrate_piece_types at the start position,
    commit a move from vision, then full_fen()/verify_position() agree
    with the rules board at piece-type granularity."""
    from chessboard_vision_tpu.session.game_session import GameSession

    s = GameSession(headless=True)
    s.MOVE_COOLDOWN = 0.0
    assert s.on_calibration_requested(None, config={
        "corners": DEFAULT_CORNERS.tolist(),
        "player_color": "white",
        "orientation_flipped": False,
        "grid_lines_x": None,
        "grid_lines_y": None,
    })
    start = chess.Board()
    occ0, col0, rad0 = board_render_maps(start)

    def frame(board_maps):
        o, c, r = board_maps
        return make_board_frame(o, rng, piece_colors=c, piece_radii=r)

    s.capture_reference_frame(frame((occ0, col0, rad0)))
    for _ in range(6):
        s.on_frame(frame((occ0, col0, rad0)))
    cents = s.calibrate_piece_types()
    assert cents is not None and len(cents) == 12

    after = chess.Board()
    after.push_uci("e2e4")
    maps1 = board_render_maps(after)
    committed = None
    for _ in range(40):
        committed = s.on_frame(frame(maps1))
        if committed:
            break
    assert committed is not None and committed.uci() == "e2e4"

    # refill the radius window on the new position; a full window also
    # auto-refreshes the centroids with rules-labeled samples (the radius
    # readout's neighborhood bias: crowded home squares read smaller than
    # isolated mid-board placements)
    for _ in range(s._radius_window.maxlen + 2):
        s.on_frame(frame(maps1))
    match, got, want = s.verify_position()
    assert match is True, f"\ngot  {got}\nwant {want}"
    assert want == after.fen().split()[0]


@pytest.mark.slow
def test_promotion_full_fen_sees_queen_on_e8(rng):
    """The queen-for-pawn radius swap through vision (VERDICT r3 item 6):
    after e7e8q commits from frames, full_fen()/verify_position() must
    read a QUEEN on e8 off the detected circle radius — a piece-TYPE
    change at constant occupancy is exactly what occupancy-FEN clips
    cannot see. The start position carries a white queen elsewhere so
    the radius model has a queen centroid to match."""
    from chessboard_vision_tpu.session.game_session import GameSession

    fen0 = "k7/4P3/8/8/8/8/1Q6/4K3 w - - 0 1"
    s = GameSession(headless=True)
    s.MOVE_COOLDOWN = 0.0
    assert s.on_calibration_requested(None, config={
        "corners": DEFAULT_CORNERS.tolist(),
        "player_color": "white",
        "orientation_flipped": False,
        "grid_lines_x": None,
        "grid_lines_y": None,
    })
    s.game.set_fen(fen0)
    start = chess.Board(fen0)
    maps0 = board_render_maps(start)

    def frame(maps):
        o, c, r = maps
        return make_board_frame(o, rng, piece_colors=c, piece_radii=r)

    s.capture_reference_frame(frame(maps0))
    for _ in range(6):
        s.on_frame(frame(maps0))
    cents = s.calibrate_piece_types()
    assert cents is not None and (1, chess.QUEEN) in cents

    after = chess.Board(fen0)
    after.push_uci("e7e8q")
    maps1 = board_render_maps(after)
    committed = None
    for _ in range(40):
        committed = s.on_frame(frame(maps1))
        if committed:
            break
    assert committed is not None and committed.uci() == "e7e8q"

    for _ in range(s._radius_window.maxlen + 2):
        s.on_frame(frame(maps1))
    match, got, want = s.verify_position()
    assert want == after.fen().split()[0]
    assert match is True, f"\ngot  {got}\nwant {want}"
    # e8 (rank 8, file e) reads as 'Q' through the vision radius — not a
    # pawn placeholder and not the pre-promotion 'P'.
    assert got.split("/")[0] == "k3Q3", got
