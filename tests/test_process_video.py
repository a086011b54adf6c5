"""Recorded-video processing tool (tools/process_video.py).

Builds a real video file (MJPG avi) from fixture frames — a scripted
e2e4 — and runs the tool's pipeline over it: reference capture from the
leading frames, SKIP_FRAMES cadence, move commit, JSONL timeline.
"""

import json

import numpy as np
import pytest

from chessboard_vision_tpu.tools.process_video import parse_corners, run
from chessboard_vision_tpu.rules import chess

from fixtures import DEFAULT_CORNERS, make_board_frame


def _occ(board):
    occ = np.zeros((8, 8), bool)
    for sq in chess.SQUARES:
        if board.piece_at(sq) is not None:
            occ[chess.square_file(sq), chess.square_rank(sq)] = True
    return occ


def test_parse_corners():
    assert parse_corners("1,2 3,4 5,6 7,8") == [[1, 2], [3, 4], [5, 6], [7, 8]]
    with pytest.raises(ValueError):
        parse_corners("1,2 3,4")


@pytest.mark.slow
def test_video_to_moves(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(11)

    board = chess.Board()
    frames = [make_board_frame(_occ(board), rng) for _ in range(4)]
    board.push_uci("e2e4")
    # skip_frames=2 halves the frames the session sees; stability needs
    # ~20 processed frames -> 56 raw frames of the new position.
    frames += [make_board_frame(_occ(board), rng) for _ in range(56)]

    path = str(tmp_path / "clip.avi")
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 30, (w, h))
    assert vw.isOpened()
    for f in frames:
        vw.write(f)
    vw.release()

    config = {
        "corners": [list(map(int, c)) for c in np.asarray(DEFAULT_CORNERS)],
        "player_color": "white",
        "orientation_flipped": False,
        "grid_lines_x": None,
        "grid_lines_y": None,
    }
    out = str(tmp_path / "timeline.jsonl")
    moves, fen, n = run(path, config, skip_frames=2, out_path=out)
    assert moves == ["e2e4"]
    assert fen == board.fen()
    assert n >= 25

    lines = [json.loads(l) for l in open(out)]
    assert lines[0]["move"] == "e2e4"
    assert lines[-1]["final_fen"] == fen
