"""Recorded-video processing tool (tools/process_video.py).

Builds a real video file (MJPG avi) from fixture frames — a scripted
e2e4 — and runs the tool's pipeline over it: reference capture from the
leading frames, SKIP_FRAMES cadence, move commit, JSONL timeline.

Also drives the COMMITTED MJPG file tests/data/game_clip.avi (a scripted
two-move game on the hard 'photographic' renderer with a textured-hand
interlude) against its pinned timeline — real recorded-video bytes in the
repo, not frames synthesized at test time. Regenerate with:
    python tests/test_process_video.py --regen
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pytest

from chessboard_vision_tpu.tools.process_video import parse_corners, run
from chessboard_vision_tpu.rules import chess

from fixtures import (
    DEFAULT_CORNERS,
    add_hand_sprite,
    make_board_frame,
    make_hard_board_frame,
)

HERE = os.path.dirname(os.path.abspath(__file__))
GAME_CLIP = os.path.join(HERE, "data", "game_clip.avi")
GAME_TIMELINE = os.path.join(HERE, "data", "game_clip_timeline.json")


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


def _game_clip_frames():
    """Deterministic scripted 2-move game (e2e4, e7e5) on the hard
    renderer, with a textured-hand reach between the moves."""
    rng = np.random.default_rng(21)
    board = chess.Board()
    frames = [make_hard_board_frame(_occ(board), rng, t=0.3) for _ in range(4)]
    board.push_uci("e2e4")
    frames += [make_hard_board_frame(_occ(board), rng, t=0.3) for _ in range(28)]
    hand = add_hand_sprite(make_hard_board_frame(_occ(board), rng, t=0.3), rng)
    frames += [hand, hand.copy()]
    board.push_uci("e7e5")
    frames += [make_hard_board_frame(_occ(board), rng, t=0.3) for _ in range(28)]
    return frames, board


def _clip_config():
    return {
        "corners": [list(map(int, c)) for c in np.asarray(DEFAULT_CORNERS)],
        "player_color": "white",
        "orientation_flipped": False,
        "grid_lines_x": None,
        "grid_lines_y": None,
    }


def _decoded_clip_hash(path):
    import cv2

    cap = cv2.VideoCapture(path)
    h = hashlib.sha256()
    while True:
        ok, img = cap.read()
        if not ok:
            break
        h.update(img.tobytes())
    cap.release()
    return h.hexdigest()


@pytest.mark.slow
def test_committed_game_clip_matches_pinned_timeline():
    """The committed MJPG file plays frame-to-FEN to the pinned timeline
    (BASELINE's 'recorded game footage' clause on actual video bytes)."""
    if not os.path.exists(GAME_CLIP):
        pytest.skip("committed clip missing (regen: python tests/test_process_video.py --regen)")
    with open(GAME_TIMELINE) as fh:
        pinned = json.load(fh)
    if _decoded_clip_hash(GAME_CLIP) != pinned["decoded_sha256"]:
        # A different OpenCV/libjpeg build decodes different pixels; a
        # mismatch would say nothing about this code (same policy as the
        # 'video' regression clip).
        pytest.skip("MJPG decodes differently from the pinning environment")
    out_moves, fen, n = run(GAME_CLIP, _clip_config(), skip_frames=1)
    assert out_moves == pinned["moves"]
    assert fen == pinned["final_fen"]
    assert n == pinned["frames_processed"]


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import cv2

        os.makedirs(os.path.dirname(GAME_CLIP), exist_ok=True)
        frames, board = _game_clip_frames()
        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(GAME_CLIP, cv2.VideoWriter_fourcc(*"MJPG"), 30, (w, h))
        assert vw.isOpened()
        try:
            vw.set(cv2.VIDEOWRITER_PROP_QUALITY, 85)
        except AttributeError:
            pass
        for f in frames:
            vw.write(f)
        vw.release()
        size_mb = os.path.getsize(GAME_CLIP) / 1e6
        print(f"wrote {GAME_CLIP} ({len(frames)} frames, {size_mb:.1f} MB)")

        out_moves, fen, n = run(GAME_CLIP, _clip_config(), skip_frames=1)
        expected_final = board.fen()
        assert out_moves == ["e2e4", "e7e5"], out_moves
        assert fen == expected_final, (fen, expected_final)
        payload = {
            "moves": out_moves,
            "final_fen": fen,
            "frames_processed": n,
            "decoded_sha256": _decoded_clip_hash(GAME_CLIP),
        }
        with open(GAME_TIMELINE, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"pinned timeline -> {GAME_TIMELINE}: {payload['moves']} {fen}")
