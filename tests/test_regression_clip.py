"""Regression clip: deterministic synthetic game clip with golden outputs.

BASELINE.md's parity clause is "FEN parity on regression clips". This test
renders a fixed-seed 38-frame clip (two moves, a hand occlusion, recovery
with session-style forced rescans), runs it through the fused pipeline,
and checks the per-frame occupancy-FEN sequence against
tests/golden_clip.json. --regen additionally asserts per-frame parity with
the cv2-oracle path before writing. Any future kernel change that shifts a
decision on this clip fails loudly here.

Regenerate goldens (only after verifying oracle parity still holds):
    python tests/test_regression_clip.py --regen
"""

import json
import os
import sys

# allow running directly: python tests/test_regression_clip.py --regen
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from chessboard_vision_tpu import geometry as geo
from chessboard_vision_tpu.models.pipeline import VisionPipeline, occupancy_to_set
from chessboard_vision_tpu.rules import occupancy_to_fen

from fixtures import make_board_frame, initial_occupancy, DEFAULT_CORNERS

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_clip.json")
SEED = 20260816


def clip_frames():
    rng = np.random.default_rng(SEED)
    occ0 = initial_occupancy()
    occ1 = occ0.copy()
    occ1[4, 1] = False
    occ1[4, 3] = True  # e2e4
    occ2 = occ1.copy()
    occ2[4, 6] = False
    occ2[4, 4] = True  # e7e5
    frames = [make_board_frame(occ0, rng) for _ in range(6)]
    frames += [make_board_frame(occ1, rng) for _ in range(10)]
    hand = make_board_frame(occ1, rng)
    hand[230:540, 420:820] = (115, 108, 102)
    frames += [hand, hand.copy()]
    frames += [make_board_frame(occ2, rng) for _ in range(10)]
    frames += [make_board_frame(occ2, rng) for _ in range(10)]
    ref_frame = make_board_frame(occ0, np.random.default_rng(SEED + 1))
    return ref_frame, frames


ALL_SQUARES = {(f, r) for f in range(8) for r in range(8)}


def _s2c(i):
    """Session-style forced rescans after the hand frames (indices 16-17)."""
    return ALL_SQUARES if i >= 18 else None


def run_pipeline(collect_occ=False):
    g = geo.BoardGeometry.from_calibration(DEFAULT_CORNERS)
    pipe = VisionPipeline(g, hough_backend="exact")
    state = pipe.init_state()
    ref_frame, frames = clip_frames()
    state = pipe.capture_reference(state, ref_frame)
    fens = []
    occs = []
    for i, fr in enumerate(frames):
        state, out = pipe.step(state, fr, squares_to_check=_s2c(i))
        occ = occupancy_to_set(out.occupancy)
        occs.append(occ)
        mask = np.zeros((8, 8), bool)
        for f, r in occ:
            mask[f, r] = True
        fens.append(occupancy_to_fen(mask).split()[0])
    return (fens, occs) if collect_occ else fens


def run_oracle():
    import cv2

    from chessboard_vision_tpu.geometry import reorder, split_board_dict
    from chessboard_vision_tpu.reference import PieceDetectorCV

    pts = reorder(DEFAULT_CORNERS)
    bs = 620
    M = cv2.getPerspectiveTransform(
        np.float32(pts).reshape(4, 2),
        np.float32([[0, 0], [bs, 0], [0, bs], [bs, bs]]),
    )
    det = PieceDetectorCV()
    ref_frame, frames = clip_frames()
    det.update_references(split_board_dict(cv2.warpPerspective(ref_frame, M, (bs, bs))))
    occs = []
    for i, fr in enumerate(frames):
        squares = split_board_dict(cv2.warpPerspective(fr, M, (bs, bs)))
        results, _ = det.detect_all_pieces(squares, use_delta=True, squares_to_check=_s2c(i))
        occs.append({pos for pos, info in results.items() if info["has_piece"]})
    return occs


def test_clip_matches_golden():
    with open(GOLDEN) as fh:
        golden = json.load(fh)
    fens = run_pipeline()
    assert len(fens) == len(golden["fens"])
    for i, (got, want) in enumerate(zip(fens, golden["fens"])):
        assert got == want, f"frame {i}: {got} != golden {want}"


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        fens, occs = run_pipeline(collect_occ=True)
        oracle_occs = run_oracle()
        for i, (a, b) in enumerate(zip(occs, oracle_occs)):
            assert a == b, f"frame {i}: pipeline/oracle occupancy mismatch"
        print("oracle parity: OK on all frames")
        with open(GOLDEN, "w") as fh:
            json.dump({"seed": SEED, "fens": fens}, fh, indent=1)
        print(f"wrote {GOLDEN} with {len(fens)} frames")
