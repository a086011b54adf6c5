"""Piece-TYPE classification from per-square vision features -> full FEN.

Beyond the reference's scope: its fen_generator.py:5-10 defines the
'white-pawn'..'black-king' label -> FEN char mapping and a labeled-
detection API that waits for a piece classifier which was never built
(SURVEY.md: fen_generator orphan). This module is that classifier.

Physical chess pieces differ by base diameter — the reference's own
calibrator exports measured radii of 23-35 px at 77 px squares
(/root/reference/piece_stats.txt:5-20) — and the fused device step
already measures every square's detected circle radius
(StepOutputs.radius, from the Hough detector) at zero extra cost. A
nearest-centroid model over (radius / square_size) calibrated on ONE
known position (the initial setup — every game passes through it, and
GameSession.capture_reference happens exactly there) then reads piece
types straight off the board, upgrading colored FEN (light/dark) to a
full FEN placement.

Caveats by design: radius resolves types only as far as the physical set
separates base diameters (knight/bishop bases are close in many sets);
squares the cascade resolved without a circle (center_diff/symmetry
methods report radius 0) fall back to game-state tracking. Classification
never overrides the rules engine — it exists for initial-board
verification and desync recovery (board_verifiers' sketched capability).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from chessboard_vision_tpu.rules import chesslib as chess

# chesslib piece types are 1..6 (PAWN..KING); PIECE_SYMBOLS maps to chars.
TYPE_CHARS = "pnbrqk"


def average_radii(radii) -> np.ndarray:
    """Per-square mean of positive radius observations.

    radii: (F, 64) stacked StepOutputs.radius over F frames (or (64,)).
    The circle detector's per-frame radius estimate jitters by a few px
    under sensor noise (adjacent Hough radius bins trade votes); piece
    base diameters are ~3-4 px apart, so both calibration and readout
    should average a handful of frames — the session's stability gate
    (20 stable frames before any commit) provides exactly that window
    for free. Squares with no positive observation return 0.
    """
    arr = np.atleast_2d(np.asarray(radii, np.float64))
    pos = arr > 0
    n = pos.sum(axis=0)
    s = np.where(pos, arr, 0.0).sum(axis=0)
    return np.where(n > 0, s / np.maximum(n, 1), 0.0).reshape(-1)


class PieceTypeClassifier:
    """Nearest-centroid piece-type model over detected circle radii.

    Features are per-(color, type): pieces of the same type share a base
    diameter; white and black sets are calibrated separately (some sets
    differ slightly, and it is free — the initial position shows all 12
    classes)."""

    def __init__(self):
        # (color int, piece_type int) -> mean radius (px)
        self.centroids: Dict[Tuple[int, int], float] = {}
        # Per-square readout bias (px): the circle detector reads the same
        # piece 2-3 px differently depending on the square's CONTEXT
        # (crowded neighbors bleed edge votes; background texture shifts
        # the peak). The bias is a property of the square/rig, not the
        # piece, so it is learned from labeled samples and subtracted
        # before centroid matching.
        self.square_bias = np.zeros(64)

    @staticmethod
    def _labeled_means(radius, board) -> Dict[Tuple[int, int], float]:
        rad = np.asarray(radius).reshape(64)
        samples: Dict[Tuple[int, int], list] = {}
        for sq in range(64):
            piece = board.piece_at(sq)
            if piece is None or rad[sq] <= 0:
                continue
            key = (int(piece.color), piece.piece_type)
            samples.setdefault(key, []).append(float(rad[sq]))
        return {k: float(np.mean(v)) for k, v in samples.items()}

    def calibrate(self, radius, board: "chess.Board") -> Dict:
        """Fit centroids from a frame of a KNOWN position.

        radius: StepOutputs.radius, (64,) px in chess-square order
        (sq = rank*8 + file); board: the rules Board matching the frame.
        Squares whose cascade did not resolve a circle (radius <= 0)
        contribute nothing. Returns the centroid dict (empty -> no
        circles resolved; classify() then returns all-unknown).
        """
        self.centroids = self._labeled_means(radius, board)
        return self.centroids

    def update(self, radius, board: "chess.Board", blend: float = 0.5) -> Dict:
        """Blend new labeled samples into centroids + per-square biases.

        Between committed moves the position is always known, so every
        stable window provides labeled samples for free. Centroids are
        updated from bias-corrected readings; each occupied square's bias
        then tracks its residual (reading - class centroid). Classes not
        seen before are adopted outright; existing ones move by ``blend``
        toward the new mean.
        """
        rad = np.asarray(radius).reshape(64)
        corrected = np.where(rad > 0, rad - self.square_bias, 0.0)
        for k, v in self._labeled_means(corrected, board).items():
            if k in self.centroids:
                self.centroids[k] = (1.0 - blend) * self.centroids[k] + blend * v
            else:
                self.centroids[k] = v
        for sq in range(64):
            piece = board.piece_at(sq)
            if piece is None or rad[sq] <= 0:
                continue
            key = (int(piece.color), piece.piece_type)
            if key in self.centroids:
                resid = float(rad[sq]) - self.centroids[key]
                self.square_bias[sq] = (
                    (1.0 - blend) * self.square_bias[sq] + blend * resid
                )
        return self.centroids

    def classify(self, radius, occupancy, piece_colors) -> np.ndarray:
        """Per-square FEN chars from radii + the light/dark classifier.

        radius/occupancy: StepOutputs arrays (64,); piece_colors: (64,)
        int8 from rules.classify_piece_colors (1 light / 0 dark / -1
        empty). Returns a (64,) object array of FEN chars ('' for empty,
        '?' for occupied squares the model cannot type: no circle
        resolved, unknown color, or no centroids for that color).
        """
        rad = np.asarray(radius).reshape(64)
        occ = np.asarray(occupancy, bool).reshape(64)
        col = np.asarray(piece_colors).reshape(64)
        out = np.full(64, "", dtype=object)
        for sq in range(64):
            if not occ[sq]:
                continue
            if rad[sq] <= 0 or col[sq] < 0:
                out[sq] = "?"
                continue
            color = int(col[sq])
            cands = {t: c for (c0, t), c in self.centroids.items() if c0 == color}
            if not cands:
                out[sq] = "?"
                continue
            reading = float(rad[sq]) - self.square_bias[sq]
            t_best = min(cands, key=lambda t: abs(cands[t] - reading))
            ch = chess.PIECE_SYMBOLS[t_best]
            out[sq] = ch.upper() if color == 1 else ch
        return out


def occupancy_to_full_fen(
    occupancy,
    type_chars,
    current_turn: str = "w",
    unknown_light: str = "P",
    unknown_dark: str = "p",
    piece_colors=None,
) -> str:
    """FEN placement from occupancy + per-square type chars.

    type_chars: (64,) chars from PieceTypeClassifier.classify. '?' squares
    degrade to the colored-FEN placeholder (pawn char by color) so the
    output is always a valid placement string.
    """
    from chessboard_vision_tpu.rules.fen import generate_fen

    occ = np.asarray(occupancy, dtype=bool).reshape(8, 8)
    chars = np.asarray(type_chars).reshape(64)
    colors = (
        np.asarray(piece_colors).reshape(64) if piece_colors is not None else None
    )
    board_map = {}
    for f in range(8):
        for r in range(8):
            if not occ[f, r]:
                continue
            ch = chars[r * 8 + f]
            if ch in ("", "?"):
                dark = colors is not None and colors[r * 8 + f] == 0
                ch = unknown_dark if dark else unknown_light
            board_map[(f, 7 - r)] = {"fen": str(ch), "conf": 1.0, "class": "type"}
    return generate_fen(board_map, current_turn)
