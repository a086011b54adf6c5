"""FEN generation from labeled detections or occupancy grids.

Equivalent of the reference's standalone FEN API (fen_generator.py): maps
pixel-space detections onto the 8x8 grid with confidence-based conflict
resolution and serializes a FEN placement string. Adds
``occupancy_to_fen`` used by the TPU pipeline's frame->FEN path.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple

import numpy as np

COLUMNS = "abcdefgh"
ROWS = "12345678"

PIECE_TO_FEN = {
    "white-pawn": "P", "white-knight": "N", "white-bishop": "B",
    "white-rook": "R", "white-queen": "Q", "white-king": "K",
    "black-pawn": "p", "black-knight": "n", "black-bishop": "b",
    "black-rook": "r", "black-queen": "q", "black-king": "k",
}


def get_chess_square(x: int, y: int, board_size: int) -> Tuple[str, Tuple[int, int]]:
    """Pixel (x, y) in the warped image -> (square name, (grid_x, grid_y)).

    grid_y counts from the top (0 = rank 8), as in reference
    fen_generator.py:12-30.
    """
    square_size = board_size // 8
    grid_x = x // square_size
    grid_y = y // square_size
    if not (0 <= grid_x < 8 and 0 <= grid_y < 8):
        return "out_of_bounds", (-1, -1)
    return f"{COLUMNS[grid_x]}{ROWS[7 - grid_y]}", (grid_x, grid_y)


def map_detections_to_board(detections: Iterable[dict], board_size: int) -> Dict:
    """Map labeled detections to grid cells, keeping highest confidence on conflict."""
    board_map: Dict[Tuple[int, int], dict] = {}
    for det in detections:
        cx, cy = det["center"]
        _, (gx, gy) = get_chess_square(cx, cy, board_size)
        if gx == -1:
            continue
        entry = {
            "fen": PIECE_TO_FEN.get(det["class"], "?"),
            "conf": det["conf"],
            "class": det["class"],
        }
        if (gx, gy) not in board_map or det["conf"] > board_map[(gx, gy)]["conf"]:
            board_map[(gx, gy)] = entry
    return board_map


def generate_fen(board_map: Dict, current_turn: str = "w") -> str:
    """Serialize a {(grid_x, grid_y): {'fen': char}} map into a FEN string.

    Castling/en-passant fields are stubbed ``- -`` as in the reference
    (fen_generator.py:86-89).
    """
    board = [["" for _ in range(8)] for _ in range(8)]
    for (gx, gy), data in board_map.items():
        board[gy][gx] = data["fen"]

    fen_rows = []
    for row in board:
        empty = 0
        row_fen = ""
        for cell in row:
            if cell == "":
                empty += 1
            else:
                if empty:
                    row_fen += str(empty)
                    empty = 0
                row_fen += cell
        if empty:
            row_fen += str(empty)
        fen_rows.append(row_fen)
    return f"{'/'.join(fen_rows)} {current_turn} - - 0 1"


def occupancy_to_fen(occupancy, current_turn: str = "w", piece_char: str = "P") -> str:
    """FEN placement from a bare occupancy grid (no piece-type classifier).

    ``occupancy`` is an (8, 8) boolean array indexed [file, rank] (a1 =
    [0, 0]) or any array-like reshapeable to that. Occupied squares are
    rendered as ``piece_char``; this gives the frame->FEN path a canonical,
    comparable serialization even without a piece-type model (the reference
    has none either — occupancy is its only vision signal).
    """
    occ = np.asarray(occupancy, dtype=bool).reshape(8, 8)
    board_map = {}
    for f in range(8):
        for r in range(8):
            if occ[f, r]:
                # grid_y counts from top: rank r -> row (7 - r)
                board_map[(f, 7 - r)] = {"fen": piece_char, "conf": 1.0, "class": "occ"}
    return generate_fen(board_map, current_turn)
