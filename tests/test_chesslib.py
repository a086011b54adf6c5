"""Correctness tests for the in-framework chess rules engine.

Perft node counts are the gold standard for move-generator correctness;
positions and counts are the standard public vectors (startpos, Kiwipete,
en-passant/promotion-heavy positions).
"""

import pytest

from chessboard_vision_tpu.rules import chesslib as chess
from chessboard_vision_tpu.rules.chesslib import Board, Move, perft


class TestBasics:
    def test_startpos_fen_roundtrip(self):
        b = Board()
        assert b.fen() == chess.STARTING_FEN
        b2 = Board(b.fen())
        assert b2.fen() == b.fen()

    def test_square_mapping(self):
        assert chess.square(0, 0) == 0  # a1
        assert chess.square(7, 7) == 63  # h8
        assert chess.square_name(chess.square(4, 1)) == "e2"
        assert chess.parse_square("e4") == chess.square(4, 3)

    def test_move_uci_roundtrip(self):
        m = Move.from_uci("e2e4")
        assert m.uci() == "e2e4"
        p = Move.from_uci("e7e8q")
        assert p.promotion == chess.QUEEN

    def test_push_pop(self):
        b = Board()
        b.push_uci("e2e4")
        b.push_uci("e7e5")
        assert b.fullmove_number == 2
        b.pop()
        b.pop()
        assert b.fen() == chess.STARTING_FEN

    def test_illegal_uci_raises(self):
        b = Board()
        with pytest.raises(ValueError):
            b.push_uci("e2e5")

    def test_piece_at_and_symbols(self):
        b = Board()
        p = b.piece_at(chess.parse_square("e1"))
        assert p.piece_type == chess.KING and p.color == chess.WHITE
        assert p.symbol() == "K"
        assert b.piece_at(chess.parse_square("e4")) is None

    def test_is_capture_and_en_passant(self):
        b = Board()
        b.push_uci("e2e4")
        b.push_uci("d7d5")
        m = Move.from_uci("e4d5")
        assert b.is_capture(m)
        # En passant setup
        b = Board("rnbqkbnr/ppp1pppp/8/8/3pP3/8/PPPP1PPP/RNBQKBNR b KQkq e3 0 2")
        ep = Move.from_uci("d4e3")
        assert b.is_en_passant(ep)
        assert b.is_capture(ep)

    def test_castling_flags_in_fen(self):
        b = Board()
        for uci in ["e2e4", "e7e5", "g1f3", "b8c6", "f1c4", "g8f6", "e1g1"]:
            b.push_uci(uci)
        assert "K" not in b.fen().split()[2]
        assert b.piece_at(chess.parse_square("g1")).piece_type == chess.KING
        assert b.piece_at(chess.parse_square("f1")).piece_type == chess.ROOK

    def test_promotion_auto_queen_shape(self):
        b = Board("8/P7/8/8/8/8/7k/K7 w - - 0 1")
        moves = {m.uci() for m in b.legal_moves}
        assert "a7a8q" in moves and "a7a8n" in moves
        b.push_uci("a7a8q")
        assert b.piece_at(chess.parse_square("a8")).piece_type == chess.QUEEN

    def test_check_detection(self):
        b = Board("rnb1kbnr/pppp1ppp/8/4p3/6Pq/5P2/PPPPP2P/RNBQKBNR w KQkq - 1 3")
        assert b.is_check()
        # Only legal replies block/avoid check.
        for m in b.legal_moves:
            b.push(m)
            b.pop()


PERFT_VECTORS = [
    # (fen, depth, nodes) — standard public perft positions
    (chess.STARTING_FEN, 1, 20),
    (chess.STARTING_FEN, 2, 400),
    (chess.STARTING_FEN, 3, 8902),
    (chess.STARTING_FEN, 4, 197281),
    # Kiwipete
    ("r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1", 1, 48),
    ("r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1", 2, 2039),
    ("r3k2r/p1ppqpb1/bn2pnp1/3PN3/1p2P3/2N2Q1p/PPPBBPPP/R3K2R w KQkq - 0 1", 3, 97862),
    # Position 3 (en passant / pins)
    ("8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1", 1, 14),
    ("8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1", 2, 191),
    ("8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1", 3, 2812),
    ("8/2p5/3p4/KP5r/1R3p1k/8/4P1P1/8 w - - 0 1", 4, 43238),
    # Position 4 (promotions / castling)
    ("r3k2r/Pppp1ppp/1b3nbN/nP6/BBP1P3/q4N2/Pp1P2PP/R2Q1RK1 w kq - 0 1", 1, 6),
    ("r3k2r/Pppp1ppp/1b3nbN/nP6/BBP1P3/q4N2/Pp1P2PP/R2Q1RK1 w kq - 0 1", 2, 264),
    ("r3k2r/Pppp1ppp/1b3nbN/nP6/BBP1P3/q4N2/Pp1P2PP/R2Q1RK1 w kq - 0 1", 3, 9467),
    # Position 5
    ("rnbq1k1r/pp1Pbppp/2p5/8/2B5/8/PPP1NnPP/RNBQK2R w KQ - 1 8", 1, 44),
    ("rnbq1k1r/pp1Pbppp/2p5/8/2B5/8/PPP1NnPP/RNBQK2R w KQ - 1 8", 2, 1486),
    ("rnbq1k1r/pp1Pbppp/2p5/8/2B5/8/PPP1NnPP/RNBQK2R w KQ - 1 8", 3, 62379),
]


@pytest.mark.parametrize("fen,depth,expected", PERFT_VECTORS)
def test_perft(fen, depth, expected):
    assert perft(Board(fen), depth) == expected
