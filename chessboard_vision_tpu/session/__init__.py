"""Session layer: noise FSM, game orchestration, Lichess wiring."""

from chessboard_vision_tpu.session.noise import NoiseHandler, NoiseState
from chessboard_vision_tpu.session.game_session import GameSession
from chessboard_vision_tpu.session.lichess_session import LichessSession

__all__ = ["NoiseHandler", "NoiseState", "GameSession", "LichessSession"]
