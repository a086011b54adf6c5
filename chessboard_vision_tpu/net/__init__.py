"""Network layer: Lichess Board API client."""

from chessboard_vision_tpu.net.lichess_client import LichessClient

__all__ = ["LichessClient"]
