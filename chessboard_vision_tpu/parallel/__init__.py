"""Parallel layer: multi-stream batching and device-mesh sharding."""

from chessboard_vision_tpu.parallel.mesh import make_mesh, stream_sharding
from chessboard_vision_tpu.parallel.multistream import MultiStreamPipeline

__all__ = ["make_mesh", "stream_sharding", "MultiStreamPipeline"]
