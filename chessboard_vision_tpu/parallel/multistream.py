"""Batched N-stream pipeline with mesh sharding.

The BASELINE north-star's batched configuration: N camera streams processed
as one vmapped device program per frame-tick, with the stream axis sharded
over the device mesh ("data") so streams scale across chips over ICI with
zero cross-stream communication. The per-stream noise FSM runs on device
(ops/fsm.py) so the whole tick — warp, detect, change-detect, FSM — is one
XLA call; hosts only see per-stream occupancy + FSM events.

All streams share one calibration geometry (the batched deployment is N
identical rigs; per-rig calibration means per-stream gather maps, which
vmap also supports — pass stacked geometries).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from chessboard_vision_tpu.geometry import BoardGeometry
from chessboard_vision_tpu.models.pipeline import VisionPipeline, PipelineState, StepOutputs
from chessboard_vision_tpu.ops import fsm as fsm_ops
from chessboard_vision_tpu.parallel import mesh as mesh_lib


class MultiStreamState(NamedTuple):
    pipe: PipelineState  # leaves with leading (N,) stream axis
    noise: fsm_ops.NoiseFsmState  # leaves with leading (N,) stream axis


class MultiStreamOutputs(NamedTuple):
    step: StepOutputs  # leaves (N, ...)
    noise: fsm_ops.NoiseFsmOut  # leaves (N, ...)


class MultiStreamPipeline:
    """N-stream batched pipeline over one (optionally sharded) mesh."""

    def __init__(
        self,
        geometry: BoardGeometry,
        n_streams: int,
        mesh=None,
        piece_settings: Optional[dict] = None,
        with_change_detector: bool = True,
    ):
        self.n_streams = n_streams
        self.mesh = mesh
        self.pipe = VisionPipeline(
            geometry,
            piece_settings=piece_settings,
            with_change_detector=with_change_detector,
            donate_state=False,  # donation handled on the batched jit below
        )

        def one_stream(state: MultiStreamState, frame, s2c_mask, s2c_given, refresh, consts):
            pipe_state, out = self.pipe._step_impl(
                state.pipe, frame, s2c_mask, s2c_given, refresh, consts
            )
            noise_state, noise_out = fsm_ops.noise_step(state.noise, out.visual_changes)
            return MultiStreamState(pipe_state, noise_state), MultiStreamOutputs(out, noise_out)

        # Device constants enter as (replicated) arguments, not closure
        # literals — see models/pipeline.StepConsts.
        batched = jax.vmap(one_stream, in_axes=(0, 0, 0, 0, 0, None))
        self._step = jax.jit(batched, donate_argnums=(0,))

        def chunk(state, frames, s2c_mask, s2c_given, refresh, consts):
            # lax.scan over T ticks of the vmapped step: one dispatch + one
            # small D2H per T x N frames (the same per-dispatch overhead
            # amortization as VisionPipeline.step_many, applied to the
            # batched configuration).
            def body(st, xs):
                fr, m, g, r = xs
                st, out = batched(st, fr, m, g, r, consts)
                return st, out

            return jax.lax.scan(body, state, (frames, s2c_mask, s2c_given, refresh))

        self._step_chunk = jax.jit(chunk, donate_argnums=(0,))
        self._capture = jax.jit(
            jax.vmap(
                lambda st, fr, c: self.pipe._capture_impl(st, fr, c),
                in_axes=(0, 0, None),
            )
        )

    def init_state(self) -> MultiStreamState:
        def stack(leaf):
            return jnp.broadcast_to(leaf, (self.n_streams,) + leaf.shape)

        pipe0 = self.pipe.init_state()
        state = MultiStreamState(
            pipe=jax.tree.map(stack, pipe0),
            noise=jax.tree.map(stack, fsm_ops.init_state()),
        )
        if self.mesh is not None:
            if "space" in self.mesh.axis_names and self.mesh.shape["space"] > 1:
                # 2-D placement: streams over "data", the 64-square axis
                # over "space" (spatial/model parallelism — XLA inserts the
                # all-gathers the per-stream FSM reduction needs over ICI).
                state = mesh_lib.shard_pytree_stream_square(state, self.mesh)
            else:
                state = mesh_lib.shard_pytree_leading_axis(state, self.mesh)
        return state

    def capture_reference(self, state: MultiStreamState, frames) -> MultiStreamState:
        frames = jnp.asarray(frames)
        pipe = self._capture(state.pipe, self._place(frames), self.pipe._consts)
        return MultiStreamState(pipe=pipe, noise=state.noise)

    def _place(self, arr):
        if self.mesh is not None:
            return jax.device_put(
                arr, mesh_lib.stream_sharding(self.mesh, axis="data")
            )
        return arr

    def step(
        self,
        state: MultiStreamState,
        frames,
        s2c_masks=None,
        refresh=None,
    ):
        """One tick for all N streams. frames: (N, H, W, 3) u8."""
        n = self.n_streams
        frames = self._place(jnp.asarray(frames))
        if s2c_masks is None:
            s2c_mask = jnp.zeros((n, 64), bool)
            s2c_given = jnp.zeros((n,), bool)
        else:
            s2c_mask = jnp.asarray(s2c_masks)
            s2c_given = jnp.ones((n,), bool)
        if refresh is None:
            refresh = jnp.zeros((n,), bool)
        else:
            refresh = jnp.asarray(refresh)
        return self._step(state, frames, s2c_mask, s2c_given, refresh, self.pipe._consts)

    def step_chunk(self, state: MultiStreamState, frames):
        """T ticks for all N streams in ONE device dispatch.

        frames: (T, N, 3, H, W) planar u8 (or (T, N, H, W, 3) HWC host
        array). Outputs have leading (T, N) axes. Tick semantics are
        scan-exact vs T sequential step() calls."""
        frames = jnp.asarray(frames)
        t, n = frames.shape[0], self.n_streams
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            frames = jax.device_put(
                frames, NamedSharding(self.mesh, P(None, "data"))
            )
        masks = jnp.zeros((t, n, 64), bool)
        givens = jnp.zeros((t, n), bool)
        refreshes = jnp.zeros((t, n), bool)
        return self._step_chunk(
            state, frames, masks, givens, refreshes, self.pipe._consts
        )
