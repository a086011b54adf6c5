"""Device-side noise FSM — the NoiseHandler as pure array ops.

For batched multi-stream operation the per-stream hand-occlusion state
machine (session/noise.py, reference noise_handler.py) runs on device:
state is a small pytree of scalars/masks per stream, the transition
function is branchless selects, and ``vmap`` runs N streams at once.
Semantics match NoiseHandler exactly (same thresholds and transitions);
tests drive both against random change sequences.

Modes: 0 = IDLE, 1 = NOISE_ACTIVE, 2 = MOVE_PENDING.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

MODE_IDLE, MODE_NOISE, MODE_PENDING = 0, 1, 2

NOISE_THRESHOLD = 3
STABILITY_FRAMES = 12
COOLDOWN_FRAMES = 5


class NoiseFsmState(NamedTuple):
    mode: jnp.ndarray  # () i32
    pending: jnp.ndarray  # (64,) bool
    stable_count: jnp.ndarray  # () i32
    cooldown: jnp.ndarray  # () i32
    lifted: jnp.ndarray  # () i32 square index or -1


class NoiseFsmOut(NamedTuple):
    mode: jnp.ndarray  # () i32 (post-transition)
    stable: jnp.ndarray  # () bool — stable_ready / move_ready fired
    move_ready: jnp.ndarray  # () bool — pending squares cleared + stable
    squares: jnp.ndarray  # (64,) bool — pending squares at fire time
    lifted: jnp.ndarray  # () i32
    blocked: jnp.ndarray  # () bool — mode == NOISE_ACTIVE


def init_state() -> NoiseFsmState:
    return NoiseFsmState(
        mode=jnp.int32(MODE_IDLE),
        pending=jnp.zeros(64, bool),
        stable_count=jnp.int32(0),
        cooldown=jnp.int32(0),
        lifted=jnp.int32(-1),
    )


def _first_set_index(mask):
    idx = jnp.argmax(mask.astype(jnp.int32))
    return jnp.where(jnp.any(mask), idx.astype(jnp.int32), jnp.int32(-1))


def noise_step(state: NoiseFsmState, changed: jnp.ndarray):
    """One FSM transition. changed: (64,) bool. Returns (state, out)."""
    n = jnp.sum(changed).astype(jnp.int32)
    mode = state.mode
    same_as_pending = jnp.all(changed == state.pending)
    lifted_new = _first_set_index(changed)

    # --- IDLE transitions
    idle_to_noise = (mode == MODE_IDLE) & (n > NOISE_THRESHOLD)
    idle_to_pending = (mode == MODE_IDLE) & (n > 0) & (n <= NOISE_THRESHOLD)

    # --- NOISE transitions
    in_noise = mode == MODE_NOISE
    noise_zero = in_noise & (n == 0)
    noise_low = in_noise & (n > 0) & (n <= NOISE_THRESHOLD)
    noise_high = in_noise & (n > NOISE_THRESHOLD)
    cooldown_after = jnp.where(
        noise_zero | noise_low, state.cooldown + 1, jnp.where(noise_high, 0, state.cooldown)
    )
    noise_to_idle = noise_zero & (cooldown_after >= COOLDOWN_FRAMES)
    noise_to_pending = noise_low & (cooldown_after >= COOLDOWN_FRAMES)

    # --- PENDING transitions
    in_pending = mode == MODE_PENDING
    pend_to_noise = in_pending & (n > NOISE_THRESHOLD)
    pend_zero = in_pending & (n == 0)
    pend_same = in_pending & (n > 0) & (n <= NOISE_THRESHOLD) & same_as_pending
    pend_update = in_pending & (n > 0) & (n <= NOISE_THRESHOLD) & ~same_as_pending

    stable_after = jnp.where(
        pend_zero | pend_same,
        state.stable_count + 1,
        jnp.where(idle_to_pending | noise_to_pending | pend_update, 1, state.stable_count),
    )
    move_ready = pend_zero & (stable_after >= STABILITY_FRAMES)
    stable_ready = pend_same & (stable_after >= STABILITY_FRAMES)
    fired = move_ready | stable_ready

    # --- next mode
    next_mode = jnp.where(
        idle_to_noise | noise_high | pend_to_noise,
        MODE_NOISE,
        jnp.where(
            idle_to_pending | noise_to_pending | pend_same | pend_update | (pend_zero & ~move_ready),
            MODE_PENDING,
            jnp.where(
                noise_to_idle | move_ready,
                MODE_IDLE,
                jnp.where(noise_zero | noise_low, MODE_NOISE, mode),
            ),
        ),
    ).astype(jnp.int32)

    enter_pending = idle_to_pending | noise_to_pending | pend_update
    next_pending = jnp.where(
        enter_pending[..., None] if enter_pending.ndim else enter_pending,
        changed,
        jnp.where(move_ready, jnp.zeros_like(changed), state.pending),
    )
    out_squares = jnp.where(move_ready | stable_ready, state.pending, next_pending)
    # move_ready reports the pre-reset pending set
    out_squares = jnp.where(move_ready, state.pending, out_squares)

    # noise_to_pending refreshes the lifted square for the NEW pending
    # cycle, matching the host FSM (session/noise.py _noise: a stale
    # lifted from a previous cycle must not leak into counting payloads).
    enter_or_update = idle_to_pending | noise_to_pending | pend_update
    next_lifted = jnp.where(
        enter_or_update & (n == 1),
        lifted_new,
        jnp.where(
            enter_or_update & (n != 1),
            -1,
            jnp.where(move_ready, -1, state.lifted),
        ),
    ).astype(jnp.int32)

    next_stable = jnp.where(
        move_ready | idle_to_noise | pend_to_noise, 0, stable_after
    ).astype(jnp.int32)
    next_cooldown = jnp.where(
        noise_to_idle | noise_to_pending | move_ready | idle_to_noise | pend_to_noise,
        0,
        jnp.where(in_noise, cooldown_after, state.cooldown),
    ).astype(jnp.int32)

    new_state = NoiseFsmState(
        mode=next_mode,
        pending=next_pending,
        stable_count=next_stable,
        cooldown=next_cooldown,
        lifted=next_lifted,
    )
    out = NoiseFsmOut(
        mode=next_mode,
        stable=fired,
        move_ready=move_ready,
        squares=out_squares,
        lifted=next_lifted,
        blocked=next_mode == MODE_NOISE,
    )
    return new_state, out
