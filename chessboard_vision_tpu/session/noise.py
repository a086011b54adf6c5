"""Noise-handling state machine (hand occlusion / move stabilization).

Behavioral equivalent of reference noise_handler.py: a 3-state FSM over the
per-frame set of visually-changed squares. IDLE -> (>3 changes) ->
NOISE_ACTIVE -> (5 clean frames) -> IDLE; IDLE -> (1..3 changes) ->
MOVE_PENDING -> (12 stable frames) -> move_ready/stable_ready. Tracks the
'lifted' square when exactly one change is pending.

This host-side class is the session's FSM; a vectorized device version for
batched multi-stream pipelines lives in parallel/multistream.py.
"""

from __future__ import annotations

from enum import Enum, auto


class NoiseState(Enum):
    IDLE = auto()
    NOISE_ACTIVE = auto()
    MOVE_PENDING = auto()


class NoiseHandler:
    NOISE_THRESHOLD = 3
    STABILITY_FRAMES = 12
    COOLDOWN_FRAMES = 5

    def __init__(self):
        self.state = NoiseState.IDLE
        self.pending_squares: set = set()
        self.stable_count = 0
        self.cooldown_count = 0
        self.last_lifted_square = None

    def process(self, changed_squares: set) -> tuple:
        n = len(changed_squares)
        if self.state == NoiseState.IDLE:
            return self._idle(changed_squares, n)
        if self.state == NoiseState.NOISE_ACTIVE:
            return self._noise(changed_squares, n)
        if self.state == NoiseState.MOVE_PENDING:
            return self._pending(changed_squares, n)
        return (self.state, {})

    def _idle(self, changed, n):
        if n == 0:
            return (NoiseState.IDLE, {"message": "waiting"})
        if n > self.NOISE_THRESHOLD:
            self.state = NoiseState.NOISE_ACTIVE
            self.cooldown_count = 0
            return (NoiseState.NOISE_ACTIVE, {"message": "hand_detected", "changed_count": n})
        self.state = NoiseState.MOVE_PENDING
        self.pending_squares = set(changed)
        self.stable_count = 1
        self.last_lifted_square = next(iter(changed)) if n == 1 else None
        return (
            NoiseState.MOVE_PENDING,
            {
                "message": "detecting",
                "squares": self.pending_squares,
                "lifted": self.last_lifted_square,
                "stable": False,
                "progress": self.stable_count / self.STABILITY_FRAMES,
            },
        )

    def _noise(self, changed, n):
        if n == 0:
            self.cooldown_count += 1
            if self.cooldown_count >= self.COOLDOWN_FRAMES:
                self.state = NoiseState.IDLE
                self.cooldown_count = 0
                return (NoiseState.IDLE, {"message": "noise_cleared"})
            return (
                NoiseState.NOISE_ACTIVE,
                {
                    "message": "clearing",
                    "cooldown": self.cooldown_count,
                    "progress": self.cooldown_count / self.COOLDOWN_FRAMES,
                },
            )
        if n <= self.NOISE_THRESHOLD:
            self.cooldown_count += 1
            if self.cooldown_count >= self.COOLDOWN_FRAMES:
                self.state = NoiseState.MOVE_PENDING
                self.pending_squares = set(changed)
                self.stable_count = 1
                # refresh the lifted square for THIS pending cycle (a
                # stale one from a previous cycle would otherwise leak
                # into the counting payloads)
                self.last_lifted_square = next(iter(changed)) if n == 1 else None
                return (
                    NoiseState.MOVE_PENDING,
                    {"message": "detecting", "squares": self.pending_squares, "stable": False},
                )
            return (NoiseState.NOISE_ACTIVE, {"message": "stabilizing", "changed_count": n})
        self.cooldown_count = 0
        return (NoiseState.NOISE_ACTIVE, {"message": "hand_active", "changed_count": n})

    def _pending(self, changed, n):
        if n > self.NOISE_THRESHOLD:
            self.state = NoiseState.NOISE_ACTIVE
            self.pending_squares = set()
            self.stable_count = 0
            self.cooldown_count = 0
            return (
                NoiseState.NOISE_ACTIVE,
                {"message": "interrupted_by_hand", "changed_count": n},
            )
        if n == 0:
            self.stable_count += 1
            if self.stable_count >= self.STABILITY_FRAMES:
                squares = set(self.pending_squares)
                self._reset()
                return (
                    NoiseState.IDLE,
                    {"message": "move_ready", "squares": squares, "stable": True},
                )
            return (
                NoiseState.MOVE_PENDING,
                {
                    "message": "stabilizing",
                    "squares": self.pending_squares,
                    "stable": False,
                    "progress": self.stable_count / self.STABILITY_FRAMES,
                },
            )
        if changed == self.pending_squares:
            self.stable_count += 1
            if self.stable_count >= self.STABILITY_FRAMES:
                return (
                    NoiseState.MOVE_PENDING,
                    {
                        "message": "stable_ready",
                        "squares": set(self.pending_squares),
                        "stable": True,
                        "progress": 1.0,
                    },
                )
            return (
                NoiseState.MOVE_PENDING,
                {
                    "message": "counting",
                    "squares": self.pending_squares,
                    "lifted": self.last_lifted_square if len(self.pending_squares) == 1 else None,
                    "stable": False,
                    "progress": self.stable_count / self.STABILITY_FRAMES,
                },
            )
        self.pending_squares = set(changed)
        self.stable_count = 1
        self.last_lifted_square = next(iter(changed)) if n == 1 else None
        return (
            NoiseState.MOVE_PENDING,
            {
                "message": "updated",
                "squares": self.pending_squares,
                "lifted": self.last_lifted_square,
                "stable": False,
                "progress": self.stable_count / self.STABILITY_FRAMES,
            },
        )

    def _reset(self):
        self.state = NoiseState.IDLE
        self.pending_squares = set()
        self.stable_count = 0
        self.cooldown_count = 0
        self.last_lifted_square = None

    def reset(self):
        self._reset()

    def is_blocked(self) -> bool:
        return self.state == NoiseState.NOISE_ACTIVE

    def get_state_name(self) -> str:
        return {
            NoiseState.IDLE: "IDLE",
            NoiseState.NOISE_ACTIVE: "NOISE",
            NoiseState.MOVE_PENDING: "PENDING",
        }.get(self.state, "UNKNOWN")
