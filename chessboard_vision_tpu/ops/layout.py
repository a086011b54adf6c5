"""Square-layout helpers shared across models/pipeline layers.

The 64-square axis is indexed rank-major: flat = rank * 8 + file, with
a1 = (file 0, rank 0) — the convention every device kernel, mask, and
output in this package uses.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

SquareTuple = Tuple[int, int]


def positions_to_mask(positions: Iterable[SquareTuple]) -> np.ndarray:
    """(file, rank) tuples -> (64,) bool mask (out-of-board tuples dropped)."""
    m = np.zeros(64, bool)
    for f, r in positions:
        if 0 <= f < 8 and 0 <= r < 8:
            m[r * 8 + f] = True
    return m
