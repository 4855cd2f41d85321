"""Per-segment affine normalization of the observation vector.

Rebuilds ``SechsNimmtStateNormalization``
(/root/reference/rl_6_nimmt/utils/preprocessing.py:5-57) as a pure function:
each block of the (optionally action-prefixed) state vector is mapped to
[-1, 1] with the reference's hardcoded segment ranges:

| block                | length | min | max       |
|----------------------|--------|-----|-----------|
| action (optional)    | 1      | 0   | cards - 1 |
| own hand             | 10     | 0   | cards - 1 |
| number of players    | 1      | 0   | 6         |
| cards per row        | rows   | 1   | 5         |
| highest card per row | rows   | 0   | cards - 1 |
| points per row       | rows   | 1   | 10        |
| raw board grid       | rest   | 0   | cards - 1 |

TPU-first: instead of slicing and concatenating segments at runtime, the
per-feature scale/shift vectors are precomputed once per layout, so the whole
normalization is a single fused multiply-add over the feature axis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _scale_shift(length: int, action: bool, cards: int, rows: int, hand: int, summaries: bool):
    """Precompute per-feature (scale, shift) mapping x -> -1 + 2*(x-min)/(max-min)."""
    mins = np.empty(length, dtype=np.float32)
    maxs = np.empty(length, dtype=np.float32)
    pos = 0

    def block(n, lo, hi):
        nonlocal pos
        mins[pos : pos + n] = lo
        maxs[pos : pos + n] = hi
        pos += n

    if action:
        block(1, 0, cards - 1)
    block(hand, 0, cards - 1)
    block(1, 0, 6)
    if summaries:
        block(rows, 1, 5)
        block(rows, 0, cards - 1)
        block(rows, 1, 10)
    block(length - pos, 0, cards - 1)

    scale = 2.0 / (maxs - mins)
    shift = -1.0 - mins * scale
    return scale, shift


def normalize_state(
    x: jnp.ndarray,
    action: bool = False,
    cards: int = 104,
    rows: int = 4,
    hand: int = 10,
    summaries: bool = True,
) -> jnp.ndarray:
    """Normalize ``[..., state_length(+1)]`` observations to [-1, 1] per block."""
    scale, shift = _scale_shift(int(x.shape[-1]), action, cards, rows, hand, summaries)
    return x * jnp.asarray(scale) + jnp.asarray(shift)
