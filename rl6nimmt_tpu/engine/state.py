"""Fixed-shape game state for the TPU engine.

The reference keeps the game as Python lists of lists (env.py:30-31), which is
inherently host-bound.  Here the whole game lives in a small pytree of dense,
statically-shaped arrays so that ``jax.vmap`` can step thousands of games in
lockstep and ``lax.scan`` can unroll a full game on device.

Design notes (TPU-first):

* ``hands`` is a boolean membership mask over all card ids rather than a
  sorted list.  Playing a card is a one-hot scatter, legality is a gather,
  and the legal-action mask needed by every agent is literally the state --
  no per-step sorting or ragged shapes on the hot path.
* ``board`` keeps rows as ``-1``-padded fixed rows of ``threshold`` slots,
  mirroring the reference's observation grid layout (env.py:188-204) so the
  observation is a cheap concat instead of a re-encode.
* Everything is ``int32``: the arrays are tiny (a 4-player game is < 1 KB),
  so HBM layout hardly matters; what matters is avoiding host round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp


@dataclass(frozen=True)
class EnvConfig:
    """Static game parameters (hashable: usable as a jit static argument).

    Mirrors the reference constructor signature (env.py:16-27).
    """

    num_players: int
    num_rows: int = 4
    num_cards: int = 104
    threshold: int = 6
    include_summaries: bool = True
    hand_size: int = 10

    def __post_init__(self):
        assert self.num_players > 0
        assert self.num_rows > 0
        assert self.num_cards >= self.hand_size * self.num_players + self.num_rows

    @property
    def state_length(self) -> int:
        """Per-player observation length (reference env.py:37): 47 by default."""
        summaries = 3 * self.num_rows if self.include_summaries else 0
        return self.hand_size + 1 + summaries + self.num_rows * self.threshold

    @property
    def num_actions(self) -> int:
        return self.num_cards

    @property
    def max_turns(self) -> int:
        return self.hand_size


class EnvState(NamedTuple):
    """One game (unbatched). Batched variants carry a leading games axis.

    Fields
    ------
    board:   int32[num_rows, threshold] card ids, -1 for empty slots.
    row_len: int32[num_rows]            cards currently in each row (1..threshold-1).
    hands:   bool[num_players, num_cards] card-membership mask per player.
    hands_sorted: int32[num_players, hand_size] ascending card ids, -1 padded.
    scores:  int32[num_players]         accumulated penalty points (positive).
    turn:    int32                      completed simultaneous turns.

    ``hands`` and ``hands_sorted`` are two views of the same information: the
    mask feeds legal-action logits in O(1), while the sorted list feeds the
    observation's hand block.  Maintaining the sorted view *incrementally*
    (one masked shift per played card) keeps the per-turn cost at O(hand)
    instead of re-deriving order from the O(cards) mask every observation --
    the difference between VPU-trivial and the hottest op in the engine.
    """

    board: jnp.ndarray
    row_len: jnp.ndarray
    hands: jnp.ndarray
    hands_sorted: jnp.ndarray
    scores: jnp.ndarray
    turn: jnp.ndarray
