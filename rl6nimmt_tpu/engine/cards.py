"""Card point ("Hornochsen") tables for 6 nimmt!.

The scoring rule (reference: /root/reference/rl_6_nimmt/env.py:224-239) assigns
points to the 1-indexed face value of each card:

* face 55            -> 7 points
* multiples of 11    -> 5 points (11, 22, ..., 99; 55 is caught above)
* multiples of 10    -> 3 points
* faces ending in 5  -> 2 points (5, 15, ..., 95; 55 caught above)
* everything else    -> 1 point

Cards are identified by a 0-indexed id ``c`` whose face value is ``c + 1``.

TPU-first design: instead of per-card branching, the whole rule is baked into a
static lookup table once at import time.  On device the table lives as a
constant ``int32[num_cards]`` array and row scoring becomes a gather + masked
sum -- no control flow, fully vectorizable over thousands of games.
"""

from __future__ import annotations

import numpy as np

NUM_CARDS_DEFAULT = 104

# Sigils used by the renderer to mark card point values (reference env.py:241-244).
VALUE_SIGILS = {1: " ", 2: ".", 3: ":", 5: "+", 7: "#"}


def card_points(card_id: int) -> int:
    """Point value of a single 0-indexed card id (face value ``card_id + 1``)."""
    face = card_id + 1
    if face == 55:
        return 7
    if face % 11 == 0:
        return 5
    if face % 10 == 0:
        return 3
    if face % 10 == 5:
        return 2
    return 1


def build_points_table(num_cards: int = NUM_CARDS_DEFAULT) -> np.ndarray:
    """Dense ``int32[num_cards]`` lookup table of card point values."""
    return np.asarray([card_points(c) for c in range(num_cards)], dtype=np.int32)


# The standard 104-card table, shared by engine / parity / renderer.
POINTS_104 = build_points_table(NUM_CARDS_DEFAULT)


def format_card(card_id: int) -> str:
    """Render a card as ``'<face><sigil>'`` right-aligned (reference env.py:241-244)."""
    sigil = VALUE_SIGILS[card_points(card_id)]
    return f"{card_id + 1:>3d}{sigil}"
