from .harness import reference_deck, reference_deck_stream, reference_hands_and_board
from .refenv import IllegalMoveError, ParityEnv

__all__ = [
    "IllegalMoveError",
    "ParityEnv",
    "reference_deck",
    "reference_deck_stream",
    "reference_hands_and_board",
]
