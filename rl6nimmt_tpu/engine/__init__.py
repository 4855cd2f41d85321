from .cards import POINTS_104, build_points_table, card_points, format_card
from .env import (
    InvalidMoveException,
    batched,
    deal,
    init_from_deck,
    is_done,
    jitted_core,
    legal_mask,
    observe,
    row_points,
    sorted_hands,
    step,
)
from .state import EnvConfig, EnvState
from .wrapper import SechsNimmtEnv

__all__ = [
    "POINTS_104",
    "build_points_table",
    "card_points",
    "format_card",
    "InvalidMoveException",
    "batched",
    "deal",
    "init_from_deck",
    "is_done",
    "jitted_core",
    "legal_mask",
    "observe",
    "row_points",
    "sorted_hands",
    "step",
    "EnvConfig",
    "EnvState",
    "SechsNimmtEnv",
]
