from .arena import SeatPolicy, make_arena, play_match, seat_policy_of
from .device_match import make_device_match_fn
from .session import GameSession

__all__ = [
    "GameSession",
    "SeatPolicy",
    "make_arena",
    "make_device_match_fn",
    "play_match",
    "seat_policy_of",
]
