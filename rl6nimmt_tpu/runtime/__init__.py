from .arena import SeatPolicy, make_arena, play_match, seat_policy_of
from .session import GameSession

__all__ = ["GameSession", "SeatPolicy", "make_arena", "play_match", "seat_policy_of"]
