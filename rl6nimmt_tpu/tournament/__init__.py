from .elo import EloPlayer, calc_elo
from .tournament import Tournament

__all__ = ["EloPlayer", "calc_elo", "Tournament"]
