from .mesh import (
    GAMES_AXIS,
    game_sharding,
    make_dp_dqn_step,
    make_dp_reinforce_step,
    make_mesh,
    replicated,
    stack_for_mesh,
)

__all__ = [
    "GAMES_AXIS",
    "game_sharding",
    "make_dp_dqn_step",
    "make_dp_reinforce_step",
    "make_mesh",
    "replicated",
    "stack_for_mesh",
]
