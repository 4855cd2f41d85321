"""Interactive CLI agent (the reference's ``Human``, human.py:7-33).

Prompts on stdin for a 1-indexed card face until the player names a card they
actually hold.  This is inherently a host-side agent (the GameSession path);
for a fully-jitted game where only the human's choice crosses to the host,
see :mod:`..runtime.callback_human` (io_callback seat, SURVEY.md §5).
"""

from __future__ import annotations

import logging

from .base import Agent

logger = logging.getLogger(__name__)


def prompt_for_card(legal_actions, name: str) -> int:
    """The reference prompt/retry loop (human.py:14-28): 1-indexed card faces,
    re-prompt until a held card is named.  Shared by the GameSession agent
    and the io_callback seat (runtime/callback_human.py)."""
    hand = " ".join(f"{card + 1:>3d}" for card in legal_actions)
    prompt = (
        f"It is your turn, {name}! You have the following cards: "
        f"{hand}. Choose one to play!"
    )
    action = -1
    while action not in legal_actions:
        raw = input(prompt)
        try:
            action = int(raw) - 1
        except (TypeError, ValueError):
            logger.error("Input in wrong format, please try again.")
        prompt = "You don't have that card. Please pick one of your cards: " + hand
    return action


class Human(Agent):
    def __init__(self, name: str = "Human", env=None, *args, **kwargs):
        super().__init__(env, *args, **kwargs)
        self.__name__ = name

    def forward(self, state, legal_actions, **kwargs):
        action = prompt_for_card(list(legal_actions), self.__name__)
        return action, {}

    def learn(self, *args, **kwargs):
        return 0.0
