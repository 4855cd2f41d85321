"""Uniform-random agent (the reference's ``DrunkHamster``, random.py:5-13)."""

from __future__ import annotations

import numpy as np

from .base import Agent


class DrunkHamster(Agent):
    """Plays a uniformly random legal card; never learns."""

    def forward(self, state, legal_actions, **kwargs):
        action = int(np.random.choice(np.asarray(legal_actions, dtype=np.int64)))
        return action, {}

    def learn(self, *args, **kwargs):
        return 0.0
