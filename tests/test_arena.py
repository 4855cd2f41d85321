"""Device-arena tests: heterogeneous matchups fully on device."""

import numpy as np
import pytest

from rl6nimmt_tpu.agents import (
    BatchedACERAgent,
    BatchedReinforceAgent,
    DrunkHamster,
    Human,
    MCSAgent,
    Noisy_D3QN_PRB_NStep,
)
from rl6nimmt_tpu.runtime.arena import play_match, seat_policy_of


def test_mixed_matchup_runs():
    agents = [
        DrunkHamster(seed=0),
        BatchedReinforceAgent(seed=1),
        BatchedACERAgent(seed=2),
        Noisy_D3QN_PRB_NStep(seed=3),
    ]
    scores = play_match(agents, num_games=64, seed=0)
    assert scores.shape == (64, 4)
    assert (scores <= 0).all()
    # Every game hands out penalties somewhere.
    assert (scores.sum(axis=1) < 0).any()


def test_two_seat_matchup_and_determinism():
    agents = [DrunkHamster(seed=0), BatchedReinforceAgent(seed=1)]
    a = play_match(agents, num_games=32, seed=5)
    b = play_match(agents, num_games=32, seed=5)
    np.testing.assert_array_equal(a, b)
    c = play_match(agents, num_games=32, seed=6)
    assert not np.array_equal(a, c)


def test_host_only_agents_are_rejected():
    assert seat_policy_of(MCSAgent(seed=0)) is None
    assert seat_policy_of(Human()) is None
    with pytest.raises(ValueError, match="not device-representable"):
        play_match([DrunkHamster(seed=0), MCSAgent(seed=1)], num_games=8)
