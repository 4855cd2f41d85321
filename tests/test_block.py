"""Block driver (runtime/block.py) + cross-game batched search (forward_many).

Covers the block-mode contract: forward_many is semantically the sequential
forward (identical np.random/PRNG stream for one request), a one-game block
reproduces GameSession exactly for device-representable learners, and the
tournament's play_block scores games like sequential play.
"""

import numpy as np
import pytest

from rl6nimmt_tpu.agents import (
    BatchedReinforceAgent,
    DrunkHamster,
    MCSAgent,
    PUCTAgent,
)
from rl6nimmt_tpu.engine.wrapper import SechsNimmtEnv
from rl6nimmt_tpu.runtime.block import BlockSession
from rl6nimmt_tpu.runtime.session import GameSession
from rl6nimmt_tpu.tournament import Tournament

pytestmark = pytest.mark.heavy  # compile-heavy device suite; run via `pytest -m heavy`



def _opening_position(num_players=3, env_seed=11):
    env = SechsNimmtEnv(num_players, seed=env_seed)
    states, legal = env.reset()
    return states[0], legal[0]


@pytest.mark.parametrize(
    "make_agent",
    [
        lambda: MCSAgent(mc_max=12, mc_per_card=2, seed=123),
        lambda: PUCTAgent(mc_max=12, mc_per_card=2, batch_playouts=4, seed=123),
    ],
    ids=["mcs", "puct"],
)
def test_forward_many_single_request_matches_forward(make_agent):
    state, legal = _opening_position()

    np.random.seed(77)
    a = make_agent()
    action_seq, info_seq = a.forward(state, legal)

    np.random.seed(77)
    b = make_agent()
    mem = b.new_memory()
    ((action_blk, info_blk),) = b.forward_many([state], [legal], [mem])

    assert action_blk == action_seq
    assert info_blk["log_prob"] == pytest.approx(info_seq["log_prob"])
    # forward_many threaded the card memory the way forward updated self.
    assert mem["available_cards"] == a.available_cards
    assert mem["num_players"] == a.num_players


def test_block_session_single_game_matches_game_session():
    def agents(seed):
        return [
            BatchedReinforceAgent(seed=seed),
            DrunkHamster(seed=seed + 1),
        ]

    np.random.seed(99)
    seq = agents(5)
    for ag in seq:
        ag.train()
    session = GameSession(*seq, env_seed=42)
    session.play_game()

    np.random.seed(99)
    blk = agents(5)
    for ag in blk:
        ag.train()
    block = BlockSession([blk], env_seeds=[42])
    scores = block.play()

    np.testing.assert_array_equal(scores[0], session.results[0])
    import jax

    for ps, pb in zip(jax.tree.leaves(seq[0].params), jax.tree.leaves(blk[0].params)):
        np.testing.assert_allclose(np.asarray(ps), np.asarray(pb))


def test_block_session_mixed_search_games():
    """Two games sharing one MCS instance play to completion with sane scores."""
    np.random.seed(3)
    mcs = MCSAgent(mc_max=6, mc_per_card=1, seed=9)
    rnd1, rnd2 = DrunkHamster(seed=1), DrunkHamster(seed=2)
    block = BlockSession([[mcs, rnd1], [rnd2, mcs]])
    scores = block.play()
    assert len(scores) == 2
    for s in scores:
        assert s.shape == (2,)
        assert (s <= 0).all()


def test_tournament_play_block_scores_like_sequential():
    np.random.seed(13)
    t = Tournament(min_players=2, max_players=3)
    t.add_player("Random1", DrunkHamster(seed=1))
    t.add_player("Random2", DrunkHamster(seed=2))
    t.add_player("MCS", MCSAgent(mc_max=6, mc_per_card=1, seed=3))
    t.play_block(6)
    assert t.total_games == 6
    assert sum(t.played_games.values()) >= 12  # 2-3 players per game
    for name in t.agents:
        assert len(t.elos[name]) == t.played_games[name] + 1
