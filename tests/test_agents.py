"""Agent smoke + behavior tests: every family plays and learns in a session.

Mirrors the reference's de-facto test strategy (debug_{acer,dqn,mcts}.py) but
as real assertions: games complete, scores are consistent, parameters move
under training, and variant-specific behaviors hold.
"""

import jax
import numpy as np
import pytest

from rl6nimmt_tpu.agents import (
    AGENTS,
    BatchedACERAgent,
    BatchedReinforceAgent,
    DQNVanilla,
    DrunkHamster,
    MaskedReinforceAgent,
    MCSAgent,
    Noisy_D3QN_PRB_NStep,
    PUCTAgent,
    PUCTCustomedAgent,
)
from rl6nimmt_tpu.runtime import GameSession

pytestmark = pytest.mark.heavy  # compile-heavy suite; run via `pytest -m heavy`



def leaves_differ(a, b):
    return any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def play_games(agent, n_games=1, opponents=1, seed=0):
    session = GameSession(agent, *[DrunkHamster(seed=seed + i) for i in range(opponents)],
                          env_seed=seed)
    for _ in range(n_games):
        session.play_game()
    return session


def test_registry_matches_reference_keys():
    reference_keys = {
        "human", "random", "reinforce", "acer", "dqn", "ddqn", "duelling_dqn",
        "duelling_ddqn", "dqn_prb", "ddqn_prb", "duelling_ddqn_prb", "dqn_nstep",
        "d3qn_prb_nstep", "noisy_dqn", "noisy_d3qn_prb_nstep", "noisy_d3qn",
        "mcts", "pmcs", "puct",
    }
    # Every reference key present with its exact meaning; framework-original
    # additions (decoupled Alpha0.5) are allowed on top.
    framework_extras = {"puct_uniform"}
    assert set(AGENTS.keys()) == reference_keys | framework_extras


def test_random_agents_complete_game():
    session = play_games(DrunkHamster(seed=1), n_games=2, opponents=2)
    assert len(session.results) == 2
    for scores in session.results:
        assert (scores <= 0).all()


def test_reinforce_agents_learn():
    for cls in (BatchedReinforceAgent, MaskedReinforceAgent):
        agent = cls(seed=3)
        agent.train()
        before = jax.tree.map(np.asarray, agent.parameters())
        play_games(agent, n_games=2)
        assert leaves_differ(before, agent.parameters()), cls.__name__


def test_dqn_vanilla_learns_and_masks():
    agent = DQNVanilla(seed=4, minibatch=8)
    agent.train()
    before = jax.tree.map(np.asarray, agent.parameters())
    play_games(agent, n_games=3)
    assert leaves_differ(before, agent.parameters())
    assert len(agent.history) == 30  # 10 transitions per game

    # Greedy path must respect the legal mask.
    agent.eps = 0.0
    session = GameSession(agent, DrunkHamster(seed=5))
    states, legal = session.env.reset()
    action, info = agent(states[0], legal_actions=legal[0])
    assert action in legal[0]


def test_noisy_d3qn_prb_nstep_full_stack():
    """The flagship Rainbow-lite config: noisy + double + dueling + PER + n-step."""
    agent = Noisy_D3QN_PRB_NStep(seed=6, minibatch=8, n_steps=3, history_length=1000)
    agent.train()
    before = jax.tree.map(np.asarray, agent.parameters())
    play_games(agent, n_games=3)
    assert leaves_differ(before, agent.parameters())
    # Noisy agent still picks legal actions (argmax over legal subset).
    session = GameSession(agent, DrunkHamster(seed=7))
    states, legal = session.env.reset()
    action, _ = agent(states[0], legal_actions=legal[0])
    assert action in legal[0]
    # n-step tail flush marks trailing transitions done.
    dones = [r["done"] for r in agent.history._records[: len(agent.history)] if r is not None]
    assert any(dones)


def test_acer_learns_after_warmup():
    agent = BatchedACERAgent(seed=8, warmup=2, minibatch=2)
    agent.train()
    before = jax.tree.map(np.asarray, agent.parameters())
    play_games(agent, n_games=4)
    assert leaves_differ(before, agent.parameters())


def test_mcs_plays_reasonably():
    agent = MCSAgent(seed=9, mc_max=16, mc_per_card=2)
    play_games(agent, n_games=1, opponents=2)


def test_puct_plays_and_learns():
    agent = PUCTAgent(seed=10, mc_max=12, mc_per_card=2, batch_playouts=4)
    agent.train()
    before = jax.tree.map(np.asarray, agent.parameters())
    play_games(agent, n_games=1, opponents=1)
    assert leaves_differ(before, agent.parameters())


def test_puct_customed_plays_and_learns():
    agent = PUCTCustomedAgent(seed=11)
    agent.train()
    before = jax.tree.map(np.asarray, agent.parameters())
    play_games(agent, n_games=1, opponents=1)
    assert leaves_differ(before, agent.parameters())


def test_scores_match_env_accounting():
    session = play_games(DrunkHamster(seed=12), n_games=1, opponents=3)
    np.testing.assert_array_equal(-session.results[0], session.env.scores)


def test_human_agent_prompts_until_valid(monkeypatch):
    """Human CLI loop parity (reference human.py:7-33): 1-indexed input,
    re-prompt on bad format and on cards not held, learn() is a no-op."""
    from rl6nimmt_tpu.agents import Human

    agent = Human(name="Merle")
    feeds = iter(["notacard", "100", "8"])  # junk, card not held, then valid
    prompts = []
    monkeypatch.setattr("builtins.input", lambda p: (prompts.append(p), next(feeds))[1])

    action, info = agent.forward(state=None, legal_actions=[2, 7, 31])
    assert action == 7  # "8" is 1-indexed
    assert info == {}
    assert len(prompts) == 3
    assert "Merle" in prompts[0]
    assert "don't have that card" in prompts[2]
    assert agent.learn() == 0.0
