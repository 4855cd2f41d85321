"""Tournament tests: positions, ELO, evolution, cloning, table rendering."""

import numpy as np
import pytest

from rl6nimmt_tpu.agents import BatchedReinforceAgent, DrunkHamster
from rl6nimmt_tpu.tournament import EloPlayer, Tournament, calc_elo


def test_relative_positions_midrank_ties():
    # scores: higher = better; ties -> midranks (reference tournament.py:249-256)
    scores = np.asarray([-5, -10, -5, -20], dtype=np.float64)
    pos = Tournament._compute_relative_positions(scores)
    # Best two tie at relative (2.5+3.5)/2... normalized to [0,1]:
    np.testing.assert_allclose(pos, [5 / 6, 1 / 3, 5 / 6, 0.0], atol=1e-6)


def test_absolute_positions():
    # NOTE: matches the reference formula (tournament.py:240-247), whose
    # values are effectively 1-based with (l+r)/2 midranks -- its "0 = best"
    # docstring does not describe its own output.  Only ordering feeds ELO.
    scores = np.asarray([-5, -10, -5, -20], dtype=np.float64)
    pos = Tournament._compute_absolute_positions(scores)
    np.testing.assert_allclose(pos, [1.5, 3.0, 1.5, 4.0], atol=1e-6)


def test_elo_zero_sum_and_direction():
    players = [EloPlayer(place=0, elo=1600), EloPlayer(place=1, elo=1600)]
    new = calc_elo(players, k=32)
    assert new[0] > 1600 > new[1]
    np.testing.assert_allclose(new.sum(), 3200, atol=1e-9)
    # Underdog win moves more points than favorite win.
    upset = calc_elo([EloPlayer(0, 1400), EloPlayer(1, 1800)], k=32)
    assert upset[0] - 1400 > new[0] - 1600


def test_elo_k_scaled_by_opponents():
    # A sweep win against 3 equal opponents: total gain equals (k/(n-1)) * 3 * 0.5.
    players = [EloPlayer(place=i, elo=1600) for i in range(4)]
    new = calc_elo(players, k=30)
    np.testing.assert_allclose(new[0] - 1600, 10 * 3 * 0.5 / 1)  # k_pair=10
    np.testing.assert_allclose(new.sum(), 4 * 1600, atol=1e-9)


def test_tournament_play_and_score():
    t = Tournament(min_players=2, max_players=4)
    for i in range(4):
        t.add_player(f"rand{i}", DrunkHamster(seed=i))
    np.random.seed(0)
    for _ in range(5):
        t.play_game()
    assert t.total_games == 5
    games = sum(t.played_games.values())
    assert games >= 10  # at least 2 players per game
    table = str(t)
    assert "Tournament after 5 games:" in table
    assert "rand0" in table and "ELO" in table


def test_tournament_evolve_clone_and_cull():
    t = Tournament(min_players=2, max_players=2)
    for i in range(4):
        t.add_player(f"a{i}", DrunkHamster(seed=i))
    # Rig ELOs: a3 best.
    for i, name in enumerate(["a0", "a1", "a2", "a3"]):
        t.elos[name].append(1500 + 100 * i)
    t.evolve(copies=(2,), max_players=4, max_per_descendant=2)
    active = t.active_agents()
    assert len(active) == 4
    # Best agent a3 cloned twice.
    assert sum(1 for n in active if t.descendants[n] == "a3") == 2
    # Lineage tracked through copies.
    assert all("_" in n for n in active)


def test_learning_agent_clone_shares_weights():
    agent = BatchedReinforceAgent(seed=5)
    agent.train()
    t = Tournament()
    t.add_player("r1", agent)
    t.copy_player("r1", "r2")
    import jax

    for a, b in zip(jax.tree.leaves(t.agents["r1"].parameters()),
                    jax.tree.leaves(t.agents["r2"].parameters())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert t.agents["r2"].__name__ == "r2"
    # The clone must be trainable independently.
    from rl6nimmt_tpu.runtime import GameSession

    session = GameSession(t.agents["r2"], DrunkHamster(seed=6))
    session.play_game()


def test_baseline_eval_runs():
    t = Tournament(
        min_players=2, max_players=2,
        baseline_agents=[DrunkHamster(seed=9)],
        baseline_condition=1,
    )
    t.add_player("x", DrunkHamster(seed=10))
    t.add_player("y", DrunkHamster(seed=11))
    np.random.seed(1)
    t.play_game()
    assert len(t.baseline_scores["x"]) == 1
    assert len(t.baseline_wins["y"]) == 1


def test_winner_returns_best_positioned():
    t = Tournament()
    t.add_player("w", DrunkHamster(seed=1))
    t.add_player("l", DrunkHamster(seed=2))
    t.tournament_positions["w"].append(1.0)
    t.tournament_positions["l"].append(0.0)
    assert t.winner() is t.agents["w"]
