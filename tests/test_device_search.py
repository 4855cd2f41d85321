"""Device-resident search decisions (agents/device_search.py).

Covers: PUCT round selection parity vs the host path, the masked median /
min-max q normalization, determinization validity, and end-to-end games with
``device_root=True`` through GameSession and the block driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl6nimmt_tpu.agents import DrunkHamster, MCSAgent, PolicyMCSAgent, PUCTAgent
from rl6nimmt_tpu.agents.device_search import (
    _masked_median,
    _normalized_q,
    deal_opponents,
    puct_select,
)
from rl6nimmt_tpu.runtime import GameSession

pytestmark = pytest.mark.heavy  # compile-heavy device suite; run via `pytest -m heavy`



def _stats_from_outcomes(legal, outcomes, buf_len):
    """Build the device path's (act_sum, act_cnt, rets_buf, completed)."""
    act_sum = np.array([sum(outcomes[a]) for a in legal], np.float32)
    act_cnt = np.array([len(outcomes[a]) for a in legal], np.float32)
    flat = [r for a in legal for r in outcomes[a]]
    rets_buf = np.zeros(buf_len, np.float32)
    rets_buf[: len(flat)] = flat
    return act_sum, act_cnt, rets_buf, len(flat)


@pytest.mark.parametrize(
    "outcomes",
    [
        # cold start (<10 outcomes, mcts.py:304-315 constants)
        {3: [-2.0], 7: [], 11: [-5.0, -1.0], 20: []},
        # warm: min/max/median from 12 outcomes
        {3: [-2.0, -4.0, -1.0], 7: [-9.0, -3.0, -3.5], 11: [0.0, -6.0, -2.0], 20: [-7.0, -8.0, -0.5]},
        # all outcomes equal -> PARITY.md q=0.5 fallback
        {3: [-4.0] * 6, 7: [-4.0] * 5, 11: [], 20: []},
    ],
)
def test_puct_round_selection_matches_host(outcomes):
    legal = [3, 7, 11, 20]
    agent = PUCTAgent.__new__(PUCTAgent)  # selection math only; no net needed
    agent.c_puct = 2.0
    # Non-harmonic priors: p_i/(1+c) collisions (e.g. 0.2/2 == 0.1/1) are
    # exact PUCT ties that f32-vs-f64 rounding would break differently.
    rlp = {3: np.log(0.46), 7: np.log(0.27), 11: np.log(0.17), 20: np.log(0.10)}

    K = 8
    host = agent._choose_first_moves(K, legal, outcomes, rlp)

    act_sum, act_cnt, rets_buf, completed = _stats_from_outcomes(legal, outcomes, 64)
    probs = np.exp([rlp[a] for a in legal]).astype(np.float32)
    q = _normalized_q(
        jnp.asarray(act_sum), jnp.asarray(act_cnt), jnp.asarray(rets_buf), completed
    )
    idx = puct_select(
        q, jnp.asarray(probs), jnp.asarray(act_cnt), jnp.ones(4, bool),
        jnp.ones(K, bool), 2.0,
    )
    device = [legal[i] for i in np.asarray(idx)]
    assert list(host) == device


def test_masked_median_matches_numpy(rng):
    for count in [1, 2, 5, 10, 11]:
        vals = rng.randn(16).astype(np.float32)
        got = float(_masked_median(jnp.asarray(vals), count))
        assert got == pytest.approx(float(np.median(vals[:count])), abs=1e-6)


def test_normalized_q_warm_range():
    # 12 completed outcomes on 3 actions; q must be the min-max normalized
    # means, clipped to [0, 1], with empty actions at the median's value.
    legal = [1, 2, 3]
    outcomes = {1: [-1.0, -3.0], 2: [-9.0] * 9, 3: [-5.0]}
    act_sum, act_cnt, rets_buf, completed = _stats_from_outcomes(legal, outcomes, 32)
    q = np.asarray(
        _normalized_q(
            jnp.asarray(act_sum), jnp.asarray(act_cnt), jnp.asarray(rets_buf), completed
        )
    )
    all_rets = [r for rs in outcomes.values() for r in rs]
    lo, hi = np.min(all_rets), np.max(all_rets)
    expect = [(np.mean(outcomes[a]) - lo) / (hi - lo) for a in legal]
    np.testing.assert_allclose(q, np.clip(expect, 0, 1), atol=1e-6)


def test_deal_opponents_valid_partition():
    avail = np.zeros(104, bool)
    pool = np.arange(5, 95, 3)  # 30 unseen cards
    avail[pool] = True
    for seed in range(5):
        opp = np.asarray(
            deal_opponents(jnp.asarray(avail), jax.random.key(seed), 3, 7, 7)
        )
        assert opp.shape == (3, 7)
        flat = opp.reshape(-1)
        assert len(set(flat.tolist())) == 21  # disjoint across hands
        assert set(flat.tolist()) <= set(pool.tolist())  # subset of the pool
        assert (np.diff(opp, axis=1) > 0).all()  # ascending per hand


def test_deal_opponents_padded_slots():
    # Traced n below the slot count: tails are -1 (hands_sorted convention).
    avail = np.zeros(104, bool)
    pool = np.arange(10, 70, 2)
    avail[pool] = True
    opp = np.asarray(
        deal_opponents(jnp.asarray(avail), jax.random.key(3), 3, 4, 10)
    )
    assert opp.shape == (3, 10)
    assert (opp[:, 4:] == -1).all()
    valid = opp[:, :4].reshape(-1)
    assert len(set(valid.tolist())) == 12
    assert set(valid.tolist()) <= set(pool.tolist())
    assert (np.diff(opp[:, :4], axis=1) > 0).all()


@pytest.mark.parametrize("cls", [MCSAgent, PolicyMCSAgent, PUCTAgent])
def test_device_root_full_game(cls):
    np.random.seed(3)
    agent = cls(mc_max=16, device_root=True, seed=0)
    session = GameSession(agent, DrunkHamster(seed=1), DrunkHamster(seed=2))
    session.play_game()
    assert session.results[-1].shape == (3,)
    assert (session.results[-1] <= 0).all()


def test_device_root_beats_random():
    np.random.seed(7)
    agent = MCSAgent(mc_max=24, device_root=True, seed=5)
    wins = 0
    games = 24
    session = GameSession(agent, DrunkHamster(seed=6))
    for _ in range(games):
        session.play_game()
    scores = np.stack(session.results)
    wins = (scores[:, 0] >= scores[:, 1]).mean()
    assert wins > 0.6, scores.tolist()


def test_device_root_block_driver():
    from rl6nimmt_tpu.tournament import Tournament

    np.random.seed(11)
    t = Tournament()
    t.add_player("mcs", MCSAgent(mc_max=12, device_root=True, seed=0))
    t.add_player("puct", PUCTAgent(mc_max=12, device_root=True, seed=1))
    t.add_player("rng", DrunkHamster(seed=2))
    t.play_block(4)
    assert t.total_games == 4
