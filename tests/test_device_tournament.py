"""Device-block tournament driver: unified-decide parity + replay stream.

Covers :mod:`rl6nimmt_tpu.runtime.device_tournament` and the kind-traced
decision program (:func:`rl6nimmt_tpu.agents.device_search
._make_decide_unified`):

* the unified program with a FIXED kind is bit-identical to the kind-static
  device-root programs (same key, same inputs) for all three search roots;
* the host-side learning replay delivers the exact GameSession argument
  stream (reward lag, episode_end cadence, legal lists, num_episode=0);
* ``Tournament.play_device_block`` routes eligible lineups to the device
  session and everything else through the host block driver.
"""

import jax
import numpy as np
import pytest

from rl6nimmt_tpu.agents.device_search import (
    KIND_POLICY,
    KIND_PUCT,
    KIND_PUCT_UNIFORM,
    KIND_RANDOM,
    KIND_UNIFORM,
    make_device_decision_fn,
    make_unified_decision_fn,
)
from rl6nimmt_tpu.agents.mcs import MCSAgent, PUCTAgent, PUCTUniformAgent
from rl6nimmt_tpu.agents.random_agent import DrunkHamster
from rl6nimmt_tpu.engine.env import deal, observe
from rl6nimmt_tpu.engine.state import EnvConfig
from rl6nimmt_tpu.nets import MLPSpec, mlp_init
from rl6nimmt_tpu.runtime.device_tournament import (
    DeviceBlockSession,
    device_lineup_eligible,
    seat_kind,
)
from rl6nimmt_tpu.tournament import Tournament

pytestmark = pytest.mark.heavy  # compile-heavy device suite; run via `pytest -m heavy`


MC_MAX, BATCH = 16, 4


def _root_inputs(cfg, seed=0):
    """Fresh-deal decision inputs for seat 0."""
    state = deal(cfg, jax.random.key(seed))
    obs, _ = observe(cfg, state)
    my_hand = np.asarray(state.hands_sorted[0])
    seen = np.zeros(cfg.num_cards, bool)
    seen[np.asarray(state.board).reshape(-1)[np.asarray(state.board).reshape(-1) >= 0]] = True
    avail = ~(seen | np.asarray(state.hands[0]))
    return (
        np.asarray(state.board),
        np.asarray(state.row_len),
        my_hand,
        cfg.hand_size,
        12,
        avail,
        np.asarray(obs[0]),
    )


@pytest.mark.parametrize(
    "root,kind,playout",
    [
        ("uniform", KIND_UNIFORM, "uniform"),
        ("policy", KIND_POLICY, "net"),
        ("puct", KIND_PUCT, "net"),
        # Decoupled Alpha0.5: net ROOT prior, uniform playouts.
        ("puct", KIND_PUCT_UNIFORM, "uniform"),
    ],
)
def test_unified_decide_matches_static(root, kind, playout):
    cfg = EnvConfig(num_players=3)
    spec = MLPSpec(input_size=cfg.state_length + 1, hidden_sizes=(16,), head_sizes=(1,))
    params = mlp_init(jax.random.key(7), spec)
    board, row_len, my_hand, n, n_mc, avail, obs = _root_inputs(cfg)
    key = jax.random.key(42)

    static = make_device_decision_fn(
        cfg, playout,
        spec if (playout == "net" or root != "uniform") else None,
        root, MC_MAX, BATCH, 2.0,
    )
    unified = make_unified_decision_fn(cfg, spec, MC_MAX, BATCH)
    a_ref, lp_ref = static(params, board, row_len, my_hand, n, n_mc, avail, obs, key)
    a_uni, lp_uni, pick = unified(
        params, kind, board, row_len, my_hand, n, n_mc, 2.0, avail, obs, key
    )
    assert int(a_uni) == int(a_ref)
    assert float(lp_uni) == float(lp_ref)
    assert int(my_hand[int(pick)]) == int(a_ref)


def test_unified_random_kind_zero_budget():
    cfg = EnvConfig(num_players=3)
    spec = MLPSpec(input_size=cfg.state_length + 1, hidden_sizes=(16,), head_sizes=(1,))
    params = jax.tree.map(lambda x: x * 0, mlp_init(jax.random.key(0), spec))
    board, row_len, my_hand, n, _, avail, obs = _root_inputs(cfg, seed=5)
    unified = make_unified_decision_fn(cfg, spec, MC_MAX, BATCH)
    actions = {
        int(
            unified(
                params, KIND_RANDOM, board, row_len, my_hand, n, 0, 0.0, avail, obs,
                jax.random.key(k),
            )[0]
        )
        for k in range(30)
    }
    legal = {int(c) for c in my_hand if c >= 0}
    assert actions <= legal and len(actions) > 1  # random legal picks, varied


class RecordingHamster(DrunkHamster):
    """Eligible (KIND_RANDOM) seat that records its learn argument stream."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.calls = []

    def learn(self, **kwargs):
        self.calls.append(kwargs)
        return 0.0


def test_device_session_learn_stream_matches_gamesession_protocol():
    np.random.seed(0)
    rec = RecordingHamster(seed=1)
    mcs = MCSAgent(seed=2, mc_max=8, mc_per_card=2)
    sess = DeviceBlockSession([[rec, mcs, DrunkHamster(seed=3)]], batch=BATCH)
    (scores,) = sess.play()

    assert len(rec.calls) == 10
    assert rec.calls[0]["reward"] == 0  # reward lag (play.py:29-72)
    for t, call in enumerate(rec.calls):
        assert call["num_episode"] == 0
        assert call["episode_end"] == call["done"] == (t == 9)
        assert len(call["legal_actions"]) == 10 - t
        assert call["action"] in call["legal_actions"]
        if t > 0:
            assert call["reward"] == rec.calls[t - 1]["next_reward"]  # lag
        if t < 9:
            np.testing.assert_array_equal(
                call["next_state"], rec.calls[t + 1]["state"]
            )
            assert call["next_legal_actions"] == rec.calls[t + 1]["legal_actions"]
        else:
            assert call["next_legal_actions"] == []
    total = sum(int(c["next_reward"]) for c in rec.calls)
    assert total == int(scores[0])  # trajectory rewards sum to the final score
    assert all(s <= 0 for s in scores)


def test_seat_kind_and_eligibility():
    assert seat_kind(DrunkHamster()) == KIND_RANDOM
    assert seat_kind(MCSAgent(mc_max=4)) == KIND_UNIFORM
    assert seat_kind(PUCTAgent(mc_max=4)) == KIND_PUCT
    assert seat_kind(PUCTUniformAgent(mc_max=4)) == KIND_PUCT_UNIFORM
    assert device_lineup_eligible([DrunkHamster(), PUCTUniformAgent(mc_max=4)])

    from rl6nimmt_tpu.agents.dqn import DQNVanilla
    from rl6nimmt_tpu.agents.human import Human

    dqn = DQNVanilla()
    assert seat_kind(dqn) is None  # search-only view: DQN is a learner slot
    assert device_lineup_eligible([DrunkHamster(), MCSAgent(mc_max=4)])
    assert device_lineup_eligible([DrunkHamster(), dqn])
    assert not device_lineup_eligible([DrunkHamster(), Human()])


def test_device_session_sharded_over_mesh_matches_single_device():
    """Game-axis sharding over the 8-device mesh is numerically invisible."""
    from rl6nimmt_tpu.parallel import make_mesh

    def run(mesh, seed):
        np.random.seed(seed)
        lineups = [
            [DrunkHamster(seed=1), MCSAgent(seed=2, mc_max=8, mc_per_card=2)]
            for _ in range(8)
        ]
        sess = DeviceBlockSession(lineups, batch=BATCH, mesh=mesh)
        return np.stack(sess.play())

    single = run(None, seed=123)
    sharded = run(make_mesh(), seed=123)
    np.testing.assert_array_equal(single, sharded)


def test_tournament_groups_mixed_net_specs_separately():
    """Two eligible agents with different architectures must not share one
    compiled program: play_device_block groups by full lineup signature."""
    np.random.seed(3)
    t = Tournament(min_players=2, max_players=2)
    t.add_player("small", PUCTAgent(seed=1, mc_max=8, mc_per_card=2, hidden_sizes=(16,)))
    t.add_player("big", PUCTAgent(seed=2, mc_max=8, mc_per_card=2, hidden_sizes=(32,)))
    t.add_player("random", DrunkHamster(seed=3))
    t.play_device_block(6)  # mixed-spec lineups land in separate groups
    assert t.total_games == 6


def test_nondefault_batch_playouts_puct_falls_back_to_host():
    """PUCT root statistics refresh per round; a non-default batch_playouts
    would change that cadence, so such seats stay on the host driver."""
    from rl6nimmt_tpu.runtime.device_tournament import device_lineup_eligible

    default = PUCTAgent(seed=1, mc_max=8)
    custom = PUCTAgent(seed=2, mc_max=8, batch_playouts=1)
    assert device_lineup_eligible([DrunkHamster(), default])
    assert not device_lineup_eligible([DrunkHamster(), custom])
    # Uniform-root MCS is round-agnostic: any batch_playouts stays eligible.
    assert device_lineup_eligible(
        [DrunkHamster(), MCSAgent(seed=3, mc_max=8, batch_playouts=2)]
    )


def test_playout_budget_matches_host_without_overflow():
    """min(mc_max, mc_per * n!) survives products past int32 (mcts.py:105-106)."""
    import math

    from rl6nimmt_tpu.agents.device_search import factorial_table, playout_budget

    fact = factorial_table(10)
    for mc_max, mc_per, n in [(100, 10, 1), (5000, 1000, 10), (400, 10, 3), (0, 0, 10)]:
        expect = min(mc_max, mc_per * math.factorial(n))
        got = int(playout_budget(mc_max, mc_per, fact[n]))
        assert got == expect, (mc_max, mc_per, n, got, expect)


def test_tournament_play_device_block_mixed_population():
    np.random.seed(7)
    from rl6nimmt_tpu.agents.dqn import DQNVanilla

    t = Tournament(min_players=2, max_players=3)
    t.add_player("random", DrunkHamster(seed=1))
    t.add_player("mcs", MCSAgent(seed=2, mc_max=8, mc_per_card=2))
    puct = PUCTAgent(seed=3, mc_max=8, mc_per_card=2)
    puct.train()
    t.add_player("puct", puct)
    dqn = DQNVanilla(seed=4, minibatch=4)
    dqn.train()
    t.add_player("dqn", dqn)

    t.play_device_block(6)
    assert t.total_games == 6
    assert sum(t.played_games.values()) >= 12  # 2-3 seats per game
    for name in t.agents:
        assert len(t.elos[name]) == 1 + t.played_games[name]
    assert str(t)  # ASCII table renders
