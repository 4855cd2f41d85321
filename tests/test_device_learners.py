"""Device-block learner seats: acting parity + learn-replay plumbing.

Covers the learner-slot extension of :mod:`rl6nimmt_tpu.runtime
.device_tournament` — the DQN lattice, ACER, both REINFORCE variants and
PUCTCustomed acting inside the kind-traced device program:

* per-family acting parity against the host agents' own forward math under
  identical frozen parameters (exact on the CPU backend: the device path
  reuses the same pure functions);
* the host-side learn replay feeds each learner's real buffers/updates
  (DQN transitions with reward lag, ACER sequences with the captured
  behavior log-probs, REINFORCE/PUCTCustomed episode training);
* eligibility and slot bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl6nimmt_tpu.agents.acer import BatchedACERAgent, actor_critic_heads
from rl6nimmt_tpu.agents.dqn import DQNVanilla, DuellingDQNAgent, Noisy_D3QN_PRB_NStep
from rl6nimmt_tpu.agents.mcs import PUCTAgent, PUCTCustomedAgent, _policy_value
from rl6nimmt_tpu.agents.random_agent import DrunkHamster
from rl6nimmt_tpu.agents.reinforce import (
    BatchedReinforceAgent,
    MaskedReinforceAgent,
    action_in_input_logits,
    masked_policy_logits,
)
from rl6nimmt_tpu.engine.env import deal, observe
from rl6nimmt_tpu.engine.state import EnvConfig
from rl6nimmt_tpu.runtime.device_tournament import (
    KIND_LEARNER_BASE,
    DeviceBlockSession,
    LearnerSlot,
    _make_learner_decide,
    device_lineup_eligible,
    seat_slot,
)

pytestmark = pytest.mark.heavy  # compile-heavy device suite; run via `pytest -m heavy`


CFG = EnvConfig(num_players=4)


def _decision_inputs(seed=0):
    state = deal(CFG, jax.random.key(seed))
    obs, _ = observe(CFG, state)
    return np.asarray(obs[0], np.float32), np.asarray(state.hands_sorted[0], np.int32)


def _run_slot(slot, params, obs, hand, eps=0.0, key_seed=11):
    decide = _make_learner_decide(CFG, (slot,))
    pick, logp, vec = jax.jit(decide)(
        (params,),
        jnp.int32(KIND_LEARNER_BASE),
        jnp.asarray(hand),
        jnp.asarray(obs),
        jnp.float32(eps),
        jax.random.key(key_seed),
    )
    return int(pick), float(logp), np.asarray(vec)


def test_dqn_greedy_pick_matches_host_forward():
    for agent in (DQNVanilla(seed=1), DuellingDQNAgent(seed=2)):
        agent.eps = 0.0  # force the greedy branch on the host path
        obs, hand = _decision_inputs(seed=3)
        legal = [int(c) for c in hand if c >= 0]
        host_action, _ = agent.forward(obs, legal_actions=legal)
        role, slot = seat_slot(agent)
        assert role == "learner" and slot.family == "dqn"
        pick, _, _ = _run_slot(slot, agent.params, obs, hand, eps=0.0)
        assert int(hand[pick]) == int(host_action)


def test_noisy_dqn_pick_matches_host_at_equal_noise_key():
    agent = Noisy_D3QN_PRB_NStep(seed=4)
    obs, hand = _decision_inputs(seed=5)
    legal = [int(c) for c in hand if c >= 0]
    # Same noise key on both paths -> identical Q draw -> identical argmax.
    key = jax.random.fold_in(jax.random.key(11), 2)  # the device path's k_noise
    q = np.asarray(agent._q_fn(agent.params, jnp.asarray(obs)[None], key)[0])
    host_pick = int(np.argmax(q[legal]))
    _, slot = seat_slot(agent)
    pick, _, _ = _run_slot(slot, agent.params, obs, hand, eps=0.0, key_seed=11)
    assert pick == host_pick


def test_dqn_eps_one_explores_uniformly():
    agent = DQNVanilla(seed=6)
    obs, hand = _decision_inputs(seed=7)
    _, slot = seat_slot(agent)
    picks = {
        _run_slot(slot, agent.params, obs, hand, eps=1.0, key_seed=k)[0]
        for k in range(40)
    }
    n_legal = int((hand >= 0).sum())
    assert picks <= set(range(n_legal)) and len(picks) > 3


def test_acer_behavior_log_probs_match_host_vector():
    agent = BatchedACERAgent(seed=8)
    obs, hand = _decision_inputs(seed=9)
    host_lp, _ = actor_critic_heads(agent.spec, agent.params, jnp.asarray(obs), jnp.asarray(hand))
    _, slot = seat_slot(agent)
    pick, logp, vec = _run_slot(slot, agent.params, obs, hand)
    np.testing.assert_array_equal(vec, np.asarray(host_lp))
    assert logp == float(host_lp[pick])
    assert int(hand[pick]) >= 0  # sampled a legal slot


def test_reinforce_ai_logp_matches_host_math():
    agent = BatchedReinforceAgent(seed=10)
    obs, hand = _decision_inputs(seed=11)
    logits = action_in_input_logits(agent.spec, agent.params, jnp.asarray(obs), jnp.asarray(hand))
    host_lp = np.asarray(jax.nn.log_softmax(logits))
    _, slot = seat_slot(agent)
    pick, logp, _ = _run_slot(slot, agent.params, obs, hand)
    assert logp == float(host_lp[pick])
    assert int(hand[pick]) >= 0


def test_reinforce_masked_logp_matches_host_math():
    agent = MaskedReinforceAgent(seed=12)
    obs, hand = _decision_inputs(seed=13)
    mask = np.zeros(CFG.num_cards, bool)
    mask[hand[hand >= 0]] = True
    logits = masked_policy_logits(agent.spec, agent.params, jnp.asarray(obs), jnp.asarray(mask))
    host_lp = np.asarray(jax.nn.log_softmax(logits))
    _, slot = seat_slot(agent)
    pick, logp, _ = _run_slot(slot, agent.params, obs, hand)
    card = int(hand[pick])
    assert card >= 0 and mask[card]
    assert logp == float(host_lp[card])


def test_puct_customed_value_argmax_matches_host():
    agent = PUCTCustomedAgent(seed=14, mc_max=8)
    obs, hand = _decision_inputs(seed=15)
    legal = [int(c) for c in hand if c >= 0]
    host_action, _ = agent._nn_choice(obs, legal)
    role, slot = seat_slot(agent)
    assert role == "learner" and slot.family == "pv"
    pick, logp, _ = _run_slot(slot, agent.params, obs, hand)
    assert int(hand[pick]) == int(host_action)
    lp, _ = _policy_value(agent.spec, agent.params, jnp.asarray(obs), jnp.asarray(hand))
    assert logp == float(lp[pick])


# ---------------------------------------------------------------- integration


def test_device_session_fills_learner_buffers_and_trains():
    np.random.seed(0)
    dqn = DQNVanilla(seed=1, minibatch=64)  # minibatch > block steps: no update
    dqn.train()
    acer = BatchedACERAgent(seed=2, warmup=1000)  # warmup: store only
    acer.train()
    rai = BatchedReinforceAgent(seed=3)
    rai.train()
    params_before = jax.tree.map(np.asarray, rai.params)

    lineup = [dqn, acer, rai, DrunkHamster(seed=4)]
    sess = DeviceBlockSession([lineup, lineup], batch=4)
    scores = sess.play()
    assert len(scores) == 2 and all(s.shape == (4,) for s in scores)

    # DQN: 10 transitions per game, reward-lagged (play.py:52-71).
    assert len(dqn.history) == 20
    _, _, raw = dqn.history.sample(20)
    assert all(0 <= a <= 103 for a in raw["action"])
    # ACER: one 10-step sequence per game with the captured behavior policy.
    # Records use the SequentialHistory twin layout: per-step value lists
    # plus the injected first flags (replay_buffer.py:274-302).
    assert len(acer.history) == 2
    seq = acer.history.rollout(n=1)
    log_probs = np.stack(seq["log_probs"][0])
    assert log_probs.shape == (10, 10)
    assert seq["first"][0] == [True] + [False] * 9
    lp0 = log_probs[0]
    aid0 = int(seq["action_id"][0][0])
    assert np.isfinite(lp0[aid0]) and lp0[aid0] >= -20.0
    # REINFORCE trained at both episode ends: parameters moved.
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(a, b), params_before, rai.params
    )
    assert any(jax.tree.leaves(changed))


def test_device_session_reward_lag_for_learner_seats():
    class RecordingDQN(DQNVanilla):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.calls = []

        def learn(self, **kwargs):
            self.calls.append(kwargs)
            return super().learn(**kwargs)

    np.random.seed(1)
    rec = RecordingDQN(seed=5, minibatch=64)
    rec.train()
    sess = DeviceBlockSession(
        [[rec, DrunkHamster(seed=6), DrunkHamster(seed=7)]], batch=4
    )
    (scores,) = sess.play()
    assert len(rec.calls) == 10
    assert rec.calls[0]["reward"] == 0
    for t, call in enumerate(rec.calls):
        assert call["num_episode"] == 0
        assert call["episode_end"] == call["done"] == (t == 9)
        assert call["action"] in call["legal_actions"]
        if t > 0:
            assert call["reward"] == rec.calls[t - 1]["next_reward"]
    assert sum(int(c["next_reward"]) for c in rec.calls) == int(scores[0])


def test_population_slots_cover_every_family():
    agents = [
        Noisy_D3QN_PRB_NStep(seed=1),
        BatchedACERAgent(seed=2),
        BatchedReinforceAgent(seed=3),
        MaskedReinforceAgent(seed=4),
        PUCTCustomedAgent(seed=5, mc_max=8),
        PUCTAgent(seed=6, mc_max=8),
        DrunkHamster(seed=7),
    ]
    assert device_lineup_eligible(agents[:4])
    fams = {
        seat_slot(a)[1].family
        for a in agents
        if seat_slot(a) is not None and seat_slot(a)[0] == "learner"
    }
    assert fams == {"dqn", "acer", "rai", "rmask", "pv"}


def test_tournament_full_population_runs_on_device():
    """The published-protocol roster (random/D3QN/ACER/MCS/Alpha0.5) is now
    fully device-eligible: no game falls back to the host block driver."""
    from rl6nimmt_tpu.agents.mcs import MCSAgent
    from rl6nimmt_tpu.runtime import block as block_mod
    from rl6nimmt_tpu.tournament import Tournament

    np.random.seed(2)
    t = Tournament(min_players=2, max_players=3)
    t.add_player("random", DrunkHamster(seed=1))
    d3qn = Noisy_D3QN_PRB_NStep(seed=2, n_steps=10, minibatch=4)
    d3qn.train()
    t.add_player("d3qn", d3qn)
    acer = BatchedACERAgent(seed=3, minibatch=2, warmup=5)
    acer.train()
    t.add_player("acer", acer)
    t.add_player("mcs", MCSAgent(seed=4, mc_max=8, mc_per_card=2))
    puct = PUCTAgent(seed=5, mc_max=8, mc_per_card=2)
    puct.train()
    t.add_player("alpha05", puct)

    calls = []
    orig = block_mod.BlockSession.play

    def spy(self):
        calls.append(len(self.lineups))
        return orig(self)

    block_mod.BlockSession.play = spy
    try:
        t.play_device_block(8)
    finally:
        block_mod.BlockSession.play = orig
    assert t.total_games == 8
    assert calls == []  # nothing fell back to the host driver
