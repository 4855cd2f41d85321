"""Determinism guarantees: same keys -> bit-identical runs (race detection)."""

import jax
import numpy as np
import optax

from rl6nimmt_tpu.agents import BatchedACERAgent
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import MLPSpec, mlp_init
from rl6nimmt_tpu.runtime.vector import make_random_rollout, make_reinforce_train_step


CFG = EnvConfig(num_players=4)


def test_random_rollout_is_deterministic():
    rollout = make_random_rollout(CFG, num_games=32)
    _, t1, c1 = rollout(jax.random.key(9))
    _, t2, c2 = rollout(jax.random.key(9))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert float(c1) == float(c2)


def test_train_step_is_deterministic():
    spec = MLPSpec(input_size=CFG.state_length + 1, hidden_sizes=(16,), head_sizes=(1,))
    params = mlp_init(jax.random.key(0), spec)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    train = make_reinforce_train_step(CFG, spec, optimizer, num_games=8)
    p1, _, m1 = train(params, opt_state, jax.random.key(1))
    p2, _, m2 = train(params, opt_state, jax.random.key(1))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["loss"]) == float(m2["loss"])


def test_actor_critic_evaluate_api():
    """Reference evaluate() parity: padded (log_probs, qs) for a batch."""
    agent = BatchedACERAgent(seed=0, hidden_sizes=(16,))
    states = [np.random.RandomState(i).randn(47).astype(np.float32) for i in range(3)]
    legal = [[1, 5, 9], [2, 3], [10, 20, 30, 40]]
    log_probs, qs = agent.evaluate(states, legal)
    log_probs, qs = np.asarray(log_probs), np.asarray(qs)
    assert log_probs.shape == (3, 10) and qs.shape == (3, 10)
    # Padded slots: log_epsilon / 0 (reference a-c.py:92-96).
    assert np.allclose(log_probs[1, 2:], -20.0)
    assert np.allclose(qs[1, 2:], 0.0)
    # Legal slots form a distribution (up to the -20 clamp).
    assert abs(np.exp(log_probs[0, :3]).sum() - 1.0) < 1e-3
