"""Numerical tests of the fused learner steps against NumPy replicas.

Validates the Bellman target / IS weighting / soft-update logic of the DQN
learn step and the REINFORCE episode loss by recomputing them step-by-step in
NumPy from the same network forwards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl6nimmt_tpu.agents.dqn import DQNConfig, make_learn_step, q_network_spec, q_values
from rl6nimmt_tpu.agents.reinforce import (
    action_in_input_logits,
    log_probs_and_entropy,
    reinforce_loss,
)
from rl6nimmt_tpu.nets import MLPSpec, mlp_init


def make_batch(rng, n, s):
    return {
        "state": jnp.asarray(rng.randn(n, s).astype(np.float32)),
        "action": jnp.asarray(rng.randint(0, 104, n).astype(np.int32)),
        "reward": jnp.asarray(rng.randn(n).astype(np.float32)),
        "next_state": jnp.asarray(rng.randn(n, s).astype(np.float32)),
        "done": jnp.asarray((rng.random(n) < 0.3).astype(np.float32)),
        "weights": jnp.asarray(rng.random(n).astype(np.float32) + 0.5),
    }


def test_dqn_vanilla_loss_matches_numpy():
    cfg = DQNConfig(hidden_sizes=(16,), minibatch=8)
    spec = q_network_spec(cfg, 47, 104)
    params = mlp_init(jax.random.key(0), spec)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    rng = np.random.RandomState(0)
    batch = make_batch(rng, 8, 47)

    learn = make_learn_step(cfg, spec, optimizer, gamma=0.99)
    _, _, _, loss, abs_err, q_target = learn(params, None, opt_state, batch, False, jax.random.key(1))

    q = np.asarray(q_values(cfg, spec, params, batch["state"]))
    q_next = np.asarray(q_values(cfg, spec, params, batch["next_state"]))
    q_eval = q[np.arange(8), np.asarray(batch["action"])]
    target = np.asarray(batch["reward"]) + 0.99 * q_next.max(1) * (1 - np.asarray(batch["done"]))
    expected_err = np.abs(q_eval - target)
    expected_loss = np.mean((q_eval - target) ** 2)  # non-PER path: plain MSE
    np.testing.assert_allclose(float(loss), expected_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(abs_err), expected_err, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(q_target), target, rtol=1e-4)


def test_double_dqn_target_and_soft_update():
    cfg = DQNConfig(double=True, per=True, hidden_sizes=(16,), minibatch=8, tau=0.1)
    spec = q_network_spec(cfg, 47, 104)
    params = mlp_init(jax.random.key(2), spec)
    target_params = mlp_init(jax.random.key(3), spec)  # deliberately different
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    rng = np.random.RandomState(1)
    batch = make_batch(rng, 8, 47)

    learn = make_learn_step(cfg, spec, optimizer, gamma=0.9)
    new_params, new_target, _, loss, abs_err, _ = learn(
        params, target_params, opt_state, batch, True, jax.random.key(4)
    )

    q = np.asarray(q_values(cfg, spec, params, batch["state"]))
    q_eval = q[np.arange(8), np.asarray(batch["action"])]
    ql = np.asarray(q_values(cfg, spec, params, batch["next_state"]))
    qt = np.asarray(q_values(cfg, spec, target_params, batch["next_state"]))
    idx = ql.argmax(1)
    boot = qt[np.arange(8), idx]
    target = np.asarray(batch["reward"]) + (0.9**1) * boot * (1 - np.asarray(batch["done"]))
    expected_loss = np.mean(np.asarray(batch["weights"]) * (q_eval - target) ** 2)
    np.testing.assert_allclose(float(loss), expected_loss, rtol=1e-5)

    # Soft update: theta' = tau * theta_new + (1 - tau) * theta_old.
    for new_t, old_t, new_l in zip(
        jax.tree.leaves(new_target), jax.tree.leaves(target_params), jax.tree.leaves(new_params)
    ):
        np.testing.assert_allclose(
            np.asarray(new_t), 0.1 * np.asarray(new_l) + 0.9 * np.asarray(old_t), rtol=1e-5
        )


def test_no_soft_update_when_flag_false():
    cfg = DQNConfig(double=True, hidden_sizes=(8,), minibatch=4)
    spec = q_network_spec(cfg, 47, 104)
    params = mlp_init(jax.random.key(5), spec)
    target_params = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    batch = make_batch(np.random.RandomState(2), 4, 47)
    learn = make_learn_step(cfg, spec, optimizer, gamma=0.99)
    _, new_target, _, _, _, _ = learn(params, target_params, opt_state, batch, False, jax.random.key(6))
    for a, b in zip(jax.tree.leaves(new_target), jax.tree.leaves(target_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reinforce_episode_loss_matches_numpy():
    spec = MLPSpec(input_size=48, hidden_sizes=(16,), head_sizes=(1,))
    params = mlp_init(jax.random.key(7), spec)
    T = 5
    rng = np.random.RandomState(3)
    states = rng.randn(T, 47).astype(np.float32) * 10
    cards = np.sort(rng.choice(104, size=(T, 10), replace=False).astype(np.int32), axis=1)
    chosen = rng.randint(0, 10, T).astype(np.int32)
    rewards = rng.randn(T).astype(np.float32)
    batch = {
        "state": jnp.asarray(states),
        "legal_cards": jnp.asarray(cards),
        "chosen": jnp.asarray(chosen),
        "reward": jnp.asarray(rewards),
    }

    def logits_fn(p, b):
        return jax.vmap(lambda s, c: action_in_input_logits(spec, p, s, c))(
            b["state"], b["legal_cards"]
        )

    gamma = 0.99
    loss, (actor, ent) = reinforce_loss(logits_fn, params, batch, gamma, 1.0, 0.5)

    logits = np.asarray(logits_fn(params, batch))
    logp = logits - np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1, keepdims=True)) - logits.max(1, keepdims=True)
    # stable log-softmax in numpy
    m = logits.max(1, keepdims=True)
    logp = logits - (m + np.log(np.exp(logits - m).sum(1, keepdims=True)))
    p = np.exp(logp)
    entropy = -(p * np.where(p > 0, logp, 0)).sum(1)
    chosen_logp = logp[np.arange(T), chosen]
    returns = np.zeros(T)
    g = 0.0
    for t in reversed(range(T)):
        g = rewards[t] + gamma * g
        returns[t] = g
    expected_actor = -np.sum(gamma ** np.arange(T) * returns * chosen_logp)
    expected_ent = -np.sum(entropy)
    np.testing.assert_allclose(float(actor), expected_actor, rtol=1e-4)
    np.testing.assert_allclose(float(ent), expected_ent, rtol=1e-4)
    np.testing.assert_allclose(float(loss), expected_actor + 0.5 * expected_ent, rtol=1e-4)
