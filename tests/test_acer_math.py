"""ACER update math vs a NumPy replica of the reference's flattened recursion.

The reference computes Q_ret over the *concatenated* minibatch stream with
``first``-flag re-initialization (actor_critic.py:195-207); our implementation
decomposes it per sequence (agents/acer.py:acer_qret).  This test feeds both
formulations the same network outputs and asserts identical losses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rl6nimmt_tpu.agents.acer import BatchedACERAgent, actor_critic_heads


def reference_flattened_losses(agent, batch):
    """The reference's ACER losses computed in NumPy over the flattened stream."""
    spec, params, gamma, trunc = agent.spec, agent.params, agent.gamma, agent.truncate
    B, T = batch["state"].shape[:2]

    logp_now, q = [], []
    for b in range(B):
        for t in range(T):
            lp, qs = actor_critic_heads(
                spec, params, jnp.asarray(batch["state"][b, t]),
                jnp.asarray(batch["legal_cards"][b, t]),
            )
            logp_now.append(np.asarray(lp))
            q.append(np.asarray(qs))
    logp_now, q = np.stack(logp_now), np.stack(q)

    # Flatten with validity mask and first flags exactly like the reference
    # stream (first = position 0 of each sequence).
    valid = np.concatenate([np.arange(T) < batch["length"][b] for b in range(B)])
    first = np.concatenate([(np.arange(T) == 0) for _ in range(B)])
    flat = lambda x: np.concatenate([x[b] for b in range(B)])
    aid = flat(batch["action_id"])
    rewards = flat(batch["reward"])
    dones = flat(batch["done"])
    logp_then = flat(batch["log_probs"])

    # Drop padded steps (the reference stream has none).
    logp_now, q = logp_now[valid], q[valid]
    aid, rewards, dones = aid[valid], rewards[valid], dones[valid]
    logp_then, first = logp_then[valid], first[valid]

    n = len(rewards)
    idx = np.arange(n)
    q_a = q[idx, aid]
    logp_now_a = logp_now[idx, aid]
    v = (q * np.exp(logp_now)).sum(1)
    rho = np.exp(logp_now - logp_then)
    rho_a = rho[idx, aid]
    rho_bar = np.minimum(rho_a, trunc)
    corr = np.maximum(1.0 - trunc / rho, 0.0)

    # The reference recursion (actor_critic.py:195-207), verbatim semantics.
    q_ret = v[-1] * (1.0 - dones[-1])
    out = np.zeros(n)
    for i in reversed(range(n)):
        q_ret = rewards[i] + gamma * q_ret
        out[i] = q_ret
        q_ret = rho_bar[i] * (q_ret - q_a[i]) + v[i]
        if first[i] and i != 0:
            q_ret = v[i - 1] * (1.0 - dones[i - 1])
    q_ret = out

    actor = (-rho_bar * logp_now_a * (q_ret - v)).mean()
    correction = (
        (-corr * np.exp(logp_then) * logp_now * (q - v[:, None])).sum(1).mean()
    )
    diff = q_a - q_ret
    huber = np.where(np.abs(diff) < 1.0, 0.5 * diff**2, np.abs(diff) - 0.5)
    critic = agent.critic_weight * huber.mean()
    return actor, correction, critic


def test_acer_train_step_matches_reference_recursion():
    agent = BatchedACERAgent(seed=0, hidden_sizes=(16,))
    agent.train()
    rng = np.random.RandomState(0)
    B, T, H, S = 3, 10, 10, 47

    lengths = np.asarray([10, 4, 7], np.int32)
    batch_np = {
        "state": rng.randn(B, T, S).astype(np.float32) * 5,
        "legal_cards": np.sort(
            np.stack([rng.choice(104, H, replace=False) for _ in range(B * T)])
            .reshape(B, T, H).astype(np.int32), axis=2,
        ),
        "log_probs": np.log(rng.dirichlet(np.ones(H), size=(B, T)).astype(np.float32)),
        "action_id": rng.randint(0, H, (B, T)).astype(np.int32),
        "reward": rng.randn(B, T).astype(np.float32),
        "done": np.zeros((B, T), np.float32),
        "length": lengths,
    }
    batch_np["done"][0, 9] = 1.0  # sequence 0 ends its episode

    expected = reference_flattened_losses(agent, batch_np)

    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, _, (actor, correction, critic) = agent._train_step(
        agent.params, agent.opt_state, batch
    )
    np.testing.assert_allclose(float(actor), expected[0], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(correction), expected[1], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(critic), expected[2], rtol=2e-4, atol=1e-5)


def test_packed_train_step_matches_default_on_aligned_sequences():
    """packed_rows=True == default train step to float round-off when every
    sequence is a full aligned episode (step t: H-t live leading slots)."""
    import jax
    import jax.numpy as jnp
    import optax

    from rl6nimmt_tpu.agents.acer import make_acer_train_step
    from rl6nimmt_tpu.nets import MLPSpec, mlp_init

    B, T, H, S = 6, 10, 10, 47
    spec = MLPSpec(input_size=1 + S, hidden_sizes=(16,), head_sizes=(1, 1))
    params = mlp_init(jax.random.key(0), spec)
    optimizer = optax.sgd(1e-2)  # linear in the gradient (cf. test_dp_sync)
    opt_state = optimizer.init(params)

    rng = np.random.RandomState(3)
    cards = np.full((B, T, H), -1, np.int32)
    for b in range(B):
        hand = np.sort(rng.choice(104, size=H, replace=False))
        for t in range(T):
            cards[b, t, : H - t] = hand[t:]  # aligned: live rows lead
    logits = rng.randn(B, T, H).astype(np.float32)
    log_probs = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)
    batch = {
        "state": jnp.asarray(rng.randn(B, T, S).astype(np.float32)),
        "legal_cards": jnp.asarray(cards),
        "log_probs": jnp.asarray(log_probs),
        "action_id": jnp.asarray(
            np.stack([[rng.randint(0, H - t) for t in range(T)] for _ in range(B)]).astype(np.int32)
        ),
        "reward": jnp.asarray(rng.randn(B, T).astype(np.float32)),
        "done": jnp.asarray((rng.random((B, T)) < 0.1).astype(np.float32)),
        "length": jnp.full((B,), T, jnp.int32),
    }

    default = jax.jit(make_acer_train_step(spec, optimizer))
    packed = jax.jit(make_acer_train_step(spec, optimizer, packed_rows=True))
    p1, o1, l1 = default(params, opt_state, batch)
    p2, o2, l2 = packed(params, opt_state, batch)
    for a, b_ in zip(l1, l2):
        np.testing.assert_allclose(float(a), float(b_), rtol=1e-5, atol=1e-7)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-7)
