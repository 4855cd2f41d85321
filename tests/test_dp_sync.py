"""Synchronous data-parallelism equivalence proofs.

The DP learner steps (``parallel.mesh.make_dp_dqn_step`` /
``make_dp_acer_step``) pmean gradients *inside* each fused update, so an
N-device step must equal a single-device step on the concatenated global
minibatch.  These tests prove exactly that on the virtual 8-device CPU mesh:
shard a global batch over the mesh, run the axis-named learn step under
``shard_map``, and compare the resulting parameters / opt-state / loss
value-for-value against the plain single-device step on the full batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from rl6nimmt_tpu.agents.acer import make_acer_train_step
from rl6nimmt_tpu.agents.dqn import DQNConfig, make_learn_step, q_network_spec
from rl6nimmt_tpu.nets import MLPSpec, mlp_init
from rl6nimmt_tpu.parallel import make_mesh

S = 47  # state length
H = 10  # hand size


def global_dqn_batch(rng, n):
    return {
        "state": jnp.asarray(rng.randn(n, S).astype(np.float32)),
        "action": jnp.asarray(rng.randint(0, 104, n).astype(np.int32)),
        "reward": jnp.asarray(rng.randn(n).astype(np.float32)),
        "next_state": jnp.asarray(rng.randn(n, S).astype(np.float32)),
        "done": jnp.asarray((rng.random(n) < 0.3).astype(np.float32)),
        "weights": jnp.asarray(rng.random(n).astype(np.float32) + 0.5),
    }


def assert_tree_allclose(a, b, atol=1e-6, rtol=1e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=rtol)


@pytest.mark.parametrize(
    "cfg",
    [
        DQNConfig(hidden_sizes=(16,)),
        DQNConfig(double=True, dueling=True, per=True, hidden_sizes=(16,)),
    ],
    ids=["vanilla", "d3qn_prb"],
)
def test_dqn_dp_step_equals_single_device_on_global_batch(cfg):
    mesh = make_mesh()
    n_dev = mesh.size
    axis = mesh.axis_names[0]
    per_dev = 16
    spec = q_network_spec(cfg, S, 104)
    params = mlp_init(jax.random.key(0), spec)
    target = mlp_init(jax.random.key(1), spec) if cfg.double else None
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    batch = global_dqn_batch(np.random.RandomState(0), n_dev * per_dev)

    # Single device, full global minibatch.
    single = make_learn_step(cfg, spec, optimizer, gamma=0.99)
    p1, t1, o1, loss1, _, _ = single(
        params, target, opt_state, batch, True, jax.random.key(2)
    )

    # N devices, per-device shards, gradient pmean inside the update.
    dp = make_learn_step(cfg, spec, optimizer, gamma=0.99, axis_name=axis)

    def sharded(params, target, opt_state, batch):
        p, t, o, loss, _, _ = dp(params, target, opt_state, batch, True, jax.random.key(2))
        return p, t, o, loss

    mapped = jax.jit(
        jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis)),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )
    pN, tN, oN, lossN = mapped(params, target, opt_state, batch)

    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-6)
    assert_tree_allclose(pN, p1)
    assert_tree_allclose(oN, o1)
    if cfg.double:
        assert_tree_allclose(tN, t1)


def test_acer_dp_train_equals_single_device_on_global_batch():
    mesh = make_mesh()
    n_dev = mesh.size
    axis = mesh.axis_names[0]
    per_dev = 4
    B, T = n_dev * per_dev, 10
    spec = MLPSpec(input_size=1 + S, hidden_sizes=(16,), head_sizes=(1, 1))
    params = mlp_init(jax.random.key(3), spec)
    # SGD keeps the param delta linear in the gradient: Adam's g/(sqrt(v)+eps)
    # amplifies float reduction-order noise without bound on near-zero
    # gradients, which would test numerics rather than the DP semantics.
    optimizer = optax.sgd(1e-2)
    opt_state = optimizer.init(params)

    rng = np.random.RandomState(1)
    cards = np.sort(
        np.stack([rng.choice(104, size=H, replace=False) for _ in range(B * T)]),
        axis=1,
    ).reshape(B, T, H).astype(np.int32)
    logits = rng.randn(B, T, H).astype(np.float32)
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    batch = {
        "state": jnp.asarray(rng.randn(B, T, S).astype(np.float32)),
        "legal_cards": jnp.asarray(cards),
        "log_probs": jnp.asarray(log_probs.astype(np.float32)),
        "action_id": jnp.asarray(rng.randint(0, H, (B, T)).astype(np.int32)),
        "reward": jnp.asarray(rng.randn(B, T).astype(np.float32)),
        "done": jnp.asarray((rng.random((B, T)) < 0.1).astype(np.float32)),
        # Equal lengths: the local per-step weighting then reduces to a plain
        # local mean, making pmean == global mean exact (vectorized self-play
        # always produces full max_turns episodes).
        "length": jnp.full((B,), T, jnp.int32),
    }

    single = jax.jit(make_acer_train_step(spec, optimizer))
    p1, o1, losses1 = single(params, opt_state, batch)

    dp = make_acer_train_step(spec, optimizer, axis_name=axis)
    mapped = jax.jit(
        jax.shard_map(
            dp,
            mesh=mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
    pN, oN, lossesN = mapped(params, opt_state, batch)

    for lN, l1 in zip(lossesN, losses1):
        np.testing.assert_allclose(float(lN), float(l1), atol=1e-6, rtol=1e-5)
    assert_tree_allclose(pN, p1)
    assert_tree_allclose(oN, o1)


def test_dp_dqn_cycle_keeps_params_replicated_bit_identical():
    """Full DP self-play cycle: re-running from identical inputs is
    deterministic, and the out-spec P() collapse is sound because every
    device computes bit-identical params (grad pmean before the update)."""
    from rl6nimmt_tpu.buffers import per_init
    from rl6nimmt_tpu.engine import EnvConfig
    from rl6nimmt_tpu.parallel import make_dp_dqn_step, stack_for_mesh

    cfg_env = EnvConfig(num_players=4)
    mesh = make_mesh()
    dqn_cfg = DQNConfig(double=True, per=True, hidden_sizes=(16,), minibatch=16)
    spec = q_network_spec(dqn_cfg, cfg_env.state_length, cfg_env.num_actions)
    params = mlp_init(jax.random.key(9), spec)
    target = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    example = {
        "state": jnp.zeros(cfg_env.state_length),
        "action": jnp.zeros((), jnp.int32),
        "reward": jnp.zeros(()),
        "next_state": jnp.zeros(cfg_env.state_length),
        "done": jnp.zeros(()),
    }
    buf = stack_for_mesh(per_init(512, example), mesh)
    step = make_dp_dqn_step(cfg_env, dqn_cfg, optimizer, games_per_device=2,
                            mesh=mesh, learn_iters=2)
    keys = jax.random.split(jax.random.key(10), mesh.size)
    out_a = step(params, target, opt_state, buf, keys, jnp.asarray(0.3))
    out_b = step(params, target, opt_state, buf, keys, jnp.asarray(0.3))
    for a, b in zip(jax.tree.leaves(out_a[0]), jax.tree.leaves(out_b[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
