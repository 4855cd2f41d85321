"""Tests for the functional nets: math parity with torch, noisy-layer stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl6nimmt_tpu.nets import (
    MLPSpec,
    dueling_apply,
    mlp_apply,
    mlp_init,
    noisy_linear_apply,
    noisy_linear_init,
    normalize_state,
)


def test_mlp_shapes_and_heads():
    spec = MLPSpec(input_size=47, hidden_sizes=(64, 32), head_sizes=(104, 1))
    params = mlp_init(jax.random.key(0), spec)
    x = jnp.ones((5, 47))
    q, v = mlp_apply(spec, params, x)
    assert q.shape == (5, 104) and v.shape == (5, 1)


def test_mlp_matches_torch_linear_stack():
    """Same weights -> same outputs as a torch MLP (cross-framework check)."""
    torch = pytest.importorskip("torch")
    spec = MLPSpec(input_size=10, hidden_sizes=(16, 8), head_sizes=(3, 1))
    params = mlp_init(jax.random.key(1), spec)
    x = np.random.RandomState(0).randn(4, 10).astype(np.float32)

    h = torch.tensor(x)
    for layer in params["trunk"]:
        lin = torch.nn.Linear(*layer["w"].shape)
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(np.asarray(layer["w"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(layer["b"])))
        h = torch.relu(lin(h))
    t_outs = []
    for layer in params["heads"]:
        lin = torch.nn.Linear(*layer["w"].shape)
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(np.asarray(layer["w"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(layer["b"])))
        t_outs.append(lin(h).detach().numpy())

    j_outs = mlp_apply(spec, params, jnp.asarray(x))
    for t, j in zip(t_outs, j_outs):
        np.testing.assert_allclose(t, np.asarray(j), rtol=1e-5, atol=1e-5)


def test_dueling_aggregation():
    """Q = V + (A - mean(A)): mean over actions of Q equals V."""
    spec = MLPSpec(input_size=47, hidden_sizes=(32,), head_sizes=(1, 104))
    params = mlp_init(jax.random.key(2), spec)
    x = jax.random.normal(jax.random.key(3), (6, 47))
    q = dueling_apply(spec, params, x)
    v, a = mlp_apply(spec, params, x)
    np.testing.assert_allclose(
        np.asarray(jnp.mean(q, axis=-1)), np.asarray(v[:, 0]), rtol=1e-5, atol=1e-5
    )


def test_noisy_linear_zero_sigma_is_linear():
    params = noisy_linear_init(jax.random.key(4), 8, 5, sigma_init=0.5)
    params["sigma_w"] = jnp.zeros_like(params["sigma_w"])
    params["sigma_b"] = jnp.zeros_like(params["sigma_b"])
    x = jax.random.normal(jax.random.key(5), (3, 8))
    noisy = noisy_linear_apply(params, x, jax.random.key(6))
    silent = noisy_linear_apply(params, x, None)
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(silent), rtol=1e-6)


def test_noisy_linear_noise_statistics():
    """Factorized noise: mean ~ deterministic output, nonzero variance."""
    params = noisy_linear_init(jax.random.key(7), 8, 5, sigma_init=0.5)
    x = jnp.ones((1, 8))
    outs = jnp.stack(
        [noisy_linear_apply(params, x, jax.random.key(i))[0] for i in range(300)]
    )
    mean = jnp.mean(outs, axis=0)
    silent = noisy_linear_apply(params, x, None)[0]
    np.testing.assert_allclose(np.asarray(mean), np.asarray(silent), atol=0.15)
    assert float(jnp.std(outs)) > 0.01


def test_noisy_mlp_forward_changes_with_key():
    spec = MLPSpec(input_size=10, hidden_sizes=(16,), head_sizes=(4,), noisy=True)
    params = mlp_init(jax.random.key(8), spec)
    x = jnp.ones((2, 10))
    (a,) = mlp_apply(spec, params, x, key=jax.random.key(1))
    (b,) = mlp_apply(spec, params, x, key=jax.random.key(2))
    (c,) = mlp_apply(spec, params, x, key=None)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(c)))


def test_normalize_state_blocks():
    """Spot-check block scaling against the reference formula (preprocessing.py)."""
    x = np.zeros(47, dtype=np.float32)
    x[:10] = [0, 103, 51.5] + [-1] * 7        # hand block: 0..103 -> [-1, 1]
    x[10] = 4                                  # players: 0..6
    x[11:15] = [1, 5, 3, 1]                    # cards/row: 1..5
    x[15:19] = [0, 103, 0, 0]                  # highest: 0..103
    x[19:23] = [1, 10, 5.5, 1]                 # points/row: 1..10
    y = np.asarray(normalize_state(jnp.asarray(x)))
    np.testing.assert_allclose(y[0], -1.0, rtol=1e-6)
    np.testing.assert_allclose(y[1], 1.0, rtol=1e-6)
    np.testing.assert_allclose(y[2], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[10], -1 + 2 * 4 / 6, rtol=1e-6)
    np.testing.assert_allclose(y[11], -1.0, rtol=1e-6)
    np.testing.assert_allclose(y[12], 1.0, rtol=1e-6)
    np.testing.assert_allclose(y[19], -1.0, rtol=1e-6)
    np.testing.assert_allclose(y[20], 1.0, rtol=1e-6)
    np.testing.assert_allclose(y[21], 0.0, atol=1e-6)


def test_normalize_state_with_action_prefix():
    x = np.zeros(48, dtype=np.float32)
    x[0] = 103  # action card id
    y = np.asarray(normalize_state(jnp.asarray(x), action=True))
    np.testing.assert_allclose(y[0], 1.0, rtol=1e-6)


def test_precomputed_noise_matches_key_draws():
    """draw_mlp_noise/learn_noise reproduce the in-apply key schedule: the
    noise VALUES are bit-identical to what mlp_apply/make_learn_step would
    draw from the same key (the consuming arithmetic may refuse by one ulp
    across program structures on some backends; on TPU the full DQN cycle is
    pinned bit-identical by bench.py's chained-vs-sequential guard)."""
    import jax
    import optax

    from rl6nimmt_tpu.agents.dqn import DQNConfig, learn_noise, q_network_spec
    from rl6nimmt_tpu.nets import MLPSpec, draw_mlp_noise
    from rl6nimmt_tpu.nets.mlp import _factorized_noise

    spec = MLPSpec(input_size=7, hidden_sizes=(5,), head_sizes=(1, 4), noisy=True)
    key = jax.random.key(3)
    noise = draw_mlp_noise(spec, key)
    keys = jax.random.split(key, len(spec.layer_sizes))
    for nz, k, (i, o) in zip(noise, keys, spec.layer_sizes):
        ref = _factorized_noise(k, i, o)
        np.testing.assert_array_equal(np.asarray(nz["eps_in"]), np.asarray(ref["eps_in"]))
        np.testing.assert_array_equal(np.asarray(nz["eps_out"]), np.asarray(ref["eps_out"]))
        assert nz["eps_in"].shape == (i, 1) and nz["eps_out"].shape == (1, o)

    # learn_noise mirrors make_learn_step's split schedule (eval/target,
    # double splits target again) and the noise-path step runs finite.
    cfg = DQNConfig(double=True, dueling=True, noisy=True, hidden_sizes=(5,))
    qspec = q_network_spec(cfg, 7, 11)
    from rl6nimmt_tpu.agents.dqn import make_learn_step
    from rl6nimmt_tpu.nets import mlp_init

    params = mlp_init(jax.random.key(0), qspec)
    target = jax.tree.map(jnp.array, params)
    opt = optax.adam(1e-3)
    step = make_learn_step(cfg, qspec, opt, gamma=0.99)
    batch = {
        "state": jnp.ones((4, 7)),
        "action": jnp.zeros((4,), jnp.int32),
        "reward": jnp.ones((4,)),
        "next_state": jnp.ones((4, 7)),
        "done": jnp.zeros((4,)),
        "weights": jnp.ones((4,)),
    }
    lk = jax.random.key(9)
    p1, t1, o1, loss1, _, _ = step(params, target, opt.init(params), batch, True, lk)
    nz = learn_noise(cfg, qspec, lk)
    p2, t2, o2, loss2, _, _ = step(params, target, opt.init(params), batch, True, lk, noise=nz)
    # Same noise values -> same update up to backend fusion round-off.
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_noisy_effective_params_bit_identical():
    """Collapsing noise into effective weights == the in-apply noisy path,
    bit for bit (same elementwise expressions, same matmul shapes) -- the
    equivalence the vectorized DQN rollout's precomputed-weights act relies
    on (runtime/vector.py:make_dqn_selfplay_step)."""
    import dataclasses

    from rl6nimmt_tpu.nets import (
        MLPSpec,
        draw_mlp_noise,
        mlp_apply,
        mlp_init,
        noisy_effective_params,
    )

    spec = MLPSpec(input_size=47, hidden_sizes=(64,), head_sizes=(1, 104), noisy=True)
    params = mlp_init(jax.random.key(0), spec)
    x = jax.random.normal(jax.random.key(1), (37, 47))

    for seed in range(3):
        key = jax.random.key(10 + seed)
        nz = draw_mlp_noise(spec, key)
        want = mlp_apply(spec, params, x, noise=nz)
        eff = noisy_effective_params(spec, params, nz)
        got = mlp_apply(dataclasses.replace(spec, noisy=False), eff, x)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))

    # And under vmap over stacked noise (how the rollout materializes all
    # T turns' weights in one pass).
    keys = jax.random.split(jax.random.key(2), 5)
    noises = jax.vmap(lambda k: draw_mlp_noise(spec, k))(keys)
    effs = jax.vmap(lambda nz: noisy_effective_params(spec, params, nz))(noises)
    for t in range(5):
        nz_t = jax.tree.map(lambda a: a[t], noises)
        eff_t = jax.tree.map(lambda a: a[t], effs)
        want = mlp_apply(spec, params, x, noise=nz_t)
        got = mlp_apply(dataclasses.replace(spec, noisy=False), eff_t, x)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
