"""Fused act-rollout kernel (ops/act_rollout_kernel.py).

TPU-gated like the other Mosaic-kernel suites (RL6_TEST_TPU=1 on a TPU
host).  The kernel deals from the hardware PRNG, so there is no key-for-key
XLA trajectory twin; correctness is pinned by

(a) exact structural invariants (every chosen action is in the acting
    seat's pre-turn hand, hand counts decrement, terminal hands empty,
    rewards non-positive),
(b) EXACT deal parity with ``make_deal_kernel`` (shared PRNG stream), and
(c) action/score agreement with the XLA greedy act path replayed on those
    same deals with the same effective weights -- measured at exactly
    1.000000 across seeds (both sides ride the same MXU matmul numerics;
    the assertion allows a 1e-3 disagreement budget for near-tie rounding,
    see the module docstring's dueling-argmax note).

The config-validation tests at the bottom run on every platform.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import draw_mlp_noise, mlp_init, noisy_effective_params

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="compiled Pallas kernel needs TPU; interpret mode is impractically slow",
)

CFG = EnvConfig(num_players=4)
DQN = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                n_steps=10, hidden_sizes=(64,), minibatch=64)
SPEC = q_network_spec(DQN, CFG.state_length, CFG.num_actions)


def _turn_effective(params, key):
    """The per-turn effective weights exactly as the vectorized rollout
    derives them (runtime/vector.py rollout_kernel)."""
    T = CFG.max_turns

    def chain(k, _):
        k, sub = jax.random.split(k)
        return k, sub

    _, subs = lax.scan(chain, key, jnp.arange(T))
    noise_keys = jax.vmap(lambda s: jax.random.split(s, 3)[0])(subs)
    turn_noise = jax.vmap(lambda nk: draw_mlp_noise(SPEC, nk))(noise_keys)
    return jax.vmap(lambda nz: noisy_effective_params(SPEC, params, nz))(turn_noise)


def _play(seed, eff, G):
    from rl6nimmt_tpu.ops.act_rollout_kernel import make_act_rollout_kernel

    play = make_act_rollout_kernel(CFG, G, hidden=SPEC.hidden_sizes[0])
    return jax.tree.map(np.asarray, play(
        seed,
        eff["trunk"][0]["w"], eff["trunk"][0]["b"],
        eff["heads"][1]["w"], eff["heads"][1]["b"],
    ))


@requires_tpu
def test_structural_invariants():
    params = mlp_init(jax.random.key(1), SPEC)
    eff = _turn_effective(params, jax.random.key(42))
    G, T, H = 1024, CFG.max_turns, CFG.hand_size
    obs, actions, rewards = _play(9, eff, G)

    assert obs.shape == (T + 1, G, CFG.num_players, CFG.state_length)
    for t in range(T):
        hand = obs[t, :, :, :H]
        assert np.all((hand >= 0).sum(-1) == H - t)
        assert np.all((hand == actions[t][:, :, None]).any(-1)), f"illegal at t={t}"
    assert np.all(obs[T, :, :, :H] == -1)
    assert np.all(rewards <= 0)


@requires_tpu
def test_agreement_with_xla_greedy_replay():
    """Same deals (shared PRNG stream via make_deal_kernel), same effective
    weights: the XLA masked-Q argmax replay must match the kernel's actions
    and scores (tiny near-tie budget; measured 1.000000).  ONE shared
    implementation (``ops.act_rollout_check``) serves this test AND the
    in-bench line-3 guard, so the two sites cannot drift; exact deal
    parity of the t=0 observations is asserted inside the helper."""
    from rl6nimmt_tpu.ops.act_rollout_check import greedy_replay_agreement

    params = mlp_init(jax.random.key(1), SPEC)
    agree, score_agree = greedy_replay_agreement(
        CFG, DQN, SPEC, params, num_games=1024, seed=7,
        noise_key=jax.random.key(42),
    )
    assert agree > 0.999, f"action agreement {agree}"
    assert score_agree > 0.999, f"score agreement {score_agree}"


@requires_tpu
def test_selfplay_cycle_runs_and_learns():
    """One full DQN cycle on the kernel path: finite loss, params move,
    buffer fills with the kernel's transitions."""
    import optax

    from rl6nimmt_tpu.buffers import per_init
    from rl6nimmt_tpu.runtime.vector import (
        dqn_replay_example,
        make_dqn_selfplay_step,
    )

    G = 1024
    params = mlp_init(jax.random.key(1), SPEC)
    target = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    buf = per_init(200_000, dqn_replay_example(CFG, compact=True))
    cycle = make_dqn_selfplay_step(
        CFG, DQN, optimizer, G, learn_iters=8, pallas_act_rollout=True
    )
    p2, t2, o2, b2, metrics = cycle(params, target, opt_state, buf,
                                    jax.random.key(5), 0.1)
    assert np.isfinite(float(metrics["loss"]))
    assert float(b2.size) == G * CFG.max_turns * CFG.num_players
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params))
    )
    assert -15.0 < float(metrics["mean_score"]) < -5.0


def test_config_validation():
    """The kernel path rejects configs whose act semantics it cannot honor
    (runs on every platform -- validation happens before any compile)."""
    import optax

    from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step

    eps_greedy = dataclasses.replace(DQN, noisy=False)
    with pytest.raises(ValueError, match="noisy"):
        make_dqn_selfplay_step(CFG, eps_greedy, optax.adam(1e-3), 1024,
                               pallas_act_rollout=True)
    deep = dataclasses.replace(DQN, hidden_sizes=(64, 64))
    with pytest.raises(ValueError, match="hidden"):
        make_dqn_selfplay_step(CFG, deep, optax.adam(1e-3), 1024,
                               pallas_act_rollout=True)


@requires_tpu
def test_feature_major_kernel_outputs_match_row_major():
    """feature_major=True is a pure relabeling: same seed -> identical deals,
    actions, rewards, and observations, just in the native [S, (T+1)*P, G] /
    [T*P, G] layout (games stay on lanes; zero transposes)."""
    from rl6nimmt_tpu.ops.act_rollout_kernel import make_act_rollout_kernel

    params = mlp_init(jax.random.key(1), SPEC)
    eff = _turn_effective(params, jax.random.key(42))
    G, T, P, S = 1024, CFG.max_turns, CFG.num_players, CFG.state_length
    args = (7, eff["trunk"][0]["w"], eff["trunk"][0]["b"],
            eff["heads"][1]["w"], eff["heads"][1]["b"])

    rm = make_act_rollout_kernel(CFG, G, hidden=SPEC.hidden_sizes[0])
    fm = make_act_rollout_kernel(CFG, G, hidden=SPEC.hidden_sizes[0],
                                 feature_major=True)
    obs_rm, act_rm, rew_rm = jax.tree.map(np.asarray, rm(*args))
    obs_fm, act_fm, rew_fm = jax.tree.map(np.asarray, fm(*args))

    assert obs_fm.shape == (S, (T + 1) * P, G)
    assert act_fm.shape == rew_fm.shape == (T * P, G)
    # fm[f, t*P+p, g] == rm[t, g, p, f]
    np.testing.assert_array_equal(
        obs_fm.reshape(S, T + 1, P, G).transpose(1, 3, 2, 0), obs_rm
    )
    np.testing.assert_array_equal(
        act_fm.reshape(T, P, G).transpose(0, 2, 1), act_rm
    )
    np.testing.assert_array_equal(
        rew_fm.reshape(T, P, G).transpose(0, 2, 1), rew_rm
    )


@requires_tpu
def test_feature_major_selfplay_cycle_runs_and_learns():
    """The fm cycle on the kernel path (bench line 3 configuration with
    feature-major replay): finite loss, params move, buffer fills."""
    import optax

    from rl6nimmt_tpu.buffers import per_init_fm
    from rl6nimmt_tpu.runtime.vector import (
        dqn_replay_example,
        make_dqn_selfplay_step,
    )

    G = 1024
    params = mlp_init(jax.random.key(1), SPEC)
    target = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    buf = per_init_fm(200_000, dqn_replay_example(CFG, compact=True))
    cycle = make_dqn_selfplay_step(
        CFG, DQN, optimizer, G, learn_iters=8, pallas_act_rollout=True,
        feature_major=True,
    )
    p2, t2, o2, b2, metrics = cycle(params, target, opt_state, buf,
                                    jax.random.key(5), 0.1)
    assert np.isfinite(float(metrics["loss"]))
    assert float(b2.size) == G * CFG.max_turns * CFG.num_players
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params))
    )
    assert -15.0 < float(metrics["mean_score"]) < -5.0


@requires_tpu
def test_kernel_insert_planes_match_fm_harvest():
    """The direct-insert kernel's storage planes EXACTLY equal the values
    the fm harvest (to_transitions_fm math) produces from the fm rollout
    kernel on the same seed -- states/actions/done bit-equal under the
    explicit (tile, t, p, g) column mapping, n-step rewards allclose
    (float reassociation of the discounted sums)."""
    from rl6nimmt_tpu.ops.act_rollout_check import insert_planes_agreement
    from rl6nimmt_tpu.ops.act_rollout_kernel import TILE

    params = mlp_init(jax.random.key(1), SPEC)
    T, P = CFG.max_turns, CFG.num_players
    insert_planes_agreement(
        CFG, DQN, SPEC, params, num_games=2048, capacity=T * P * TILE * 3,
        seed=7, ptr=T * P * TILE,  # nonzero ptr: modular mapping exercised
        noise_key=jax.random.key(42),
    )


@requires_tpu
def test_kernel_insert_cycle_runs_and_learns():
    """Full DQN cycle on the direct-insert path: finite loss, params move,
    ring bookkeeping advances, buffer wraps correctly over two cycles."""
    import optax

    from rl6nimmt_tpu.buffers import per_init_kd
    from rl6nimmt_tpu.ops.act_rollout_kernel import S_PAD, SCAL_ROWS, TILE
    from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step

    G = 1024
    n = CFG.max_turns * CFG.num_players * G
    CAP = CFG.max_turns * CFG.num_players * TILE * 3  # wraps on cycle 3
    params = mlp_init(jax.random.key(1), SPEC)
    target = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    buf = per_init_kd(CAP, S_PAD, SCAL_ROWS)
    cycle = make_dqn_selfplay_step(CFG, DQN, optimizer, G, learn_iters=8,
                                   kernel_insert=True)
    c = (params, target, opt_state, buf)
    for i in range(4):
        *c, metrics = cycle(*c, jax.random.key(5 + i), 0.1)
        assert np.isfinite(float(metrics["loss"])), i
        assert -15.0 < float(metrics["mean_score"]) < -5.0, i
    b = c[3]
    assert int(b.size) == CAP  # 4n > CAP: saturated
    assert int(b.ptr) == (4 * n) % CAP
    assert any(
        not np.array_equal(np.asarray(a_), np.asarray(b_))
        for a_, b_ in zip(jax.tree.leaves(c[0]), jax.tree.leaves(params))
    )


def test_kernel_insert_validation():
    """Config validation for the direct-insert path (every platform)."""
    import optax

    from rl6nimmt_tpu.ops.act_rollout_kernel import make_act_insert_kernel
    from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step

    short_n = dataclasses.replace(DQN, n_steps=3)
    with pytest.raises(ValueError, match="n_steps"):
        make_dqn_selfplay_step(CFG, short_n, optax.adam(1e-3), 1024,
                               kernel_insert=True)
    with pytest.raises(ValueError, match="subsumes"):
        make_dqn_selfplay_step(CFG, DQN, optax.adam(1e-3), 1024,
                               kernel_insert=True, pallas_act_rollout=True)
    with pytest.raises(ValueError, match="capacity"):
        make_act_insert_kernel(CFG, 1024, 64, 200_000, 0.99, 10)
