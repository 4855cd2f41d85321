"""Shared correctness check for the fused act-rollout kernel.

ONE implementation of the kernel-vs-XLA greedy-replay agreement protocol,
imported by both the TPU-gated suite (``tests/test_act_rollout.py``) and
the in-bench guard (``bench.py:verify_act_rollout_exactness``) so the two
sites cannot drift (they were near-verbatim copies before round 5's
review pass).

Protocol: the kernel plays full greedy games from its hardware-PRNG
deals; ``make_deal_kernel`` reproduces those exact deals (shared PRNG
stream convention, ops/game_kernel.py), which seed the XLA engine; the
XLA masked-Q argmax path (reference act semantics, dqn.py:196-230)
replays the same turns with the same per-turn effective weights.  Checks:

* EXACT deal parity of the t=0 observations (by construction; asserted);
* action agreement and final-score agreement fractions (returned; the
  callers gate on > 0.999 -- measured 1.000000, the budget covers
  float-rounding of dueling near-ties, see the kernel module docstring).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..agents.dqn import DQNConfig, q_values
from ..engine.env import observe, step
from ..engine.state import EnvConfig, EnvState
from ..nets import MLPSpec, draw_mlp_noise, noisy_effective_params


def turn_effective_weights(spec: MLPSpec, params, key, num_turns: int = 10):
    """Per-turn effective weights exactly as the vectorized rollout derives
    them (runtime/vector.py rollout_kernel's key schedule)."""
    T = num_turns

    def chain(k, _):
        k, sub = jax.random.split(k)
        return k, sub

    _, subs = lax.scan(chain, key, jnp.arange(T))
    noise_keys = jax.vmap(lambda s: jax.random.split(s, 3)[0])(subs)
    turn_noise = jax.vmap(lambda nk: draw_mlp_noise(spec, nk))(noise_keys)
    return jax.vmap(lambda nz: noisy_effective_params(spec, params, nz))(turn_noise)


def greedy_replay_agreement(
    cfg: EnvConfig,
    dqn_cfg: DQNConfig,
    spec: MLPSpec,
    params,
    num_games: int,
    seed: int,
    noise_key,
) -> Tuple[float, float]:
    """Play ``num_games`` in the kernel, replay them in XLA, return the
    (action agreement, score agreement) fractions.  Asserts exact deal
    parity of the initial observations as a precondition."""
    from .act_rollout_kernel import make_act_rollout_kernel
    from .game_kernel import make_deal_kernel

    G, P = num_games, cfg.num_players
    eff = turn_effective_weights(spec, params, noise_key)
    adv_head = 1 if dqn_cfg.dueling else 0
    play = make_act_rollout_kernel(cfg, G, hidden=spec.hidden_sizes[0])
    obs, actions, rewards = jax.tree.map(np.asarray, play(
        seed,
        eff["trunk"][0]["w"], eff["trunk"][0]["b"],
        eff["heads"][adv_head]["w"], eff["heads"][adv_head]["b"],
    ))

    board_d, len_d, hands_d = make_deal_kernel(cfg, G)(seed)
    gi = jnp.arange(G)[:, None, None]
    pi = jnp.arange(P)[None, :, None]
    valid = hands_d >= 0
    hands_mask = jnp.zeros((G, P, cfg.num_cards), bool).at[
        gi, pi, jnp.where(valid, hands_d, 0)
    ].set(valid)
    state = EnvState(
        board=board_d.astype(jnp.int32), row_len=len_d.astype(jnp.int32),
        hands=hands_mask, hands_sorted=hands_d.astype(jnp.int32),
        scores=jnp.zeros((G, P), jnp.int32), turn=jnp.zeros((G,), jnp.int32),
    )
    # deal parity is EXACT by construction (shared stream) -- assert it
    np.testing.assert_array_equal(
        np.asarray(jax.vmap(functools.partial(observe, cfg))(state)[0]),
        np.asarray(obs[0], np.float32),
    )

    eff_spec = dataclasses.replace(spec, noisy=False)
    step_b = jax.vmap(functools.partial(step, cfg))
    obs_b = jax.vmap(functools.partial(observe, cfg))

    @jax.jit
    def replay(state, eff):
        def turn(st, eff_t):
            o, masks = obs_b(st)
            q = q_values(dqn_cfg, eff_spec, eff_t, o)
            acts = jnp.argmax(jnp.where(masks, q, -1e9), axis=-1).astype(jnp.int32)
            st, _ = step_b(st, acts)
            return st, acts

        st, acts = lax.scan(turn, state, eff)
        return acts, -st.scores

    xla_actions, xla_scores = jax.tree.map(np.asarray, replay(state, eff))
    action_agree = float((xla_actions == actions).mean())
    score_agree = float((np.asarray(xla_scores) == rewards.sum(0)).mean())
    return action_agree, score_agree


def insert_planes_agreement(cfg: EnvConfig, dqn_cfg: DQNConfig,
                            spec: MLPSpec, params, num_games: int,
                            capacity: int, seed: int, ptr: int,
                            noise_key, gamma: float = 0.99) -> None:
    """Verify the direct-insert kernel's storage planes against the fm
    rollout kernel's trajectory on the SAME seed: states / next-states /
    actions / done bit-equal under the explicit (tile, t, p, g) column
    mapping, n-step rewards allclose (float reassociation only).  Raises
    on any mismatch.  Shared by the TPU-gated suite and the in-bench
    line-3 guard (one implementation, no drift)."""
    from .act_rollout_kernel import (
        S_PAD,
        SCAL_ROWS,
        TILE,
        make_act_insert_kernel,
        make_act_rollout_kernel,
    )

    G, T, P, S = num_games, cfg.max_turns, cfg.num_players, cfg.state_length
    eff = turn_effective_weights(spec, params, noise_key, T)
    adv = 1 if dqn_cfg.dueling else 0
    args = (eff["trunk"][0]["w"], eff["trunk"][0]["b"],
            eff["heads"][adv]["w"], eff["heads"][adv]["b"])

    ins = make_act_insert_kernel(cfg, G, spec.hidden_sizes[0], capacity,
                                 gamma, dqn_cfg.n_steps)
    st, nx, sc, rew = jax.tree.map(np.asarray, ins(
        seed, ptr, *args,
        jnp.zeros((S_PAD, capacity), jnp.int8),
        jnp.zeros((S_PAD, capacity), jnp.int8),
        jnp.zeros((SCAL_ROWS, capacity), jnp.float32),
    ))
    play = make_act_rollout_kernel(cfg, G, spec.hidden_sizes[0],
                                   feature_major=True)
    obs_fm, act_fm, rew_fm = jax.tree.map(np.asarray, play(seed, *args))
    np.testing.assert_array_equal(rew.reshape(T * P, G), rew_fm)

    n_steps = dqn_cfg.n_steps
    obs_r = obs_fm.reshape(S, T + 1, P, G)
    lag = np.zeros((T, P, G), np.float32)
    lag[1:] = rew_fm.reshape(T, P, G).astype(np.float32)[:-1]
    disc = gamma ** np.arange(n_steps)
    pad = np.concatenate([lag, np.zeros((n_steps - 1, P, G), np.float32)], 0)
    R = sum(disc[i] * pad[i : i + T] for i in range(n_steps))
    acts = act_fm.reshape(T, P, G)
    tail_start = (T - n_steps + 1) if n_steps > 1 else (T - 1)
    cap_blk = capacity // TILE
    for tile in range(G // TILE):
        base = (ptr // TILE + tile * T * P) % cap_blk
        gs = slice(tile * TILE, (tile + 1) * TILE)
        for t in range(T):
            for p in range(P):
                c0 = (base + t * P + p) * TILE
                cols = slice(c0, c0 + TILE)
                np.testing.assert_array_equal(st[:S, cols], obs_r[:, t, p, gs])
                np.testing.assert_array_equal(nx[:S, cols], obs_r[:, T, p, gs])
                np.testing.assert_array_equal(sc[1, cols], acts[t, p, gs])
                np.testing.assert_array_equal(
                    sc[2, cols],
                    np.full(TILE, 1.0 if t >= tail_start else 0.0, np.float32),
                )
                np.testing.assert_allclose(sc[0, cols], R[t, p, gs], atol=1e-3)
    # storage invariants: pad rows stay zero
    assert np.all(st[S:] == 0) and np.all(nx[S:] == 0) and np.all(sc[3:] == 0)
