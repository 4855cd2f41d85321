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
