"""Pallas turn-resolution kernel vs the reference engine step (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl6nimmt_tpu.engine import EnvConfig, deal, step
from rl6nimmt_tpu.ops.step_kernel import make_turn_resolver


@pytest.mark.parametrize("num_players", [4])
def test_kernel_matches_engine_step(num_players):
    cfg = EnvConfig(num_players=num_players)
    G = 128
    deal_b = jax.vmap(functools.partial(deal, cfg))
    step_b = jax.jit(jax.vmap(functools.partial(step, cfg)))
    resolver = make_turn_resolver(cfg, G, interpret=True)

    key = jax.random.key(0)
    state = deal_b(jax.random.split(key, G))

    rng = np.random.RandomState(1)
    for turn in range(3):  # interpret mode is slow; 3 turns cover captures
        # Random legal actions per seat.
        hs = np.asarray(state.hands_sorted)
        counts = (hs >= 0).sum(axis=2)
        picks = (rng.random(counts.shape) * counts).astype(np.int64)
        actions = np.take_along_axis(hs, picks[..., None], axis=2)[..., 0]
        actions = jnp.asarray(actions, jnp.int32)

        k_board, k_len, k_rewards = resolver(state.board, state.row_len, actions)
        state, e_rewards = step_b(state, actions)

        np.testing.assert_array_equal(np.asarray(k_board), np.asarray(state.board),
                                      err_msg=f"board turn {turn}")
        np.testing.assert_array_equal(np.asarray(k_len), np.asarray(state.row_len))
        np.testing.assert_array_equal(np.asarray(k_rewards), np.asarray(e_rewards))
