"""Pallas turn-resolution kernel vs the engine step.

Runs compiled on a real TPU; skipped on CPU (the Pallas interpreter is far
too slow for this fully-unrolled kernel).  To exercise it manually on a TPU
host: run this file without the conftest CPU pin, e.g. via
``python tests/standalone_step_kernel_check.py`` style drives.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl6nimmt_tpu.engine import EnvConfig, deal, step

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="compiled Pallas kernel needs TPU; interpret mode is impractically slow",
)


@requires_tpu
@pytest.mark.parametrize("num_players", [2, 4])
def test_kernel_matches_engine_step(num_players):
    from rl6nimmt_tpu.ops.step_kernel import TILE, make_turn_resolver

    cfg = EnvConfig(num_players=num_players)
    G = TILE
    deal_b = jax.vmap(functools.partial(deal, cfg))
    step_b = jax.jit(jax.vmap(functools.partial(step, cfg)))
    resolver = make_turn_resolver(cfg, G)

    state = deal_b(jax.random.split(jax.random.key(0), G))
    rng = np.random.RandomState(1)
    for turn in range(10):
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
