"""Fully-device matches (runtime/device_match.py)."""

import jax
import numpy as np
import pytest

from rl6nimmt_tpu.engine.state import EnvConfig
from rl6nimmt_tpu.nets import MLPSpec, mlp_init
from rl6nimmt_tpu.runtime.device_match import make_device_match_fn

pytestmark = pytest.mark.heavy  # compile-heavy device suite; run via `pytest -m heavy`



def test_device_match_shapes_and_strength():
    cfg = EnvConfig(num_players=2)
    fn = make_device_match_fn(cfg, ("uniform", "random"), None, num_games=24, mc_max=24)
    scores = np.asarray(fn((None, None), jax.random.key(0)))
    assert scores.shape == (24, 2)
    assert (scores <= 0).all()
    # Determinized MC search must dominate a random seat.
    assert (scores[:, 0] >= scores[:, 1]).mean() > 0.6


def test_device_match_puct_roster_runs():
    cfg = EnvConfig(num_players=3)
    spec = MLPSpec(input_size=cfg.state_length + 1, head_sizes=(1,))
    params = mlp_init(jax.random.key(1), spec)
    fn = make_device_match_fn(
        cfg, ("puct", "uniform", "random"), spec, num_games=4, mc_max=12, batch=4
    )
    scores = np.asarray(fn((params, None, None), jax.random.key(2)))
    assert scores.shape == (4, 3)
    assert np.isfinite(scores).all() and (scores <= 0).all()
    # Different keys -> different matches.
    scores2 = np.asarray(fn((params, None, None), jax.random.key(3)))
    assert not np.array_equal(scores, scores2)


def test_device_match_puct_uniform_decoupled_roster():
    """puct_uniform = PUCT root prior from the net, uniform playout policy
    (the decoupled-prior kind behind experiments/prior_decoupled_eval.py)."""
    cfg = EnvConfig(num_players=2)
    spec = MLPSpec(input_size=cfg.state_length + 1, head_sizes=(1,))
    params = mlp_init(jax.random.key(4), spec)
    fn = make_device_match_fn(
        cfg, ("puct_uniform", "random"), spec, num_games=8, mc_max=12, batch=4
    )
    scores = np.asarray(fn((params, None), jax.random.key(5)))
    assert scores.shape == (8, 2)
    assert np.isfinite(scores).all() and (scores <= 0).all()
    # A searching seat still dominates a random one.
    assert (scores[:, 0] >= scores[:, 1]).mean() > 0.6
