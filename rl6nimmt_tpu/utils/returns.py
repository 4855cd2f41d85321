"""Return computations (reference various.py:41-50, rebuilt as lax scans)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def discounted_returns(rewards: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Reverse-scan discounted return: ``G_t = r_t + gamma * G_{t+1}``."""
    def body(carry, r):
        g = r + gamma * carry
        return g, g

    _, returns = lax.scan(body, jnp.zeros((), rewards.dtype), rewards, reverse=True)
    return returns
