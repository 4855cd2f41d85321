"""Small TPU-friendly op replacements.

Gather-style primitives (``take_along_axis``, fancy indexing, table lookups)
lower to slow serialized paths on TPU; for the small trailing axes this
framework uses (hand slots H=10, actions C=104, rows R=4) a one-hot
select-and-reduce is far faster and fuses into neighboring elementwise work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def uniform_index(key, count: jnp.ndarray) -> jnp.ndarray:
    """Uniform integer draw in ``[0, count)`` per element, one uniform each.

    ``floor(u * count)`` with a defensive clamp to ``count - 1``: JAX's
    float32 uniform tops out at ``1 - 2**-24`` today, but that invariant is
    backend-sensitive (a draw within half an ulp of 1.0 times a power-of-two
    count would round up to ``count`` and select an out-of-range slot).  The
    clamp is free on TPU and makes the legality invariant explicit.  Rows
    with ``count == 0`` return 0, matching the unclamped expression.
    """
    r = jnp.floor(jax.random.uniform(key, jnp.shape(count)) * count).astype(jnp.int32)
    return jnp.minimum(r, jnp.maximum(count - 1, 0).astype(jnp.int32))


def onehot_select(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``x[..., idx]`` along the last axis via one-hot sum.

    ``x: [..., N]``, ``idx: [...]`` (same leading shape) -> ``[...]``.
    Equivalent to ``take_along_axis(x, idx[..., None], -1)[..., 0]`` for
    in-range indices, with no gather.
    """
    iota = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.sum(jnp.where(iota == idx[..., None], x, 0), axis=-1)


def pmean_fused(tree, axis_name):
    """``lax.pmean`` of a whole pytree as ONE collective.

    Ravels the tree into a single flat vector before the reduction instead
    of issuing one tiny all-reduce per leaf -- the DP DQN cycle's 8 updates
    otherwise emit ~100 sequential sub-KB all-reduces per cycle, pure
    interconnect latency (VERDICT r3 #2; measured on the 2-process Gloo
    proxy in experiments/multiprocess_dp.py).  Elementwise identical to
    per-leaf pmeans: the reduction applies the same mean per element
    regardless of concatenation.  All leaves must share a dtype (f32 here;
    ``ravel_pytree`` would otherwise promote).
    """
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(tree)
    return unravel(lax.pmean(flat, axis_name))
