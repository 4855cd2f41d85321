"""Small TPU-friendly op replacements.

Gather-style primitives (``take_along_axis``, fancy indexing, table lookups)
lower to slow serialized paths on TPU; for the small trailing axes this
framework uses (hand slots H=10, actions C=104, rows R=4) a one-hot
select-and-reduce is far faster and fuses into neighboring elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def onehot_select(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``x[..., idx]`` along the last axis via one-hot sum.

    ``x: [..., N]``, ``idx: [...]`` (same leading shape) -> ``[...]``.
    Equivalent to ``take_along_axis(x, idx[..., None], -1)[..., 0]`` for
    in-range indices, with no gather.
    """
    iota = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.sum(jnp.where(iota == idx[..., None], x, 0), axis=-1)
