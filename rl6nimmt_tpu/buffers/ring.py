"""Fixed-capacity device-resident ring replay buffer.

Replaces the reference's object-array ``History``
(/root/reference/rl_6_nimmt/utils/replay_buffer.py:206-271).  Instead of a
NumPy array of Python dicts, the buffer is a pytree of preallocated arrays
with a leading capacity axis plus a write pointer -- every operation (store,
uniform sample, rollout) is a pure jit-able function on that state, so replay
lives in HBM and never crosses the host boundary during training.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def circular_write(buf: jnp.ndarray, items: jnp.ndarray, ptr: jnp.ndarray) -> jnp.ndarray:
    """Write ``items`` rows at positions ``(ptr + arange(n)) % cap``.

    Equivalent to ``buf.at[(ptr + arange(n)) % cap].set(items)`` but built
    from contiguous ops: one ``dynamic_update_slice`` into a ``[cap+n]``
    extension, then the wrapped spill is folded back over the head with a
    static-shape select.  XLA lowers the row-scatter with wrapped indices to
    per-row DMAs (~15x off memory bandwidth on TPU for large batches); this
    version moves every byte in large contiguous chunks.
    """
    n = items.shape[0]
    cap = buf.shape[0]
    # The replaced ``buf.at[idx].set(items)`` silently cast; keep that
    # contract (dynamic_update_slice itself requires exact dtype match).
    items = items.astype(buf.dtype)

    def nowrap(buf):
        # ptr + n <= cap: a single in-place update -- no concat copies, so
        # XLA can alias the buffer through scan carries.  Callers whose
        # capacity is a multiple of the insert size (e.g. the vectorized
        # ACER sequence buffer) take this branch on every insert.
        return lax.dynamic_update_slice_in_dim(buf, items, ptr, axis=0)

    def wrap(buf):
        # In-place wrapped write as TWO static-start n-row slice updates
        # (no whole-buffer concat extension): rotate the items so the spill
        # rows lead, patch the tail window [cap-n, cap) -- preserving the
        # not-yet-wrapped old rows under the window's head -- then patch
        # the head window [0, n) with the spill (and rewrite its untouched
        # rows unchanged).  Every op is an n-row move and both updates can
        # alias the buffer, so the cond below carries no copy-on-branch
        # buffers (the previous concat formulation cost ~0.4 ms/cycle of
        # the flagship DQN trainer in branch-boundary copies alone).
        over = ptr + n - cap  # > 0 in this branch
        items_rot = jnp.roll(items, over, axis=0)
        k = jnp.arange(n).reshape((n,) + (1,) * (buf.ndim - 1))
        tail = jnp.where(k < over, buf[cap - n :], items_rot)
        buf = lax.dynamic_update_slice_in_dim(buf, tail, cap - n, axis=0)
        head = jnp.where(k < over, items_rot, buf[:n])
        return lax.dynamic_update_slice_in_dim(buf, head, 0, axis=0)

    return lax.cond(ptr + n <= cap, nowrap, wrap, buf)


class RingState(NamedTuple):
    """storage: pytree with leaves ``[capacity, ...]``; ptr/size: int32 scalars."""

    storage: Any
    ptr: jnp.ndarray
    size: jnp.ndarray


def ring_init(capacity: int, example: Any) -> RingState:
    """Allocate a buffer shaped after one example transition (pytree)."""
    storage = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype), example
    )
    return RingState(storage, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))


def ring_capacity(state: RingState) -> int:
    return jax.tree.leaves(state.storage)[0].shape[0]


def ring_add(state: RingState, item: Any) -> RingState:
    """Store one transition at the write pointer (wrapping overwrite)."""
    cap = ring_capacity(state)
    storage = jax.tree.map(lambda buf, x: buf.at[state.ptr].set(x), state.storage, item)
    return RingState(
        storage,
        (state.ptr + 1) % cap,
        jnp.minimum(state.size + 1, cap),
    )


def ring_add_batch(state: RingState, items: Any) -> RingState:
    """Store a leading-axis batch of transitions (wrapping scatter)."""
    n = jax.tree.leaves(items)[0].shape[0]
    cap = ring_capacity(state)
    if n > cap:  # duplicate write positions would drop transitions silently
        raise ValueError(f"batch of {n} transitions exceeds buffer capacity {cap}")
    storage = jax.tree.map(
        lambda buf, x: circular_write(buf, x, state.ptr), state.storage, items
    )
    return RingState(
        storage,
        (state.ptr + n) % cap,
        jnp.minimum(state.size + n, cap),
    )


def ring_sample(state: RingState, key: jax.Array, n: int) -> Tuple[jnp.ndarray, Any]:
    """Uniform sample of ``n`` stored transitions (with replacement).

    The reference samples without replacement (replay_buffer.py:233-238); with
    a warm buffer (size >> n) the distributions are indistinguishable, and
    with-replacement keeps the op a single gather.
    """
    idx = jax.random.randint(key, (n,), 0, jnp.maximum(state.size, 1))
    return idx, jax.tree.map(lambda buf: buf[idx], state.storage)


def ring_clear(state: RingState) -> RingState:
    return RingState(state.storage, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
