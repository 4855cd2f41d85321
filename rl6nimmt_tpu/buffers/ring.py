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


def circular_write(
    buf: jnp.ndarray, items: jnp.ndarray, ptr: jnp.ndarray, axis: int = 0
) -> jnp.ndarray:
    """Write ``items`` slots at positions ``(ptr + arange(n)) % cap`` on ``axis``.

    Equivalent to a per-slot scatter with wrapped indices but built from
    contiguous ops: one ``dynamic_update_slice`` when the write fits, else
    two static-start slice updates folding the wrapped spill over the head.
    XLA lowers the wrapped-index scatter to per-slot DMAs (~15x off memory
    bandwidth on TPU for large batches); this version moves every byte in
    large contiguous chunks.

    ``axis`` selects the slot axis (default 0, the classic leading-capacity
    ring).  Feature-major replay buffers put slots LAST (``axis=-1``) so a
    kernel's feature-major trajectory flows in without any relayout and the
    storage keeps full lane utilization.
    """
    axis = axis % buf.ndim
    n = items.shape[axis]
    cap = buf.shape[axis]
    # The replaced ``buf.at[idx].set(items)`` silently cast; keep that
    # contract (dynamic_update_slice itself requires exact dtype match).
    items = items.astype(buf.dtype)

    def nowrap(buf):
        # ptr + n <= cap: a single in-place update -- no concat copies, so
        # XLA can alias the buffer through scan carries.  Callers whose
        # capacity is a multiple of the insert size (e.g. the vectorized
        # ACER sequence buffer) take this branch on every insert.
        return lax.dynamic_update_slice_in_dim(buf, items, ptr, axis=axis)

    def wrap(buf):
        # In-place wrapped write as TWO static-start n-slot slice updates
        # (no whole-buffer concat extension): rotate the items so the spill
        # slots lead, patch the tail window [cap-n, cap) -- preserving the
        # not-yet-wrapped old slots under the window's head -- then patch
        # the head window [0, n) with the spill (and rewrite its untouched
        # slots unchanged).  Every op is an n-slot move and both updates can
        # alias the buffer, so the cond below carries no copy-on-branch
        # buffers (the previous concat formulation cost ~0.4 ms/cycle of
        # the flagship DQN trainer in branch-boundary copies alone).
        over = ptr + n - cap  # > 0 in this branch
        items_rot = jnp.roll(items, over, axis=axis)
        kshape = [1] * buf.ndim
        kshape[axis] = n
        k = jnp.arange(n).reshape(kshape)
        tail = jnp.where(k < over, lax.slice_in_dim(buf, cap - n, cap, axis=axis),
                         items_rot)
        buf = lax.dynamic_update_slice_in_dim(buf, tail, cap - n, axis=axis)
        head = jnp.where(k < over, items_rot, lax.slice_in_dim(buf, 0, n, axis=axis))
        return lax.dynamic_update_slice_in_dim(buf, head, 0, axis=axis)

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
