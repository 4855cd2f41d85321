"""Fixed-shape sequence replay buffer (ACER's rollout memory).

Rebuilds ``SequentialHistory``
(/root/reference/rl_6_nimmt/utils/replay_buffer.py:274-302): steps accumulate
into a current sequence; ``flush`` pushes the whole sequence into long-term
memory as one record.  Here both live in fixed-shape device arrays:

* long-term storage has leaves ``[capacity, max_len, ...]`` with a per-slot
  ``seq_len`` (ragged sequences are length-masked, never re-shaped);
* the current sequence is a ``[max_len, ...]`` scratch pytree plus a counter;
* the reference's per-step ``first`` flag (replay_buffer.py:292-296) needs no
  storage -- within a fixed layout it is simply ``position == 0``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SeqState(NamedTuple):
    storage: Any              # pytree, leaves [capacity, max_len, ...]
    seq_len: jnp.ndarray      # int32[capacity]
    ptr: jnp.ndarray          # int32
    size: jnp.ndarray         # int32
    current: Any              # pytree, leaves [max_len, ...]
    cur_len: jnp.ndarray      # int32


def seq_init(capacity: int, max_len: int, example: Any) -> SeqState:
    zeros = lambda lead: jax.tree.map(
        lambda x: jnp.zeros(lead + jnp.shape(x), jnp.asarray(x).dtype), example
    )
    return SeqState(
        storage=zeros((capacity, max_len)),
        seq_len=jnp.zeros((capacity,), jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        current=zeros((max_len,)),
        cur_len=jnp.zeros((), jnp.int32),
    )


def seq_capacity(state: SeqState) -> int:
    return state.seq_len.shape[0]


def seq_store(state: SeqState, item: Any) -> SeqState:
    """Append one step to the current (not yet flushed) sequence."""
    current = jax.tree.map(lambda buf, x: buf.at[state.cur_len].set(x), state.current, item)
    return state._replace(current=current, cur_len=state.cur_len + 1)


def seq_flush(state: SeqState) -> SeqState:
    """Commit the current sequence to long-term memory and reset it."""
    cap = seq_capacity(state)
    storage = jax.tree.map(
        lambda buf, cur: buf.at[state.ptr].set(cur), state.storage, state.current
    )
    cleared = jax.tree.map(jnp.zeros_like, state.current)
    return SeqState(
        storage=storage,
        seq_len=state.seq_len.at[state.ptr].set(state.cur_len),
        ptr=(state.ptr + 1) % cap,
        size=jnp.minimum(state.size + 1, cap),
        current=cleared,
        cur_len=jnp.zeros((), jnp.int32),
    )


def seq_store_batch(state: SeqState, seqs: Any, lengths: jnp.ndarray) -> SeqState:
    """Flush ``B`` complete sequences at once (the vectorized trainer's path).

    ``seqs`` leaves are ``[B, max_len, ...]``; ``lengths`` is ``int32[B]``.
    Writes occupy slots ``ptr..ptr+B-1`` modulo capacity (B must not exceed
    capacity).  The interactive one-at-a-time path keeps using
    :func:`seq_store`/:func:`seq_flush`.
    """
    from .ring import circular_write

    cap = seq_capacity(state)
    B = lengths.shape[0]
    if B > cap:  # duplicate write positions would corrupt slots silently
        raise ValueError(f"batch of {B} sequences exceeds buffer capacity {cap}")
    storage = jax.tree.map(
        lambda buf, batch: circular_write(buf, batch, state.ptr), state.storage, seqs
    )
    return state._replace(
        storage=storage,
        seq_len=circular_write(
            state.seq_len, lengths.astype(jnp.int32), state.ptr
        ),
        ptr=(state.ptr + B) % cap,
        size=jnp.minimum(state.size + B, cap),
    )


def seq_sample(state: SeqState, key: jax.Array, n: int) -> Tuple[jnp.ndarray, Any, jnp.ndarray]:
    """Uniform sample of ``n`` sequences -> (indices, batch, lengths)."""
    idx = jax.random.randint(key, (n,), 0, jnp.maximum(state.size, 1))
    batch = jax.tree.map(lambda buf: buf[idx], state.storage)
    return idx, batch, state.seq_len[idx]


def seq_latest(state: SeqState) -> Tuple[Any, jnp.ndarray]:
    """The most recently flushed sequence (on-policy rollout of ACER)."""
    cap = seq_capacity(state)
    last = (state.ptr - 1) % cap
    return (
        jax.tree.map(lambda buf: buf[last], state.storage),
        state.seq_len[last],
    )
