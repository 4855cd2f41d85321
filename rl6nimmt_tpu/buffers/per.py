"""Prioritized experience replay (Schaul et al. 2016), TPU-native.

Rebuilds the reference PER stack -- numba sum-tree + ``PriorityReplayBuffer``
(/root/reference/rl_6_nimmt/utils/replay_buffer.py:15-203) -- as pure JAX on a
dense priority array:

* storage is a :class:`RingState`-style pytree plus ``priorities: f32[cap]``;
* sampling uses the reference's *stratified* scheme -- one uniform draw per
  equal-mass segment ``u_i = (i + U[0,1)) * total / n`` -- but resolves each
  draw with a vectorized ``searchsorted`` over the priority prefix-sum, which
  selects exactly the same leaf as the reference's root-to-leaf sum-tree
  descent (replay_buffer.py:42-60);
* importance weights are ``(p / min_p) ** (-beta)`` with beta annealed by
  +0.001 per sample call toward 1.0 (replay_buffer.py:145-166), and priority
  updates apply ``(min(|err| + eps, 1)) ** alpha`` with eps=0.01, alpha=0.6
  (replay_buffer.py:188-200).

The draw is resolved by a TWO-LEVEL prefix scheme rather than a cumsum +
binary search over the whole priority array: priorities are viewed as
``[num_blocks, block]`` tiles, one reduction produces the block sums, a tiny
cumsum over blocks picks each draw's block by comparison count, and the
in-block offset is resolved the same way on the gathered 64xblock tile.
This selects exactly the leaf ``searchsorted(cumsum(pri), u, 'left')``
would (up to float reassociation of the partial sums;
``tests/test_buffers.py::test_per_blocked_matches_flat_searchsorted`` pins
exact agreement on integer-valued priorities) but costs one O(cap)
*reduction* instead of an O(cap) *prefix scan* plus pointer-chasing
gathers -- on TPU that is ~30x faster at the reference's 2e5 capacity,
where the flat cumsum dominated the entire Bellman update.  Known
deviation: the reference's ``num_items`` saturates at ``capacity - 1`` due
to an off-by-one in ``SumTree.add`` (replay_buffer.py:99-104); this
implementation uses the true element count.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PERState(NamedTuple):
    storage: Any              # pytree, leaves [capacity, ...]
    priorities: jnp.ndarray   # f32[capacity], 0 for empty slots
    ptr: jnp.ndarray          # int32
    size: jnp.ndarray         # int32
    beta: jnp.ndarray         # f32, annealed 0.4 -> 1.0


ABS_ERROR_UPPER = 1.0
EPSILON = 0.01
ALPHA = 0.6
BETA0 = 0.4
BETA_INCREMENT = 0.001


def per_init(capacity: int, example: Any) -> PERState:
    """Allocate a PER buffer.

    Performance note: if batch inserts always carry the same row count
    ``n``, pick ``capacity`` as a multiple of ``n`` -- the write pointer
    then never wraps and every insert takes :func:`..ring.circular_write`'s
    in-place fast branch (no whole-buffer concat copies; measured worth
    ~1.7 ms/cycle on the vectorized ACER trainer at G=4096).
    """
    storage = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype), example
    )
    return PERState(
        storage=storage,
        priorities=jnp.zeros((capacity,), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        beta=jnp.asarray(BETA0, jnp.float32),
    )


def per_capacity(state: PERState) -> int:
    return state.priorities.shape[0]


def per_init_fm(capacity: int, example: Any) -> PERState:
    """Feature-major PER buffer: the slot axis is LAST on every storage leaf.

    A transition example with leaves ``state [S]`` / ``action []`` becomes
    storage ``state [S, capacity]`` / ``action [capacity]``.  Two wins on
    TPU over the classic leading-slot ring (``per_init``):

    * the storage keeps slots on the LANE axis, so a ``[47, cap]`` int8
      state plane uses all 128 lanes where ``[cap, 47]`` rows use 47 -- and
      every whole-buffer move (ring-wrap folds, scan-carry copies) rides
      full-width tiles;
    * the fused act-rollout kernel emits its trajectory feature-major
      (``[S, (T+1)*P, G]`` with games on lanes), which flows into
      :func:`per_add_batch` ``slot_axis=-1`` as a pure reshape -- no
      row-major relayout between rollout and insert (the named lever of
      RESULTS.md's act-rollout analysis).

    Priorities/ptr/size/beta semantics (replay_buffer.py:122-203) are
    identical to :func:`per_init`; only the storage layout differs.  Use
    ``slot_axis=-1`` on :func:`per_add_batch`/:func:`per_sample`.
    """
    storage = jax.tree.map(
        lambda x: jnp.zeros(jnp.shape(x) + (capacity,), jnp.asarray(x).dtype),
        example,
    )
    return PERState(
        storage=storage,
        priorities=jnp.zeros((capacity,), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        beta=jnp.asarray(BETA0, jnp.float32),
    )


def per_init_kd(capacity: int, state_rows: int, scal_rows: int) -> PERState:
    """PER buffer for the direct-insert kernel (ops/act_rollout_kernel.py).

    Storage is three feature-major PLANES the kernel DMA-writes at the ring
    pointer: ``state``/``next_state`` int8 ``[state_rows, cap]`` (features
    padded to the DMA row tile) and ``scalars`` f32 ``[scal_rows, cap]``
    (row 0 = n-step reward, 1 = action, 2 = done).  Priorities/ptr/size/
    beta semantics are unchanged; inserts mark priorities via
    :func:`per_mark_batch` because the kernel wrote the storage already.
    """
    storage = {
        "state": jnp.zeros((state_rows, capacity), jnp.int8),
        "next_state": jnp.zeros((state_rows, capacity), jnp.int8),
        "scalars": jnp.zeros((scal_rows, capacity), jnp.float32),
    }
    return PERState(
        storage=storage,
        priorities=jnp.zeros((capacity,), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        beta=jnp.asarray(BETA0, jnp.float32),
    )


def per_mark_batch(state: PERState, storage: Any, n: int) -> PERState:
    """Bookkeeping companion to an external batch write (the direct-insert
    kernel): adopt the externally-written ``storage``, give the ``n`` new
    slots at the ring pointer the max-priority treatment of
    :func:`per_add_batch` (replay_buffer.py:150), and advance ptr/size."""
    from .ring import circular_write

    cap = per_capacity(state)
    if n > cap:
        raise ValueError(f"batch of {n} transitions exceeds buffer capacity {cap}")
    max_p = jnp.max(state.priorities)
    priority = jnp.where(max_p == 0.0, ABS_ERROR_UPPER, max_p)
    return PERState(
        storage=storage,
        priorities=circular_write(
            state.priorities, jnp.broadcast_to(priority, (n,)), state.ptr
        ),
        ptr=(state.ptr + n) % cap,
        size=jnp.minimum(state.size + n, cap),
        beta=state.beta,
    )


def per_add(state: PERState, item: Any) -> PERState:
    """Insert with max-priority (new experiences get sampled at least once)."""
    max_p = jnp.max(state.priorities)
    priority = jnp.where(max_p == 0.0, ABS_ERROR_UPPER, max_p)
    cap = per_capacity(state)
    storage = jax.tree.map(lambda buf, x: buf.at[state.ptr].set(x), state.storage, item)
    return PERState(
        storage=storage,
        priorities=state.priorities.at[state.ptr].set(priority),
        ptr=(state.ptr + 1) % cap,
        size=jnp.minimum(state.size + 1, cap),
        beta=state.beta,
    )


def per_add_batch(state: PERState, items: Any, slot_axis: int = 0) -> PERState:
    """Batch insert, all at the current max priority.

    ``slot_axis`` selects the storage slot axis: 0 for :func:`per_init`
    buffers (leading-slot rows), -1 for :func:`per_init_fm` feature-major
    buffers (slots on lanes; 1-D leaves coincide either way).
    """
    from .ring import circular_write

    n = jax.tree.leaves(items)[0].shape[slot_axis]
    cap = per_capacity(state)
    if n > cap:  # duplicate write positions would drop transitions silently
        raise ValueError(f"batch of {n} transitions exceeds buffer capacity {cap}")
    max_p = jnp.max(state.priorities)
    priority = jnp.where(max_p == 0.0, ABS_ERROR_UPPER, max_p)
    storage = jax.tree.map(
        lambda buf, x: circular_write(buf, x, state.ptr, axis=slot_axis),
        state.storage, items,
    )
    return PERState(
        storage=storage,
        priorities=circular_write(
            state.priorities, jnp.broadcast_to(priority, (n,)), state.ptr
        ),
        ptr=(state.ptr + n) % cap,
        size=jnp.minimum(state.size + n, cap),
        beta=state.beta,
    )


def per_init_aligned(capacity: int, insert_block: int, example: Any) -> PERState:
    """PER buffer with a block-aligned physical layout (writes never wrap).

    Physical capacity is ``capacity`` rounded UP to a multiple of
    ``insert_block``, so every :func:`per_add_batch_aligned` insert of
    exactly ``insert_block`` rows is one in-place ``dynamic_update_slice``
    at an aligned pointer -- never the wrap branch of
    :func:`..ring.circular_write`, whose concat extension moves ~2x the
    buffer per insert.  Measured caveat (round 4, v5e,
    ``experiments/micro_insert.py`` / ``micro_cycle5.py``): at the flagship
    trainer's shapes the wrapping ring insert is ALREADY overlap-scheduled
    off the cycle's critical path, and the aligned layout's larger physical
    priority array slightly slows the per-update stratified samples -- so
    the flagship bench stays on the ring layout.  Use this layout when the
    insert measurably dominates (e.g. much wider transition rows or
    capacity >> insert block, where the concat's 2x-capacity traffic beats
    the sampler's O(physical) reduction).

    Ring-eviction semantics are preserved exactly at the live-set level:
    after every insert the live rows are the newest ``capacity`` rows ever
    stored, with per-row priorities carried across inserts -- the same
    (row, priority) multiset a ``per_init(capacity)`` ring holds (pinned by
    ``tests/test_buffers.py::test_per_aligned_matches_ring_live_set``).
    Rows older than ``capacity`` keep their storage until their block is
    overwritten but have priority zeroed, and ``pri > 0`` == live excludes
    them from both sampling and the min-probability IS normalizer, so the
    per-transition selection probabilities are identical to the ring's.
    Reference semantics (replay_buffer.py:122-203) are unchanged.
    """
    if insert_block <= 0:
        raise ValueError(f"insert_block must be positive, got {insert_block}")
    phys = -(-capacity // insert_block) * insert_block
    return per_init(phys, example)


def per_init_aligned_fm(capacity: int, insert_block: int, example: Any) -> PERState:
    """Feature-major twin of :func:`per_init_aligned` (slot axis LAST).

    Same block-aligned physical layout and ring-equivalent live-set
    semantics; combine with ``per_add_batch_aligned(..., slot_axis=-1)``.
    With feature-major storage the aligned write is one in-place
    lane-contiguous ``dynamic_update_slice`` per leaf -- no wrap cond, so
    XLA can alias the buffers through scan carries (the wrap branch's
    roll + two window patches measured as the flagship fm cycle's largest
    phase, experiments/roofline_cycle.py).
    """
    if insert_block <= 0:
        raise ValueError(f"insert_block must be positive, got {insert_block}")
    phys = -(-capacity // insert_block) * insert_block
    return per_init_fm(phys, example)


def per_add_batch_aligned(
    state: PERState, items: Any, capacity: int, slot_axis: int = 0
) -> PERState:
    """Aligned batch insert (see :func:`per_init_aligned`), all rows at the
    current max priority like :func:`per_add_batch` (replay_buffer.py:150).

    ``capacity`` is the LOGICAL ring capacity; the buffer must come from
    ``per_init_aligned(capacity, n, ...)`` with ``n`` = this batch's row
    count.  After the in-place write, the globally oldest ``phys -
    capacity`` rows (the head of the next block to be overwritten) get
    priority 0, evicting them from the live set exactly as the ring's
    wrapping overwrite would.  ``slot_axis`` as in :func:`per_add_batch`
    (-1 for :func:`per_init_aligned_fm` feature-major buffers).
    """
    from jax import lax

    n = jax.tree.leaves(items)[0].shape[slot_axis]
    phys = per_capacity(state)
    if phys % n != 0:
        raise ValueError(
            f"aligned insert of {n} rows into physical capacity {phys}: "
            f"capacity must be a multiple of the insert block"
        )
    if not capacity <= phys < capacity + n:
        raise ValueError(
            f"physical capacity {phys} is not capacity..capacity+block for "
            f"logical capacity {capacity} and block {n}"
        )
    max_p = jnp.max(state.priorities)
    priority = jnp.where(max_p == 0.0, ABS_ERROR_UPPER, max_p)
    storage = jax.tree.map(
        lambda buf, x: lax.dynamic_update_slice_in_dim(
            buf, x.astype(buf.dtype), state.ptr,
            axis=slot_axis % buf.ndim,
        ),
        state.storage,
        items,
    )
    pri = lax.dynamic_update_slice_in_dim(
        state.priorities,
        jnp.broadcast_to(priority, (n,)).astype(jnp.float32),
        state.ptr,
        axis=0,
    )
    nxt = ((state.ptr + n) % phys).astype(jnp.int32)
    stale = phys - capacity  # static; < n, so the zeroed range never wraps
    if stale:
        pri = lax.dynamic_update_slice_in_dim(
            pri, jnp.zeros((stale,), jnp.float32), nxt, axis=0
        )
    return PERState(
        storage=storage,
        priorities=pri,
        ptr=nxt,
        size=jnp.minimum(state.size + n, capacity),
        beta=state.beta,
    )


def _block_size(capacity: int) -> int:
    """Power-of-two block width near sqrt(capacity), in [64, 1024]."""
    b = 64
    while b * b < capacity and b < 1024:
        b *= 2
    return b


def _stratified_indices(pri: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """First index where ``cumsum(pri)`` reaches each ``u`` (side='left').

    Two-level resolution: pick the block whose end-cumsum first reaches u
    (it contains the flat answer), then count in-block prefix sums below the
    residual.  All comparisons are dense [n, blocks]/[n, block] masks -- no
    prefix scan over the full array, no binary-search gathers.
    """
    cap = pri.shape[0]
    B = _block_size(cap)
    nb = -(-cap // B)
    padded = jnp.pad(pri, (0, nb * B - cap))
    blocks = padded.reshape(nb, B)
    bcum = jnp.cumsum(jnp.sum(blocks, axis=1))                   # [nb]
    b = jnp.sum(bcum[None, :] < u[:, None], axis=1)              # [n]
    b = jnp.minimum(b, nb - 1)
    prefix = jnp.where(b > 0, bcum[jnp.maximum(b - 1, 0)], 0.0)  # [n]
    residual = u - prefix
    icum = jnp.cumsum(blocks[b], axis=1)                         # [n, B]
    j = jnp.sum(icum < residual[:, None], axis=1)                # [n]
    return (b * B + jnp.minimum(j, B - 1)).astype(jnp.int32)


def per_sample(
    state: PERState, key: jax.Array, n: int, slot_axis: int = 0
) -> Tuple[PERState, jnp.ndarray, jnp.ndarray, Any]:
    """Stratified priority sample.

    Returns ``(state', indices, importance_weights, batch)``; the returned
    state only differs in the annealed beta.  ``slot_axis`` as in
    :func:`per_add_batch` (-1 for feature-major storage; the batch then has
    the minibatch axis last, e.g. ``state [S, n]``).
    """
    pri = state.priorities
    total = jnp.sum(pri)
    beta = jnp.minimum(1.0, state.beta + BETA_INCREMENT)

    segment = total / n
    u = (jnp.arange(n, dtype=jnp.float32) + jax.random.uniform(key, (n,))) * segment
    idx = _stratified_indices(pri, u).astype(jnp.int32)
    # Live slots are exactly those with positive priority (every stored row
    # keeps priority >= 0.01**0.6; empty ring slots and aligned-layout stale
    # rows are 0).  A draw can only land on a dead slot when a float-exact
    # boundary coincidence makes the strict comparison skip over a zero run;
    # snap those (and the ring's old clip-to-size guard) to the max-priority
    # slot, which is always live when the buffer is nonempty.
    idx = jnp.where(pri[idx] > 0.0, idx, jnp.argmax(pri).astype(jnp.int32))

    probs = pri[idx] / total
    min_prob = jnp.min(jnp.where(pri > 0.0, pri, jnp.inf)) / total
    weights = jnp.power(probs / min_prob, -beta)

    batch = jax.tree.map(
        lambda buf: jnp.take(buf, idx, axis=slot_axis), state.storage
    )
    return state._replace(beta=beta), idx, weights, batch


def per_update(state: PERState, idx: jnp.ndarray, abs_errors: jnp.ndarray) -> PERState:
    """Write back clipped TD-error priorities for sampled indices."""
    clipped = jnp.minimum(jnp.abs(abs_errors) + EPSILON, ABS_ERROR_UPPER)
    new_p = jnp.power(clipped, ALPHA)
    return state._replace(priorities=state.priorities.at[idx].set(new_p))
