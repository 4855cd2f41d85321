"""Buffer tests: ring semantics, PER sampling distribution, sequence masking.

The PER distribution test mirrors the intent of the reference's (broken)
tests/test_pbr.py: fill past capacity, sample + batch_update repeatedly, and
check importance weights stay positive and sampling tracks priorities.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rl6nimmt_tpu.buffers import (
    per_add,
    per_init,
    per_init_aligned,
    per_sample,
    per_update,
    ring_add,
    ring_add_batch,
    ring_init,
    ring_sample,
    seq_flush,
    seq_init,
    seq_latest,
    seq_sample,
    seq_store,
)


def example_item():
    return {"state": jnp.zeros(47), "action": jnp.zeros((), jnp.int32), "reward": jnp.zeros(())}


def test_ring_wraparound():
    state = ring_init(4, example_item())
    add = jax.jit(ring_add)
    for i in range(6):
        item = {
            "state": jnp.full(47, float(i)),
            "action": jnp.asarray(i, jnp.int32),
            "reward": jnp.asarray(float(i)),
        }
        state = add(state, item)
    assert int(state.size) == 4
    assert int(state.ptr) == 2
    # Slots 0,1 were overwritten by items 4,5.
    np.testing.assert_array_equal(
        np.asarray(state.storage["action"]), np.asarray([4, 5, 2, 3], np.int32)
    )


def test_ring_add_batch_and_sample():
    state = ring_init(8, example_item())
    items = {
        "state": jnp.tile(jnp.arange(6, dtype=jnp.float32)[:, None], (1, 47)),
        "action": jnp.arange(6, dtype=jnp.int32),
        "reward": jnp.arange(6, dtype=jnp.float32),
    }
    state = ring_add_batch(state, items)
    assert int(state.size) == 6
    idx, batch = ring_sample(state, jax.random.key(0), 32)
    assert batch["action"].shape == (32,)
    assert np.asarray(idx).max() < 6


def test_per_fill_sample_update_cycle():
    """Reference test_pbr scenario: overfill, then many sample/update rounds."""
    state = per_init(100, {"x": jnp.zeros(())})
    add = jax.jit(per_add)
    for i in range(110):
        state = add(state, {"x": jnp.asarray(float(i))})
    assert int(state.size) == 100

    sample = jax.jit(per_sample, static_argnums=2)
    update = jax.jit(per_update)
    key = jax.random.key(0)
    for it in range(50):
        key, sub = jax.random.split(key)
        state, idx, weights, batch = sample(state, sub, 10)
        w = np.asarray(weights)
        assert (w > 0).all() and np.isfinite(w).all()
        assert w.max() <= 1.0 + 1e-5  # max-priority item has weight 1
        errors = jnp.abs(batch["x"]) / 200.0
        state = update(state, idx, errors)
    assert float(state.beta) > 0.4


def test_per_sampling_tracks_priorities():
    """High-priority items must be sampled proportionally more often."""
    state = per_init(16, {"x": jnp.zeros(())})
    for i in range(16):
        state = per_add(state, {"x": jnp.asarray(float(i))})
    # Give slot 3 ten times the priority of everyone else.
    pri = np.full(16, 0.1, np.float32)
    pri[3] = 8.0
    state = state._replace(priorities=jnp.asarray(pri))

    counts = np.zeros(16)
    key = jax.random.key(1)
    for _ in range(200):
        key, sub = jax.random.split(key)
        _, idx, _, _ = per_sample(state, sub, 8)
        for i in np.asarray(idx):
            counts[i] += 1
    frac = counts[3] / counts.sum()
    expect = 8.0 / (8.0 + 1.5)
    assert abs(frac - expect) < 0.05


def test_circular_write_matches_wrapped_scatter():
    """Contiguous circular write == buf.at[(ptr+arange(n)) % cap].set(items)."""
    from rl6nimmt_tpu.buffers.ring import circular_write

    rng = np.random.RandomState(3)
    for cap, n in [(10, 3), (10, 10), (64, 17), (100, 99), (128, 64)]:
        for ptr in {0, 1, cap - 1, cap - n, max(cap - n - 1, 0), cap // 2}:
            for shape in [(), (5,)]:
                buf = rng.random((cap,) + shape).astype(np.float32)
                items = rng.random((n,) + shape).astype(np.float32)
                want = buf.copy()
                want[(ptr + np.arange(n)) % cap] = items
                got = np.asarray(
                    circular_write(jnp.asarray(buf), jnp.asarray(items),
                                   jnp.asarray(ptr, jnp.int32))
                )
                np.testing.assert_array_equal(got, want, err_msg=f"{cap},{n},{ptr},{shape}")


def test_per_blocked_matches_flat_searchsorted():
    """Two-level draw resolution == flat searchsorted(cumsum, u, 'left').

    Integer-valued f32 priorities keep every partial sum exact (< 2^24), so
    block-wise and flat summation agree bit-for-bit and the comparison must
    be EXACT -- including zero runs (empty slots), ties, and draws landing
    on block boundaries.
    """
    from rl6nimmt_tpu.buffers.per import _block_size, _stratified_indices

    rng = np.random.RandomState(7)
    for cap, n in [(100, 10), (1000, 64), (5000, 64), (20000, 128)]:
        B = _block_size(cap)
        for case in range(3):
            pri = rng.randint(0, 8, size=cap).astype(np.float32)
            if case == 1:
                pri[cap // 2 :] = 0.0  # half-empty buffer
            if case == 2:
                pri[:] = 1.0  # uniform ties
            total = pri.sum()
            u = np.sort(rng.uniform(0, total, size=n)).astype(np.float32)
            # Exact block-boundary draws: u equal to a block's end-cumsum.
            u[0] = np.cumsum(pri)[B - 1]
            got = np.asarray(_stratified_indices(jnp.asarray(pri), jnp.asarray(u)))
            want = np.searchsorted(np.cumsum(pri), u, side="left")
            want = np.minimum(want, cap - 1)
            np.testing.assert_array_equal(got, want, err_msg=f"cap={cap} case={case}")


def test_per_update_priority_formula():
    state = per_init(8, {"x": jnp.zeros(())})
    for i in range(8):
        state = per_add(state, {"x": jnp.asarray(float(i))})
    state = per_update(state, jnp.asarray([0, 1]), jnp.asarray([0.5, 10.0]))
    p = np.asarray(state.priorities)
    np.testing.assert_allclose(p[0], (0.5 + 0.01) ** 0.6, rtol=1e-5)
    np.testing.assert_allclose(p[1], 1.0, rtol=1e-5)  # clipped at 1


def test_sequence_buffer_flush_and_first_flags():
    ex = {"r": jnp.zeros(()), "a": jnp.zeros((), jnp.int32)}
    state = seq_init(4, 10, ex)
    for t in range(3):
        state = seq_store(state, {"r": jnp.asarray(float(t)), "a": jnp.asarray(t, jnp.int32)})
    assert int(state.cur_len) == 3
    state = seq_flush(state)
    assert int(state.cur_len) == 0 and int(state.size) == 1

    seq, length = seq_latest(state)
    assert int(length) == 3
    np.testing.assert_array_equal(np.asarray(seq["r"])[:3], [0.0, 1.0, 2.0])

    for t in range(2):
        state = seq_store(state, {"r": jnp.asarray(9.0), "a": jnp.asarray(9, jnp.int32)})
    state = seq_flush(state)
    idx, batch, lengths = seq_sample(state, jax.random.key(0), 5)
    assert batch["r"].shape == (5, 10)
    assert set(np.asarray(lengths)) <= {2, 3}


def test_ring_with_replacement_deviation_quantified_at_cold_sizes():
    """PARITY.md deviation #3, quantified at the COLDEST size the device path
    can sample from.

    A device learner cycle always pushes G*P*T transitions before its first
    sample, so the smallest population the with-replacement sampler ever
    sees is one cycle's fill (320 at the minimal G=8, 4p).  At population N
    and minibatch m, with-replacement draws E[dups] = m(m-1)/(2N) duplicate
    pairs per batch (6.3% of the batch at N=320, m=64; 0.12% at the default
    G=4096 fill) while the reference's random.sample draws none -- the only
    distributional difference, since marginal inclusion stays uniform.
    Asserts both facts empirically.
    """
    import jax

    from rl6nimmt_tpu.buffers import ring_add_batch, ring_init, ring_sample

    N, m, draws = 320, 64, 400
    example = {"x": jnp.zeros(())}
    buf = ring_init(512, example)
    buf = ring_add_batch(buf, {"x": jnp.arange(N, dtype=jnp.float32)})
    assert int(buf.size) == N

    dup_pairs = []
    counts = np.zeros(N)
    key = jax.random.key(0)
    for _ in range(draws):
        key, sub = jax.random.split(key)
        idx, _ = ring_sample(buf, sub, m)
        idx = np.asarray(idx)
        dup_pairs.append(m - len(np.unique(idx)))
        counts[idx] += 1  # marginal inclusion (duplicates counted once ok here)

    # Duplicate rate matches the with-replacement theory (binomial-ish spread).
    expected_dups = m * (m - 1) / (2 * N)  # ~6.3 at N=320
    measured = float(np.mean(dup_pairs))
    assert abs(measured - expected_dups) < 1.0, (measured, expected_dups)

    # Marginal inclusion is uniform: chi-square against uniform expectation.
    expected_count = counts.sum() / N
    chi2 = float(((counts - expected_count) ** 2 / expected_count).sum())
    # dof = N-1 = 319; mean 319, sd ~ sqrt(2*319) ~ 25 -> 5 sigma ~ 445.
    assert chi2 < 445, chi2


def test_nstep_named_classes_default_to_vanilla_like_reference():
    """Reference parity pin (VERDICT r1 weak #6): DQN_NStep_Agent and
    D3QN_PRB_NStep default to n_steps=1 EXACTLY like the reference
    (ref dqn.py:45 `n_steps=1`; the notebook passes n_steps=10 explicitly,
    run.py:23).  The named classes are only n-step when configured."""
    from rl6nimmt_tpu.agents.dqn import (
        D3QN_PRB_NStep,
        DQN_NStep_Agent,
        Noisy_D3QN_PRB_NStep,
    )

    assert DQN_NStep_Agent(seed=0).cfg.n_steps == 1
    assert D3QN_PRB_NStep(seed=0).cfg.n_steps == 1
    # And the kwarg reaches the config (the notebook's flagship setting).
    assert Noisy_D3QN_PRB_NStep(seed=0, n_steps=10).cfg.n_steps == 10


def test_circular_write_branch_matrix():
    """Both circular_write branches (in-place no-wrap DUS vs the wrapped
    concat fold) match the scatter reference for every (cap, n, ptr) combo,
    including n == cap and the exact wrap boundary."""
    import jax
    import jax.numpy as jnp

    from rl6nimmt_tpu.buffers.ring import circular_write

    rng = np.random.RandomState(0)
    for cap, n in [(10, 10), (10, 4), (12, 4), (7, 3)]:
        buf = jnp.asarray(rng.randn(cap, 3).astype(np.float32))
        for ptr in range(cap):
            items = jnp.asarray(rng.randn(n, 3).astype(np.float32))
            ref = np.asarray(buf).copy()
            ref[(ptr + np.arange(n)) % cap] = np.asarray(items)
            out = np.asarray(circular_write(buf, items, jnp.asarray(ptr, jnp.int32)))
            np.testing.assert_array_equal(out, ref, err_msg=f"cap={cap} n={n} ptr={ptr}")


def test_per_aligned_matches_ring_live_set():
    """Aligned PER == ring PER at the live-set level, round after round.

    Runs parallel histories through ``per_add_batch`` (ring, wrapping) and
    ``per_add_batch_aligned`` (block-aligned physical layout) with unique
    row ids, applying priority updates addressed BY CONTENT (so physical
    index differences cannot mask a divergence).  After every round the
    (row, priority) multiset of live slots, the live count, and the
    per-row selection probabilities must agree -- including priorities
    carried across partial evictions.
    """
    from rl6nimmt_tpu.buffers import per_add_batch, per_add_batch_aligned

    cap, n = 10, 8  # phys = 16, stale = 6: evicts slice an old block every round
    ex = {"x": jnp.zeros(())}
    ring = per_init(cap, ex)
    ali = per_init_aligned(cap, n, ex)
    assert ali.priorities.shape[0] == 16

    def live(state):
        pri = np.asarray(state.priorities)
        xs = np.asarray(state.storage["x"])
        mask = pri > 0
        return dict(zip(xs[mask].tolist(), pri[mask].tolist()))

    def update_by_content(state):
        xs = np.asarray(state.storage["x"])
        pri = np.asarray(state.priorities)
        sel = (pri > 0) & (xs.astype(np.int64) % 3 == 0)
        if not sel.any():
            return state
        idx = jnp.asarray(np.nonzero(sel)[0], jnp.int32)
        err = jnp.asarray(0.05 + (xs[sel] % 7.0) / 10.0, jnp.float32)
        return per_update(state, idx, err)

    rid = 0
    for _ in range(7):
        items = {"x": jnp.arange(rid, rid + n, dtype=jnp.float32)}
        rid += n
        ring = per_add_batch(ring, items)
        ali = per_add_batch_aligned(ali, items, cap)
        ring, ali = update_by_content(ring), update_by_content(ali)

        lr, la = live(ring), live(ali)
        assert lr == la  # exact: identical per-row ops in both layouts
        assert len(la) == min(rid, cap)
        assert int(ring.size) == int(ali.size) == min(rid, cap)
        # Selection probabilities and the IS min-prob normalizer agree.
        tr = float(jnp.sum(ring.priorities))
        ta = float(jnp.sum(ali.priorities))
        np.testing.assert_allclose(tr, ta, rtol=1e-6)
        np.testing.assert_allclose(
            sorted(p / tr for p in lr.values()),
            sorted(p / ta for p in la.values()),
            rtol=1e-6,
        )


def test_per_aligned_sampling_live_and_tracks_priorities():
    """Aligned-layout sampling never selects a stale/dead slot and tracks
    priorities proportionally, exactly like the ring layout."""
    from rl6nimmt_tpu.buffers import per_add_batch_aligned

    cap, n = 12, 8  # phys = 16, stale = 4
    state = per_init_aligned(cap, n, {"x": jnp.zeros(())})
    for r in range(3):
        state = per_add_batch_aligned(
            state, {"x": jnp.arange(r * n, (r + 1) * n, dtype=jnp.float32)}, cap
        )
    pri = np.asarray(state.priorities)
    assert (pri > 0).sum() == cap  # live count pinned at logical capacity

    # Boost one live row far above the rest, by content.
    xs = np.asarray(state.storage["x"])
    target_slot = int(np.nonzero((pri > 0) & (xs == 20.0))[0][0])
    new_pri = np.where(pri > 0, 0.1, 0.0).astype(np.float32)
    new_pri[target_slot] = 8.0
    state = state._replace(priorities=jnp.asarray(new_pri))

    counts = np.zeros(16)
    key = jax.random.key(2)
    sample = jax.jit(per_sample, static_argnums=2)
    for _ in range(200):
        key, sub = jax.random.split(key)
        _, idx, weights, batch = sample(state, sub, 8)
        idx = np.asarray(idx)
        assert (np.asarray(state.priorities)[idx] > 0).all()  # never dead
        assert np.isfinite(np.asarray(weights)).all()
        for i in idx:
            counts[i] += 1
    frac = counts[target_slot] / counts.sum()
    expect = 8.0 / (8.0 + 0.1 * (cap - 1))
    assert abs(frac - expect) < 0.05


def test_per_aligned_validates_shapes():
    import pytest

    from rl6nimmt_tpu.buffers import per_add_batch_aligned

    state = per_init_aligned(10, 8, {"x": jnp.zeros(())})
    with pytest.raises(ValueError):
        per_add_batch_aligned(state, {"x": jnp.zeros(5)}, 10)  # 16 % 5 != 0
    with pytest.raises(ValueError):
        # 16 % 4 == 0 but phys=16 >= cap+n=14: block doesn't match the init.
        per_add_batch_aligned(state, {"x": jnp.zeros(4)}, 10)


def test_circular_write_axis_last_matches_axis0():
    """circular_write(axis=-1) is the exact transpose of axis=0 on both the
    in-place and the wrapped branch (feature-major storage foundation)."""
    from rl6nimmt_tpu.buffers.ring import circular_write

    rng = np.random.RandomState(3)
    buf0 = jnp.asarray(rng.randn(11, 5).astype(np.float32))
    items = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    for ptr in (0, 3, 7, 9, 10):  # 9, 10 wrap
        rm = circular_write(buf0, items, jnp.asarray(ptr, jnp.int32))
        fm = circular_write(buf0.T, items.T, jnp.asarray(ptr, jnp.int32), axis=-1)
        np.testing.assert_array_equal(np.asarray(rm), np.asarray(fm).T)


def test_per_fm_matches_row_major_buffer():
    """A feature-major PER buffer (slots last) behaves identically to the
    classic ring: same priorities, same stratified draws under the same key,
    same sampled transitions (transposed), same priority write-back."""
    from rl6nimmt_tpu.buffers import per_add_batch, per_init_fm

    ex = example_item()
    cap = 64
    rm = per_init(cap, ex)
    fm = per_init_fm(cap, ex)

    rng = np.random.RandomState(11)
    for it in range(3):  # 3 x 24 rows: second/third inserts wrap the ring
        n = 24
        rows = {
            "state": jnp.asarray(rng.randint(-1, 104, size=(n, 47)), jnp.float32),
            "action": jnp.asarray(rng.randint(0, 104, size=(n,)), jnp.int32),
            "reward": jnp.asarray(rng.randn(n), jnp.float32),
        }
        cols = {
            "state": rows["state"].T,
            "action": rows["action"],
            "reward": rows["reward"],
        }
        rm = per_add_batch(rm, rows)
        fm = per_add_batch(fm, cols, slot_axis=-1)
        np.testing.assert_array_equal(np.asarray(rm.priorities), np.asarray(fm.priorities))
        assert int(rm.ptr) == int(fm.ptr) and int(rm.size) == int(fm.size)
        np.testing.assert_array_equal(
            np.asarray(rm.storage["state"]), np.asarray(fm.storage["state"]).T
        )

        key = jax.random.key(100 + it)
        rm, idx_rm, w_rm, batch_rm = per_sample(rm, key, 8)
        fm, idx_fm, w_fm, batch_fm = per_sample(fm, key, 8, slot_axis=-1)
        np.testing.assert_array_equal(np.asarray(idx_rm), np.asarray(idx_fm))
        np.testing.assert_array_equal(np.asarray(w_rm), np.asarray(w_fm))
        np.testing.assert_array_equal(
            np.asarray(batch_rm["state"]), np.asarray(batch_fm["state"]).T
        )
        np.testing.assert_array_equal(
            np.asarray(batch_rm["reward"]), np.asarray(batch_fm["reward"])
        )
        errs = jnp.asarray(rng.random(8), jnp.float32)
        rm = per_update(rm, idx_rm, errs)
        fm = per_update(fm, idx_fm, errs)
        np.testing.assert_array_equal(np.asarray(rm.priorities), np.asarray(fm.priorities))
