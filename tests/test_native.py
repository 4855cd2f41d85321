"""Native C++ kernel tests (skipped when the toolchain is unavailable)."""

import numpy as np
import pytest

sn = pytest.importorskip("rl6nimmt_tpu.buffers.sumtree_native")

from rl6nimmt_tpu.buffers.host import HostPriorityBuffer


def test_stratified_sample_matches_searchsorted():
    rng = np.random.RandomState(0)
    pri = rng.random(5000)
    for k in (1, 16, 257):
        u = (np.arange(k) + rng.random(k)) * (pri.sum() / k)
        native = sn.stratified_sample(pri, u)
        ref = np.searchsorted(np.cumsum(pri), u, side="left")
        np.testing.assert_array_equal(native, ref)


def test_stratified_sample_clamps_overflow():
    pri = np.asarray([1.0, 2.0, 3.0])
    idx = sn.stratified_sample(pri, np.asarray([0.5, 5.9, 100.0]))
    np.testing.assert_array_equal(idx, [0, 2, 2])


def test_update_priorities_formula():
    pri = np.zeros(8, dtype=np.float64)
    sn.update_priorities(pri, np.asarray([0, 3]), np.asarray([0.5, 10.0]), 0.01, 1.0, 0.6)
    np.testing.assert_allclose(pri[0], 0.51**0.6)
    np.testing.assert_allclose(pri[3], 1.0)


def test_host_buffer_uses_native_and_behaves():
    buf = HostPriorityBuffer(64)
    for i in range(80):
        buf.store(x=float(i))
    idx, weights, batch = buf.sample(16)
    assert (weights > 0).all()
    buf.batch_update(idx, np.abs(np.asarray(batch["x"])) / 100.0)
    assert (buf.priorities[idx] > 0).all()
