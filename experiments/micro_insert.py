"""Micro-benchmark: PER batch insert, ring (wrapping) vs block-aligned layout.

Times ONLY the insert at the flagship trainer's shapes (163,840 transitions
per cycle into a 200k-capacity buffer), chained inside one scan dispatch so
the tunnel round trip amortizes -- the same conditions under which the
insert was measured at ~1.1 ms/cycle inside the full DQN cycle (RESULTS.md
round 3).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.buffers import (
    per_add_batch,
    per_add_batch_aligned,
    per_init,
    per_init_aligned,
)

G, P, T = 4096, 4, 10
N = G * P * T  # 163,840
CAP = 200_000
S = 47
CHAIN = 64


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN * 1e3


def main():
    example = {
        "state": jnp.zeros(S),
        "action": jnp.zeros((), jnp.int32),
        "reward": jnp.zeros(()),
        "next_state": jnp.zeros(S),
        "done": jnp.zeros(()),
    }
    items = {
        "state": jnp.ones((N, S)),
        "action": jnp.ones((N,), jnp.int32),
        "reward": jnp.ones((N,)),
        "next_state": jnp.ones((N, S)),
        "done": jnp.zeros((N,)),
    }

    def chained(add):
        def run(buf, items):
            def body(b, i):
                it = dict(items, reward=items["reward"] + i)  # defeat CSE
                return add(b, it), it["reward"][0]

            buf, probes = lax.scan(body, buf, jnp.arange(CHAIN, dtype=jnp.float32))
            return buf.priorities[:1], buf.ptr, jnp.sum(probes)

        return jax.jit(run)

    ring = per_init(CAP, example)
    ali = per_init_aligned(CAP, N, example)
    ms_ring = timeit(chained(per_add_batch), ring, items)
    ms_ali = timeit(chained(lambda b, it: per_add_batch_aligned(b, it, CAP)), ali, items)
    print(f"ring insert    (cap={CAP}, n={N}): {ms_ring:6.3f} ms/insert")
    print(f"aligned insert (phys={ali.priorities.shape[0]}): {ms_ali:6.3f} ms/insert")
    print(f"speedup: {ms_ring / ms_ali:.2f}x")


if __name__ == "__main__":
    main()
