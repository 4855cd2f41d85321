"""Micro-timings of per_sample internals on the current backend."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.buffers import per_init
from rl6nimmt_tpu.buffers.per import _stratified_indices, per_sample

CAP = 200_000
N = 64
CHAIN = 64


def timed(fn, *args, iters=8):
    for _ in range(2):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / CHAIN


def chain_scan(body):
    def many(key, *args):
        acc, _ = lax.scan(
            lambda c, k: (c + body(k, *args), None),
            jnp.zeros(()), jax.random.split(key, CHAIN),
        )
        return acc
    return jax.jit(many)


pri = jnp.asarray(np.random.RandomState(0).random(CAP).astype(np.float32) + 0.01)

example = {
    "state": jnp.zeros(47), "action": jnp.zeros((), jnp.int32),
    "reward": jnp.zeros(()), "next_state": jnp.zeros(47), "done": jnp.zeros(()),
}
buf = per_init(CAP, example)
buf = buf._replace(priorities=pri, size=jnp.asarray(CAP, jnp.int32))

key = jax.random.key(0)

# 1. cumsum alone
t = timed(chain_scan(lambda k: jnp.cumsum(pri)[-1]), key)
print(f"cumsum 200k:            {t*1e3:.3f} ms")

# 2. blocked index resolution alone
t = timed(chain_scan(
    lambda k: jnp.sum(_stratified_indices(pri, jax.random.uniform(k, (N,)) * jnp.sum(pri)).astype(jnp.float32))), key)
print(f"blocked indices:        {t*1e3:.3f} ms")

# 3. flat searchsorted resolution
def flat(k):
    u = jax.random.uniform(k, (N,)) * jnp.sum(pri)
    return jnp.sum(jnp.searchsorted(jnp.cumsum(pri), u).astype(jnp.float32))
t = timed(chain_scan(flat), key)
print(f"cumsum+searchsorted:    {t*1e3:.3f} ms")

# 4. min-over-valid reduce (weights denominator)
def minred(k):
    valid = jnp.arange(CAP) < buf.size
    return jnp.min(jnp.where(valid, pri, jnp.inf)) + jax.random.uniform(k)
t = timed(chain_scan(minred), key)
print(f"masked min reduce:      {t*1e3:.3f} ms")

# 5. storage gather of 64 rows
def gath(k):
    idx = jax.random.randint(k, (N,), 0, CAP)
    b = jax.tree.map(lambda s: s[idx], buf.storage)
    return jnp.sum(b["state"]) + jnp.sum(b["next_state"])
t = timed(chain_scan(gath), key)
print(f"storage gather 64 rows: {t*1e3:.3f} ms")

# 6. full per_sample (fixed buf, no carry)
def full(k):
    _, idx, w, batch = per_sample(buf, k, N)
    return jnp.sum(w) + jnp.sum(batch["state"])
t = timed(chain_scan(full), key)
print(f"full per_sample:        {t*1e3:.3f} ms")

# 7. per_sample with buf CARRIED through the scan (as in the cycle)
def carried(key):
    def body(c, k):
        b, acc = c
        b, idx, w, batch = per_sample(b, k, N)
        return (b, acc + jnp.sum(w) + jnp.sum(batch["state"])), None
    (b, acc), _ = lax.scan(body, (buf, jnp.zeros(())), jax.random.split(key, CHAIN))
    return acc
t = timed(jax.jit(carried), key)
print(f"per_sample carried buf: {t*1e3:.3f} ms")
