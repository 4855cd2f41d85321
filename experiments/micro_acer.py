"""Decompose the ACER selfplay cycle: rollout vs store vs on/off-policy train."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax
from jax import lax

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.agents.acer import make_acer_train_step
from rl6nimmt_tpu.buffers import seq_init
from rl6nimmt_tpu.buffers.sequence import seq_sample, seq_store_batch
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import MLPSpec, mlp_init
from rl6nimmt_tpu.runtime.vector import make_acer_rollout

G = 4096
CHAIN = 16
cfg = EnvConfig(num_players=4)

spec = MLPSpec(input_size=1 + cfg.state_length, hidden_sizes=(100, 100),
               head_sizes=(1, 1))
params = mlp_init(jax.random.key(2), spec)
optimizer = optax.adam(1e-3)
opt_state = optimizer.init(params)
example = {
    "state": jnp.zeros(cfg.state_length),
    "legal_cards": jnp.zeros(10, jnp.int32),
    "log_probs": jnp.zeros(10),
    "action_id": jnp.zeros((), jnp.int32),
    "reward": jnp.zeros(()),
    "done": jnp.zeros(()),
}
buf = seq_init(65536, cfg.max_turns, example)
rollout = make_acer_rollout(cfg, spec, G, r_factor=0.1)
train = make_acer_train_step(spec, optimizer, 0.99, 1.0, 1.0, 1.0)


def timed(fn, *args, iters=6):
    for _ in range(2):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / CHAIN


def chained(body):
    def many(key):
        def f(acc, k):
            return acc + body(k), None
        acc, _ = lax.scan(f, jnp.zeros(()), jax.random.split(key, CHAIN))
        return acc
    return jax.jit(many)


# (a) rollout only
def roll_only(k):
    seqs, scores = rollout(params, k)
    return jnp.sum(scores.astype(jnp.float32)) + jnp.sum(seqs["reward"])
t = timed(chained(roll_only), jax.random.key(0))
print(f"rollout only:                {t*1e3:7.2f} ms", flush=True)

# (b) on-policy train on a fixed fresh batch (params carried)
seqs_fixed, _ = jax.jit(rollout)(params, jax.random.key(9))
def many_on(key, p0, o0):
    def f(c, k):
        p, o = c
        p, o, losses = train(p, o, seqs_fixed)
        return (p, o), None
    (p, o), _ = lax.scan(f, (p0, o0), jax.random.split(key, CHAIN))
    return jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))
t = timed(jax.jit(many_on), jax.random.key(1), params, opt_state)
print(f"on-policy train (16384 seq): {t*1e3:7.2f} ms", flush=True)

# (c) off-policy train on 512 sampled sequences (params carried)
buf_warm = jax.jit(lambda b: seq_store_batch(
    b, {k: v for k, v in seqs_fixed.items() if k != "length"}, seqs_fixed["length"]
))(buf)
def many_off(key, p0, o0):
    def f(c, k):
        p, o = c
        _, batch, lengths = seq_sample(buf_warm, k, 512)
        batch = dict(batch, length=lengths)
        p, o, losses = train(p, o, batch)
        return (p, o), None
    (p, o), _ = lax.scan(f, (p0, o0), jax.random.split(key, CHAIN))
    return jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))
t = timed(jax.jit(many_off), jax.random.key(2), params, opt_state)
print(f"off-policy train (512 seq):  {t*1e3:7.2f} ms", flush=True)
