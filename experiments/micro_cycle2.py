"""Localize the ~9ms fixed cost of attaching one update to the DQN cycle."""

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

from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
from rl6nimmt_tpu.buffers import per_init
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import mlp_init
from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step

CHAIN = 16
cfg = EnvConfig(num_players=4)


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


def run(tag, G=4096, cap=200_000, li=1, **cfg_kw):
    kw = dict(double=True, dueling=True, noisy=True, per=True,
              n_steps=10, hidden_sizes=(64,), minibatch=64)
    kw.update(cfg_kw)
    dqn_cfg = DQNConfig(**kw)
    spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
    params = mlp_init(jax.random.key(1), spec)
    target = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    example = {
        "state": jnp.zeros(cfg.state_length),
        "action": jnp.zeros((), jnp.int32),
        "reward": jnp.zeros(()),
        "next_state": jnp.zeros(cfg.state_length),
        "done": jnp.zeros(()),
    }
    buf = per_init(cap, example)
    cycle = make_dqn_selfplay_step(cfg, dqn_cfg, optimizer, G, learn_iters=li)

    def many(key, params, target, opt_state, buf):
        def body(c, k):
            p, t, o, b, m = cycle(c[0], c[1], c[2], c[3], k, jnp.asarray(0.1))
            return (p, t, o, b), None
        carry, _ = lax.scan(body, (params, target, opt_state, buf),
                            jax.random.split(key, CHAIN))
        return jnp.sum(jax.tree.leaves(carry[0])[0].astype(jnp.float32))

    t = timed(jax.jit(many), jax.random.key(0), params, target, opt_state, buf)
    print(f"{tag:<42} {t*1e3:7.2f} ms/cycle", flush=True)


run("baseline G=4096 li=1")
run("li=0", li=0)
run("G=512 li=1", G=512)
run("G=512 li=0", G=512, li=0)
run("noisy=False li=1", noisy=False)
run("n_steps=1 li=1", n_steps=1)
run("minibatch=1024 li=1", minibatch=1024)
run("cap=16384 li=1 (fits VMEM-ish)", cap=16384, G=1024)
run("cap=16384 li=0", cap=16384, G=1024, li=0)
