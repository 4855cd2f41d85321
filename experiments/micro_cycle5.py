"""Round-4 DQN-cycle decomposition, after aligned-PER + effective-weight act.

Times the CURRENT make_dqn_selfplay_step and ablations of it (chained,
DCE-proof probes) to re-attribute the cycle's milliseconds before chasing
further optimizations -- the round-3 split (RESULTS.md) predated both the
aligned buffer layout and the effective-weights act path.
"""

import functools
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

from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec, q_values
from rl6nimmt_tpu.buffers import per_init, per_init_aligned
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.engine.env import deal, observe, step
from rl6nimmt_tpu.nets import draw_mlp_noise, mlp_init, noisy_effective_params
from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step
from rl6nimmt_tpu.utils.tpu_ops import onehot_select, uniform_index

G, CHAIN = 4096, 32
cfg = EnvConfig(num_players=4)
dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                    n_steps=10, hidden_sizes=(64,), minibatch=64)
spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
params = mlp_init(jax.random.key(1), spec)

deal_b = jax.vmap(functools.partial(deal, cfg))
step_b = jax.vmap(functools.partial(step, cfg))
obs_b = jax.vmap(functools.partial(observe, cfg))
T = cfg.max_turns
NEG_INF = -1e9

example = {
    "state": jnp.zeros(cfg.state_length),
    "action": jnp.zeros((), jnp.int32),
    "reward": jnp.zeros(()),
    "next_state": jnp.zeros(cfg.state_length),
    "done": jnp.zeros(()),
}
optimizer = optax.adam(1e-3)


def timeit(fn, *args, iters=6):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / CHAIN * 1e3  # ms per cycle


def rollout_variant(kind):
    """Replicates the current noisy rollout (effective weights) standalone."""

    def rollout_one(key):
        import dataclasses

        key, dk = jax.random.split(key)
        state = deal_b(jax.random.split(dk, G))

        def chaink(k, _):
            k, sub = jax.random.split(k)
            return k, sub

        _, subs = lax.scan(chaink, key, jnp.arange(T))
        noise_keys = jax.vmap(lambda s: jax.random.split(s, 3)[0])(subs)
        turn_noise = jax.vmap(lambda nk: draw_mlp_noise(spec, nk))(noise_keys)
        turn_eff = jax.vmap(lambda nz: noisy_effective_params(spec, params, nz))(turn_noise)
        eff_spec = dataclasses.replace(spec, noisy=False)

        def turn(carry, xs):
            state = carry
            eff, sub = xs
            obs, masks = obs_b(state)
            if kind == "no_act":
                count = jnp.sum(state.hands_sorted >= 0, axis=-1)
                r = uniform_index(sub, count)
                actions = onehot_select(state.hands_sorted, r).astype(jnp.int32)
            else:
                q = q_values(dqn_cfg, eff_spec, eff, obs)
                actions = jnp.argmax(jnp.where(masks, q, NEG_INF), axis=-1).astype(jnp.int32)
            state, rewards = step_b(state, actions)
            return state, (jnp.sum(obs), jnp.sum(rewards))

        state, (o, r) = lax.scan(turn, state, (turn_eff, subs), unroll=T)
        return jnp.sum(o) + jnp.sum(r) - jnp.sum(state.scores)

    def many(key):
        def gen(acc, k):
            return acc + rollout_one(k), None

        acc, _ = lax.scan(gen, jnp.zeros(()), jax.random.split(key, CHAIN))
        return acc

    return jax.jit(many)


def cycle_variant(learn_iters, aligned):
    cyc = make_dqn_selfplay_step(
        cfg, dqn_cfg, optimizer, G, learn_iters=learn_iters,
        per_aligned_capacity=200_000 if aligned else None,
    )
    p = mlp_init(jax.random.key(1), spec)
    t = jax.tree.map(jnp.copy, p)
    o = optimizer.init(p)
    buf = (per_init_aligned(200_000, T * G * cfg.num_players, example)
           if aligned else per_init(200_000, example))

    def multi(p, t, o, buf, key):
        def body(c, k):
            p2, t2, o2, b2, m = cyc(*c, k, 0.1)
            return (p2, t2, o2, b2), m["mean_score"]

        carry, scores = lax.scan(body, (p, t, o, buf), jax.random.split(key, CHAIN))
        (p2, _, _, b2) = carry
        return jnp.sum(scores) + jnp.sum(b2.priorities[:1]) + jnp.sum(p2["trunk"][0]["b"])

    return jax.jit(multi), (p, t, o, buf)


def main():
    for kind in ("no_act", "full_act"):
        ms = timeit(rollout_variant(kind), jax.random.key(0))
        print(f"rollout[{kind:8s}]           : {ms:6.2f} ms/cycle", flush=True)

    for aligned in (False, True):
        for iters in (0, 8):
            fn, st = cycle_variant(iters, aligned)
            ms = timeit(fn, *st, jax.random.key(5))
            lay = "aligned" if aligned else "ring   "
            print(f"cycle[{lay}, learn_iters={iters}]: {ms:6.2f} ms/cycle", flush=True)


if __name__ == "__main__":
    main()
