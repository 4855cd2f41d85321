"""Round-3 DQN-cycle decomposition: where do the 5.2 ms go? (chained, DCE-proof)

Variants of the flagship cycle (G=4096, Noisy-D3QN-PER-10step, 8 updates)
timed at chain=16 cycles per dispatch so the ~1.5 ms tunnel dispatch
amortizes away.  Every probe fetches a scalar that depends on all the work
claimed (actions+rewards -> score sums; buffers -> priority sums; learns ->
loss sums), so nothing can be dead-code-eliminated.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
import optax
from jax import lax

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec, q_values
from rl6nimmt_tpu.buffers import per_init
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.engine.env import deal, observe, step
from rl6nimmt_tpu.nets import mlp_init
from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step
from rl6nimmt_tpu.utils.tpu_ops import onehot_select, uniform_index

G, CHAIN = 4096, 16
cfg = EnvConfig(num_players=4)
dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                    n_steps=10, hidden_sizes=(64,), minibatch=64)
spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
params = mlp_init(jax.random.key(1), spec)

deal_b = jax.vmap(functools.partial(deal, cfg))
step_b = jax.vmap(functools.partial(step, cfg))
obs_b = jax.vmap(functools.partial(observe, cfg))

NEG_INF = -1e9


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


def chained(rollout_one):
    def many(key):
        def gen(acc, k):
            return acc + rollout_one(k), None

        acc, _ = lax.scan(gen, jnp.zeros(()), jax.random.split(key, CHAIN))
        return acc

    return jax.jit(many)


def make_variant(kind):
    def act(p, obs, masks, hands, key, eps):
        noise_key, eps_key, rand_key = jax.random.split(key, 3)
        if kind == "mean_net":
            q = q_values(dqn_cfg, spec, p, obs, None)  # no noisy draws
        else:
            q = q_values(dqn_cfg, spec, p, obs, noise_key)
        greedy = jnp.argmax(jnp.where(masks, q, NEG_INF), axis=-1)
        return greedy.astype(jnp.int32)

    def rollout_one(key):
        key, dk = jax.random.split(key)
        state = deal_b(jax.random.split(dk, G))

        def turn(carry, t):
            state, key = carry
            key, sub = jax.random.split(key)
            obs, masks = obs_b(state)
            if kind == "no_act":
                # uniform-legal instead of the net (the raw engine rollout)
                count = jnp.sum(state.hands_sorted >= 0, axis=-1)
                r = uniform_index(sub, count)
                actions = onehot_select(state.hands_sorted, r).astype(jnp.int32)
                probe = jnp.sum(obs)
            elif kind == "no_obs_net":
                # net runs on a zeros obs (same matmuls, no obs dependency);
                # obs still built for the probe so the env work stays live
                actions = act(params, jnp.zeros_like(obs), masks,
                              state.hands_sorted, sub, 0.1)
                probe = jnp.sum(obs)
            else:
                actions = act(params, obs, masks, state.hands_sorted, sub, 0.1)
                probe = 0.0
            state, rewards = step_b(state, actions)
            return (state, key), jnp.sum(rewards) + probe

        (state, _), probes = lax.scan(turn, (state, key), jnp.arange(cfg.max_turns))
        return jnp.sum(probes)

    return chained(rollout_one)


def main():
    key = jax.random.key(0)
    for kind in ("no_act", "mean_net", "no_obs_net", "full_act"):
        ms = timeit(make_variant(kind), key)
        print(f"rollout[{kind:10s}]: {ms:7.2f} ms/cycle", flush=True)

    # Full cycles with varying learn_iters to price the Bellman phase.
    optimizer = optax.adam(1e-3)
    example = {
        "state": jnp.zeros(cfg.state_length),
        "action": jnp.zeros((), jnp.int32),
        "reward": jnp.zeros(()),
        "next_state": jnp.zeros(cfg.state_length),
        "done": jnp.zeros(()),
    }
    for iters in (0, 1, 8):
        cyc = make_dqn_selfplay_step(cfg, dqn_cfg, optimizer, G, learn_iters=max(iters, 1))
        if iters == 0:
            # learn-free variant: rollout + harvest + buffer add only
            from rl6nimmt_tpu.buffers.per import per_add_batch

            inner = make_dqn_selfplay_step(cfg, dqn_cfg, optimizer, G, learn_iters=1)
            # reuse the module's internals by timing learn_iters=1 minus... skip;
            # approximate with learn_iters=1 below.
            continue
        p = mlp_init(jax.random.key(1), spec)
        t = jax.tree.map(jnp.copy, p)
        o = optimizer.init(p)
        buf = per_init(200_000, example)

        def multi(p, t, o, buf, key):
            def body(c, k):
                p2, t2, o2, b2, m = cyc(*c, k, 0.1)
                return (p2, t2, o2, b2), m["loss"]

            carry, losses = lax.scan(body, (p, t, o, buf), jax.random.split(key, CHAIN))
            return jnp.sum(losses)

        fn = jax.jit(multi)
        ms = timeit(fn, p, t, o, buf, jax.random.key(5))
        print(f"full cycle [learn_iters={iters}]: {ms:7.2f} ms/cycle", flush=True)


if __name__ == "__main__":
    main()
