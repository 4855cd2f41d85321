"""DCE-proof decomposition of the DQN cycle: act-rollout vs harvest vs scatter.

Every variant's probe sums outputs that depend on ALL the work it claims to
measure (actions/rewards for the rollout; buffer storage + priorities for
the adds), so XLA cannot delete the path being timed.
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
from rl6nimmt_tpu.buffers.per import per_add_batch
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.engine.env import deal, observe, step
from rl6nimmt_tpu.nets import mlp_init
from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step

G = 4096
CAP = 200_000
CHAIN = 16
cfg = EnvConfig(num_players=4)

dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                    n_steps=10, hidden_sizes=(64,), minibatch=64)
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
buf0 = per_init(CAP, example)

deal_batch = jax.vmap(functools.partial(deal, cfg))
step_batch = jax.vmap(functools.partial(step, cfg))
observe_batch = jax.vmap(functools.partial(observe, cfg))

NEG_INF = -1e9


def act(params, obs, masks, key, eps):
    noise_key, eps_key, rand_key = jax.random.split(key, 3)
    q = q_values(dqn_cfg, spec, params, obs, noise_key)
    return jnp.argmax(jnp.where(masks, q, NEG_INF), axis=-1).astype(jnp.int32)


def rollout(params, key, eps):
    key, deal_key = jax.random.split(key)
    state = deal_batch(jax.random.split(deal_key, G))

    def turn(carry, t):
        state, key = carry
        key, sub = jax.random.split(key)
        obs, masks = observe_batch(state)
        actions = act(params, obs, masks, sub, eps)
        state, rewards = step_batch(state, actions)
        return (state, key), (obs, actions, rewards.astype(jnp.float32))

    (state, _), (obs, actions, rewards) = lax.scan(turn, (state, key),
                                                   jnp.arange(cfg.max_turns))
    final_obs, _ = observe_batch(state)
    next_obs = jnp.concatenate([obs[1:], final_obs[None]], axis=0)
    return obs, actions, rewards, next_obs, -state.scores


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


# (a) act-rollout alone (probe: rewards + actions + obs checksum)
def roll_only(k):
    obs, actions, rewards, next_obs, scores = rollout(params, k, 0.1)
    return (jnp.sum(rewards) + jnp.sum(actions.astype(jnp.float32))
            + jnp.sum(obs) * 1e-9)
t = timed(chained(roll_only), jax.random.key(0))
print(f"act-rollout only:                  {t*1e3:7.2f} ms", flush=True)

# (b) rollout + harvest + PER add (probe: storage + priorities)
cycle0 = make_dqn_selfplay_step(cfg, dqn_cfg, optimizer, G, learn_iters=0)
def roll_add(k):
    p, tgt, o, b, m = cycle0(params, target, opt_state, buf0, k, jnp.asarray(0.1))
    return (jnp.sum(b.priorities) + jnp.sum(b.storage["reward"])
            + jnp.sum(b.storage["state"][:, 0]))
t = timed(chained(roll_add), jax.random.key(0))
print(f"rollout+harvest+add:               {t*1e3:7.2f} ms", flush=True)

# (c) scatter alone: fixed transitions, fresh add each iteration
fixed = {
    "state": jnp.ones((163840, cfg.state_length), jnp.float32),
    "action": jnp.ones((163840,), jnp.int32),
    "reward": jnp.ones((163840,), jnp.float32),
    "next_state": jnp.ones((163840, cfg.state_length), jnp.float32),
    "done": jnp.zeros((163840,), jnp.float32),
}
def add_only(k):
    # vary ptr via the key so the scatter can't be hoisted as loop-invariant
    ptr = jax.random.randint(k, (), 0, CAP, dtype=jnp.int32)
    b = buf0._replace(ptr=ptr)
    b = per_add_batch(b, fixed)
    return jnp.sum(b.priorities) + jnp.sum(b.storage["state"][:, 0])
t = timed(chained(add_only), jax.random.key(0))
print(f"PER add_batch (163840 rows) alone: {t*1e3:7.2f} ms", flush=True)

# (d) raw random rollout engine reference point (probe: rewards)
def raw(k):
    key, deal_key = jax.random.split(k)
    state = deal_batch(jax.random.split(deal_key, G))
    def turn(carry, t):
        state, key = carry
        key, sub = jax.random.split(key)
        obs, masks = observe_batch(state)
        hs = state.hands_sorted
        count = jnp.sum(hs >= 0, axis=-1)
        r = jnp.floor(jax.random.uniform(sub, count.shape) * count).astype(jnp.int32)
        slot = lax.broadcasted_iota(jnp.int32, hs.shape, 2)
        acts = jnp.sum(jnp.where(slot == r[..., None], hs, 0), axis=-1).astype(jnp.int32)
        state, rewards = step_batch(state, acts)
        return (state, key), jnp.sum(rewards) + jnp.sum(obs) * 1e-9
    (state, _), probes = lax.scan(turn, (state, k), jnp.arange(cfg.max_turns))
    return jnp.sum(probes)
t = timed(chained(raw), jax.random.key(0))
print(f"raw random rollout (XLA engine):   {t*1e3:7.2f} ms", flush=True)
