"""Decompose the trainable-cycle time: rollout vs buffer ops vs updates.

The trainable bench (`bench_trainable.py`) publishes whole-cycle steps/s;
this script times each component of the DQN/REINFORCE cycles separately so
optimization effort lands where the time actually goes.  Every timed
program carries its state through a `lax.scan` of `--chain` iterations
(params through updates, buffers through adds) so XLA cannot dead-code the
backward pass or the scatter, and a scalar that depends on the carried
state is fetched per dispatch.

Usage: python experiments/profile_trainable.py [--games 4096] [--dtype bfloat16]
"""

import argparse
import dataclasses
import json
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

from rl6nimmt_tpu.agents.dqn import DQNConfig, make_learn_step, q_network_spec
from rl6nimmt_tpu.buffers import per_init
from rl6nimmt_tpu.buffers.per import per_add_batch, per_sample, per_update
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import MLPSpec, mlp_init


def timed(fn, *args, iters=8, warmup=2):
    """Median wall seconds of fn(*args); output fetched to host each call."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        times.append(time.perf_counter() - start)
    return sorted(times)[len(times) // 2]


def chain_carry(body, init, n):
    """Scan `body(carry, key) -> carry` n times; probe = first leaf's sum.

    The carry threads through every iteration, so per-iteration work that
    feeds the carry (param updates, buffer writes) cannot be eliminated.
    """

    def many(key, *init_args):
        carry, _ = lax.scan(
            lambda c, k: (body(c, k), None),
            init(*init_args),
            jax.random.split(key, n),
        )
        return jnp.sum(jax.tree.leaves(carry)[0].astype(jnp.float32))

    return jax.jit(many)


def profile_reinforce(cfg, G, n, dtype):
    from rl6nimmt_tpu.runtime.vector import make_reinforce_rollout, make_reinforce_train_step

    spec = MLPSpec(input_size=cfg.state_length + 1, hidden_sizes=(100, 100),
                   head_sizes=(1,), compute_dtype=dtype)
    params = mlp_init(jax.random.key(0), spec)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    # Rollout only: carry the score total (actions depend on the forwards,
    # rewards depend on actions -- nothing to eliminate).
    rollout = make_reinforce_rollout(cfg, spec, G)
    roll_fn = chain_carry(
        lambda tot, k: tot + jnp.sum(rollout(params, k)[1].astype(jnp.float32)),
        lambda: jnp.zeros(()), n,
    )
    t_roll = timed(roll_fn, jax.random.key(1)) / n

    # Full cycle: params/opt-state carried through every update.
    train = make_reinforce_train_step(cfg, spec, optimizer, G)
    full_fn = chain_carry(
        lambda c, k: train(c[0], c[1], k)[:2],
        lambda: (params, opt_state), n,
    )
    t_full = timed(full_fn, jax.random.key(2)) / n

    steps = G * cfg.max_turns
    print(json.dumps({
        "learner": "reinforce", "dtype": dtype,
        "rollout_ms": round(t_roll * 1e3, 2),
        "full_cycle_ms": round(t_full * 1e3, 2),
        "lossgrad+update_ms": round((t_full - t_roll) * 1e3, 2),
        "steps_per_s_full": round(steps / t_full, 1),
    }), flush=True)


def profile_dqn(cfg, G, n, dtype):
    from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step

    CAP = 200_000
    dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                        n_steps=10, hidden_sizes=(64,), minibatch=64)
    spec = dataclasses.replace(
        q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions),
        compute_dtype=dtype,
    )
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

    # Warm the buffer once (full + realistic priorities).
    cycle8 = make_dqn_selfplay_step(cfg, dqn_cfg, optimizer, G, learn_iters=8)
    warm = jax.jit(lambda b, k: cycle8(params, target, opt_state, b, k, jnp.asarray(0.1))[3])
    buf = warm(buf0, jax.random.key(3))
    for i in range(4):
        buf = warm(buf, jax.random.key(10 + i))
    jax.block_until_ready(buf)

    # (a) rollout + harvest + buffer add, no updates.
    cycle0 = make_dqn_selfplay_step(cfg, dqn_cfg, optimizer, G, learn_iters=0)
    roll_fn = chain_carry(
        lambda b, k: cycle0(params, target, opt_state, b, k, jnp.asarray(0.1))[3],
        lambda: buf, n,
    )
    t_roll = timed(roll_fn, jax.random.key(4)) / n

    # (b) full cycle with the bench's learn_iters=8.
    full_fn = chain_carry(
        lambda c, k: cycle8(c[0], c[1], c[2], c[3], k, jnp.asarray(0.1))[:4],
        lambda: (params, target, opt_state, buf), n,
    )
    t_full = timed(full_fn, jax.random.key(5)) / n

    # (c) one bare Bellman update incl. PER sample + priority writeback,
    # params AND priorities carried.
    learn_step = make_learn_step(dqn_cfg, spec, optimizer, 0.99)

    def one_update(c, key):
        p, t_, o, b = c
        sample_key, learn_key = jax.random.split(key)
        b, idx, weights, batch = per_sample(b, sample_key, dqn_cfg.minibatch)
        batch = dict(batch, weights=weights)
        p, t_, o, loss, abs_err, _ = learn_step(p, t_, o, batch, True, learn_key)
        b = per_update(b, idx, abs_err)
        return (p, t_, o, b)

    upd_fn = chain_carry(one_update, lambda: (params, target, opt_state, buf), n)
    t_upd = timed(upd_fn, jax.random.key(6)) / n

    # (d) PER sample alone (cumsum + searchsorted + gather), priorities carried.
    def sample_only(c, key):
        b, acc = c
        b, idx, weights, batch = per_sample(b, key, dqn_cfg.minibatch)
        return (b, acc + jnp.sum(weights) + jnp.sum(batch["reward"]))

    samp_fn = chain_carry(sample_only, lambda: (buf, jnp.zeros(())), n)
    t_samp = timed(samp_fn, jax.random.key(7)) / n

    steps = G * cfg.max_turns
    print(json.dumps({
        "learner": "dqn", "dtype": dtype, "capacity": CAP,
        "rollout+harvest+add_ms": round(t_roll * 1e3, 2),
        "full_cycle_ms": round(t_full * 1e3, 2),
        "8_updates_ms": round((t_full - t_roll) * 1e3, 2),
        "1_update_ms": round(t_upd * 1e3, 3),
        "1_per_sample_ms": round(t_samp * 1e3, 3),
        "steps_per_s_full": round(steps / t_full, 1),
    }), flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=4096)
    parser.add_argument("--chain", type=int, default=16)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--learners", default="reinforce,dqn")
    args = parser.parse_args()

    cfg = EnvConfig(num_players=4)
    for name in args.learners.split(","):
        {"reinforce": profile_reinforce, "dqn": profile_dqn}[name](
            cfg, args.games, args.chain, args.dtype
        )


if __name__ == "__main__":
    main()
