"""Trainable throughput: env-steps/s of the REAL training cycles.

The headline bench (bench.py) measures the fused random-play kernel; this
script measures what a learner actually sustains: full self-play + update
cycles (`make_reinforce_train_step`, `make_dqn_selfplay_step`,
`make_acer_selfplay_step`) at G parallel games on one chip.  One env step =
one simultaneous-move turn of one game (all seats act, board resolves),
same definition as bench.py; a cycle contributes G * max_turns env steps
regardless of how many minibatch updates follow, so the number is honest
about training overhead.

Prints one JSON line per learner.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from jax import lax

from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
from rl6nimmt_tpu.buffers import per_init, ring_init, seq_init
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import MLPSpec, mlp_init


def time_cycles(fn, args_fn, iters=8, warmup=2):
    """Median seconds/cycle; every output fetched to host (tunnel-honest)."""
    carry = None
    for _ in range(warmup):
        carry = fn(*args_fn(carry))
        jax.block_until_ready(carry)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        carry = fn(*args_fn(carry))
        # Fetch a scalar: on tunneled backends only a host fetch bounds work.
        _ = float(np.asarray(jax.tree.leaves(carry)[0]).ravel()[0])
        times.append(time.perf_counter() - start)
    return sorted(times)[len(times) // 2]


def bench_reinforce(cfg, G, key, chain=1, dtype="float32", fused=False):
    from rl6nimmt_tpu.runtime.vector import make_reinforce_train_step

    spec = MLPSpec(input_size=cfg.state_length + 1, hidden_sizes=(100, 100),
                   head_sizes=(1,), compute_dtype=dtype)
    params = mlp_init(jax.random.key(0), spec)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    train = make_reinforce_train_step(cfg, spec, optimizer, G, fused_grad=fused)

    # chain > 1: run `chain` full cycles per dispatch via lax.scan --
    # production cadence; amortizes the host->device round trip.
    def multi(params, opt_state, key):
        def body(c, k):
            p, o, m = train(c[0], c[1], k)
            return (p, o), m["loss"]
        (p, o), losses = lax.scan(body, (params, opt_state),
                                  jax.random.split(key, chain))
        return p, o, losses
    fn = jax.jit(multi) if chain > 1 else train

    state = {"params": params, "opt": opt_state, "i": 0}

    def args(carry):
        if carry is not None:
            state["params"], state["opt"] = carry[0], carry[1]
        state["i"] += 1
        return state["params"], state["opt"], jax.random.key(state["i"])

    return time_cycles(fn, args)


def bench_dqn(cfg, G, key, per=True, chain=1, dtype="float32"):
    import dataclasses

    from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step

    dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=per,
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
    buf = (per_init if per else ring_init)(200_000, example)
    cycle = make_dqn_selfplay_step(cfg, dqn_cfg, optimizer, G, learn_iters=8)

    def multi(params, target, opt_state, buf, key, eps):
        def body(c, k):
            p, t, o, b, m = cycle(*c, k, eps)
            return (p, t, o, b), m["loss"]
        carry, losses = lax.scan(body, (params, target, opt_state, buf),
                                 jax.random.split(key, chain))
        return carry + (losses,)
    fn = jax.jit(multi) if chain > 1 else cycle

    state = {"c": (params, target, opt_state, buf), "i": 0}

    def args(carry):
        if carry is not None:
            state["c"] = carry[:4]
        state["i"] += 1
        p, t, o, b = state["c"]
        return p, t, o, b, jax.random.key(state["i"]), jnp.asarray(0.1)

    return time_cycles(fn, args)


def bench_acer(cfg, G, key, chain=1, dtype="float32", on_policy=None, packed=False):
    from rl6nimmt_tpu.runtime.vector import make_acer_selfplay_step

    spec = MLPSpec(input_size=1 + cfg.state_length, hidden_sizes=(100, 100),
                   head_sizes=(1, 1), compute_dtype=dtype)
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
    cycle = make_acer_selfplay_step(
        cfg, spec, optimizer, G, minibatch=512, on_policy_sequences=on_policy,
        packed_rows=packed,
    )

    def multi(params, opt_state, buf, key):
        def body(c, k):
            p, o, b, m = cycle(*c, k)
            return (p, o, b), m["critic_loss"]
        carry, losses = lax.scan(body, (params, opt_state, buf),
                                 jax.random.split(key, chain))
        return carry + (losses,)
    fn = jax.jit(multi) if chain > 1 else cycle

    state = {"c": (params, opt_state, buf), "i": 0}

    def args(carry):
        if carry is not None:
            state["c"] = carry[:3]
        state["i"] += 1
        p, o, b = state["c"]
        return p, o, b, jax.random.key(state["i"])

    return time_cycles(fn, args)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=4096)
    parser.add_argument("--learners", default="reinforce,dqn,acer")
    parser.add_argument("--chain", type=int, default=1,
                        help="cycles fused per dispatch (amortizes tunnel latency)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="policy matmul compute dtype (bfloat16 feeds the "
                             "MXU at full rate; f32 params/accumulation)")
    parser.add_argument("--reinforce-fused", action="store_true",
                        help="differentiate through the rollout's own forward "
                             "(fused_grad=True; round-off-equivalent)")
    parser.add_argument("--acer-packed", action="store_true",
                        help="packed-row unrolled ACER train step")
    parser.add_argument("--acer-on-policy", type=int, default=None,
                        help="subsample the ACER on-policy phase to this many "
                             "fresh sequences (default: all G*P)")
    args = parser.parse_args()

    cfg = EnvConfig(num_players=4)
    G = args.games
    steps_per_call = G * cfg.max_turns * args.chain
    key = jax.random.key(0)

    benches = {"reinforce": bench_reinforce, "dqn": bench_dqn, "acer": bench_acer}
    for name in args.learners.split(","):
        kw = {"on_policy": args.acer_on_policy, "packed": args.acer_packed} if name == "acer" else {}
        if name == "reinforce" and args.reinforce_fused:
            kw["fused"] = True
        sec = benches[name](cfg, G, key, chain=args.chain, dtype=args.dtype, **kw)
        print(json.dumps({
            "metric": f"trainable env-steps/s @ {G} games ({name} selfplay+update cycle"
                      + (f", {args.chain} chained" if args.chain > 1 else "")
                      + (", bf16" if args.dtype == "bfloat16" else "")
                      + (f", on-policy {args.acer_on_policy}" if name == "acer" and args.acer_on_policy else "")
                      + (", fused-grad" if name == "reinforce" and args.reinforce_fused else "")
                      + (", packed" if name == "acer" and args.acer_packed else "")
                      + ")",
            "value": round(steps_per_call / sec, 1),
            "unit": "steps/s",
            "seconds_per_cycle": round(sec / args.chain, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
