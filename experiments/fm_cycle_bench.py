"""A/B/C the flagship cycle: XLA rollout vs fused kernel (row-major replay)
vs fused kernel + feature-major replay (VERDICT r4 #3).

Run on the real chip: ``python experiments/fm_cycle_bench.py [--chain 256]``.
Prints ms/cycle and env-steps/s per arm, interleaved A/B/C repeats so
tunnel/day variance hits every arm equally.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
from rl6nimmt_tpu.buffers import per_init, per_init_aligned_fm, per_init_fm
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import mlp_init
from rl6nimmt_tpu.runtime.vector import dqn_replay_example, make_dqn_selfplay_step


def build(cfg, num_games, chain, pallas, fm, aligned=False):
    dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                        n_steps=10, hidden_sizes=(64,), minibatch=64)
    spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
    params = mlp_init(jax.random.key(1), spec)
    target = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    example = dqn_replay_example(cfg, compact=True)
    cap = 200_000
    insert = num_games * cfg.max_turns * cfg.num_players
    if aligned:
        buf = per_init_aligned_fm(cap, insert, example)
    else:
        buf = (per_init_fm if fm else per_init)(cap, example)
    cycle = make_dqn_selfplay_step(
        cfg, dqn_cfg, optimizer, num_games, learn_iters=8,
        pallas_act_rollout=pallas, feature_major=fm,
        per_aligned_capacity=cap if aligned else None,
    )

    def multi(params, target, opt_state, buf, key, eps):
        def body(c, k):
            p, t, o, b, m = cycle(*c, k, eps)
            return (p, t, o, b), m["loss"]

        carry, losses = lax.scan(
            body, (params, target, opt_state, buf), jax.random.split(key, chain)
        )
        return carry + (losses,)

    return jax.jit(multi), (params, target, opt_state, buf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=256)
    ap.add_argument("--games", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    cfg = EnvConfig(num_players=4)
    arms = {
        "xla": build(cfg, args.games, args.chain, False, False),
        "pallas_rm": build(cfg, args.games, args.chain, True, False),
        "pallas_fm": build(cfg, args.games, args.chain, True, True),
        "pallas_fm_aligned": build(cfg, args.games, args.chain, True, True,
                                   aligned=True),
    }
    eps = jnp.asarray(0.1)
    states = {}
    for name, (fn, st) in arms.items():
        out = fn(*st, jax.random.key(10), eps)  # warmup/compile
        states[name] = out[:4]
        assert np.all(np.isfinite(np.asarray(out[4]))), name

    times = {k: [] for k in arms}
    for r in range(args.reps):
        for name, (fn, _) in arms.items():
            start = time.perf_counter()
            out = fn(*states[name], jax.random.key(20 + r), eps)
            states[name] = out[:4]
            _ = np.asarray(out[4])
            times[name].append(time.perf_counter() - start)

    steps = args.games * cfg.max_turns * args.chain
    result = {}
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        result[name] = {
            "ms_per_cycle": round(med / args.chain * 1e3, 4),
            "steps_per_sec": round(steps / med, 1),
            "all_s": [round(t, 4) for t in ts],
        }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
