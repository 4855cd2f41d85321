"""ACER on-policy ratio A/B: all-fresh (historical default) vs subsampled.

The vectorized ACER cycle historically ran its on-policy update on ALL
``G*P`` fresh sequences (on:off update sample ratio 32:1 at G=4096 vs the
reference's 1-fresh-per-flush cadence, actor_critic.py:173-177) and that
phase dominated the cycle (~7 of 17.7 ms).  ``on_policy_sequences=512``
restores the reference-like balance and runs the cycle ~3x faster
(2.31M -> 7.16M env-steps/s, experiments/bench_trainable.py).

This A/B answers the remaining question (VERDICT r2 #3): is the ratio
strength-relevant PER CYCLE?  Both arms train the same number of cycles at
the same G with the same seeds; strength is then measured two ways:

* each arm vs 3 uniform-random seats (4-player arena win rate), and
* A vs B directly (2-player alternating-seat device matches via the
  policy-head arena).

If per-cycle strength is ~equal, the subsampled configuration strictly
dominates (same strength per cycle, 3x the cycles per second).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax


def train(cfg, spec, games, steps, seed, on_policy):
    from rl6nimmt_tpu.buffers import seq_init
    from rl6nimmt_tpu.runtime.vector import make_acer_selfplay_step

    from rl6nimmt_tpu.nets import mlp_init

    optimizer = optax.adam(1e-3)
    params = mlp_init(jax.random.key(seed), spec)
    opt_state = optimizer.init(params)
    example = {
        "state": jnp.zeros(cfg.state_length),
        "legal_cards": jnp.zeros(10, jnp.int32),
        "log_probs": jnp.zeros(10),
        "action_id": jnp.zeros((), jnp.int32),
        "reward": jnp.zeros(()),
        "done": jnp.zeros(()),
    }
    buf = seq_init(1 << 16, cfg.max_turns, example)
    cycle = make_acer_selfplay_step(
        cfg, spec, optimizer, games, minibatch=512, on_policy_sequences=on_policy
    )
    key = jax.random.key(seed + 1)
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, buf, metrics = cycle(params, opt_state, buf, sub)
    jax.block_until_ready(metrics["mean_score"])
    return params, time.perf_counter() - t0, float(np.asarray(metrics["mean_score"]))


def arena_vs_random(cfg, spec, params, games, seed):
    from rl6nimmt_tpu.runtime.arena import SeatPolicy, make_arena

    policies = (SeatPolicy("policy", spec),) + (SeatPolicy("random"),) * 3
    arena = make_arena(cfg, policies, games)
    eps = (jnp.zeros(()),) * 4
    scores = np.asarray(arena((params, None, None, None), eps, jax.random.key(seed)))
    wins = np.sum(scores[:, 0] == scores.max(axis=1))
    return float(wins / games)


def head_to_head(spec, params_a, params_b, games, seed):
    from rl6nimmt_tpu.engine import EnvConfig
    from rl6nimmt_tpu.runtime.arena import SeatPolicy, make_arena

    cfg2 = EnvConfig(num_players=2)
    pol = (SeatPolicy("policy", spec), SeatPolicy("policy", spec))
    arena = make_arena(cfg2, pol, games)
    eps = (jnp.zeros(()),) * 2
    s_ab = np.asarray(arena((params_a, params_b), eps, jax.random.key(seed)))
    s_ba = np.asarray(arena((params_b, params_a), eps, jax.random.key(seed + 1)))
    wins = np.sum(s_ab[:, 0] > s_ab[:, 1]) + np.sum(s_ba[:, 1] > s_ba[:, 0])
    ties = np.sum(s_ab[:, 0] == s_ab[:, 1]) + np.sum(s_ba[:, 1] == s_ba[:, 0])
    n = 2 * games
    rate = (wins + 0.5 * ties) / n
    return float(rate), float((rate * (1 - rate) / n) ** 0.5), n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=4096)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--on-policy", type=int, default=512)
    parser.add_argument("--eval-games", type=int, default=4096)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="experiments/results/acer_onpolicy_ab.json")
    args = parser.parse_args()

    from rl6nimmt_tpu.engine import EnvConfig
    from rl6nimmt_tpu.nets import MLPSpec

    cfg = EnvConfig(num_players=4)
    spec = MLPSpec(input_size=1 + cfg.state_length, hidden_sizes=(100, 100),
                   head_sizes=(1, 1))

    out = {"games": args.games, "steps": args.steps, "on_policy": args.on_policy}
    arms = {}
    for label, op in (("all_fresh", None), ("subsampled", args.on_policy)):
        params, secs, score = train(cfg, spec, args.games, args.steps, args.seed, op)
        win = arena_vs_random(cfg, spec, params, args.eval_games, args.seed + 7)
        arms[label] = {"params": params, "train_s": round(secs, 1),
                       "final_mean_score": round(score, 3),
                       "win_vs_3_random": round(win, 4)}
        print(f"[{label}] train {secs:.1f}s  final score {score:.3f}  "
              f"win vs 3 random {win:.4f}", flush=True)

    rate, se, n = head_to_head(
        spec, arms["all_fresh"]["params"], arms["subsampled"]["params"],
        args.eval_games, args.seed + 17,
    )
    print(f"[head-to-head] all_fresh vs subsampled: {rate:.4f} ± {se:.4f} "
          f"over {n} games", flush=True)
    out.update({
        k: {kk: vv for kk, vv in v.items() if kk != "params"}
        for k, v in arms.items()
    })
    out["all_fresh_win_vs_subsampled"] = {"rate": round(rate, 4),
                                          "se": round(se, 4), "games": n}
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
