"""N-seed learning-curve A/B for the performance-profile options (VERDICT r3 #3).

Two options were measured strength-neutral-per-cycle in round 3 but stayed
opt-in for bit-continuity:

* REINFORCE ``fused_grad=True`` (packed-row unrolled turns, 3.3x the
  cycles/s; identical trajectories on equal keys, loss to round-off);
* ACER ``on_policy_sequences=512`` (reference-like on:off balance, 3.1x;
  RNG stream of the default untouched).

This experiment closes the evidence gap with N independent seeds per arm:
equal-cycle curves for REINFORCE (the arms compute the same math), and
equal-WALL-CLOCK budgets for ACER (the honest production comparison --
cycle counts are derived from measured per-cycle time per arm).  Strength
is scored as win rate vs 3 uniform-random seats plus a direct
alternating-seat head-to-head between the arms, per seed, with seed-level
mean +- s.e. and a Welch t.

    python experiments/profile_ab.py [--seeds 8] [--out ...]
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

from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import MLPSpec, mlp_init
from rl6nimmt_tpu.runtime.arena import SeatPolicy, make_arena


def welch_t(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    if va + vb == 0:
        return 0.0
    return float((a.mean() - b.mean()) / np.sqrt(va + vb))


def arena_vs_random(cfg, spec, params, games, seed):
    policies = (SeatPolicy("policy", spec),) + (SeatPolicy("random"),) * 3
    arena = make_arena(cfg, policies, games)
    eps = (jnp.zeros(()),) * 4
    scores = np.asarray(arena((params, None, None, None), eps, jax.random.key(seed)))
    return float(np.sum(scores[:, 0] == scores.max(axis=1)) / games)


def head_to_head(spec, params_a, params_b, games, seed):
    cfg2 = EnvConfig(num_players=2)
    pol = (SeatPolicy("policy", spec), SeatPolicy("policy", spec))
    arena = make_arena(cfg2, pol, games)
    eps = (jnp.zeros(()),) * 2
    s_ab = np.asarray(arena((params_a, params_b), eps, jax.random.key(seed)))
    s_ba = np.asarray(arena((params_b, params_a), eps, jax.random.key(seed + 1)))
    wins = np.sum(s_ab[:, 0] > s_ab[:, 1]) + np.sum(s_ba[:, 1] > s_ba[:, 0])
    ties = np.sum(s_ab[:, 0] == s_ab[:, 1]) + np.sum(s_ba[:, 1] == s_ba[:, 0])
    return float((wins + 0.5 * ties) / (2 * games))


# ------------------------------------------------------------------ REINFORCE


def reinforce_ab(cfg, args):
    from rl6nimmt_tpu.runtime.vector import make_reinforce_train_step

    spec = MLPSpec(input_size=1 + cfg.state_length, hidden_sizes=(100, 100),
                   head_sizes=(1,))
    optimizer = optax.adam(1e-3)
    steps = {
        label: make_reinforce_train_step(cfg, spec, optimizer, args.games,
                                         fused_grad=fused)
        for label, fused in (("default", False), ("fused", True))
    }

    curves = {k: [] for k in steps}
    wins = {k: [] for k in steps}
    h2h = []
    for seed in range(args.seeds):
        params_by_arm = {}
        for label, step in steps.items():
            params = mlp_init(jax.random.key(100 + seed), spec)
            opt_state = optimizer.init(params)
            key = jax.random.key(200 + seed)
            curve = []
            for i in range(args.cycles):
                key, sub = jax.random.split(key)
                params, opt_state, m = step(params, opt_state, sub)
                if (i + 1) % args.curve_every == 0:
                    curve.append(round(float(m["mean_score"]), 3))
            curves[label].append(curve)
            wins[label].append(arena_vs_random(cfg, spec, params,
                                               args.eval_games, 777 + seed))
            params_by_arm[label] = params
        h2h.append(head_to_head(spec, params_by_arm["fused"],
                                params_by_arm["default"], args.eval_games,
                                900 + seed))
        print(f"[reinforce seed {seed}] default={wins['default'][-1]:.4f} "
              f"fused={wins['fused'][-1]:.4f} h2h(fused)={h2h[-1]:.4f}", flush=True)

    return {
        "spec": "action-in-input REINFORCE (registry 'reinforce')",
        "arms": {"default": "recompute-grad (bit-continuous)",
                 "fused": "fused_grad=True packed-row"},
        "protocol": f"{args.seeds} seeds x {args.cycles} cycles @ G={args.games} (equal cycles; identical rollout trajectories per seed)",
        "win_vs_3_random": {k: v for k, v in wins.items()},
        "seed_mean": {k: round(float(np.mean(v)), 4) for k, v in wins.items()},
        "seed_se": {k: round(float(np.std(v, ddof=1) / np.sqrt(len(v))), 4)
                    for k, v in wins.items()},
        "welch_t_default_minus_fused": round(welch_t(wins["default"], wins["fused"]), 3),
        "head_to_head_fused_rate": [round(x, 4) for x in h2h],
        "head_to_head_fused_mean": round(float(np.mean(h2h)), 4),
        "mean_score_curves": curves,
    }


# ----------------------------------------------------------------------- ACER


def acer_ab(cfg, args):
    from rl6nimmt_tpu.buffers import seq_init
    from rl6nimmt_tpu.runtime.vector import make_acer_selfplay_step

    spec = MLPSpec(input_size=1 + cfg.state_length, hidden_sizes=(100, 100),
                   head_sizes=(1, 1))
    optimizer = optax.adam(1e-3)
    example = {
        "state": jnp.zeros(cfg.state_length),
        "legal_cards": jnp.zeros(10, jnp.int32),
        "log_probs": jnp.zeros(10),
        "action_id": jnp.zeros((), jnp.int32),
        "reward": jnp.zeros(()),
        "done": jnp.zeros(()),
    }
    arms = {"all_fresh": None, "subsampled": 512}
    cycles_of = {}
    steps = {}
    for label, op in arms.items():
        steps[label] = make_acer_selfplay_step(
            cfg, spec, optimizer, args.games, minibatch=512,
            on_policy_sequences=op,
        )
        # Equal-wall budgets: time 5 cycles warm, derive each arm's count.
        params = mlp_init(jax.random.key(0), spec)
        opt_state = optimizer.init(params)
        buf = seq_init(1 << 15, cfg.max_turns, example)
        key = jax.random.key(1)
        params, opt_state, buf, m = steps[label](params, opt_state, buf, key)
        jax.block_until_ready(m["mean_score"])
        t0 = time.perf_counter()
        for i in range(5):
            key, sub = jax.random.split(key)
            params, opt_state, buf, m = steps[label](params, opt_state, buf, sub)
        jax.block_until_ready(m["mean_score"])
        cycles_of[label] = (time.perf_counter() - t0) / 5
    base = args.acer_cycles  # all_fresh cycle count
    counts = {
        "all_fresh": base,
        "subsampled": int(round(base * cycles_of["all_fresh"] / cycles_of["subsampled"])),
    }
    print(f"[acer] per-cycle s: { {k: round(v,3) for k,v in cycles_of.items()} } "
          f"-> equal-wall cycle counts {counts}", flush=True)

    curves = {k: [] for k in arms}
    wins = {k: [] for k in arms}
    h2h = []
    for seed in range(args.seeds):
        params_by_arm = {}
        for label in arms:
            params = mlp_init(jax.random.key(300 + seed), spec)
            opt_state = optimizer.init(params)
            buf = seq_init(1 << 15, cfg.max_turns, example)
            key = jax.random.key(400 + seed)
            curve = []
            every = max(1, counts[label] // (args.acer_cycles // args.curve_every_acer))
            for i in range(counts[label]):
                key, sub = jax.random.split(key)
                params, opt_state, buf, m = steps[label](params, opt_state, buf, sub)
                if (i + 1) % every == 0:
                    curve.append(round(float(m["mean_score"]), 3))
            curves[label].append(curve)
            wins[label].append(arena_vs_random(cfg, spec, params,
                                               args.eval_games, 555 + seed))
            params_by_arm[label] = params
        h2h.append(head_to_head(spec, params_by_arm["subsampled"],
                                params_by_arm["all_fresh"], args.eval_games,
                                600 + seed))
        print(f"[acer seed {seed}] all_fresh={wins['all_fresh'][-1]:.4f} "
              f"subsampled={wins['subsampled'][-1]:.4f} "
              f"h2h(subsampled)={h2h[-1]:.4f}", flush=True)

    return {
        "spec": "ACER (registry 'acer')",
        "arms": {"all_fresh": "on_policy_sequences=None (bit-continuous default)",
                 "subsampled": "on_policy_sequences=512"},
        "protocol": (f"{args.seeds} seeds, EQUAL WALL CLOCK: "
                     f"{counts['all_fresh']} all-fresh cycles vs "
                     f"{counts['subsampled']} subsampled cycles @ G={args.games}"),
        "equal_wall_cycle_counts": counts,
        "per_cycle_seconds": {k: round(v, 4) for k, v in cycles_of.items()},
        "win_vs_3_random": {k: v for k, v in wins.items()},
        "seed_mean": {k: round(float(np.mean(v)), 4) for k, v in wins.items()},
        "seed_se": {k: round(float(np.std(v, ddof=1) / np.sqrt(len(v))), 4)
                    for k, v in wins.items()},
        "welch_t_allfresh_minus_subsampled": round(
            welch_t(wins["all_fresh"], wins["subsampled"]), 3),
        "head_to_head_subsampled_rate": [round(x, 4) for x in h2h],
        "head_to_head_subsampled_mean": round(float(np.mean(h2h)), 4),
        "mean_score_curves": curves,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=8)
    parser.add_argument("--games", type=int, default=1024)
    parser.add_argument("--cycles", type=int, default=400)       # reinforce
    parser.add_argument("--acer-cycles", type=int, default=120)  # all-fresh arm
    parser.add_argument("--curve-every", type=int, default=25)
    parser.add_argument("--curve-every-acer", type=int, default=10)
    parser.add_argument("--eval-games", type=int, default=4096)
    parser.add_argument("--family", choices=("both", "reinforce", "acer"),
                        default="both")
    parser.add_argument("--out", default="experiments/results/profile_ab_r4.json")
    args = parser.parse_args()

    cfg = EnvConfig(num_players=4)
    out = {}
    if args.family in ("both", "reinforce"):
        out["reinforce"] = reinforce_ab(cfg, args)
    if args.family in ("both", "acer"):
        out["acer"] = acer_ab(cfg, args)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
