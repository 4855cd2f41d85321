"""Learning-strength A/B for the bench line-3 path (round 5).

The fused act-rollout + feature-major cycle differs from the XLA cycle in
two DOCUMENTED ways (PARITY.md #14): hardware-PRNG deals (not
key-reproducible) and replay slot order (t, p, g) vs (t, g, p).  The
in-bench guards pin the MECHANICS (act agreement, chained bit-identity);
this experiment pins the LEARNING: train the flagship Noisy-D3QN-PER-10step
from identical initializations under all three cycle variants for the same
budget, then score the final parameters in the device arena (greedy noisy
act vs 3 uniform-random seats, reference dqn.py:251-261 semantics).

Arms per seed (same init params, same cycle/update counts):
  * xla        -- bit-continuous XLA rollout (bench line 2 config)
  * pallas_rm  -- fused kernel, row-major replay (r4 line 3)
  * pallas_fm  -- fused kernel, feature-major replay (r5 line 3)

    python experiments/fm_strength_ab.py [--seeds 6] [--cycles 150]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax
from jax import lax

from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
from rl6nimmt_tpu.buffers import per_init, per_init_fm
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import mlp_init
from rl6nimmt_tpu.runtime.arena import SeatPolicy, make_arena
from rl6nimmt_tpu.runtime.vector import dqn_replay_example, make_dqn_selfplay_step

CFG = EnvConfig(num_players=4)
DQN = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                n_steps=10, hidden_sizes=(64,), minibatch=64)
SPEC = q_network_spec(DQN, CFG.state_length, CFG.num_actions)
G = 1024  # kernel minimum tile
CAP = 200_000


def train(arm: str, seed: int, cycles: int):
    params = mlp_init(jax.random.key(seed), SPEC)
    target = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    if arm == "kernel_insert":
        from rl6nimmt_tpu.buffers import per_init_kd
        from rl6nimmt_tpu.ops.act_rollout_kernel import S_PAD, SCAL_ROWS, TILE

        region = CFG.max_turns * CFG.num_players * TILE
        buf = per_init_kd(-(-CAP // region) * region, S_PAD, SCAL_ROWS)
        cycle = make_dqn_selfplay_step(
            CFG, DQN, optimizer, G, learn_iters=8, kernel_insert=True,
        )
    else:
        pallas = arm != "xla"
        fm = arm == "pallas_fm"
        buf = (per_init_fm if fm else per_init)(CAP, dqn_replay_example(CFG, compact=True))
        cycle = make_dqn_selfplay_step(
            CFG, DQN, optimizer, G, learn_iters=8,
            pallas_act_rollout=pallas, feature_major=fm,
        )

    @jax.jit
    def run(params, target, opt_state, buf, key):
        def body(c, k):
            p, t, o, b, m = cycle(*c, k, jnp.asarray(0.1))
            return (p, t, o, b), m["loss"]

        carry, losses = lax.scan(
            body, (params, target, opt_state, buf), jax.random.split(key, cycles)
        )
        return carry + (losses,)

    params, target, opt_state, buf, losses = run(
        params, target, opt_state, buf, jax.random.key(10_000 + seed)
    )
    assert np.all(np.isfinite(np.asarray(losses))), (arm, seed)
    return params


def evaluate(params, eval_games: int, eval_keys: int):
    """Greedy noisy DQN (seat 0) vs 3 uniform-random seats."""
    policies = (SeatPolicy("dqn", spec=SPEC, dqn_cfg=DQN),
                SeatPolicy("random"), SeatPolicy("random"), SeatPolicy("random"))
    arena = make_arena(CFG, policies, eval_games)
    scores, wins = [], []
    for e in range(eval_keys):
        s = np.asarray(arena((params, None, None, None),
                             (jnp.asarray(0.0),) * 4, jax.random.key(777 + e)))
        scores.append(s[:, 0].mean())
        wins.append((np.argmax(s, axis=1) == 0).mean())
    return float(np.mean(scores)), float(np.mean(wins))


def ci95(xs):
    T = {1: 12.71, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
         7: 2.365}
    xs = np.asarray(xs, float)
    if len(xs) < 2:
        return float(xs.mean()), float("nan")
    t = T.get(len(xs) - 1, 2.0)
    return float(xs.mean()), float(t * xs.std(ddof=1) / np.sqrt(len(xs)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=6)
    ap.add_argument("--arms", default="xla,pallas_rm,pallas_fm")
    ap.add_argument("--cycles", type=int, default=150)
    ap.add_argument("--eval-games", type=int, default=8192)
    ap.add_argument("--eval-keys", type=int, default=3)
    ap.add_argument("--out", default="experiments/results/fm_strength_ab.json")
    args = ap.parse_args()

    arms = tuple(args.arms.split(","))
    results = {a: {"score": [], "win": []} for a in arms}
    for seed in range(args.seeds):
        for arm in arms:
            params = train(arm, seed, args.cycles)
            sc, wn = evaluate(params, args.eval_games, args.eval_keys)
            results[arm]["score"].append(round(sc, 4))
            results[arm]["win"].append(round(wn, 4))
            print(f"seed {seed} {arm}: score {sc:.3f} win {wn:.3f}", flush=True)

    out = {"config": {"seeds": args.seeds, "cycles": args.cycles,
                      "games_per_cycle": G, "updates_per_cycle": 8,
                      "eval_games": args.eval_games, "eval_keys": args.eval_keys}}
    for a in arms:
        sm, sc = ci95(results[a]["score"])
        wm, wc = ci95(results[a]["win"])
        out[a] = {"score_mean": round(sm, 3), "score_ci95": round(sc, 3),
                  "win_mean": round(wm, 4), "win_ci95": round(wc, 4),
                  "per_seed_score": results[a]["score"],
                  "per_seed_win": results[a]["win"]}
    for other in [a for a in arms if a != "xla"]:
        deltas = [a - b for a, b in zip(results[other]["score"], results["xla"]["score"])]
        dm, dc = ci95(deltas)
        out[f"{other}_minus_xla_score"] = {
            "mean": round(dm, 3), "ci95": round(dc, 3),
            "equivalent": bool(abs(dm) <= dc or abs(dm) < 0.25),
        }
    print(json.dumps({k: v for k, v in out.items() if not isinstance(v, list)},
                     indent=1), flush=True)
    Path(args.out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
