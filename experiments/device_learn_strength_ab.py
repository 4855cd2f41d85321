"""Per-family strength A/B: device-side learning vs host learn replay.

Closes PARITY.md #12b's open tolerance with evidence (VERDICT r3 #4): for
the two families whose device-learn parameter trajectories are NOT
bit-exact to the host replay -- PER-DQN (float32-vs-float64 priority /
IS-weight bookkeeping) and ACER (XLA scan-inlining round-off amplified by
Adam) -- train N seeds under the SAME tournament protocol with
``device_learning`` off vs on, then score both arms' final parameters:

* win rate vs 3 uniform-random seats (4-player arena, fixed eval seeds);
* direct alternating-seat head-to-head device-arm vs host-arm per seed.

Both arms of a seed share ``np.random.seed`` so lineups and the host-side
driver stream match; the device/host learner paths then diverge only by
their documented float tolerances.  REINFORCE is the bit-exact control
family (device == host parameter trajectories, tests/test_device_learn.py)
and is included to validate the harness: its per-seed arms must agree
exactly.

    python experiments/device_learn_strength_ab.py [--seeds 6] [--games 240]
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


def build_tournament(family: str, seed: int):
    from rl6nimmt_tpu.agents import BatchedACERAgent, BatchedReinforceAgent, DrunkHamster
    from rl6nimmt_tpu.agents.dqn import Noisy_D3QN_PRB_NStep
    from rl6nimmt_tpu.tournament import Tournament

    if family == "per_dqn":
        learner = Noisy_D3QN_PRB_NStep(seed=seed, minibatch=64, n_steps=10,
                                       history_length=100_000)
    elif family == "acer":
        learner = BatchedACERAgent(seed=seed, warmup=100, minibatch=5)
    elif family == "reinforce":
        learner = BatchedReinforceAgent(seed=seed)
    else:
        raise ValueError(family)
    learner.train()

    t = Tournament(min_players=2, max_players=4)
    t.add_player("learner", learner)
    t.add_player("r1", DrunkHamster(seed=seed + 1000))
    t.add_player("r2", DrunkHamster(seed=seed + 2000))
    return t, learner


def train_arm(family: str, seed: int, games: int, block: int, device_learning: bool):
    np.random.seed(seed)
    t, learner = build_tournament(family, seed)
    played = 0
    while played < games:
        t.play_device_block(block, device_learning=device_learning)
        played += block
    return learner


def eval_policy(family, learner, eval_games, seed):
    from rl6nimmt_tpu.engine import EnvConfig
    from rl6nimmt_tpu.runtime.arena import SeatPolicy, make_arena

    cfg = EnvConfig(num_players=4)
    if family == "per_dqn":
        me = SeatPolicy("dqn", learner.spec, learner.cfg)
    else:
        me = SeatPolicy("policy", learner.spec)
    policies = (me,) + (SeatPolicy("random"),) * 3
    arena = make_arena(cfg, policies, eval_games)
    eps = (jnp.zeros(()),) * 4
    scores = np.asarray(
        arena((learner.params, None, None, None), eps, jax.random.key(seed))
    )
    return float(np.sum(scores[:, 0] == scores.max(axis=1)) / eval_games)


def head_to_head(family, a, b, eval_games, seed):
    from rl6nimmt_tpu.engine import EnvConfig
    from rl6nimmt_tpu.runtime.arena import SeatPolicy, make_arena

    cfg2 = EnvConfig(num_players=2)
    if family == "per_dqn":
        pol = (SeatPolicy("dqn", a.spec, a.cfg), SeatPolicy("dqn", b.spec, b.cfg))
    else:
        pol = (SeatPolicy("policy", a.spec), SeatPolicy("policy", b.spec))
    arena = make_arena(cfg2, pol, eval_games)
    eps = (jnp.zeros(()),) * 2
    s_ab = np.asarray(arena((a.params, b.params), eps, jax.random.key(seed)))
    s_ba = np.asarray(arena((b.params, a.params), eps, jax.random.key(seed + 1)))
    wins = np.sum(s_ab[:, 0] > s_ab[:, 1]) + np.sum(s_ba[:, 1] > s_ba[:, 0])
    ties = np.sum(s_ab[:, 0] == s_ab[:, 1]) + np.sum(s_ba[:, 1] == s_ba[:, 0])
    return float((wins + 0.5 * ties) / (2 * eval_games))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=6)
    parser.add_argument("--games", type=int, default=240)
    parser.add_argument("--block", type=int, default=120)
    parser.add_argument("--eval-games", type=int, default=4096)
    parser.add_argument("--families", default="per_dqn,acer,reinforce")
    parser.add_argument("--out",
                        default="experiments/results/device_learn_strength_ab.json")
    args = parser.parse_args()

    out = {}
    for family in args.families.split(","):
        host_w, dev_w, h2h, params_equal = [], [], [], []
        for seed in range(args.seeds):
            arms = {}
            for dl in (False, True):
                learner = train_arm(family, 10 * seed + 1, args.games, args.block, dl)
                arms[dl] = learner
            host_w.append(eval_policy(family, arms[False], args.eval_games, 70 + seed))
            dev_w.append(eval_policy(family, arms[True], args.eval_games, 70 + seed))
            h2h.append(head_to_head(family, arms[True], arms[False],
                                    args.eval_games, 80 + seed))
            equal = all(
                np.array_equal(np.asarray(x), np.asarray(y))
                for x, y in zip(jax.tree.leaves(arms[False].params),
                                jax.tree.leaves(arms[True].params))
            )
            params_equal.append(bool(equal))
            print(f"[{family} seed {seed}] host={host_w[-1]:.4f} "
                  f"device={dev_w[-1]:.4f} h2h(device)={h2h[-1]:.4f} "
                  f"params_equal={equal}", flush=True)
        host_w, dev_w, h2h = map(np.asarray, (host_w, dev_w, h2h))
        n = args.seeds
        delta = dev_w - host_w
        out[family] = {
            "protocol": (f"{n} seeds x {args.games} tournament games vs 2 random "
                         f"agents (blocks of {args.block}), eval "
                         f"{args.eval_games} arena games"),
            "win_vs_3_random_host": [round(float(x), 4) for x in host_w],
            "win_vs_3_random_device": [round(float(x), 4) for x in dev_w],
            "delta_device_minus_host_mean": round(float(delta.mean()), 4),
            "delta_ci95": round(float(1.96 * delta.std(ddof=1) / np.sqrt(n)), 4)
            if n > 1 else None,
            "head_to_head_device_rate": [round(float(x), 4) for x in h2h],
            "head_to_head_device_mean": round(float(h2h.mean()), 4),
            "head_to_head_ci95": round(float(1.96 * h2h.std(ddof=1) / np.sqrt(n)), 4)
            if n > 1 else None,
            "final_params_bit_equal_per_seed": params_equal,
        }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
