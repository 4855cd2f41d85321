"""Decoupled-prior evaluation: does the trained Alpha0.5 prior help when it
only steers the ROOT?

Round-1 result: self-imitation training makes the prior predict search
choices (loss 60 -> 27 over 64k games) yet head-to-head strength vs a fresh
prior stays <= 0.5.  The diagnosed mechanism: one net is simultaneously the
PUCT root prior AND the playout policy of every seat of every determinized
rollout, so sharpening narrows root exploration and biases the opponent
model inside playouts at the same time.

This experiment isolates the two roles with the ``puct_uniform`` roster kind
(PUCT root prior from the net, uniform playout policy).  Matchups, all
alternating-seat 2-player device matches at several budgets:

  A. puct(trained)          vs puct(fresh)            -- round-1 negative, control
  B. puct_uniform(trained)  vs puct_uniform(fresh)    -- root-role value of training
  C. puct_uniform(trained)  vs puct(fresh)            -- decoupled-trained vs standard
  D. puct_uniform(fresh)    vs puct(fresh)            -- decoupling alone, no training

If the mechanism story is right: B > 0.5 (training helps once playouts are
unbiased) while A stays ~0.5; D measures how much of any gain is just the
uniform-playout architecture.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

import jax
import numpy as np


def head_to_head(match_ab, match_ba, params_a, params_b, key):
    """Alternating-seat win rate of side A (0.5 per tie)."""
    k1, k2 = jax.random.split(key)
    s_a = np.asarray(match_ab((params_a, params_b), k1))  # A in seat 0
    s_b = np.asarray(match_ba((params_b, params_a), k2))  # A in seat 1
    wins = float(np.sum(s_a[:, 0] > s_a[:, 1]) + np.sum(s_b[:, 1] > s_b[:, 0]))
    ties = float(np.sum(s_a[:, 0] == s_a[:, 1]) + np.sum(s_b[:, 1] == s_b[:, 0]))
    n = s_a.shape[0] + s_b.shape[0]
    rate = (wins + 0.5 * ties) / n
    return rate, (rate * (1 - rate) / n) ** 0.5, n


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--params", default="experiments/results/puct_prior2p_params.npz",
        help="trained prior (round-1 64k-game self-imitation artifact)",
    )
    parser.add_argument("--games", type=int, default=512, help="games per seat order")
    parser.add_argument("--budgets", default="50,100")
    parser.add_argument("--matchups", default="A,B,C,D")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from rl6nimmt_tpu.engine.state import EnvConfig
    from rl6nimmt_tpu.nets import MLPSpec, mlp_init
    from rl6nimmt_tpu.runtime.device_match import make_device_match_fn
    from rl6nimmt_tpu.utils import load_params

    cfg = EnvConfig(num_players=2)
    spec = MLPSpec(input_size=cfg.state_length + 1, hidden_sizes=(100, 100),
                   head_sizes=(1,))
    fresh = mlp_init(jax.random.key(args.seed + 1234), spec)
    trained = load_params(args.params, fresh)

    MATCHUPS = {
        "A": ("puct", trained, "puct", fresh),
        "B": ("puct_uniform", trained, "puct_uniform", fresh),
        "C": ("puct_uniform", trained, "puct", fresh),
        "D": ("puct_uniform", fresh, "puct", fresh),
    }

    results = {}
    key = jax.random.key(args.seed)
    for mc_max in [int(b) for b in args.budgets.split(",")]:
        for tag in args.matchups.split(","):
            kind_a, pa, kind_b, pb = MATCHUPS[tag]
            t0 = time.perf_counter()
            match_ab = make_device_match_fn(
                cfg, (kind_a, kind_b), spec, args.games, mc_max=mc_max
            )
            match_ba = make_device_match_fn(
                cfg, (kind_b, kind_a), spec, args.games, mc_max=mc_max
            )
            key, sub = jax.random.split(key)
            rate, se, n = head_to_head(match_ab, match_ba, pa, pb, sub)
            results[f"{tag}@{mc_max}"] = {
                "matchup": f"{kind_a}(A) vs {kind_b}(B)",
                "win_rate_A": round(rate, 4),
                "se": round(se, 4),
                "games": n,
                "mc_max": mc_max,
            }
            print(
                f"[{tag}@{mc_max}] {kind_a} vs {kind_b}: "
                f"{rate:.3f} ± {se:.3f} over {n} games "
                f"({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
