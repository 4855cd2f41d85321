"""Strength A/B: PUCT round-batch size K on the device search path.

The device decision runs mc_max playouts in ceil(mc_max/K) sequential
rounds; PUCT re-selects first moves from accumulated outcome statistics
between rounds (pending-count leaf parallelism, PARITY.md device-search
deviation; K=8 mirrors the host agent's ``batch_playouts`` default).  A
bigger K cuts the program's sequential depth ~K/8-fold — the dominant cost
of PUCT-containing tournament groups — but gives the root fewer statistics
refreshes.  This experiment measures whether that costs playing strength:

Seat 0 = Alpha0.5 (fixed random-init prior, identical across arms) vs a
common opposition (MCS, MCS, random) on SHARED deal keys per arm pair, so
the comparison is paired.  Reports seat-0 mean score and win rate per K
with a paired CI for (K - K_base) deltas.

    python experiments/puct_batch_ab.py --games 256 --keys 4 --ks 8,16,32
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

from rl6nimmt_tpu.engine.state import EnvConfig
from rl6nimmt_tpu.nets import MLPSpec, mlp_init
from rl6nimmt_tpu.runtime.device_match import make_device_match_fn


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=256)
    parser.add_argument("--keys", type=int, default=4)
    parser.add_argument("--ks", type=str, default="8,16,32")
    parser.add_argument("--mc-max", type=int, default=200)
    parser.add_argument("--out", type=str,
                        default="experiments/results/puct_batch_ab.json")
    args = parser.parse_args(argv)
    ks = [int(k) for k in args.ks.split(",")]

    cfg = EnvConfig(num_players=4)
    roster = ("puct", "uniform", "uniform", "random")
    spec = MLPSpec(input_size=cfg.state_length + 1, hidden_sizes=(100, 100),
                   head_sizes=(1,))
    prior = mlp_init(jax.random.key(7), spec)  # same fresh prior in every arm
    params = (prior, None, None, None)

    result = {"config": vars(args), "arms": {}}
    scores = {}  # k -> [keys, G] seat-0 scores
    for k in ks:
        fn = make_device_match_fn(
            cfg, roster, spec, args.games, args.mc_max, 10, k, 2.0
        )
        per_key, wall = [], []
        for e in range(args.keys):
            key = jax.random.key(1000 + e)  # SHARED across arms: paired deals
            t0 = time.perf_counter()
            s = np.asarray(jax.block_until_ready(fn(params, key)))
            wall.append(time.perf_counter() - t0)
            per_key.append(s)
        s = np.stack(per_key)  # [keys, G, P]
        scores[k] = s[:, :, 0]
        wins = (s[:, :, 0] == s.max(axis=2)).mean()
        result["arms"][str(k)] = {
            "mean_score": float(s[:, :, 0].mean()),
            "win_rate": float(wins),
            "warm_s_per_call": float(min(wall[1:]) if len(wall) > 1 else wall[0]),
        }
        print(f"K={k:3d} mean={s[:, :, 0].mean():7.3f} win={wins:.3f} "
              f"warm={min(wall[1:] or wall):.2f}s/{args.games}g")

    base = ks[0]
    n = scores[base].size
    for k in ks[1:]:
        d = (scores[k] - scores[base]).ravel()
        ci = 1.96 * d.std(ddof=1) / np.sqrt(n)
        result["arms"][str(k)]["paired_delta_vs_base"] = {
            "mean": float(d.mean()), "ci95": float(ci), "n": int(n),
        }
        print(f"K={k} - K={base}: delta={d.mean():+.3f} ± {ci:.3f} (CI95, n={n})")

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(result, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
