"""Search-budget saturation: how much strength does each playout buy?

Alpha0.5's decision is argmax-of-mean-outcome over at most ``hand_size``
legal moves; with mc_max playouts that is >= mc_max/10 outcome samples per
move.  This sweep plays fresh-prior Alpha0.5 at budget N against fresh-prior
Alpha0.5 at a saturated budget (default 800) for N across the whole range,
alternating seats, all inside the per-seat-budget device program.

The resulting curve is the INFORMATION CEILING for any prior at budget N:
a prior can at best close the gap to the saturated searcher, so wherever
win(N vs 800) ~ 0.5 there is nothing left for a trained prior to add -- the
quantitative backbone of the prior-training writeup (RESULTS.md round 2).
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
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--budgets", default="8,16,32,50,100,200,400")
    parser.add_argument("--reference-budget", type=int, default=800)
    parser.add_argument("--games", type=int, default=512, help="games per seat order")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="experiments/results/budget_saturation.json")
    args = parser.parse_args(argv)

    from rl6nimmt_tpu.agents.device_search import KIND_PUCT
    from rl6nimmt_tpu.engine.state import EnvConfig
    from rl6nimmt_tpu.nets import MLPSpec, mlp_init
    from rl6nimmt_tpu.runtime.device_tournament import make_device_block_fn

    cfg = EnvConfig(num_players=2)
    spec = MLPSpec(input_size=cfg.state_length + 1, hidden_sizes=(100, 100),
                   head_sizes=(1,))
    fresh = mlp_init(jax.random.key(args.seed + 1234), spec)

    G, P = args.games, 2
    block = make_device_block_fn(cfg, spec, G, args.reference_budget, batch=8)
    rep = lambda x: jnp.broadcast_to(x[None, None], (G, P) + x.shape)
    params = jax.tree.map(rep, fresh)
    kinds = jnp.full((G, P), KIND_PUCT, jnp.int32)
    mc_pers = jnp.full((G, P), 10, jnp.int32)
    c_pucts = jnp.full((G, P), 2.0, jnp.float32)
    epses = jnp.zeros((G, P), jnp.float32)  # no learner seats

    results = {}
    key = jax.random.key(args.seed)
    for budget in [int(b) for b in args.budgets.split(",")]:
        t0 = time.perf_counter()
        wins = ties = n = 0
        for low_seat in (0, 1):
            budgets = np.full((G, P), args.reference_budget, np.int32)
            budgets[:, low_seat] = budget
            key, sub = jax.random.split(key)
            scores, _, _ = block(
                params, (), kinds, jnp.asarray(budgets), mc_pers, c_pucts, epses, sub
            )
            s = np.asarray(scores)
            wins += float(np.sum(s[:, low_seat] > s[:, 1 - low_seat]))
            ties += float(np.sum(s[:, low_seat] == s[:, 1 - low_seat]))
            n += G
        rate = (wins + 0.5 * ties) / n
        se = (rate * (1 - rate) / n) ** 0.5
        results[str(budget)] = {
            "win_rate_vs_saturated": round(rate, 4),
            "se": round(se, 4),
            "games": n,
        }
        print(
            f"mc_max={budget:4d} vs {args.reference_budget}: "
            f"{rate:.3f} ± {se:.3f} over {n} games "
            f"({time.perf_counter() - t0:.0f}s)",
            flush=True,
        )

    Path(args.out).write_text(json.dumps(results, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
