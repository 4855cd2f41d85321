"""Strength beyond reference parity: Alpha0.5 with a bigger playout budget.

The batched search makes playouts ~40x cheaper than the reference's loop, so
budgets far beyond the published mc_max=400 are practical.  This script
plays head-to-head GameSession matches (the host driver, exactly the
tournament's path) between a big-budget Alpha0.5 and reference-budget
opponents, reporting win rates and mean scores.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=100)
    parser.add_argument("--big", type=int, default=800)
    parser.add_argument("--small", type=int, default=400)
    parser.add_argument("--opponent", choices=["puct", "mcs"], default="puct")
    parser.add_argument("--platform", type=str, default="cpu")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    if args.games <= 0:
        parser.error("--games must be positive")

    if args.platform:
        rl6nimmt_tpu.use_platform(args.platform)
    np.random.seed(args.seed)

    from rl6nimmt_tpu.agents import MCSAgent, PUCTAgent
    from rl6nimmt_tpu.runtime.session import GameSession

    big = PUCTAgent(mc_max=args.big, seed=args.seed + 1)
    if args.opponent == "puct":
        small = PUCTAgent(mc_max=args.small, seed=args.seed + 2)
    else:
        small = MCSAgent(mc_max=args.small, seed=args.seed + 2)
    name_b = f"Alpha0.5@{args.big}"
    name_s = f"{args.opponent}@{args.small}"

    wins = np.zeros(2)
    totals = np.zeros(2)
    for g in range(args.games):
        # Alternate seats to cancel any seat bias.
        agents = [big, small] if g % 2 == 0 else [small, big]
        session = GameSession(*agents)
        session.play_game()
        scores = np.asarray(session.results[-1], dtype=np.float64)
        if g % 2 == 1:
            scores = scores[::-1]  # back to [big, small] order
        totals += scores
        if scores[0] > scores[1]:
            wins[0] += 1
        elif scores[1] > scores[0]:
            wins[1] += 1
        else:
            wins += 0.5
        if (g + 1) % 10 == 0:
            print(
                f"game {g+1:>4}: {name_b} wins {wins[0]:.1f} "
                f"({wins[0]/(g+1):.2f}), mean {totals[0]/(g+1):+.2f} "
                f"vs {name_s} {totals[1]/(g+1):+.2f}",
                flush=True,
            )
    n = args.games
    print(
        f"FINAL {name_b} vs {name_s} over {n} games: "
        f"win rate {wins[0]/n:.3f}, mean scores {totals[0]/n:+.2f} vs {totals[1]/n:+.2f}"
    )


if __name__ == "__main__":
    main()
