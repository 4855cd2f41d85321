"""Strength equivalence: device-root vs host-root search decisions.

PARITY.md item 11 claims the fully-device decision path
(``device_root=True``, agents/device_search.py) is strength-equivalent to
the host-root path — same round structure and PUCT math, different PRNG
stream.  This script tests the claim head-to-head: the two variants of the
same agent play alternating-seat GameSession matches; under the null
hypothesis the win rate is 0.5.

    python experiments/devroot_equivalence.py --agent puct --games 200
    python experiments/devroot_equivalence.py --agent mcs  --games 200
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--agent", choices=["puct", "mcs", "policy_mcs"], default="puct")
    parser.add_argument("--games", type=int, default=200)
    parser.add_argument("--mc-max", type=int, default=200)
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    if args.platform:
        rl6nimmt_tpu.use_platform(args.platform)
    np.random.seed(args.seed)

    from rl6nimmt_tpu.agents import MCSAgent, PolicyMCSAgent, PUCTAgent
    from rl6nimmt_tpu.runtime.session import GameSession

    cls = {"puct": PUCTAgent, "mcs": MCSAgent, "policy_mcs": PolicyMCSAgent}[args.agent]
    device = cls(mc_max=args.mc_max, device_root=True, seed=args.seed + 1)
    host = cls(mc_max=args.mc_max, device_root=False, seed=args.seed + 2)

    # Eval mode: no learning, pure play strength.
    scores_d, scores_h, wins_d = [], [], 0.0
    for g in range(args.games):
        agents = [device, host] if g % 2 == 0 else [host, device]
        session = GameSession(*agents)
        session.play_game()
        s = np.asarray(session.results[-1], np.float64)
        d, h = (s[0], s[1]) if g % 2 == 0 else (s[1], s[0])
        scores_d.append(d)
        scores_h.append(h)
        wins_d += 1.0 if d > h else (0.5 if d == h else 0.0)
        if (g + 1) % 50 == 0:
            print(
                f"{g+1:>4} games: device-root win rate "
                f"{wins_d/(g+1):.3f}, mean {np.mean(scores_d):.2f} vs {np.mean(scores_h):.2f}"
            )

    n = args.games
    rate = wins_d / n
    se = (0.25 / n) ** 0.5  # binomial SE under the null p=0.5
    z = (rate - 0.5) / se
    verdict = "equivalent (|z| < 2)" if abs(z) < 2 else "SIGNIFICANT DIFFERENCE"
    print(
        json.dumps(
            {
                "agent": args.agent,
                "mc_max": args.mc_max,
                "games": n,
                "device_root_win_rate": rate,
                "z_vs_null_0.5": z,
                "mean_score_device": float(np.mean(scores_d)),
                "mean_score_host": float(np.mean(scores_h)),
                "verdict": verdict,
            }
        )
    )


if __name__ == "__main__":
    main()
