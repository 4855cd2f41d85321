"""Per-decision search latency: host-root path vs fully-device decisions.

Measures steady-state seconds per decision on a fixed opening position
(full 10-card hand, 4 players) for MCS and PUCT ("Alpha0.5"), comparing

* the host-root path (root logic on host, one device program per playout
  round — ``device_root=False``), and
* the device-root path (the whole decision as ONE jitted program,
  ``agents/device_search.py`` — ``device_root=True``),

optionally vmapped over a block of G simultaneous games (the block driver's
shape: one call decides all G).

    python experiments/search_latency.py --platform cpu
    python experiments/search_latency.py            # default (TPU) backend
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default=None, help="jax platform override")
    parser.add_argument("--mc-max", type=int, default=400)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--block", type=int, default=8)
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from rl6nimmt_tpu import SechsNimmtEnv
    from rl6nimmt_tpu.agents import MCSAgent, PUCTAgent

    env = SechsNimmtEnv(4, seed=123)
    states, legal = env.reset()
    state0, legal0 = np.asarray(states[0], np.float32), list(legal[0])

    def measure(agent, reps):
        # Fresh full-hand forward re-initializes the card memory each call,
        # so every rep is the same root decision.
        agent.forward(state0, legal0)  # compile / warm
        t0 = time.perf_counter()
        for _ in range(reps):
            agent.forward(state0, legal0)
        return (time.perf_counter() - t0) / reps

    def measure_block(agent, reps, G):
        memories = [agent.new_memory() for _ in range(G)]
        call = lambda: agent.forward_many([state0] * G, [legal0] * G, memories)
        call()
        t0 = time.perf_counter()
        for _ in range(reps):
            for m in memories:
                m["available_cards"] = []
                m["num_players"] = None
            call()
        return (time.perf_counter() - t0) / reps

    rows = []
    for name, cls, kwargs in [
        ("MCS", MCSAgent, {}),
        ("Alpha0.5", PUCTAgent, {}),
    ]:
        for device_root in (False, True):
            agent = cls(mc_max=args.mc_max, device_root=device_root, seed=0, **kwargs)
            dt1 = measure(agent, args.reps)
            dtG = measure_block(agent, max(args.reps // 2, 2), args.block)
            rows.append(
                {
                    "agent": name,
                    "mc_max": args.mc_max,
                    "device_root": device_root,
                    "s_per_decision": dt1,
                    "s_per_decision_block": dtG / args.block,
                    "block": args.block,
                }
            )
            print(
                f"{name:<9} mc_max={args.mc_max} device_root={str(device_root):<5} "
                f"{dt1*1e3:8.1f} ms/decision   "
                f"{dtG/args.block*1e3:8.1f} ms/decision in {args.block}-game blocks"
            )
    print(json.dumps({"platform": jax.devices()[0].platform, "rows": rows}))


if __name__ == "__main__":
    main()
