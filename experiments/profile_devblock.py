"""Profile the device-block tournament path: where does a warm block go?

Mirrors ``Tournament.play_device_block``'s grouping (same lineup sampler,
same signature buckets) for one block of N games with the notebook
population (Random, D3QN, ACER, MCS, Alpha0.5), and prints the per-group
wall split recorded by ``DeviceBlockSession.timings``:

* ``assemble_s`` — host: stacking per-seat params + block inputs,
* ``device_s``  — the fused device program including the trajectory fetch
  (which bounds execution on tunneled backends),
* ``replay_s``  — host: replaying every learner's ``learn`` stream.

Run twice internally (cold block compiles, warm block measures).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.agents import (
    BatchedACERAgent,
    DrunkHamster,
    MCSAgent,
    Noisy_D3QN_PRB_NStep,
    PUCTAgent,
)
from rl6nimmt_tpu.runtime.device_tournament import (
    DeviceBlockSession,
    LearnerSlot,
    lineup_fastclass,
    lineup_signature,
    seat_slot,
)
from rl6nimmt_tpu.tournament import Tournament


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=100)
    parser.add_argument("--mc-max", type=int, default=200)
    parser.add_argument("--blocks", type=int, default=2)
    parser.add_argument(
        "--bucket", type=int, default=None,
        help="fixed game-axis compile width shared by every group in every "
             "block (default: the pow2 ceiling of --games, so cold and warm "
             "blocks always land in the same compiled program)",
    )
    args = parser.parse_args(argv)
    # One fixed bucket across both blocks: bucket=None would let each group
    # compile at the pow2 ceiling of its own (random) size, so the warm block
    # could recompile and contaminate the measurement this script exists for.
    bucket = args.bucket or max(8, 1 << (args.games - 1).bit_length())

    np.random.seed(0)
    agents = {
        "Random": DrunkHamster(seed=0),
        "D3QN": Noisy_D3QN_PRB_NStep(history_length=int(1e5), n_steps=10, seed=1),
        "ACER": BatchedACERAgent(minibatch=10, seed=2),
        "MCS": MCSAgent(mc_max=args.mc_max, seed=3),
        "Alpha0.5": PUCTAgent(mc_max=args.mc_max, seed=4),
    }
    for a in agents.values():
        try:
            a.train()
        except Exception:
            pass
    tournament = Tournament(min_players=2, max_players=4)
    for name, agent in agents.items():
        tournament.add_player(name, agent)

    slots = set()
    for name in tournament.agents:
        role = seat_slot(tournament.agents[name])
        if role is not None and role[0] == "learner":
            slots.add(role[1])
    slots = tuple(sorted(slots, key=LearnerSlot.sort_key))

    for b in range(args.blocks):
        picks = [tournament._choose_players(None) for _ in range(args.games)]
        groups = {}
        for j, (names, ags) in enumerate(picks):
            sig = lineup_signature(ags)
            key = sig[:2] + (lineup_fastclass(ags),)
            groups.setdefault(key, []).append((j, ags))
        t0 = time.perf_counter()
        label = "cold" if b == 0 else "warm"
        for (cfg, _, fast), group in groups.items():
            sess = DeviceBlockSession(
                [ags for _, ags in group], bucket=bucket, slots=slots
            )
            sess.play()
            t = sess.timings
            print(
                f"[{label}] P={cfg.num_players} fast={fast} games={len(group)} "
                f"assemble={t['assemble_s']:.2f}s device={t['device_s']:.2f}s "
                f"replay={t['replay_s']:.2f}s"
            )
        print(f"[{label}] block total: {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
