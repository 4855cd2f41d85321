"""Steady-state speedup of device-side learner updates (VERDICT r2 #2).

Runs the SAME learner-heavy tournament protocol twice -- host learn replay
(the round-2 default) vs ``device_learning=True`` (fused per-agent device
replay programs) -- and reports wall-clock per block plus the
assemble/device/replay split from ``DeviceBlockSession.timings``.

Population: two DQN-lattice learners (vanilla + the flagship noisy D3QN),
ACER, action-in-input REINFORCE, and a DrunkHamster; 2-4 players per game
drawn like the reference protocol.  Learner-heavy by construction: >=3 of
every 4 seats train every game.
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


def build_tournament():
    from rl6nimmt_tpu.agents import BatchedACERAgent, BatchedReinforceAgent, DrunkHamster
    from rl6nimmt_tpu.agents.dqn import DQNVanilla, Noisy_D3QN_PRB_NStep
    from rl6nimmt_tpu.tournament import Tournament

    t = Tournament(min_players=2, max_players=4)
    agents = {
        "dqn": DQNVanilla(seed=11, minibatch=64),
        "d3qn": Noisy_D3QN_PRB_NStep(seed=12, minibatch=64, n_steps=10,
                                     history_length=100_000),
        "acer": BatchedACERAgent(seed=13, warmup=100, minibatch=5),
        "reinforce": BatchedReinforceAgent(seed=14),
        "random": DrunkHamster(seed=15),
    }
    for name, agent in agents.items():
        if name != "random":
            agent.train()
        t.add_player(name, agent)
    return t


def run(device_learning: bool, games: int, block: int, seed: int):
    from rl6nimmt_tpu.runtime import device_tournament as DT

    np.random.seed(seed)
    t = build_tournament()
    # aggregate session timings across blocks by patching play()
    splits = {"assemble_s": 0.0, "device_s": 0.0, "replay_s": 0.0}
    # Patch finalize (not play): the tournament driver calls dispatch()/
    # finalize() directly since the round-5 pipelining split, and finalize
    # is where the timings dict is stamped.
    orig_finalize = DT.DeviceBlockSession.finalize

    def finalize(self):
        out = orig_finalize(self)
        for k in splits:
            splits[k] += self.timings.get(k, 0.0)
        return out

    DT.DeviceBlockSession.finalize = finalize
    try:
        # Warmup block (compiles) then timed blocks.
        t.play_device_block(block, device_learning=device_learning)
        for k in splits:
            splits[k] = 0.0
        start = time.perf_counter()
        played = block
        while played < games:
            t.play_device_block(block, device_learning=device_learning)
            played += block
        wall = time.perf_counter() - start
    finally:
        DT.DeviceBlockSession.finalize = orig_finalize
    return {
        "device_learning": device_learning,
        "games": played - block,
        "wall_s": round(wall, 2),
        "ms_per_game": round(wall / (played - block) * 1e3, 2),
        "splits_s": {k: round(v, 2) for k, v in splits.items()},
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=1000)
    parser.add_argument("--block", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--pairs", type=int, default=0,
                        help=">0: interleaved A/B pairs with mean +/- CI "
                             "(VERDICT r4 #4); each pair runs both arms, "
                             "order alternating, --games games per segment")
    parser.add_argument("--out", default="experiments/results/device_learn_speedup.json")
    args = parser.parse_args()

    if not args.pairs:
        results = {}
        for dl in (False, True):
            label = "device" if dl else "host"
            print(f"=== {label} learning: {args.games} games ===", flush=True)
            results[label] = run(dl, args.games, args.block, args.seed)
            print(json.dumps(results[label]), flush=True)

        results["speedup"] = round(
            results["host"]["wall_s"] / results["device"]["wall_s"], 3
        )
        print(json.dumps({"speedup_host_over_device": results["speedup"]}))
        Path(args.out).write_text(json.dumps(results, indent=1))
        return

    # ---- interleaved A/B with statistics (VERDICT r4 #4) ----------------
    # Each pair runs BOTH arms back to back on the same chip, alternating
    # order so tunnel/day drift cancels in the pairwise ratios.  Per-arm
    # mean +/- 95% CI (t-distribution over the per-segment ms/game) and a
    # CI over the per-pair speedup ratios; the verdict gate is whether the
    # ratio CI excludes 1.0.
    # two-sided 95% t critical values, keyed by DEGREES OF FREEDOM (n - 1)
    T_95 = {1: 12.71, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
            7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228}

    def ci95(xs):
        xs = np.asarray(xs, np.float64)
        m = float(xs.mean())
        if len(xs) < 2:
            return m, float("nan")
        t = T_95.get(len(xs) - 1, 2.0 if len(xs) > 11 else 12.71)
        return m, float(t * xs.std(ddof=1) / np.sqrt(len(xs)))

    segments = {"host": [], "device": []}
    details = {"host": [], "device": []}
    for pair in range(args.pairs):
        order = (False, True) if pair % 2 == 0 else (True, False)
        for dl in order:
            label = "device" if dl else "host"
            r = run(dl, args.games, args.block, args.seed + pair)
            segments[label].append(r["ms_per_game"])
            details[label].append(r)
            print(f"pair {pair} {label}: {r['ms_per_game']} ms/game "
                  f"(splits {r['splits_s']})", flush=True)

    host_m, host_ci = ci95(segments["host"])
    dev_m, dev_ci = ci95(segments["device"])
    ratios = [h / d for h, d in zip(segments["host"], segments["device"])]
    ratio_m, ratio_ci = ci95(ratios)
    verdict = (
        "device faster (CI excludes 1.0)" if ratio_m - ratio_ci > 1.0
        else "host faster (CI excludes 1.0)" if ratio_m + ratio_ci < 1.0
        else "statistical tie (CI includes 1.0)"
    )
    results = {
        "pairs": args.pairs,
        "games_per_segment": args.games,
        "block": args.block,
        "host_ms_per_game": {"mean": round(host_m, 2), "ci95": round(host_ci, 2),
                             "all": segments["host"]},
        "device_ms_per_game": {"mean": round(dev_m, 2), "ci95": round(dev_ci, 2),
                               "all": segments["device"]},
        "speedup_host_over_device": {"mean": round(ratio_m, 3),
                                     "ci95": round(ratio_ci, 3),
                                     "all": [round(r, 3) for r in ratios]},
        "verdict": verdict,
        "detail": details,
    }
    print(json.dumps({k: v for k, v in results.items() if k != "detail"},
                     indent=1), flush=True)
    Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
