"""Throughput of fully-device matches vs the host match driver.

Head-to-head strength evaluations (Alpha0.5 vs MCS etc.) are the recurring
experimental workload of this repo.  The host driver (GameSession with
device-root decisions) crosses the tunnel ~20x per game; the device-match
path (:mod:`rl6nimmt_tpu.runtime.device_match`) plays G COMPLETE matches —
deal, per-seat determinized search with card memory, resolution — in one
program, so an entire evaluation is a handful of dispatches.

    python experiments/device_match_bench.py --games 128 --per-call 32
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

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=128)
    parser.add_argument("--per-call", type=int, default=32)
    parser.add_argument("--mc-max", type=int, default=200)
    parser.add_argument("--players", type=int, default=2)
    parser.add_argument("--roster", nargs="+", default=["puct", "uniform"])
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--host-games", type=int, default=16,
                        help="games for the host-driver comparison (0 = skip)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    if args.platform:
        rl6nimmt_tpu.use_platform(args.platform)
    assert len(args.roster) == args.players

    import jax

    from rl6nimmt_tpu.engine.state import EnvConfig
    from rl6nimmt_tpu.nets import MLPSpec, mlp_init
    from rl6nimmt_tpu.runtime.device_match import make_device_match_fn

    cfg = EnvConfig(num_players=args.players)
    spec = MLPSpec(input_size=cfg.state_length + 1, head_sizes=(1,))
    needs_net = [k in ("policy", "puct") for k in args.roster]
    params = tuple(
        mlp_init(jax.random.key(args.seed + i), spec) if need else None
        for i, need in enumerate(needs_net)
    )
    fn = make_device_match_fn(
        cfg, tuple(args.roster), spec if any(needs_net) else None,
        num_games=args.per_call, mc_max=args.mc_max,
    )

    key = jax.random.key(args.seed + 100)
    key, k0 = jax.random.split(key)
    t0 = time.perf_counter()
    np.asarray(fn(params, k0))  # compile
    compile_s = time.perf_counter() - t0

    all_scores = []
    t0 = time.perf_counter()
    for _ in range(max(1, args.games // args.per_call)):
        key, k = jax.random.split(key)
        all_scores.append(np.asarray(fn(params, k)))
    dt = time.perf_counter() - t0
    scores = np.concatenate(all_scores)
    n = len(scores)
    win0 = float((scores[:, 0] > scores[:, 1]).mean() + 0.5 * (scores[:, 0] == scores[:, 1]).mean()) if args.players == 2 else None

    host_dt = None
    if args.host_games:
        from rl6nimmt_tpu.agents import DrunkHamster, MCSAgent, PolicyMCSAgent, PUCTAgent

        cls = {"random": DrunkHamster, "uniform": MCSAgent,
               "policy": PolicyMCSAgent, "puct": PUCTAgent}
        agents = []
        for i, kind in enumerate(args.roster):
            kw = {} if kind == "random" else {"mc_max": args.mc_max, "device_root": True}
            agents.append(cls[kind](seed=args.seed + i, **kw))
        from rl6nimmt_tpu.runtime.session import GameSession

        session = GameSession(*agents)
        session.play_game()  # warm
        t0 = time.perf_counter()
        for _ in range(args.host_games):
            session.play_game()
        host_dt = (time.perf_counter() - t0) / args.host_games

    out = {
        "platform": jax.devices()[0].platform,
        "roster": args.roster,
        "mc_max": args.mc_max,
        "games": n,
        "compile_s": compile_s,
        "s_per_match_device": dt / n,
        "matches_per_s_device": n / dt,
        "s_per_match_host_driver": host_dt,
        "speedup_vs_host_driver": (host_dt / (dt / n)) if host_dt else None,
        "seat0_win_rate": win0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
