"""Play against Alpha0.5 on the CLI (the notebook's finale, cells 28-33).

The reference's human benchmark: 5 rendered games of a Human vs a trained
PUCT agent with mc_max=800.  Pass --checkpoint to load a trained tournament
agent; otherwise an untrained PUCT plays (still decent -- the search carries).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default="Human")
    parser.add_argument("--games", type=int, default=5)
    parser.add_argument("--mc-max", type=int, default=800)
    parser.add_argument("--checkpoint", default=None,
                        help="tournament pickle; its best agent becomes the opponent")
    parser.add_argument("--device-root", action="store_true",
                        help="run each Alpha0.5 decision as one device program "
                             "(fast interactive play, agents/device_search.py)")
    parser.add_argument("--prior-params", default=None,
                        help="npz of trained prior-net params for Alpha0.5 "
                             "(experiments/train_puct_prior.py --out)")
    parser.add_argument("--device-game", action="store_true",
                        help="play inside ONE jitted program: every Alpha0.5 "
                             "decision stays on device, only your card choice "
                             "crosses to the host via io_callback "
                             "(runtime/callback_human.py)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force JAX platform (e.g. cpu)")
    args = parser.parse_args(argv)

    if args.platform:
        rl6nimmt_tpu.use_platform(args.platform)

    logging.basicConfig(format="%(message)s", level=logging.INFO)

    from rl6nimmt_tpu.agents import Human, PUCTAgent
    from rl6nimmt_tpu.runtime import GameSession
    from rl6nimmt_tpu.utils import load_checkpoint

    if args.device_game:
        import os

        from rl6nimmt_tpu.runtime.callback_human import play_callback_game

        # io_callback needs host<->device callbacks; tunneled/relay backends
        # (axon) hang on them.  Decide from the env var WITHOUT touching
        # jax.devices() -- querying devices initializes the backend and makes
        # the platform unswitchable.  Interactive play is latency-, not
        # throughput-bound, so the host CPU is the right fallback.
        if not args.platform and os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu", "tpu"):
            print("(tunneled device backend: forcing --platform cpu for the "
                  "io_callback game; use a local TPU for on-device play)")
            rl6nimmt_tpu.use_platform("cpu")

        params = None
        if args.prior_params:
            from rl6nimmt_tpu.engine import EnvConfig
            from rl6nimmt_tpu.nets import MLPSpec, mlp_init
            from rl6nimmt_tpu.utils import load_params
            import jax

            cfg = EnvConfig(num_players=2)
            spec = MLPSpec(
                input_size=cfg.state_length + 1,
                hidden_sizes=(100, 100),
                head_sizes=(1,),
            )
            params = load_params(args.prior_params, mlp_init(jax.random.key(0), spec))
        totals = None
        for g in range(args.games):
            scores = play_callback_game(
                ["puct"], params=params, mc_max=args.mc_max, seed=g, name=args.name
            )
            totals = scores if totals is None else totals + scores
        print(f"Series total: {args.name} {totals[0]:.0f} vs Alpha0.5 {totals[1]:.0f}")
        return

    if args.checkpoint:
        tournament = load_checkpoint(args.checkpoint)
        opponent = tournament.winner()
        print(f"Loaded opponent {getattr(opponent, '__name__', '?')} from {args.checkpoint}")
    else:
        opponent = PUCTAgent(mc_max=args.mc_max, device_root=args.device_root)
        opponent.__name__ = "Alpha0.5"
        if args.prior_params:
            from rl6nimmt_tpu.utils import load_params

            opponent.set_parameters(
                opponent.host_put(load_params(args.prior_params, opponent.params))
            )
            print(f"Loaded trained prior from {args.prior_params}")
    if hasattr(opponent, "mc_max"):
        opponent.mc_max = args.mc_max
    if hasattr(opponent, "eval"):
        opponent.eval()

    human = Human(args.name)
    session = GameSession(human, opponent)
    for _ in range(args.games):
        session.play_game(render=True)

    totals = sum(session.results)
    print(f"Series total: {args.name} {totals[0]} vs {opponent.__name__} {totals[1]}")


if __name__ == "__main__":
    main()
