"""Smoke script: Alpha0.5 (PUCT) vs a random agent, rendered (reference debug_mcts.py)."""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

if "--platform" in sys.argv:  # e.g. --platform cpu: fastest for these
    i = sys.argv.index("--platform")
    if i + 1 >= len(sys.argv):
        sys.exit("usage: --platform <name>  (e.g. --platform cpu)")
    rl6nimmt_tpu.use_platform(sys.argv[i + 1])

from rl6nimmt_tpu.agents import DrunkHamster, PUCTAgent
from rl6nimmt_tpu.runtime import GameSession

logging.basicConfig(format="%(message)s", level=logging.DEBUG)

agent = PUCTAgent(mc_max=32, mc_per_card=4, batch_playouts=8, seed=0)
agent.train()
session = GameSession(agent, DrunkHamster(seed=1))
session.play_game(render=True)
print("results:", session.results)
