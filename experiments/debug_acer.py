"""Smoke script: ACER vs a random agent, one rendered game (reference debug_acer.py)."""

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

from rl6nimmt_tpu.agents import BatchedACERAgent, DrunkHamster
from rl6nimmt_tpu.runtime import GameSession

logging.basicConfig(format="%(message)s", level=logging.DEBUG)

agent = BatchedACERAgent(warmup=5, minibatch=2, seed=0)
agent.train()
session = GameSession(agent, DrunkHamster(seed=1))
for g in range(3):
    session.play_game(render=(g == 2))
print("results:", session.results)
