"""Smoke script: flagship DQN vs a random agent, one rendered game.

Equivalent of the reference experiments/debug_dqn.py: run a couple of games
at DEBUG logging and render the last one.
"""

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

from rl6nimmt_tpu.agents import DrunkHamster, Noisy_D3QN_PRB_NStep
from rl6nimmt_tpu.runtime import GameSession

logging.basicConfig(format="%(message)s", level=logging.DEBUG)

agent = Noisy_D3QN_PRB_NStep(history_length=1000, n_steps=3, minibatch=16, seed=0)
agent.train()
session = GameSession(agent, DrunkHamster(seed=1))
for g in range(2):
    session.play_game(render=(g == 1))
print("results:", session.results)
