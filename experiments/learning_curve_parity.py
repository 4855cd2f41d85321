"""Learning-curve parity: reference REINFORCE/DQN/ACER vs this repo's agents.

Runs the ACTUAL reference implementation (loaded via ``parity.refload`` with
import stubs for gym/numba/multi_elo -- torch math untouched) and this repo's
agents under the SAME protocol: one persistent GameSession per run (so
``num_episode`` increments and epsilon schedules advance identically), the
learner in seat 0 against three DrunkHamsters, N games per seed, multiple
seeds.  Records the learner's per-game score and reports:

* rolling-mean curves (PNG + raw JSON), and
* a Welch t-test on the final-quarter scores, reference vs ours, per algo --
  parity = no significant difference (|t| < ~2) and overlapping seed bands.

This is BASELINE.md's "learning curves within seed variance" evidence
(VERDICT round 1, task 3).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rl6nimmt_tpu.parity.refload import load_reference


def run_reference(algo, seed, games):
    ref = load_reference()
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    import random as pyrandom

    pyrandom.seed(seed)

    from rl_6_nimmt.agents import (
        BatchedACERAgent,
        BatchedReinforceAgent,
        DQNVanilla,
        DrunkHamster,
    )
    from rl_6_nimmt.play import GameSession

    learner = {
        "reinforce": BatchedReinforceAgent,
        "dqn": DQNVanilla,
        "acer": BatchedACERAgent,
    }[algo]()
    learner.train()
    opponents = [DrunkHamster() for _ in range(3)]
    session = GameSession(learner, *opponents)
    scores = []
    for _ in range(games):
        session.play_game()
        scores.append(float(session.results[-1][0]))
    return scores


def run_ours(algo, seed, games):
    np.random.seed(seed)
    import random as pyrandom

    pyrandom.seed(seed)

    from rl6nimmt_tpu.agents import (
        BatchedACERAgent,
        BatchedReinforceAgent,
        DQNVanilla,
        DrunkHamster,
    )
    from rl6nimmt_tpu.runtime import GameSession

    learner = {
        "reinforce": BatchedReinforceAgent,
        "dqn": DQNVanilla,
        "acer": BatchedACERAgent,
    }[algo](seed=seed)
    learner.train()
    opponents = [DrunkHamster(seed=seed * 7919 + i) for i in range(3)]
    session = GameSession(learner, *opponents)
    scores = []
    for _ in range(games):
        session.play_game()
        scores.append(float(session.results[-1][0]))
    return scores


def welch_t(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    return float((a.mean() - b.mean()) / np.sqrt(va + vb + 1e-12))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--algos", default="reinforce,dqn,acer")
    parser.add_argument("--games", type=int, default=400)
    parser.add_argument("--seeds", type=int, default=3)
    parser.add_argument("--out", default="experiments/results/learning_parity")
    args = parser.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    data, summary = {}, {}
    for algo in args.algos.split(","):
        data[algo] = {"reference": {}, "ours": {}}
        for seed in range(args.seeds):
            for label, runner in (("reference", run_reference), ("ours", run_ours)):
                t0 = time.time()
                scores = runner(algo, seed, args.games)
                data[algo][label][str(seed)] = scores
                print(
                    f"[{algo}/{label}/seed{seed}] {args.games} games in "
                    f"{time.time() - t0:.1f}s  mean(last quarter)="
                    f"{np.mean(scores[-args.games // 4:]):.2f}",
                    flush=True,
                )
        # Final-quarter comparison pooled over seeds.
        tail = args.games // 4
        ref_tail = np.concatenate(
            [v[-tail:] for v in data[algo]["reference"].values()]
        )
        our_tail = np.concatenate([v[-tail:] for v in data[algo]["ours"].values()])
        first = args.games // 4
        ref_head = np.concatenate(
            [v[:first] for v in data[algo]["reference"].values()]
        )
        our_head = np.concatenate([v[:first] for v in data[algo]["ours"].values()])
        # Seed-level t: within-seed scores are autocorrelated (one learning
        # trajectory), so the pooled per-game t overstates significance; the
        # exchangeable unit is the seed (one final-quarter mean per seed).
        ref_seed_means = [
            float(np.mean(v[-tail:])) for v in data[algo]["reference"].values()
        ]
        our_seed_means = [
            float(np.mean(v[-tail:])) for v in data[algo]["ours"].values()
        ]
        summary[algo] = {
            "ref_final_mean": float(ref_tail.mean()),
            "ref_final_std": float(ref_tail.std()),
            "ours_final_mean": float(our_tail.mean()),
            "ours_final_std": float(our_tail.std()),
            "ref_improvement": float(ref_tail.mean() - ref_head.mean()),
            "ours_improvement": float(our_tail.mean() - our_head.mean()),
            "welch_t_final": welch_t(ref_tail, our_tail),
            "welch_t_seed_level": welch_t(ref_seed_means, our_seed_means),
            "ref_seed_means": ref_seed_means,
            "ours_seed_means": our_seed_means,
            "games_per_seed": args.games,
            "seeds": args.seeds,
        }
        print(f"[{algo}] summary: {json.dumps(summary[algo])}", flush=True)

    (out / "curves.json").write_text(json.dumps(data))
    (out / "summary.json").write_text(json.dumps(summary, indent=2))

    # Rolling-mean plot.
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    algos = list(data)
    fig, axes = plt.subplots(1, len(algos), figsize=(5 * len(algos), 4), squeeze=False)
    window = max(10, args.games // 20)
    kernel = np.ones(window) / window
    for ax, algo in zip(axes[0], algos):
        for label, color in (("reference", "tab:blue"), ("ours", "tab:orange")):
            runs = np.asarray(
                [
                    np.convolve(v, kernel, mode="valid")
                    for v in data[algo][label].values()
                ]
            )
            x = np.arange(runs.shape[1]) + window
            ax.plot(x, runs.mean(0), color=color, label=label)
            ax.fill_between(
                x, runs.min(0), runs.max(0), color=color, alpha=0.2, linewidth=0
            )
        ax.set_title(f"{algo} (rolling mean, w={window})")
        ax.set_xlabel("game")
        ax.set_ylabel("learner score")
        ax.legend()
    fig.tight_layout()
    fig.savefig(out / "learning_curves.png", dpi=120)
    print(f"wrote {out}/learning_curves.png, curves.json, summary.json")


if __name__ == "__main__":
    main()
