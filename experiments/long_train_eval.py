"""Long self-play training with periodic arena strength evals.

Extends the learning-behavior evidence beyond the reference's scale: trains
the REINFORCE or DQN learner for tens of thousands of on-device updates
(minutes on one chip -- more games than the reference's entire published
tournament every few milliseconds) and measures true strength along the way
as the win rate of the learner seated against three random opponents in a
2048-game device arena.

    python experiments/long_train_eval.py --algo reinforce --updates 20000
    python experiments/long_train_eval.py --algo dqn --cycles 2000
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


def _win_rate_from(scores) -> float:
    best = scores.max(axis=1, keepdims=True)
    winners = scores == best
    # Midrank ties like the tournament: a tied win counts fractionally.
    return float((winners[:, 0] / winners.sum(axis=1)).mean())


def eval_win_rate(params, seed: int, num_games: int = 2048) -> float:
    """Learner seat 0 (stochastic sampling policy, as it acts while training)
    vs three DrunkHamsters."""
    from rl6nimmt_tpu.agents import BatchedReinforceAgent, DrunkHamster
    from rl6nimmt_tpu.runtime.arena import play_match

    agent = BatchedReinforceAgent(seed=seed)
    agent.set_parameters(agent.host_put(params))
    opponents = [DrunkHamster(seed=seed + i + 1) for i in range(3)]
    return _win_rate_from(play_match([agent] + opponents, num_games=num_games, seed=seed))


def eval_win_rate_dqn(params, seed: int, num_games: int = 2048) -> float:
    """Noisy-D3QN seat 0 (argmax over mean net) vs three DrunkHamsters."""
    from rl6nimmt_tpu.agents import DrunkHamster, Noisy_D3QN_PRB_NStep
    from rl6nimmt_tpu.runtime.arena import play_match

    agent = Noisy_D3QN_PRB_NStep(n_steps=3, seed=seed)
    agent.set_parameters(agent.host_put(params))
    opponents = [DrunkHamster(seed=seed + i + 1) for i in range(3)]
    return _win_rate_from(play_match([agent] + opponents, num_games=num_games, seed=seed))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--algo", choices=["reinforce", "dqn"], default="reinforce")
    parser.add_argument("--games", type=int, default=2048)
    parser.add_argument("--updates", type=int, default=20000, help="reinforce updates")
    parser.add_argument("--cycles", type=int, default=2000, help="dqn cycles")
    parser.add_argument(
        "--eval-every", type=int, default=0,
        help="eval cadence in updates, rounded down to a multiple of the 10k "
             "device-chunk cap; 0 = 8 log-spaced points",
    )
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--entropy", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="experiments/results/longtrain")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from rl6nimmt_tpu.engine import EnvConfig
    from rl6nimmt_tpu.nets import MLPSpec, mlp_init
    from rl6nimmt_tpu.utils import save_params

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg = EnvConfig(num_players=4)
    optimizer = optax.adam(args.lr)
    history = []
    start = time.perf_counter()

    if args.algo == "reinforce":
        from rl6nimmt_tpu.runtime.vector import make_reinforce_train_step

        spec = MLPSpec(input_size=cfg.state_length + 1, head_sizes=(1,))
        params = mlp_init(jax.random.key(args.seed), spec)
        opt_state = optimizer.init(params)
        step = make_reinforce_train_step(
            cfg, spec, optimizer, args.games, entropy_weight=args.entropy
        )

        # Fixed-size chunked scan (one compile).  --eval-every N evaluates
        # every N updates; default is 8 log-spaced marks rounded to chunks.
        # Chunks are capped: single device programs much past ~10k scanned
        # updates have tripped the TPU worker watchdog on this relay.
        chunk = max(min(args.eval_every or args.updates // 64, 10_000), 1)
        total = (args.updates // chunk) * chunk
        if args.eval_every:
            step_mark = max(args.eval_every // chunk, 1) * chunk
            marks = list(range(step_mark, total + 1, step_mark))
        else:
            marks = sorted(
                {((int(total ** (i / 7)) + chunk - 1) // chunk) * chunk for i in range(8)}
                | {total}
            )

        @jax.jit
        def run_chunk(params, opt_state, keys):
            def body(c, k):
                p, o = c
                p, o, m = step(p, o, k)
                return (p, o), m["loss"]
            (p, o), losses = lax.scan(body, (params, opt_state), keys)
            return p, o, losses[-1]

        done = 0
        key = jax.random.key(args.seed + 1)
        wr0 = eval_win_rate(params, args.seed)
        history.append({"updates": 0, "win_rate": wr0, "loss": None})
        print(f"updates {0:>6}  win_rate {wr0:.3f}")
        for mark in marks:
            while done < mark:
                key, sub = jax.random.split(key)
                params, opt_state, loss = run_chunk(
                    params, opt_state, jax.random.split(sub, chunk)
                )
                done += chunk
            wr = eval_win_rate(params, args.seed)
            loss = float(np.asarray(loss))
            history.append({"updates": done, "win_rate": wr, "loss": loss})
            print(
                f"updates {done:>6}  win_rate {wr:.3f}  loss {loss:>9.3f}  "
                f"({time.perf_counter() - start:5.1f}s, "
                f"{done * args.games * 4:,} episodes)"
            )
        save_params(str(out / "reinforce_params.npz"), params)

    else:
        from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
        from rl6nimmt_tpu.buffers import per_init
        from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step

        dqn_cfg = DQNConfig(
            double=True, dueling=True, noisy=True, per=True, n_steps=3,
            minibatch=1024,
        )
        spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
        params = mlp_init(jax.random.key(args.seed), spec)
        target = jax.tree.map(jnp.copy, params)
        opt_state = optimizer.init(params)
        example = {
            "state": jnp.zeros(cfg.state_length),
            "action": jnp.zeros((), jnp.int32),
            "reward": jnp.zeros(()),
            "next_state": jnp.zeros(cfg.state_length),
            "done": jnp.zeros(()),
        }
        buf = per_init(1 << 18, example)
        cycle = make_dqn_selfplay_step(
            cfg, dqn_cfg, optimizer, max(args.games // 4, 1), learn_iters=8
        )
        key = jax.random.key(args.seed + 1)
        evals = max(args.cycles // 10, 1)
        wr0 = eval_win_rate_dqn(params, args.seed)
        history.append({"cycles": 0, "win_rate": wr0, "loss": None})
        print(f"cycle {0:>5}  win_rate {wr0:.3f}")
        for i in range(args.cycles):
            key, sub = jax.random.split(key)
            eps = max(np.exp(-0.0025 * i), 0.05)
            params, target, opt_state, buf, metrics = cycle(
                params, target, opt_state, buf, sub, eps
            )
            if i % evals == 0 or i == args.cycles - 1:
                loss = float(np.asarray(metrics["loss"]))
                wr = eval_win_rate_dqn(params, args.seed)
                history.append({"cycles": i + 1, "win_rate": wr, "loss": loss})
                print(f"cycle {i:>5}  win_rate {wr:.3f}  loss {loss:.4f}  eps {eps:.3f}")
        save_params(str(out / "dqn_params.npz"), params)

    (out / f"{args.algo}_history.json").write_text(json.dumps(history, indent=1))
    print("wrote", out / f"{args.algo}_history.json")


if __name__ == "__main__":
    main()
