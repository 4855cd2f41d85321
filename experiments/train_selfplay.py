"""TPU-native large-scale self-play training (no reference equivalent).

Trains the REINFORCE or DQN-lattice learner with thousands of parallel games
per update, entirely on device -- the vectorized path the reference could
never reach with its one-game Python loop.  Works on one chip or a pod slice
(games shard over the mesh; grads pmean over ICI).

    python experiments/train_selfplay.py --algo reinforce --games 4096 --steps 100
    python experiments/train_selfplay.py --algo dqn --games 1024 --steps 200 --dp
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--algo", choices=["reinforce", "dqn", "acer"], default="reinforce")
    parser.add_argument("--games", type=int, default=4096, help="parallel games per step")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--players", type=int, default=4)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--hidden", type=int, nargs="+", default=[100, 100])
    parser.add_argument("--buffer", type=int, default=1 << 18)
    parser.add_argument("--minibatch", type=int, default=1024)
    parser.add_argument("--learn-iters", type=int, default=10)
    parser.add_argument("--dp", action="store_true", help="data-parallel over all devices")
    parser.add_argument("--save", type=str, default=None, help="npz path for params")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from rl6nimmt_tpu.engine import EnvConfig
    from rl6nimmt_tpu.nets import MLPSpec, mlp_init
    from rl6nimmt_tpu.utils import save_params

    cfg = EnvConfig(num_players=args.players)
    optimizer = optax.adam(args.lr)
    key = jax.random.key(args.seed)

    if args.algo == "reinforce":
        from rl6nimmt_tpu.runtime.vector import make_reinforce_train_step

        spec = MLPSpec(
            input_size=cfg.state_length + 1,
            hidden_sizes=tuple(args.hidden),
            head_sizes=(1,),
        )
        params = mlp_init(jax.random.key(args.seed), spec)
        opt_state = optimizer.init(params)

        if args.dp:
            from rl6nimmt_tpu.parallel import make_dp_reinforce_step, make_mesh

            mesh = make_mesh()
            step = make_dp_reinforce_step(
                cfg, spec, optimizer, max(args.games // mesh.size, 1), mesh
            )
            split = lambda k: jax.random.split(k, mesh.size)
        else:
            step = make_reinforce_train_step(cfg, spec, optimizer, args.games)
            split = lambda k: k

        start = time.perf_counter()
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, split(sub))
            if i % 10 == 0 or i == args.steps - 1:
                loss = float(np.asarray(metrics["loss"]))
                score = float(np.asarray(metrics["mean_score"]))
                rate = args.games * cfg.num_players * (i + 1) / (time.perf_counter() - start)
                print(f"step {i:>4}  loss {loss:>10.3f}  mean_score {score:>7.3f}  "
                      f"episodes/s {rate:,.0f}")

    elif args.algo == "acer":
        from rl6nimmt_tpu.buffers import seq_init
        from rl6nimmt_tpu.runtime.vector import make_acer_selfplay_step

        spec = MLPSpec(
            input_size=1 + cfg.state_length,
            hidden_sizes=tuple(args.hidden),
            head_sizes=(1, 1),
        )
        params = mlp_init(jax.random.key(args.seed), spec)
        opt_state = optimizer.init(params)
        example = {
            "state": jnp.zeros(cfg.state_length),
            "legal_cards": jnp.zeros(10, jnp.int32),
            "log_probs": jnp.zeros(10),
            "action_id": jnp.zeros((), jnp.int32),
            "reward": jnp.zeros(()),
            "done": jnp.zeros(()),
        }
        if args.dp:
            from rl6nimmt_tpu.parallel import make_dp_acer_step, make_mesh, stack_for_mesh

            mesh = make_mesh()
            buf = stack_for_mesh(seq_init(args.buffer, cfg.max_turns, example), mesh)
            dp_cycle = make_dp_acer_step(
                cfg, spec, optimizer, max(args.games // mesh.size, 1), mesh,
                minibatch=args.minibatch,
            )
            cycle = lambda p, o, b, k: dp_cycle(p, o, b, jax.random.split(k, mesh.size))
        else:
            buf = seq_init(args.buffer, cfg.max_turns, example)
            cycle = make_acer_selfplay_step(
                cfg, spec, optimizer, args.games, minibatch=args.minibatch
            )
        key = jax.random.key(args.seed + 1)
        start = time.perf_counter()
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            params, opt_state, buf, metrics = cycle(params, opt_state, buf, sub)
            if i % 10 == 0 or i == args.steps - 1:
                score = float(np.asarray(metrics["mean_score"]))
                al = float(np.asarray(metrics["actor_loss"]))
                crl = float(np.asarray(metrics["critic_loss"]))
                rate = args.games * cfg.num_players * (i + 1) / (time.perf_counter() - start)
                print(f"cycle {i:>4}  actor {al:>9.4f}  critic {crl:>9.4f}  "
                      f"mean_score {score:>7.3f}  episodes/s {rate:,.0f}")

    else:
        from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
        from rl6nimmt_tpu.buffers import per_init
        from rl6nimmt_tpu.runtime.vector import make_dqn_selfplay_step

        dqn_cfg = DQNConfig(
            double=True, dueling=True, noisy=True, per=True, n_steps=3,
            hidden_sizes=tuple(args.hidden), minibatch=args.minibatch,
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
        buf = per_init(args.buffer, example)
        cycle = make_dqn_selfplay_step(
            cfg, dqn_cfg, optimizer, args.games, learn_iters=args.learn_iters
        )

        start = time.perf_counter()
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            eps = max(np.exp(-0.0025 * i), 0.05)
            params, target, opt_state, buf, metrics = cycle(
                params, target, opt_state, buf, sub, eps
            )
            if i % 10 == 0 or i == args.steps - 1:
                loss = float(np.asarray(metrics["loss"]))
                score = float(np.asarray(metrics["mean_score"]))
                rate = args.games * (i + 1) / (time.perf_counter() - start)
                print(f"cycle {i:>4}  loss {loss:>10.4f}  mean_score {score:>7.3f}  "
                      f"games/s {rate:,.0f}  eps {eps:.3f}")

    if args.save:
        save_params(args.save, params)
        print(f"saved params to {args.save}")


if __name__ == "__main__":
    main()
