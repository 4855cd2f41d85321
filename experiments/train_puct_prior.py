"""Train Alpha0.5's prior net by self-imitation over DEVICE self-play games.

The reference's PUCTAgent improves its prior by imitating its own search
choices, one game at a time (mcts.py:191-261 via play.py) — the published
tournament gives it ~2,000 training games over two hours.  Here each
iteration plays G complete PUCT-vs-PUCT games inside ONE device program
(runtime/device_tournament.py) and applies the same self-imitation loss to
every (state, legal hand, chosen index) record of every seat's episode —
thousands of search-guided training games per minute on one chip.

Protocol notes: the loss is the reference's episode loss summed over all
episodes in the batch (equivalent to accumulating the per-episode gradients
before one Adam step — a batched-update deviation, documented here); the
search itself is the device-root PUCT decision (PARITY.md #11/#12 RNG
deviation).  The trained parameters drop straight into a ``PUCTAgent``.

Evaluation: alternating-seat 2-player head-to-head, trained prior vs fresh
prior, both at the same playout budget (device matches).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--games", type=int, default=64, help="self-play games per iteration")
    parser.add_argument("--players", type=int, default=4)
    parser.add_argument("--mc-max", type=int, default=128, help="training playout budget")
    parser.add_argument("--eval-mc-max", type=int, default=200, help="head-to-head budget")
    parser.add_argument("--eval-games", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default=None, help="save trained params (.npz)")
    parser.add_argument("--objective", choices=["imitation", "advantage"],
                        default="imitation",
                        help="'imitation' = the reference's unconditional "
                             "self-imitation (mcts.py:245-256); 'advantage' = "
                             "outcome-weighted imitation (each seat's episode "
                             "weighted by its score minus the game mean -- an "
                             "outcome signal the reference rule lacks)")
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args(argv)

    if args.platform:
        rl6nimmt_tpu.use_platform(args.platform)

    from rl6nimmt_tpu.agents.device_search import KIND_PUCT
    from rl6nimmt_tpu.agents.reinforce import action_in_input_logits
    from rl6nimmt_tpu.engine.state import EnvConfig
    from rl6nimmt_tpu.nets import MLPSpec, mlp_init
    from rl6nimmt_tpu.runtime.device_match import make_device_match_fn
    from rl6nimmt_tpu.runtime.device_tournament import make_device_block_fn

    cfg = EnvConfig(num_players=args.players)
    spec = MLPSpec(input_size=cfg.state_length + 1, hidden_sizes=(100, 100), head_sizes=(1,))
    params = mlp_init(jax.random.key(args.seed), spec)
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    G, P = args.games, args.players
    selfplay = make_device_block_fn(cfg, spec, G, args.mc_max, batch=8)
    kinds = jnp.full((G, P), KIND_PUCT, jnp.int32)
    mc_maxes = jnp.full((G, P), args.mc_max, jnp.int32)
    mc_pers = jnp.full((G, P), 10, jnp.int32)
    c_pucts = jnp.full((G, P), 2.0, jnp.float32)

    def imitation_loss(params, obs, hands, picks, weights):
        # obs [N, S], hands [N, H], picks [N], weights [N]: the reference
        # self-imitation loss -sum log pi(chosen) over every episode step
        # (mcts.py:245-256); 'advantage' scales each record by its seat's
        # score advantage so only above-average episodes are reinforced.
        logits = jax.vmap(lambda s, c: action_in_input_logits(spec, params, s, c))(obs, hands)
        logp = jax.nn.log_softmax(logits)
        chosen = jnp.take_along_axis(logp, picks[:, None], axis=1)[:, 0]
        return -jnp.sum(weights * chosen) / G

    # Self-play (the big cached device-tournament program) and the small
    # imitation update stay SEPARATE jits: fusing them would recompile the
    # whole game program inside the grad trace — many minutes over a remote
    # tunnel for zero compute benefit (two dispatches per iteration instead
    # of one is ~50 ms of RTT against seconds of self-play).
    @jax.jit
    def update(params, opt_state, traj, scores):
        S, H = cfg.state_length, cfg.hand_size
        T = traj["obs"].shape[0]
        obs = traj["obs"].reshape(-1, S)
        hands = traj["hands"].reshape(-1, H)
        picks = traj["picks"].reshape(-1)
        if args.objective == "advantage":
            adv = scores - jnp.mean(scores, axis=1, keepdims=True)  # [G, P]
            adv = adv / (jnp.std(adv) + 1e-6)
            weights = jnp.broadcast_to(adv[None], (T,) + adv.shape).reshape(-1)
        else:
            weights = jnp.ones(obs.shape[0])
        loss, grads = jax.value_and_grad(imitation_loss)(params, obs, hands, picks, weights)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, jnp.mean(scores)

    epses = jnp.zeros((G, P), jnp.float32)  # no learner seats

    def train_iter(params, opt_state, key):
        rep = lambda x: jnp.broadcast_to(x[None, None], (G, P) + x.shape)
        scores, traj, _ = selfplay(
            jax.tree.map(rep, params), (), kinds, mc_maxes, mc_pers, c_pucts,
            epses, key,
        )
        return update(params, opt_state, traj, scores)

    key = jax.random.key(args.seed + 1)
    start = time.perf_counter()
    for it in range(args.iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss, mean_score = train_iter(params, opt_state, sub)
        if it % max(1, args.iters // 10) == 0 or it == args.iters - 1:
            print(
                f"iter {it:4d}  games {G * (it + 1):7d}  loss {float(loss):8.2f}  "
                f"mean score {float(mean_score):6.2f}  ({time.perf_counter() - start:.0f}s)",
                flush=True,
            )
    elapsed = time.perf_counter() - start
    print(f"trained on {G * args.iters} self-play games in {elapsed:.0f}s")

    if args.out:
        from rl6nimmt_tpu.utils import save_params

        save_params(args.out, params)
        print(f"saved params to {args.out}")

    # ------------------------- head-to-head: trained vs fresh prior ---------
    cfg2 = EnvConfig(num_players=2)
    fresh = mlp_init(jax.random.key(args.seed + 1234), spec)
    match = make_device_match_fn(
        cfg2, ("puct", "puct"), spec, args.eval_games // 2, mc_max=args.eval_mc_max
    )
    k1, k2 = jax.random.split(jax.random.key(args.seed + 2), 2)
    s_a = np.asarray(match((params, fresh), k1))   # trained in seat 0
    s_b = np.asarray(match((fresh, params), k2))   # trained in seat 1
    wins = float(np.sum(s_a[:, 0] > s_a[:, 1]) + np.sum(s_b[:, 1] > s_b[:, 0]))
    ties = float(np.sum(s_a[:, 0] == s_a[:, 1]) + np.sum(s_b[:, 1] == s_b[:, 0]))
    n = s_a.shape[0] + s_b.shape[0]
    win_rate = (wins + 0.5 * ties) / n
    se = (win_rate * (1 - win_rate) / n) ** 0.5
    print(
        f"trained-vs-fresh Alpha0.5 @mc_max={args.eval_mc_max}: "
        f"win rate {win_rate:.3f} ± {se:.3f} over {n} alternating-seat games"
    )
    return win_rate


if __name__ == "__main__":
    main()
