"""Debug experiment: gradient-flow figure for the flagship DQN.

The reference defines ``plot_grad_flow`` (utils/various.py:11-38) and imports
it into dqn.py without ever calling it; this script is the working
invocation the reference never shipped.  It runs a few flagship self-play
cycles to fill the replay buffer and move the parameters, recomputes the
gradient of the SAME Bellman loss on a freshly sampled minibatch, and writes
the reference-styled figure via ``runtime.metrics.plot_grad_flow``.

    python experiments/debug_gradflow.py [--platform cpu] [--out PATH]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

if "--platform" in sys.argv:
    i = sys.argv.index("--platform")
    rl6nimmt_tpu.use_platform(sys.argv[i + 1])

import jax
import jax.numpy as jnp
import optax

from rl6nimmt_tpu.agents.dqn import DQNConfig, learn_noise, q_network_spec, q_values
from rl6nimmt_tpu.buffers import per_init
from rl6nimmt_tpu.buffers.per import per_sample
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.nets import mlp_init
from rl6nimmt_tpu.runtime.metrics import grad_stats, plot_grad_flow
from rl6nimmt_tpu.runtime.vector import dqn_replay_example, make_dqn_selfplay_step
from rl6nimmt_tpu.utils.tpu_ops import onehot_select

OUT = Path(__file__).parent / "results" / "grad_flow.png"
if "--out" in sys.argv:
    OUT = Path(sys.argv[sys.argv.index("--out") + 1])


def main():
    cfg = EnvConfig(num_players=4)
    dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                        n_steps=10, hidden_sizes=(64,), minibatch=64)
    spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
    params = mlp_init(jax.random.key(0), spec)
    target = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    buf = per_init(50_000, dqn_replay_example(cfg))
    cycle = make_dqn_selfplay_step(cfg, dqn_cfg, optimizer, num_games=256, learn_iters=8)

    key = jax.random.key(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, target, opt_state, buf, metrics = cycle(
            params, target, opt_state, buf, sub, 0.1
        )
    print(f"after 3 cycles: loss={float(metrics['loss']):.4f} "
          f"mean_score={float(metrics['mean_score']):.2f}")

    # Gradient of the same IS-weighted Bellman loss on a fresh minibatch
    # (double-DQN target, precomputed noisy draws -- dqn.py:make_learn_step).
    key, sample_key, noise_key = jax.random.split(key, 3)
    _, _, weights, batch = per_sample(buf, sample_key, dqn_cfg.minibatch)
    batch = {k: v.astype(jnp.float32) if k != "action" else v.astype(jnp.int32)
             for k, v in batch.items()}
    noise_eval, (nz1, nz2) = learn_noise(dqn_cfg, spec, noise_key)

    def loss_fn(p):
        q = q_values(dqn_cfg, spec, p, batch["state"], noise=noise_eval)
        q_eval = onehot_select(q, batch["action"])
        q_local = q_values(dqn_cfg, spec, p, batch["next_state"], noise=nz1)
        q_tgt = q_values(dqn_cfg, spec, target, batch["next_state"], noise=nz2)
        boot = onehot_select(q_tgt, jnp.argmax(q_local, axis=-1))
        y = jax.lax.stop_gradient(
            batch["reward"] + (0.99 ** dqn_cfg.n_steps) * boot * (1.0 - batch["done"])
        )
        return jnp.mean(weights * (q_eval - y) ** 2)

    grads = jax.grad(loss_fn)(params)
    for name, s in grad_stats(grads).items():
        print(f"  {name:30s} mean|g|={s['mean_abs']:.2e}  max|g|={s['max_abs']:.2e}")
    OUT.parent.mkdir(parents=True, exist_ok=True)
    plot_grad_flow(grads, str(OUT))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
