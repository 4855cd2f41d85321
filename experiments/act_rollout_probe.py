"""Validate + time the fused act-rollout kernel against the XLA noisy rollout.

1. Plays G games through the kernel with real noisy-DQN effective weights.
2. Structural checks: actions legal (present in the pre-turn obs hand),
   hand counts decrement, rewards non-positive, terminal hands empty.
3. Replays the SAME deals (make_deal_kernel shares the PRNG stream) through
   the XLA greedy act path with the same effective weights and reports the
   action agreement rate + score deltas.
4. Times kernel vs the XLA noisy rollout.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec, q_values
from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.engine.env import observe, step
from rl6nimmt_tpu.engine.state import EnvState
from rl6nimmt_tpu.nets import draw_mlp_noise, mlp_init, noisy_effective_params
from rl6nimmt_tpu.ops.act_rollout_kernel import make_act_rollout_kernel
from rl6nimmt_tpu.ops.game_kernel import make_deal_kernel

G = 4096
cfg = EnvConfig(num_players=4)
dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                    n_steps=10, hidden_sizes=(64,), minibatch=64)
spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
params = mlp_init(jax.random.key(1), spec)
T, P, S, H = cfg.max_turns, cfg.num_players, cfg.state_length, cfg.hand_size

# Effective weights per turn, exactly as the XLA rollout derives them.
key = jax.random.key(42)


def turn_effective(key):
    import dataclasses

    def chain(k, _):
        k, sub = jax.random.split(k)
        return k, sub

    _, subs = lax.scan(chain, key, jnp.arange(T))
    noise_keys = jax.vmap(lambda s: jax.random.split(s, 3)[0])(subs)
    turn_noise = jax.vmap(lambda nk: draw_mlp_noise(spec, nk))(noise_keys)
    eff = jax.vmap(lambda nz: noisy_effective_params(spec, params, nz))(turn_noise)
    eff_spec = dataclasses.replace(spec, noisy=False)
    return eff, eff_spec


eff, eff_spec = turn_effective(key)
w1, b1 = eff["trunk"][0]["w"], eff["trunk"][0]["b"]
wa, ba = eff["heads"][1]["w"], eff["heads"][1]["b"]
print("weight shapes:", w1.shape, b1.shape, wa.shape, ba.shape)

play = make_act_rollout_kernel(cfg, G, hidden=spec.hidden_sizes[0])
obs, actions, rewards = jax.tree.map(
    np.asarray, play(7, w1, b1, wa, ba)
)
print("shapes:", obs.shape, actions.shape, rewards.shape)

# ---- structural checks ----------------------------------------------------
ok = True
for t in range(T):
    hand = obs[t, :, :, :H]  # [G, P, H]
    counts = (hand >= 0).sum(-1)
    if not np.all(counts == H - t):
        print(f"FAIL: hand count at t={t}"); ok = False
    inhand = (hand == actions[t][:, :, None]).any(-1)
    if not np.all(inhand):
        print(f"FAIL: illegal action at t={t} ({(~inhand).sum()} seats)"); ok = False
if not np.all((obs[T, :, :, :H] == -1)):
    print("FAIL: terminal hands not empty"); ok = False
if not np.all(rewards <= 0):
    print("FAIL: positive rewards"); ok = False
scores = rewards.sum(0)  # [G, P]
print(f"structural checks: {'OK' if ok else 'FAILED'}; "
      f"mean score {scores.mean():.3f}  (uniform-random play is ~ -10.5/4p)")

# ---- XLA replay on the same deals ----------------------------------------
board_d, len_d, hands_d = make_deal_kernel(cfg, G)(7)
hands_mask = jnp.zeros((G, P, cfg.num_cards), bool)
gi = jnp.arange(G)[:, None, None]
pi = jnp.arange(P)[None, :, None]
valid = hands_d >= 0
hands_mask = hands_mask.at[gi, pi, jnp.where(valid, hands_d, 0)].set(valid)
state = EnvState(
    board=board_d.astype(jnp.int32),
    row_len=len_d.astype(jnp.int32),
    hands=hands_mask,
    hands_sorted=hands_d.astype(jnp.int32),
    scores=jnp.zeros((G, P), jnp.int32),
    turn=jnp.zeros((G,), jnp.int32),
)
step_b = jax.vmap(functools.partial(step, cfg))
obs_b = jax.vmap(functools.partial(observe, cfg))
NEG = -1e9


@jax.jit
def xla_replay(state, eff):
    def turn(carry, eff_t):
        st = carry
        o, masks = obs_b(st)
        q = q_values(dqn_cfg, eff_spec, eff_t, o)
        acts = jnp.argmax(jnp.where(masks, q, NEG), axis=-1).astype(jnp.int32)
        st, rew = step_b(st, acts)
        return st, (o, acts, rew)

    st, (o, a, r) = lax.scan(turn, state, eff)
    return o, a, r, -st.scores


xo, xa, xr, xscores = jax.tree.map(np.asarray, xla_replay(state, eff))
same_deal = np.array_equal(xo[0], obs[0].astype(np.float32))
agree = (xa == actions).mean()
print(f"deal parity (obs[0] equal): {same_deal}")
print(f"action agreement vs XLA replay: {agree:.6f}")
print(f"score agreement: {(np.asarray(xscores) == scores).mean():.6f}  "
      f"mean xla {xscores.mean():.4f} vs kernel {scores.mean():.4f}")
div = np.argwhere(xa != actions)
if len(div):
    t0, g0, p0 = div[0]
    print(f"first divergence t={t0} g={g0} p={p0}: xla={xa[t0,g0,p0]} "
          f"kernel={actions[t0,g0,p0]}")

# ---- timing ---------------------------------------------------------------
CHAIN = 256


@jax.jit
def kern_many(seed, w1, b1, wa, ba):
    def gen(acc, i):
        o, a, r = play(seed + i * (G // 1024), w1, b1, wa, ba)
        return acc + jnp.sum(r.astype(jnp.int32)) + jnp.sum(a) + jnp.sum(o[0, :, 0, 0].astype(jnp.int32)), None

    acc, _ = lax.scan(gen, jnp.zeros((), jnp.int32), jnp.arange(CHAIN, dtype=jnp.int32))
    return acc


def timeit(fn, *args, iters=5):
    out = fn(*args); _ = np.asarray(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); out = fn(*args); _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / CHAIN * 1e3


ms = timeit(kern_many, 7, w1, b1, wa, ba)
print(f"kernel rollout: {ms:6.3f} ms/generation ({G * T / ms * 1000 / 1e6:.1f}M env-steps/s)")
