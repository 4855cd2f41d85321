"""Roofline accounting for the flagship DQN cycle (VERDICT r4 #7).

Decomposes the benched fm cycle (fused Pallas act-rollout + feature-major
replay, bench line 3) into rollout / harvest+insert / per-Bellman-update
phases by measured ablation, then compares each phase against its analytic
hardware floor on this chip:

* HBM floor: bytes the phase MUST move (trajectory, insert, priority
  reduction) over the chip's usable HBM bandwidth;
* MXU floor: FLOPs the phase must execute over peak matmul throughput.

The point (and the honest finding, cross-checked against an xplane
self-time trace of the fm cycle): the cycle runs ~9x above the combined
hardware floor.  The 8 Bellman updates are NOT the gap (~28 us marginal
each, ~0.22 ms total); the two real sinks are (a) the ring-wrap insert
(~0.48 ms/cycle of dynamic_update_slice + cond + select: the wrap branch
moves ~3x the insert bytes and executes on 52 of 64 cycles at these
cap/insert sizes) and (b) the Pallas rollout itself (~0.31 ms vs a 0.05
ms MXU floor -- VPU masking/argmax/env registers, see the round-4
ablation).  The wrap-free aligned layout was re-measured under fm and is
STILL slower end to end (1.96 vs 1.46 ms), and so is a plain ring with
capacity snapped to 2x the insert block (2.07 ms -- wrap branch never
fires).  Both wrap-free variants grow the physical buffers, and the
insert+sample cost scales with PHYSICAL capacity, not the wrap: the
stopping criterion stands -- further gains need the insert moved into
the kernel, not more bandwidth/FLOP chasing in XLA.

Usage: ``python experiments/roofline_cycle.py`` on the real chip.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.engine import EnvConfig

# v5e (lite0) public spec sheet numbers; usable fractions are the standard
# planning discounts (scaling-book style: ~85% of spec HBM BW is
# achievable on large streams; bf16 MXU peak halves for f32 operands).
HBM_GBPS = 819.0 * 0.85
MXU_F32_TFLOPS = 197.0 / 4  # v5e bf16 peak 197 TF/s; f32 dot ~1/4

G, CHAIN, ITERS = 4096, 256, 8
CAP, MB = 200_000, 64


def timed(fn, state, keys, reps=3):
    out = fn(*state, keys[0], jnp.asarray(0.1))
    _ = np.asarray(jax.tree.leaves(out)[-1])
    state = out[:4]
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(*state, keys[1 + i], jnp.asarray(0.1))
        _ = np.asarray(jax.tree.leaves(out)[-1])
        state = out[:4]
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN * 1e3  # ms per cycle


def build(learn_iters):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import make_trainable_cycle

    cfg = EnvConfig(num_players=4)
    fn, _, state = make_trainable_cycle(
        cfg, G, CHAIN, learn_iters=learn_iters, pallas_act=True,
        feature_major=True,
    )
    return fn, state


def main():
    cfg = EnvConfig(num_players=4)
    T, P, S = cfg.max_turns, cfg.num_players, cfg.state_length
    H, A = 64, cfg.num_actions
    N = T * P * G  # transitions per cycle

    keys = [jax.random.key(40 + i) for i in range(8)]
    fn8, st8 = build(8)
    fn1, st1 = build(1)
    ms8 = timed(fn8, st8, keys)
    ms1 = timed(fn1, st1, keys[4:])
    per_iter = (ms8 - ms1) / (ITERS - 1)
    front = ms1 - per_iter  # rollout + harvest + insert

    # Rollout-only: chain raw fm kernel calls (fresh effective weights per
    # generation like the cycle), consume via checksum.
    from jax import lax

    from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
    from rl6nimmt_tpu.nets import draw_mlp_noise, mlp_init, noisy_effective_params
    from rl6nimmt_tpu.ops.act_rollout_kernel import make_act_rollout_kernel

    dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                        n_steps=10, hidden_sizes=(H,), minibatch=MB)
    spec = q_network_spec(dqn_cfg, S, A)
    params = mlp_init(jax.random.key(1), spec)
    play = make_act_rollout_kernel(cfg, G, hidden=H, feature_major=True)

    @jax.jit
    def rollout_chain(params, key):
        def gen(c, k):
            def chain(kk, _):
                kk, sub = jax.random.split(kk)
                return kk, sub

            k, deal_key = jax.random.split(k)
            _, subs = lax.scan(chain, k, jnp.arange(T))
            nks = jax.vmap(lambda s: jax.random.split(s, 3)[0])(subs)
            noise = jax.vmap(lambda nk: draw_mlp_noise(spec, nk))(nks)
            eff = jax.vmap(lambda nz: noisy_effective_params(spec, params, nz))(noise)
            seed = jax.random.randint(deal_key, (), 0, 2**31 - 1 - G // 1024)
            obs, acts, rews = play(seed, eff["trunk"][0]["w"], eff["trunk"][0]["b"],
                                   eff["heads"][1]["w"], eff["heads"][1]["b"])
            return c + jnp.sum(rews), None

        tot, _ = lax.scan(gen, jnp.zeros((), jnp.int32),
                          jax.random.split(key, CHAIN))
        return tot

    _ = float(rollout_chain(params, keys[0]))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(rollout_chain(params, keys[1 + i]))
        best = min(best, time.perf_counter() - t0)
    rollout_ms = best / CHAIN * 1e3
    harvest_insert_ms = front - rollout_ms

    # ---------------- analytic floors -----------------------------------
    int8 = 1
    f32 = 4
    # rollout: read per-turn effective weights, write int8 trajectory +
    # actions/rewards (i32).
    bytes_rollout = (
        T * (S * H + H + H * A + A) * f32          # effective weights read
        + (T + 1) * P * S * G * int8               # obs trajectory write
        + 2 * T * P * G * f32                      # actions+rewards write
    )
    # per tile of 1024 games: shared 37-feature contraction + per-seat
    # hand contraction + adv head, per turn (per-cycle FLOPs)
    flops_rollout = (G // 1024) * T * (
        2 * (S - 10) * H * 1024
        + P * (2 * 10 * H * 1024 + 2 * H * A * 1024)
    )
    # harvest+insert: read trajectory, write state/next_state int8 planes +
    # reward f32 + action/done int8 + priorities; ring wrap moves the
    # window twice (tail+head patch reads+writes).
    row_bytes = 2 * S * int8 + f32 + 2 * int8 + f32  # per transition incl pri
    bytes_insert = (T + 1) * P * S * G * int8 + 3 * N * row_bytes
    # learn: 8x (priority reduction over CAP + minibatch forwards/backward)
    bytes_learn = ITERS * (2 * CAP * f32 + MB * (2 * S * int8 + 8 * f32))
    flops_learn = ITERS * (
        # fwd local(s,s') + target(s') + bwd ~2x fwd, batch MB
        5 * MB * 2 * (S * H + H * A)
    )

    def floor_ms(nbytes, nflops):
        return max(nbytes / (HBM_GBPS * 1e9), nflops / (MXU_F32_TFLOPS * 1e12)) * 1e3

    phases = {
        "rollout": {
            "measured_ms": round(rollout_ms, 4),
            "hbm_floor_ms": round(bytes_rollout / (HBM_GBPS * 1e9) * 1e3, 4),
            "mxu_floor_ms": round(flops_rollout / (MXU_F32_TFLOPS * 1e12) * 1e3, 4),
            "floor_ms": round(floor_ms(bytes_rollout, flops_rollout), 4),
        },
        "harvest_insert": {
            "measured_ms": round(harvest_insert_ms, 4),
            "hbm_floor_ms": round(bytes_insert / (HBM_GBPS * 1e9) * 1e3, 4),
            "floor_ms": round(floor_ms(bytes_insert, 0), 4),
        },
        "learn_8_updates": {
            "measured_ms": round(per_iter * ITERS, 4),
            "per_update_ms": round(per_iter, 4),
            "hbm_floor_ms": round(bytes_learn / (HBM_GBPS * 1e9) * 1e3, 4),
            "mxu_floor_ms": round(flops_learn / (MXU_F32_TFLOPS * 1e12) * 1e3, 4),
            "floor_ms": round(floor_ms(bytes_learn, flops_learn), 4),
        },
    }
    total_floor = sum(p["floor_ms"] for p in phases.values())
    result = {
        "config": {"games": G, "chain": CHAIN, "learn_iters": ITERS,
                   "capacity": CAP, "minibatch": MB},
        "assumed_hw": {"hbm_gbps_usable": HBM_GBPS,
                       "mxu_f32_tflops": MXU_F32_TFLOPS},
        "measured_ms_per_cycle": {"full_8_iters": round(ms8, 4),
                                  "one_iter": round(ms1, 4)},
        "phases": phases,
        "total_floor_ms": round(total_floor, 4),
        "fraction_of_floor": round(total_floor / ms8, 4),
        "headroom_x": round(ms8 / total_floor, 2),
        "binding_constraint": (
            "ring-wrap insert (~0.48 ms/cycle: wrap-branch "
            "dynamic_update_slice + cond + select move ~3x the insert "
            "bytes, firing on ~81% of cycles at cap=200k/insert=163.8k) "
            "and the Pallas rollout's VPU work (~0.31 ms vs 0.05 ms MXU "
            "floor); the 8 Bellman updates are ~28 us each. Wrap-free "
            "aligned layout re-measured under fm: still slower end-to-end "
            "(1.96 vs 1.46 ms). Neither HBM bytes nor MXU FLOPs bind."
        ),
    }
    print(json.dumps(result, indent=1))
    Path("experiments/results/roofline_cycle_r5.json").write_text(
        json.dumps(result, indent=1)
    )


if __name__ == "__main__":
    main()
