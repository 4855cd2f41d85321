"""Ablate the act-rollout kernel to attribute its milliseconds.

Variants (cumulative):
  env   : deal + uniform-random play (selfdeal equivalent + reward outputs)
  obs   : + int8 observation trajectory writes
  mm    : + per-seat Q forward (dot_generals + bias + relu), action still random
  full  : + legal mask + masked argmax action choice (the real kernel)

Each variant is DCE-proofed by routing its intermediate through an output.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.ops.game_kernel import _deal_in_kernel, _seed_hash
from rl6nimmt_tpu.ops.step_kernel import (
    LANES,
    SUBLANES,
    TILE,
    _apply_subplay,
    _row_aggregates,
)

G, CHAIN = 4096, 256
cfg = EnvConfig(num_players=4)
HID = 64
NEG_INF = -1e9


def _kernel(variant, seed_ref, w1_ref, b1_ref, wa_ref, ba_ref,
            obs_out, act_out, rew_out):
    R, T, P, H, S = (cfg.num_rows, cfg.threshold, cfg.num_players,
                     cfg.hand_size, cfg.state_length)
    A = cfg.num_actions
    n_turns = cfg.max_turns

    pltpu.prng_seed(_seed_hash(seed_ref[0] + pl.program_id(0)))
    board, row_len, hands = _deal_in_kernel(cfg, (SUBLANES, LANES))
    aggr = _row_aggregates(cfg, board, row_len)
    row_pts, row_last, row_csum = aggr
    iota_a = lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES, A), 2)

    def game_features():
        regs = [jnp.full((SUBLANES, LANES), P, jnp.int32)]
        regs += [row_len[r] for r in range(R)]
        regs += [row_last[r] for r in range(R)]
        regs += [row_pts[r] for r in range(R)]
        regs += [board[i] for i in range(R * T)]
        return regs

    for t in range(n_turns):
        count = H - t
        game_regs = game_features()
        packed = []
        for p in range(P):
            hand_regs = [hands[p * H + i] for i in range(H)]
            obs_regs = hand_regs + game_regs

            if variant in ("obs", "mm", "full"):
                base = (t * P + p) * S
                for f, reg in enumerate(obs_regs):
                    obs_out[base + f] = reg.astype(jnp.int8)

            acted = False
            if variant in ("mm", "full"):
                obs_f32 = jnp.stack(obs_regs).astype(jnp.float32)
                h = lax.dot_general(
                    obs_f32, w1_ref[t], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + b1_ref[t]
                h = jnp.maximum(h, 0.0)
                adv = lax.dot_general(
                    h, wa_ref[t], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + ba_ref[t]
                if variant == "full":
                    legal = jnp.zeros((SUBLANES, LANES, A), jnp.bool_)
                    for i in range(count):
                        legal = legal | (iota_a == hand_regs[i][:, :, None])
                    card = jnp.argmax(
                        jnp.where(legal, adv, NEG_INF), axis=2
                    ).astype(jnp.int32)
                    acted = True
                else:
                    # keep the matmul live: fold argmax-of-all into the action
                    # stream modulo hand size (still a legal random-ish pick)
                    amax = jnp.argmax(adv, axis=2).astype(jnp.int32)
                    bits = pltpu.prng_random_bits((SUBLANES, LANES))
                    r = ((pltpu.bitcast(bits, jnp.uint32) + amax.astype(jnp.uint32))
                         % jnp.uint32(count)).astype(jnp.int32)
                    card = jnp.zeros_like(r)
                    for i in range(count):
                        card = jnp.where(r == i, hand_regs[i], card)
                    acted = True

            if not acted:  # env / obs variants: uniform-legal pick
                bits = pltpu.prng_random_bits((SUBLANES, LANES))
                r = (pltpu.bitcast(bits, jnp.uint32) % jnp.uint32(count)).astype(jnp.int32)
                card = jnp.zeros_like(r)
                for i in range(count):
                    card = jnp.where(r == i, hand_regs[i], card)

            act_out[t * P + p] = card
            for i in range(count - 1):
                hands[p * H + i] = jnp.where(
                    hands[p * H + i] >= card, hands[p * H + i + 1], hands[p * H + i]
                )
            hands[p * H + count - 1] = jnp.where(
                hands[p * H + count - 1] >= card,
                jnp.full_like(card, -1),
                hands[p * H + count - 1],
            )
            packed.append((card << 4) | p)

        for i in range(P):
            for j in range(P - 1 - i):
                packed[j], packed[j + 1] = (
                    jnp.minimum(packed[j], packed[j + 1]),
                    jnp.maximum(packed[j], packed[j + 1]),
                )
        turn_rew = [jnp.zeros((SUBLANES, LANES), jnp.int32) for _ in range(P)]
        for i in range(P):
            _apply_subplay(cfg, board, row_len, aggr, turn_rew,
                           packed[i] >> 4, packed[i] & jnp.int32(15))
        for p in range(P):
            rew_out[t * P + p] = turn_rew[p]


def build(variant):
    R, T, P, H, S = (cfg.num_rows, cfg.threshold, cfg.num_players,
                     cfg.hand_size, cfg.state_length)
    A = cfg.num_actions
    n_turns = cfg.max_turns
    grid = (G // TILE,)
    kernel = functools.partial(_kernel, variant)
    blk = lambda rows: pl.BlockSpec(
        (rows, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shaped = lambda rows, dtype: jax.ShapeDtypeStruct((rows, G // LANES, LANES), dtype)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full((n_turns, S, HID)), full((n_turns, HID)),
            full((n_turns, HID, A)), full((n_turns, A)),
        ],
        out_specs=(blk((n_turns + 1) * P * S), blk(n_turns * P), blk(n_turns * P)),
        out_shape=(
            shaped((n_turns + 1) * P * S, jnp.int8),
            shaped(n_turns * P, jnp.int32),
            shaped(n_turns * P, jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def many(seed, w1, b1, wa, ba):
        def gen(acc, i):
            o, a, r = call(jnp.asarray(seed + i * (G // TILE), jnp.int32).reshape(1),
                           w1, b1, wa, ba)
            return acc + jnp.sum(r) + jnp.sum(a) + jnp.sum(o[0].astype(jnp.int32)), None

        acc, _ = lax.scan(gen, jnp.zeros((), jnp.int32),
                          jnp.arange(CHAIN, dtype=jnp.int32))
        return acc

    return jax.jit(many)


def timeit(fn, *args, iters=5):
    out = fn(*args); _ = np.asarray(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); out = fn(*args); _ = np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / CHAIN * 1e3


def main():
    rng = np.random.default_rng(0)
    T, S, A = cfg.max_turns, cfg.state_length, cfg.num_actions
    w1 = jnp.asarray(rng.normal(size=(T, S, HID)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(T, HID)), jnp.float32)
    wa = jnp.asarray(rng.normal(size=(T, HID, A)), jnp.float32)
    ba = jnp.asarray(rng.normal(size=(T, A)), jnp.float32)
    import sys as _s
    variants = _s.argv[1:] or ["env", "obs", "mm", "full"]
    for v in variants:
        ms = timeit(build(v), 7, w1, b1, wa, ba)
        print(f"{v:5s}: {ms:7.3f} ms/generation", flush=True)


if __name__ == "__main__":
    main()
