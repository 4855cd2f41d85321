"""Headline benchmark: env throughput at 4096 parallel games on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition: one env step = one simultaneous-move ``step`` of one game
(all players play one card and the board resolves), *including* fresh
observation construction for every seat -- the same work the reference's
``SechsNimmtEnv.step`` does per call (env.py:64-77).  4096 four-player games
x 10 turns per rollout, fully fused on device (deal + 10 steps + observations
in one program).  ``vs_baseline`` is measured throughput over the
BASELINE.json target of 10M env-steps/s per chip.
"""

import json
import time

import jax

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

from rl6nimmt_tpu.engine import EnvConfig
from rl6nimmt_tpu.runtime.vector import make_random_rollout_generations

NUM_GAMES = 4096
NUM_PLAYERS = 4
TARGET_STEPS_PER_SEC = 10_000_000.0  # BASELINE.json north-star target


def verify_kernel_exactness(cfg):
    """Per-round bit-exactness guard behind the headline number.

    The fused bench path rides the Pallas turn-resolution kernel; before
    timing anything, one turn of TILE games is resolved by BOTH the kernel
    and the XLA engine step and compared bit-for-bit (the full gated suite is
    ``RL6_TEST_TPU=1 pytest tests/test_step_kernel.py tests/test_game_kernel.py``).
    Raises on any mismatch, so a silently-wrong kernel can never post a
    bench number.
    """
    import functools

    import numpy as np

    from rl6nimmt_tpu.engine import deal, step
    from rl6nimmt_tpu.ops.step_kernel import TILE, make_turn_resolver

    G = TILE
    deal_b = jax.vmap(functools.partial(deal, cfg))
    step_b = jax.jit(jax.vmap(functools.partial(step, cfg)))
    resolver = make_turn_resolver(cfg, G)

    state = deal_b(jax.random.split(jax.random.key(2026), G))
    rng = np.random.RandomState(6)
    for turn in range(3):
        hs = np.asarray(state.hands_sorted)
        counts = (hs >= 0).sum(axis=2)
        picks = (rng.random(counts.shape) * counts).astype(np.int64)
        actions = jax.numpy.asarray(
            np.take_along_axis(hs, picks[..., None], axis=2)[..., 0], jax.numpy.int32
        )
        k_board, k_len, k_rewards = resolver(state.board, state.row_len, actions)
        state, e_rewards = step_b(state, actions)
        np.testing.assert_array_equal(np.asarray(k_board), np.asarray(state.board))
        np.testing.assert_array_equal(np.asarray(k_len), np.asarray(state.row_len))
        np.testing.assert_array_equal(np.asarray(k_rewards), np.asarray(e_rewards))


def main():
    cfg = EnvConfig(num_players=NUM_PLAYERS)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu:
        verify_kernel_exactness(cfg)
    # On real TPUs: the fully-fused self-dealing game kernel (deal + 10 turns
    # + observation checksums per generation in one Pallas call).  Enough
    # generations per dispatch that the host fetch round trip (~26 ms over
    # the tunnel) stops dominating the measurement.  CPU fallback: XLA path.
    generations = 4000 if on_tpu else 50
    rollout = make_random_rollout_generations(
        cfg, num_games=NUM_GAMES, generations=generations, with_observations=True,
        use_pallas="fused" if on_tpu else False,
    )

    key = jax.random.key(0)
    # Warmup / compile.  NOTE: results are fetched to host (np.asarray), not
    # merely block_until_ready'd -- on tunneled device backends readiness can
    # resolve before execution, and only a host fetch bounds the real work.
    import numpy as np

    _ = np.asarray(rollout(key)[1])

    iters = 10
    elapsed = []
    for i in range(iters):
        start = time.perf_counter()
        out = rollout(jax.random.key(i + 1))
        _ = float(np.asarray(out[1]))  # fetch checksum: forces execution
        elapsed.append(time.perf_counter() - start)
    elapsed.sort()
    median = elapsed[iters // 2]

    env_steps = generations * NUM_GAMES * cfg.max_turns
    steps_per_sec = env_steps / median

    print(
        json.dumps(
            {
                "metric": f"env-steps/s @ {NUM_GAMES} games ({NUM_PLAYERS}p, with observations)",
                "value": round(steps_per_sec, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / TARGET_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
