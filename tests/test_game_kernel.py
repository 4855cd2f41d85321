"""Whole-game Pallas kernel (ops/game_kernel.py): deal validity + play stats.

TPU-gated like test_step_kernel.py (set RL6_TEST_TPU=1 on a TPU host).  The
kernel draws from the TPU hardware PRNG, so there is no key-for-key XLA
reference; correctness is established by (a) exact structural invariants of
the in-kernel deal (permutation validity, sorted hands, board layout parity
with ``init_from_deck``) and (b) distributional agreement of full-game
outcomes with the key-reproducible XLA rollout path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl6nimmt_tpu.engine import EnvConfig, deal

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="compiled Pallas kernel needs TPU; interpret mode is impractically slow",
)


@requires_tpu
@pytest.mark.parametrize("num_players", [2, 4])
def test_in_kernel_deal_is_valid(num_players):
    from rl6nimmt_tpu.ops.game_kernel import TILE, make_deal_kernel

    cfg = EnvConfig(num_players=num_players)
    G = 2 * TILE
    board, row_len, hands = jax.tree.map(
        np.asarray, make_deal_kernel(cfg, G)(12345)
    )

    # Permutation validity: hands + board seeds are P*H + R distinct cards.
    dealt = np.concatenate([hands.reshape(G, -1), board[:, :, 0]], axis=1)
    assert dealt.min() >= 0 and dealt.max() < cfg.num_cards
    assert all(len(set(row)) == dealt.shape[1] for row in dealt)

    # Layout parity with init_from_deck: sorted hands, seeded rows of length 1.
    assert np.all(np.diff(hands, axis=2) > 0)
    assert np.all(row_len == 1)
    assert np.all(board[:, :, 1:] == -1)


@requires_tpu
def test_in_kernel_deal_is_uniform():
    from rl6nimmt_tpu.ops.game_kernel import TILE, make_deal_kernel

    cfg = EnvConfig(num_players=4)
    G = 4 * TILE
    deal_k = make_deal_kernel(cfg, G)
    hands = np.concatenate(
        [np.asarray(deal_k(seed)[2]).reshape(-1) for seed in (1, 1000, 65537)]
    )
    # Every card should land in some hand with frequency 40/104; a 5-sigma
    # band on the binomial count over 3*G games keeps this deterministic.
    n = 3 * G
    p = (cfg.num_players * cfg.hand_size) / cfg.num_cards
    counts = np.bincount(hands, minlength=cfg.num_cards)
    sigma = np.sqrt(n * p * (1 - p))
    assert np.all(np.abs(counts - n * p) < 5 * sigma), counts

    # Different seeds produce different decks.
    h1 = np.asarray(deal_k(1)[2])
    h2 = np.asarray(deal_k(2)[2])
    assert not np.array_equal(h1, h2)


@requires_tpu
def test_selfdeal_outcomes_match_xla_distribution():
    """Full games from the self-dealing kernel vs the XLA random rollout.

    Mean per-seat totals over many games must agree (same rules, same uniform
    policy, different RNG streams): a 3-sigma band on the mean of ~million
    single-game totals whose std is ~10 points.
    """
    from rl6nimmt_tpu.ops.game_kernel import TILE, make_selfdeal_game_kernel
    from rl6nimmt_tpu.runtime.vector import make_random_rollout_generations

    cfg = EnvConfig(num_players=4)
    G, gens = 4 * TILE, 8
    play = make_selfdeal_game_kernel(cfg, G)
    kern_totals = np.concatenate(
        [np.asarray(play(seed)[0]) for seed in range(0, gens * (G // TILE), G // TILE)]
    )
    assert kern_totals.max() <= 0  # rewards are penalties

    xla = make_random_rollout_generations(
        cfg, num_games=G, generations=gens, with_observations=False
    )
    # The generations helper accumulates totals across generations per slot;
    # divide back to per-game means before comparing.
    xla_mean = np.asarray(xla(jax.random.key(3))[0]).mean() / gens

    n = kern_totals.size
    spread = 3 * 2 * np.std(kern_totals) / np.sqrt(n)
    assert abs(kern_totals.mean() - xla_mean) < spread, (
        kern_totals.mean(), xla_mean, spread,
    )


@requires_tpu
def test_fused_generations_runtime_path():
    """runtime.vector use_pallas='fused' returns sane totals and checksums."""
    from rl6nimmt_tpu.ops.game_kernel import TILE
    from rl6nimmt_tpu.runtime.vector import make_random_rollout_generations

    cfg = EnvConfig(num_players=4)
    G = TILE
    fused = make_random_rollout_generations(
        cfg, num_games=G, generations=4, with_observations=True, use_pallas="fused"
    )
    total, checksum = jax.tree.map(np.asarray, fused(jax.random.key(0)))
    assert total.shape == (G, cfg.num_players)
    assert total.max() <= 0 and total.min() > -300 * 4
    assert np.isfinite(checksum)
    # Keys fold to different seeds -> different outcomes.
    total2, _ = jax.tree.map(np.asarray, fused(jax.random.key(1)))
    assert not np.array_equal(total, total2)


@requires_tpu
def test_selfdeal_kernel_is_deterministic_per_seed():
    """Same seed -> bit-identical rewards/checksums; different seed differs."""
    from rl6nimmt_tpu.ops.game_kernel import TILE, make_selfdeal_game_kernel

    cfg = EnvConfig(num_players=4)
    play = make_selfdeal_game_kernel(cfg, TILE)
    r1, c1 = jax.tree.map(np.asarray, play(42))
    r2, c2 = jax.tree.map(np.asarray, play(42))
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)
    r3, _ = jax.tree.map(np.asarray, play(43))
    assert not np.array_equal(r1, r3)


@requires_tpu
def test_checksum_gate_on_include_summaries():
    """Same seed, summaries on/off: identical games (rules and PRNG stream
    don't depend on the observation layout) but different checksums (the
    no-summaries observation drops the per-row summary blocks)."""
    from rl6nimmt_tpu.ops.game_kernel import TILE, make_selfdeal_game_kernel

    with_s = EnvConfig(num_players=4, include_summaries=True)
    without = EnvConfig(num_players=4, include_summaries=False)
    r1, c1 = jax.tree.map(np.asarray, make_selfdeal_game_kernel(with_s, TILE)(7))
    r2, c2 = jax.tree.map(np.asarray, make_selfdeal_game_kernel(without, TILE)(7))
    np.testing.assert_array_equal(r1, r2)
    assert not np.array_equal(c1, c2)
    # The gap is exactly the summed summary blocks, which are positive for
    # every live game state: with-summaries checksums must be larger.
    assert np.all(c1 > c2)


def test_pruned_bitonic_exact_on_needed_ranks():
    """The backward-pruned partial sorting network (deal path) is exact on
    every rank it keeps — pure-array check, runs on CPU."""
    from rl6nimmt_tpu.ops.game_kernel import _bitonic_sort_packed

    rng = np.random.RandomState(0)
    needed = frozenset(range(40)) | frozenset(range(100, 104))
    for trial in range(5):
        vals = rng.randint(0, 2**31 - 1, size=128)
        full = np.sort(vals)
        tiles = [jnp.asarray(v).reshape(1, 1) for v in vals]
        _bitonic_sort_packed(tiles, needed)
        pruned = np.asarray([int(t[0, 0]) for t in tiles])
        np.testing.assert_array_equal(pruned[sorted(needed)], full[sorted(needed)])
