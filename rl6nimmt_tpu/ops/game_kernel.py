"""Pallas TPU kernel playing ENTIRE random games in VMEM.

The logical endpoint of the engine's fusion story: where ``step_kernel``
resolves one turn per invocation, this kernel plays the *whole* 10-turn game
-- uniform-legal sampling (in-kernel PRNG), ascending-order resolution,
sorted-hand maintenance, and per-turn observation checksums -- without
touching HBM between turns.  Per grid block it holds a (8, 128) tile of games
(board 24 rows, row lengths 4, sorted hands P*H rows) entirely in VMEM.

Used by the throughput benchmark's fastest path; returns per-game total
rewards plus a per-game observation checksum so the observation math stays
live (same definition as the XLA rollout: sum of all observation entries per
turn, i.e. hand blocks of every seat plus num_players/summaries/board grid
once per seat).

RNG: the TPU hardware PRNG (``pltpu.prng_random_bits``) seeded per block;
the sampled-action stream therefore differs from the ``jax.random`` rollout
paths (uniform-legal distribution is identical; use the XLA path when you
need key-reproducible trajectories).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.state import EnvConfig
from .step_kernel import (
    LANES,
    SUBLANES,
    TILE,
    _apply_subplay,
    _row_aggregates,
)


def _seed_hash(seed):
    """Knuth multiplicative scramble: decorrelates sequential block seeds."""
    return seed * jnp.int32(-1640531527)


def _bitonic_sort_packed(vals, needed=None):
    """In-place ascending bitonic sort of ``len(vals)`` (power of two) tiles.

    Every element is a single packed ``[8, 128]`` int32 tile (sort key in the
    high bits, payload in the low bits), so each compare-swap is just one
    ``minimum`` + one ``maximum`` over the whole game tile -- 2 vector ops
    instead of the 5 a separate key/payload swap costs.  n=128 -> 28 passes,
    64 pairs each.

    ``needed`` (optional): output ranks that must be exact.  The comparator
    list is backward-pruned — a comparator is dropped iff neither of its
    positions can influence a needed output downstream — which is exact for
    the kept ranks (a partial sorting network).  The deal only consumes deck
    ranks [0, P*H) and [C-R, C), pruning ~10% of the network.
    """
    n = len(vals)
    assert n & (n - 1) == 0, n
    comps = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            for i in range(n):
                l = i ^ j
                if l > i:
                    comps.append((i, l, (i & k) == 0))
            j //= 2
        k *= 2
    if needed is not None:
        live, keep = set(needed), []
        for (i, l, _) in reversed(comps):
            hit = i in live or l in live
            keep.append(hit)
            if hit:
                live.add(i)
                live.add(l)
        keep.reverse()
        comps = [c for c, kept in zip(comps, keep) if kept]
    for (i, l, ascending) in comps:
        lo = jnp.minimum(vals[i], vals[l])
        hi = jnp.maximum(vals[i], vals[l])
        vals[i], vals[l] = (lo, hi) if ascending else (hi, lo)


def _deal_in_kernel(cfg: EnvConfig, shape, materialize_board: bool = True):
    """Deal a fresh game per lane from the (already seeded) hardware PRNG.

    A uniform deck permutation via random-key sort: pack a 24-bit sort key
    over the 7-bit card id per deck slot, pad 104 -> 128 with sentinel values
    that sort last, and run a bitonic network over the 128 packed row
    registers (min/max compare-swaps).  Key collisions (~3e-4 expected
    colliding pairs per game at 24 bits) fall back to ascending card id -- an
    immeasurable deviation from exact uniformity.  Deck layout then matches
    :func:`rl6nimmt_tpu.engine.env.init_from_deck`: player ``p`` holds slots
    ``[p*H, (p+1)*H)`` (sorted ascending in-hand), board row ``r`` is seeded
    from slot ``C-1-r``.
    """
    R, T, P, H, C = cfg.num_rows, cfg.threshold, cfg.num_players, cfg.hand_size, cfg.num_cards
    assert C <= 128, C  # card id must fit the low 7 bits of the packed word
    pad = 1 << (C - 1).bit_length()

    packed = []
    for c in range(C):
        bits = pltpu.prng_random_bits(shape)
        key24 = (pltpu.bitcast(bits, jnp.uint32) >> jnp.uint32(8)).astype(jnp.int32)
        packed.append((key24 << 7) | c)
    sentinel = jnp.full(shape, jnp.int32(0x7FFFFFFF), jnp.int32)
    for _ in range(C, pad):
        packed.append(sentinel)
    needed = frozenset(range(P * H)) | frozenset(range(C - R, C))
    _bitonic_sort_packed(packed, needed)
    deck = lambda i: packed[i] & jnp.int32(127)  # unpack card id (lazy per slot)

    # Hands: slots [p*H, (p+1)*H), each sorted ascending (min/max bubble).
    hands = []
    for p in range(P):
        hand = [deck(p * H + i) for i in range(H)]
        for i in range(H):
            for j in range(H - 1 - i):
                hand[j], hand[j + 1] = (
                    jnp.minimum(hand[j], hand[j + 1]),
                    jnp.maximum(hand[j], hand[j + 1]),
                )
        hands.extend(hand)

    # Board: row r seeded from the deck tail (init_from_deck parity).  The
    # self-deal game kernel never outputs the board and resolves purely on
    # row aggregates, so it skips materializing the empty cells.
    board = []
    for r in range(R):
        board.append(deck(C - 1 - r))
        if materialize_board:
            board.extend(jnp.full(shape, -1, jnp.int32) for _ in range(T - 1))
    row_len = [jnp.full(shape, 1, jnp.int32) for _ in range(R)]
    return board, row_len, hands


def _selfdeal_game_kernel(cfg: EnvConfig, seed_ref, reward_out, checksum_out):
    """Deal AND play entirely in-kernel: input is one scalar seed per call.

    Board cells are never materialized: each freshly-dealt row is one seed
    card, so its aggregates are computed directly and the whole game resolves
    on aggregate registers alone (``_apply_subplay`` with ``board=None``) —
    rewards and observation checksums are bit-identical to the materialized
    path (gated by the turn kernel's exact-equality test vs the engine).
    """
    R, T = cfg.num_rows, cfg.threshold
    pltpu.prng_seed(_seed_hash(seed_ref[0] + pl.program_id(0)))
    shape = (SUBLANES, LANES)
    seeds, row_len, hands = _deal_in_kernel(cfg, shape, materialize_board=False)
    from .step_kernel import _card_points

    aggr = (
        [_card_points(seeds[r]) for r in range(R)],  # row_pts (incl. last)
        [seeds[r] for r in range(R)],                # row_last
        [seeds[r] for r in range(R)],                # row_csum
    )
    _play_turns(cfg, None, row_len, hands, reward_out, checksum_out, aggr)


def _play_turns(cfg: EnvConfig, board, row_len, hands, reward_out, checksum_out,
                aggr=None):
    R, T, P, H = cfg.num_rows, cfg.threshold, cfg.num_players, cfg.hand_size
    assert P < 16, P  # player id must fit the low 4 bits of the packed word

    rewards = [jnp.zeros_like(row_len[0]) for _ in range(P)]
    checksum = jnp.zeros_like(row_len[0], dtype=jnp.float32)
    if aggr is None:
        aggr = _row_aggregates(cfg, board, row_len)
    row_pts, row_last, row_csum = aggr

    # Hand-block checksum term, maintained incrementally: each pick removes
    # the card and appends a -1 pad, so the block sum drops by (pick + 1).
    hand_sum = hands[0]
    for i in range(1, P * H):
        hand_sum = hand_sum + hands[i]

    for t in range(cfg.max_turns):
        count = H - t  # cards left in every hand this turn (static)

        # ----- observation checksum (matches engine observe layout sums) ----
        # The per-row summary sums come straight off the aggregate registers
        # _apply_subplay maintains.  Bit-identical to summing the materialized
        # observe() layout: empty board cells hold -1, so
        # board_sum = csum - (T - len) per row.
        len_sum = row_len[0]
        pts_sum = row_pts[0]
        high_sum = row_last[0]
        board_sum = row_csum[0]
        for r in range(1, R):
            len_sum = len_sum + row_len[r]
            pts_sum = pts_sum + row_pts[r]
            high_sum = high_sum + row_last[r]
            board_sum = board_sum + row_csum[r]
        board_sum = board_sum + len_sum - R * T
        if cfg.include_summaries:
            game_block = P + len_sum + high_sum + pts_sum + board_sum
        else:  # observation drops the per-row summary blocks
            game_block = P + board_sum
        checksum = checksum + hand_sum.astype(jnp.float32) + (
            P * game_block
        ).astype(jnp.float32)

        # ------------------------- uniform-legal sampling per seat ----------
        # Each pick is packed as card<<4 | player so the ascending-order sort
        # below runs on single registers with min/max compare-swaps (cards
        # are distinct across seats, so the player bits never decide order).
        packed = []
        for p in range(P):
            bits = pltpu.prng_random_bits(row_len[0].shape)
            r = (pltpu.bitcast(bits, jnp.uint32) % jnp.uint32(count)).astype(jnp.int32)
            pick = jnp.zeros_like(row_len[0])
            for h in range(count):
                pick = jnp.where(r == h, hands[p * H + h], pick)
            packed.append((pick << 4) | p)
            hand_sum = hand_sum - pick - 1  # removed card + new -1 pad
            # Remove the picked card: shift left from slot r.
            for h in range(count - 1):
                hands[p * H + h] = jnp.where(
                    r <= h, hands[p * H + h + 1], hands[p * H + h]
                )
            hands[p * H + count - 1] = jnp.where(
                r <= count - 1, jnp.full_like(pick, -1), hands[p * H + count - 1]
            )

        # ------------------ ascending order: bubble sorting network ---------
        for i in range(P):
            for j in range(P - 1 - i):
                packed[j], packed[j + 1] = (
                    jnp.minimum(packed[j], packed[j + 1]),
                    jnp.maximum(packed[j], packed[j + 1]),
                )

        # --------------------------- resolve the P sub-plays ----------------
        for i in range(P):
            _apply_subplay(
                cfg, board, row_len, aggr, rewards,
                packed[i] >> 4, packed[i] & jnp.int32(15),
            )

    for p in range(P):
        reward_out[p] = rewards[p]
    checksum_out[0] = checksum


@functools.lru_cache(maxsize=None)
def make_selfdeal_game_kernel(cfg: EnvConfig, num_games: int):
    """Compile ``seed -> (rewards[G, P], checksum[G])``: deal + play in-kernel.

    The fastest path on real TPUs: one Pallas call per generation with no
    XLA-side per-generation work at all -- the hardware PRNG deals the deck
    (bitonic random-key shuffle, see :func:`_deal_in_kernel`) and the whole
    10-turn game resolves in VMEM.  Seeds must differ between calls; block
    ``i`` of a call uses stream ``seed + i``, so consecutive seeds should be
    spaced by ``num_games // TILE`` (handled by the vector-runtime wrapper).
    """
    R, T, P = cfg.num_rows, cfg.threshold, cfg.num_players
    G = num_games
    assert G % TILE == 0, f"num_games={G} must be a multiple of {TILE}"
    grid = (G // TILE,)

    kernel = functools.partial(_selfdeal_game_kernel, cfg)
    blk = lambda rows: pl.BlockSpec(
        (rows, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shaped = lambda rows, dtype=jnp.int32: jax.ShapeDtypeStruct(
        (rows, G // LANES, LANES), dtype
    )

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],  # seed [1]
        out_specs=(blk(P), blk(1)),
        out_shape=(shaped(P), shaped(1, jnp.float32)),
    )

    def play(seed):
        rewards_t, checksum_t = call(jnp.asarray(seed, jnp.int32).reshape(1))
        return rewards_t.reshape(P, G).T, checksum_t.reshape(G)

    return jax.jit(play)


def _deal_kernel(cfg: EnvConfig, seed_ref, board_out, len_out, hands_out):
    pltpu.prng_seed(_seed_hash(seed_ref[0] + pl.program_id(0)))
    board, row_len, hands = _deal_in_kernel(cfg, (SUBLANES, LANES))
    for i, v in enumerate(board):
        board_out[i] = v
    for r, v in enumerate(row_len):
        len_out[r] = v
    for i, v in enumerate(hands):
        hands_out[i] = v


@functools.lru_cache(maxsize=None)
def make_deal_kernel(cfg: EnvConfig, num_games: int):
    """Test access to the in-kernel deal: ``seed -> (board[G,R,T],
    row_len[G,R], hands_sorted[G,P,H])`` drawn from the same PRNG stream
    position the self-deal game kernel starts from."""
    R, T, P, H = cfg.num_rows, cfg.threshold, cfg.num_players, cfg.hand_size
    G = num_games
    assert G % TILE == 0, f"num_games={G} must be a multiple of {TILE}"
    grid = (G // TILE,)

    kernel = functools.partial(_deal_kernel, cfg)
    blk = lambda rows: pl.BlockSpec(
        (rows, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shaped = lambda rows: jax.ShapeDtypeStruct((rows, G // LANES, LANES), jnp.int32)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(blk(R * T), blk(R), blk(P * H)),
        out_shape=(shaped(R * T), shaped(R), shaped(P * H)),
    )

    def deal_games(seed):
        b, l, h = call(jnp.asarray(seed, jnp.int32).reshape(1))
        untile = lambda x, *s: x.reshape(x.shape[0], G).T.reshape(G, *s)
        return untile(b, R, T), untile(l, R), untile(h, P, H)

    return jax.jit(deal_games)
