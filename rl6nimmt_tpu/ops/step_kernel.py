"""Pallas TPU kernel for the batched turn resolution.

The simultaneous-turn resolution (engine/env.py ``step``) is a chain of ~50
small selects/reductions per sub-play over tiny ``[R, T]`` boards.  Under
plain XLA each intermediate round-trips HBM with heavy tile padding (the
trailing dims 4/6 pad to 8/128).  This kernel flips the layout -- games on
the 128-lane axis, board rows*slots on sublanes -- and resolves a whole turn
(all P sub-plays in ascending order) inside VMEM with fully unrolled logic:
one HBM read and one write per state tensor per turn.

Layout: ``board_t: int32[R*T, G]``, ``row_len_t: int32[R, G]``,
``cards_sorted_t / order_t: int32[P, G]`` (sorting happens outside -- a [G,P]
sort is cheap in XLA).  Returns the updated board/row_len plus per-player
rewards ``int32[P, G]``.

Semantics are bit-identical to :func:`rl6nimmt_tpu.engine.env.step` (tested
against it); the hand-mask update stays outside the kernel (it is a single
fused XLA op already).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.state import EnvConfig

LANES = 128
SUBLANES = 8
TILE = SUBLANES * LANES  # games per grid block: a full (8, 128) VPU tile


def _card_points(face_idx):
    """Point value from 0-indexed card id (arithmetic, no table)."""
    face = face_idx + 1
    m10 = face % 10
    pts = jnp.where(
        face == 55, 7,
        jnp.where(face % 11 == 0, 5, jnp.where(m10 == 0, 3, jnp.where(m10 == 5, 2, 1))),
    )
    return jnp.where(face_idx >= 0, pts, 0)



def _row_aggregates(cfg: EnvConfig, board, row_len):
    """Per-row (points, last card, filled-cell sum) registers from the board.

    ``points`` is the row penalty including the last card (the reference's
    ``_row_value(include_last=True)``, env.py:214-222), ``last`` the highest
    (= last appended) card, ``csum`` the sum of filled card ids.  Computed
    once per kernel entry; :func:`_apply_subplay` then maintains all three
    incrementally so the O(R*T) sweep never reruns per sub-play.
    """
    R, T = cfg.num_rows, cfg.threshold
    row_pts, row_last, row_csum = [], [], []
    for r in range(R):
        last = jnp.zeros_like(board[0])
        pts = jnp.zeros_like(board[0])
        csum = jnp.zeros_like(board[0])
        for t in range(T):
            cell = board[r * T + t]
            filled = t < row_len[r]
            last = jnp.where(t == row_len[r] - 1, cell, last)
            pts = pts + jnp.where(filled, _card_points(cell), 0)
            csum = csum + jnp.where(filled, cell, 0)
        row_pts.append(pts)
        row_last.append(last)
        row_csum.append(csum)
    return row_pts, row_last, row_csum


def _apply_subplay(cfg: EnvConfig, board, row_len, aggr, rewards, card, player):
    """Resolve ONE sub-play on tile-register state, shared by both kernels.

    ``board`` (R*T tiles), ``row_len`` (R tiles), ``aggr`` (the
    :func:`_row_aggregates` triple) and ``rewards`` (P tiles) are register
    lists mutated in place; ``card``/``player`` are tiles for the sub-play
    being resolved.  Single source of truth for the rules-critical resolution
    math (engine/env.py:_resolve semantics).

    ``board=None`` skips the per-cell board writes: every rules decision
    (row choice, capture, penalty) and the observation checksum read ONLY
    the aggregate registers, so callers that never output the board (the
    self-dealing game kernel) drop its O(R*T) update — the largest single
    op block of the fused game — with bit-identical rewards/checksums.
    """
    R, T, P = cfg.num_rows, cfg.threshold, cfg.num_players
    row_pts, row_last, row_csum = aggr

    # Row with the highest last card below the played card.
    best_last = jnp.full_like(card, -1)
    target = jnp.zeros_like(card)
    for r in range(R):
        fit = row_last[r] < card
        better = fit & (row_last[r] > best_last)
        best_last = jnp.where(better, row_last[r], best_last)
        target = jnp.where(better, r, target)
    undercut = best_last < 0

    # Cheapest row (first-minimum tie-break) for undercut captures.
    cheapest_pts = row_pts[0]
    cheapest = jnp.zeros_like(card)
    for r in range(1, R):
        cheaper = row_pts[r] < cheapest_pts
        cheapest_pts = jnp.where(cheaper, row_pts[r], cheapest_pts)
        cheapest = jnp.where(cheaper, r, cheapest)
    row = jnp.where(undercut, cheapest, target)

    old_len = jnp.zeros_like(card)
    old_pts = jnp.zeros_like(card)
    for r in range(R):
        sel = row == r
        old_len = jnp.where(sel, row_len[r], old_len)
        old_pts = jnp.where(sel, row_pts[r], old_pts)
    captures = undercut | (old_len + 1 >= T)

    # Board + aggregate update: capture -> [card, -1, ...]; else append.
    cpts = _card_points(card)
    for r in range(R):
        sel = row == r
        cap = sel & captures
        app = sel & ~captures
        if board is not None:
            for t in range(T):
                cell = board[r * T + t]
                cap_cell = jnp.where(t == 0, card, jnp.full_like(card, -1))
                app_cell = jnp.where(t == old_len, card, cell)
                board[r * T + t] = jnp.where(
                    sel, jnp.where(captures, cap_cell, app_cell), cell
                )
        row_len[r] = jnp.where(
            sel, jnp.where(captures, jnp.ones_like(old_len), old_len + 1), row_len[r]
        )
        row_pts[r] = jnp.where(cap, cpts, row_pts[r] + jnp.where(app, cpts, 0))
        row_csum[r] = jnp.where(cap, card, row_csum[r] + jnp.where(app, card, 0))
        row_last[r] = jnp.where(sel, card, row_last[r])

    penalty = jnp.where(captures, old_pts, 0)
    for p in range(P):
        rewards[p] = rewards[p] - jnp.where(player == p, penalty, 0)


def _turn_kernel(cfg: EnvConfig, cards_ref, order_ref, board_ref, len_ref,
                 board_out, len_out, reward_out):
    R, T, P = cfg.num_rows, cfg.threshold, cfg.num_players

    # Each per-game value is a full (8, 128) VPU tile of games.
    board = [board_ref[i] for i in range(R * T)]
    row_len = [len_ref[r] for r in range(R)]
    rewards = [jnp.zeros_like(row_len[0]) for _ in range(P)]
    aggr = _row_aggregates(cfg, board, row_len)

    for i in range(P):  # sub-plays in ascending card order
        _apply_subplay(cfg, board, row_len, aggr, rewards, cards_ref[i], order_ref[i])

    for i in range(R * T):
        board_out[i] = board[i]
    for r in range(R):
        len_out[r] = row_len[r]
    for p in range(P):
        reward_out[p] = rewards[p]


@functools.lru_cache(maxsize=None)
def _make_resolvers(cfg: EnvConfig, num_games: int, interpret: bool = False):
    """Compile both layouts: standard ``[G, ...]`` and transposed ``[..., G]``.

    Returns ``(resolve, resolve_t)`` where ``resolve(board[G,R,T], row_len[G,R],
    actions[G,P]) -> (board', row_len', rewards[G,P])`` and ``resolve_t`` takes
    and returns the games-last layout (``board_t [R*T, G]``, ``row_len_t
    [R, G]`` -> ..., ``rewards_t [P, G]``) for callers that keep state
    transposed across a rollout.  ``num_games`` must be a multiple of 128.
    """
    R, T, P = cfg.num_rows, cfg.threshold, cfg.num_players
    G = num_games
    assert G % TILE == 0, f"num_games={G} must be a multiple of {TILE}"
    grid = (G // TILE,)

    kernel = functools.partial(_turn_kernel, cfg)
    blk = lambda rows: pl.BlockSpec(
        (rows, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shaped = lambda rows: jax.ShapeDtypeStruct((rows, G // LANES, LANES), jnp.int32)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk(P), blk(P), blk(R * T), blk(R)],
        out_specs=(blk(R * T), blk(R), blk(P)),
        out_shape=(shaped(R * T), shaped(R), shaped(P)),
        interpret=interpret,
    )

    def resolve_t(board_t, row_len_t, actions):
        """Transposed-layout entry: ``board_t [R*T, G]``, ``row_len_t [R, G]``.

        For callers that keep the board games-last across a whole rollout
        (one transpose per generation instead of per turn).
        """
        actions = actions.astype(jnp.int32)
        order = jnp.argsort(actions, axis=1).astype(jnp.int32)      # [G, P]
        cards_sorted = jnp.sort(actions, axis=1)
        tile3 = lambda x: x.reshape(x.shape[0], G // LANES, LANES)
        b, l, r = call(
            tile3(cards_sorted.T), tile3(order.T), tile3(board_t), tile3(row_len_t)
        )
        flat = lambda x: x.reshape(x.shape[0], G)
        return flat(b), flat(l), flat(r)

    def resolve(board, row_len, actions):
        board_t = board.reshape(G, R * T).T
        new_board_t, new_len_t, rewards_t = resolve_t(board_t, row_len.T, actions)
        return (
            new_board_t.T.reshape(G, R, T),
            new_len_t.T,
            rewards_t.T,
        )

    jitted = jax.jit(resolve)
    return jitted, jax.jit(resolve_t)


def make_turn_resolver(cfg: EnvConfig, num_games: int, interpret: bool = False):
    """Standard-layout Pallas turn resolver (see :func:`_make_resolvers`)."""
    return _make_resolvers(cfg, num_games, interpret)[0]


def make_turn_resolver_t(cfg: EnvConfig, num_games: int, interpret: bool = False):
    """Games-last-layout Pallas turn resolver (see :func:`_make_resolvers`)."""
    return _make_resolvers(cfg, num_games, interpret)[1]
