"""Pure-functional JAX core of the 6 nimmt! environment.

All game dynamics (reference: /root/reference/rl_6_nimmt/env.py) are expressed
as jit/vmap-able functions over the fixed-shape :class:`EnvState`:

* :func:`deal` / :func:`init_from_deck` -- card dealing (env.py:99-112).
* :func:`step` -- simultaneous-move resolution in ascending card order with
  row placement, undercut replacement and capture scoring (env.py:120-172).
* :func:`observe` -- the 47-dim per-player observation plus the legal-action
  mask (env.py:174-212).
* :func:`is_done` -- hand-0-empty termination (env.py:246-249).

The sequential part of a turn -- the P sub-plays in ascending card order --
is a ``lax.fori_loop`` of length ``num_players`` over O(rows) vector ops;
everything else is data-parallel and vectorizes cleanly over a games axis via
``vmap``.  A whole game is 10 `step`s under ``lax.scan`` with no host round
trips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .cards import build_points_table
from .state import EnvConfig, EnvState


class InvalidMoveException(Exception):
    """Host-side error for illegal moves (reference env.py:9-10)."""


@functools.lru_cache(maxsize=None)
def _points_np(cfg: EnvConfig):
    return build_points_table(cfg.num_cards)


def _points(cfg: EnvConfig) -> jnp.ndarray:
    # NOTE: the cache holds a host NumPy array; the jnp constant is rebuilt per
    # trace (it embeds as a literal), which avoids leaking tracer-born values
    # out of a jit scope through the cache.
    return jnp.asarray(_points_np(cfg))


# --------------------------------------------------------------------- dealing


def init_from_deck(cfg: EnvConfig, deck: jnp.ndarray) -> EnvState:
    """Build the initial state from an explicit shuffled deck (``int32[C]``).

    Deck layout parity with the reference deal (env.py:99-112): player ``p``
    holds ``deck[p*H:(p+1)*H]`` and board row ``r`` is seeded with the card
    popped from the deck tail, i.e. ``deck[C - 1 - r]``.  Injecting a recorded
    NumPy shuffle reproduces the reference deal bit-exactly; native mode feeds
    a ``jax.random.permutation`` here.
    """
    P, C, H, R, T = cfg.num_players, cfg.num_cards, cfg.hand_size, cfg.num_rows, cfg.threshold
    deck = deck.astype(jnp.int32)

    dealt = deck[: P * H]
    owners = jnp.repeat(jnp.arange(P, dtype=jnp.int32), H)
    hands = jnp.zeros((P, C), dtype=jnp.bool_).at[owners, dealt].set(True)

    seeds = deck[C - 1 - jnp.arange(R)]
    board = jnp.full((R, T), -1, dtype=jnp.int32).at[:, 0].set(seeds)

    return EnvState(
        board=board,
        row_len=jnp.ones((R,), dtype=jnp.int32),
        hands=hands,
        scores=jnp.zeros((P,), dtype=jnp.int32),
        turn=jnp.zeros((), dtype=jnp.int32),
    )


def deal(cfg: EnvConfig, key: jax.Array) -> EnvState:
    """Deal a fresh game from a JAX PRNG key."""
    return init_from_deck(cfg, jax.random.permutation(key, cfg.num_cards))


# --------------------------------------------------------------------- scoring


def row_points(cfg: EnvConfig, board: jnp.ndarray, row_len: jnp.ndarray) -> jnp.ndarray:
    """Total points per row including the last card (``int32[R]``).

    Matches ``_row_value(include_last=True)`` (reference env.py:214-218), which
    drives both undercut row choice and the observation's score-per-row block.
    """
    pts = _points(cfg)[jnp.clip(board, 0)]
    slot = lax.broadcasted_iota(jnp.int32, board.shape, 1)
    return jnp.sum(jnp.where(slot < row_len[:, None], pts, 0), axis=1)


# ------------------------------------------------------------------------ step


def _place(cfg: EnvConfig, state: EnvState, player: jnp.ndarray, card: jnp.ndarray):
    """Resolve one sub-play: place ``card`` for ``player``, maybe capture a row.

    Semantics (reference env.py:127-172): the card joins the row whose last
    card is the highest below it; if it undercuts all rows, the cheapest row
    (summed points incl. last, first-min tie-break) is captured.  A capture --
    by undercut or by reaching ``threshold`` cards -- costs the placing player
    the points of all cards that were in the row, and restarts the row with
    just the placed card.
    """
    board, row_len = state.board, state.row_len
    R, T = cfg.num_rows, cfg.threshold

    lasts = jnp.take_along_axis(board, (row_len - 1)[:, None], axis=1)[:, 0]
    fits = lasts < card
    target = jnp.argmax(jnp.where(fits, lasts, -1))
    undercut = ~jnp.any(fits)
    cheapest = jnp.argmin(row_points(cfg, board, row_len))
    row = jnp.where(undercut, cheapest, target)

    old_len = row_len[row]
    old_points = row_points(cfg, board, row_len)[row]
    captures = undercut | (old_len + 1 >= T)

    appended = board[row].at[old_len].set(card)
    restarted = jnp.full((T,), -1, dtype=jnp.int32).at[0].set(card)
    board = board.at[row].set(jnp.where(captures, restarted, appended))
    row_len = row_len.at[row].set(jnp.where(captures, 1, old_len + 1))

    penalty = jnp.where(captures, old_points, 0)
    reward = jnp.zeros((cfg.num_players,), dtype=jnp.int32).at[player].add(-penalty)

    return EnvState(
        board=board,
        row_len=row_len,
        hands=state.hands.at[player, card].set(False),
        scores=state.scores.at[player].add(penalty),
        turn=state.turn,
    ), reward


def step(cfg: EnvConfig, state: EnvState, actions: jnp.ndarray) -> Tuple[EnvState, jnp.ndarray]:
    """One simultaneous turn: all players commit a card; resolve ascending.

    ``actions`` is ``int32[P]`` of card ids.  Returns the new state and the
    per-player reward for this turn (0 or minus captured points, accumulated
    across sub-plays exactly as reference env.py:120-136 does).  Legality is
    not checked on device; use :func:`legal_mask` / the host wrapper for that.
    """
    actions = actions.astype(jnp.int32)
    order = jnp.argsort(actions)  # card ids are globally unique -> total order

    def sub_play(i, carry):
        st, rew = carry
        p = order[i]
        st, delta = _place(cfg, st, p, actions[p])
        return st, rew + delta

    state, rewards = lax.fori_loop(
        0, cfg.num_players, sub_play,
        (state, jnp.zeros((cfg.num_players,), dtype=jnp.int32)),
    )
    return state._replace(turn=state.turn + 1), rewards


# ---------------------------------------------------------------- observations


def sorted_hands(cfg: EnvConfig, hands: jnp.ndarray) -> jnp.ndarray:
    """Ascending card ids per player, -1 padded: ``int32[P, hand_size]``.

    Reproduces the reference's sorted-hand observation block (env.py:206-212).
    """
    C = cfg.num_cards
    ids = lax.broadcasted_iota(jnp.int32, hands.shape, 1)
    keyed = jnp.where(hands, ids, C)  # sentinel sorts after every real card
    ranked = jnp.sort(keyed, axis=1)[:, : cfg.hand_size]
    return jnp.where(ranked < C, ranked, -1)


def legal_mask(state: EnvState) -> jnp.ndarray:
    """Legal-action mask ``bool[P, C]`` -- identical to the hand membership."""
    return state.hands


def observe(cfg: EnvConfig, state: EnvState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-player observations ``f32[P, state_length]`` plus legal mask.

    Layout parity with reference env.py:174-212: ``hand(10) | num_players |
    [cards/row | highest/row | points/row] | board RxT flattened``, with the
    bracketed summary blocks present iff ``include_summaries``.
    """
    P = cfg.num_players
    hand_block = sorted_hands(cfg, state.hands)

    pieces = [jnp.full((1,), P, dtype=jnp.int32)]
    if cfg.include_summaries:
        highest = jnp.take_along_axis(state.board, (state.row_len - 1)[:, None], axis=1)[:, 0]
        pieces += [state.row_len, highest, row_points(cfg, state.board, state.row_len)]
    pieces.append(state.board.reshape(-1))
    game_block = jnp.concatenate(pieces)

    obs = jnp.concatenate(
        [hand_block.astype(jnp.float32),
         jnp.broadcast_to(game_block.astype(jnp.float32), (P, game_block.shape[0]))],
        axis=1,
    )
    return obs, state.hands


def is_done(state: EnvState) -> jnp.ndarray:
    """Game over when player 0 has no cards left (reference env.py:246-249)."""
    return ~jnp.any(state.hands[0])


# ------------------------------------------------------------- batched aliases


def batched(fn, cfg: EnvConfig, **vmap_kwargs):
    """vmap a single-game engine function over a leading games axis."""
    return jax.vmap(functools.partial(fn, cfg), **vmap_kwargs)


@functools.lru_cache(maxsize=None)
def jitted_core(cfg: EnvConfig):
    """Compiled (deal, step, observe, init_from_deck) for a single game."""
    return (
        jax.jit(functools.partial(deal, cfg)),
        jax.jit(functools.partial(step, cfg)),
        jax.jit(functools.partial(observe, cfg)),
        jax.jit(functools.partial(init_from_deck, cfg)),
    )
