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


def card_points_formula(card: jnp.ndarray) -> jnp.ndarray:
    """Card point values computed arithmetically (no table gather).

    TPU note: a 104-entry table lookup is a gather, which lowers to a slow
    path on TPU; the scoring rule (cards.py / reference env.py:224-239) is
    three modulos and selects on the VPU instead.  Negative ids (empty board
    slots) get 0 so callers can skip masking when they multiply by length
    masks anyway.
    """
    face = card + 1
    m10 = face % 10
    pts = jnp.where(
        face == 55, 7,
        jnp.where(face % 11 == 0, 5, jnp.where(m10 == 0, 3, jnp.where(m10 == 5, 2, 1))),
    )
    return jnp.where(card >= 0, pts, 0).astype(jnp.int32)


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
    # Membership bitmap by comparison instead of scatter: XLA lowers the
    # vmapped [G, P*H]-index scatter to a serialized per-index loop (~0.9 ms
    # per 4096-game deal on v5e, the single hottest op of the DQN cycle),
    # while the [P, H, C] compare + any is a pure VPU reduction.  Dealt
    # cards are unique, so the bitmap is bit-identical.
    hands = jnp.any(
        dealt.reshape(P, H)[:, :, None]
        == jnp.arange(C, dtype=jnp.int32)[None, None, :],
        axis=1,
    )
    hands_sorted = jnp.sort(dealt.reshape(P, H), axis=1)

    seeds = deck[C - 1 - jnp.arange(R)]
    # Seed column 0 by concatenation (a scatter-free construction).
    board = jnp.concatenate(
        [seeds[:, None], jnp.full((R, T - 1), -1, dtype=jnp.int32)], axis=1
    )

    return EnvState(
        board=board,
        row_len=jnp.ones((R,), dtype=jnp.int32),
        hands=hands,
        hands_sorted=hands_sorted,
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
    pts = card_points_formula(board)
    slot = lax.broadcasted_iota(jnp.int32, board.shape, 1)
    return jnp.sum(jnp.where(slot < row_len[:, None], pts, 0), axis=1)


# ------------------------------------------------------------------------ step


def _resolve(cfg: EnvConfig, board: jnp.ndarray, row_len: jnp.ndarray, card: jnp.ndarray):
    """Place one card on the board; return (board', row_len', penalty).

    Semantics (reference env.py:127-172): the card joins the row whose last
    card is the highest below it; if it undercuts all rows, the cheapest row
    (summed points incl. last, first-min tie-break) is captured.  A capture --
    by undercut or by reaching ``threshold`` cards -- costs the placing player
    the points of all cards that were in the row, and restarts the row with
    just the placed card.

    TPU notes: touches ONLY the tiny board tensors ([R, T]/[R] per game) with
    one-hot selects -- no scatters, no hand-sized arrays -- so the inherently
    sequential ascending-order resolution stays cheap; hand updates and score
    attribution are hoisted out of the sequential loop by :func:`step` (they
    are order-independent).
    """
    R, T = cfg.num_rows, cfg.threshold
    slot_iota = lax.broadcasted_iota(jnp.int32, (R, T), 1)
    row_iota = lax.broadcasted_iota(jnp.int32, (R, 1), 0)[:, 0]

    lasts = jnp.sum(jnp.where(slot_iota == (row_len - 1)[:, None], board, 0), axis=1)
    fits = lasts < card
    target = jnp.argmax(jnp.where(fits, lasts, -1))
    undercut = ~jnp.any(fits)
    points = row_points(cfg, board, row_len)
    cheapest = jnp.argmin(points)
    row = jnp.where(undercut, cheapest, target)

    is_row = row_iota == row                      # bool[R]
    old_len = jnp.sum(jnp.where(is_row, row_len, 0))
    old_points = jnp.sum(jnp.where(is_row, points, 0))
    captures = undercut | (old_len + 1 >= T)

    appended = jnp.where(slot_iota == old_len, card, board)
    restarted = jnp.where(slot_iota == 0, card, -1)
    new_rows = jnp.where(captures, restarted, appended)
    board = jnp.where(is_row[:, None], new_rows, board)
    row_len = jnp.where(is_row, jnp.where(captures, 1, old_len + 1), row_len)

    penalty = jnp.where(captures, old_points, 0)
    return board, row_len, penalty


def step(cfg: EnvConfig, state: EnvState, actions: jnp.ndarray) -> Tuple[EnvState, jnp.ndarray]:
    """One simultaneous turn: all players commit a card; resolve ascending.

    ``actions`` is ``int32[P]`` of card ids.  Returns the new state and the
    per-player reward for this turn (0 or minus captured points, accumulated
    across sub-plays exactly as reference env.py:120-136 does).  Legality is
    not checked on device; use :func:`legal_mask` / the host wrapper for that.

    The P sub-plays are unrolled (P is small and static) so XLA fuses the
    whole turn into straight-line code; only board state threads through the
    sequence.  The hand update commutes across sub-plays, so all P played
    cards clear from the hand masks in a single fused op per turn.
    """
    P = cfg.num_players
    actions = actions.astype(jnp.int32)
    order = jnp.argsort(actions)  # card ids are globally unique -> total order
    cards_ascending = jnp.sort(actions)

    board, row_len = state.board, state.row_len
    player_iota = lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    rewards = jnp.zeros((P,), jnp.int32)
    for i in range(P):  # static unroll
        board, row_len, penalty = _resolve(cfg, board, row_len, cards_ascending[i])
        rewards = rewards - jnp.where(player_iota == order[i], penalty, 0)

    card_iota = lax.broadcasted_iota(jnp.int32, state.hands.shape, 1)
    hands = state.hands & (card_iota != actions[:, None])

    # Incremental sorted-hand maintenance: drop each player's played card by
    # shifting everything at/after its slot left one, padding with -1.
    hs = state.hands_sorted
    H = cfg.hand_size
    slot_h = lax.broadcasted_iota(jnp.int32, hs.shape, 1)
    pos = jnp.argmax(hs == actions[:, None], axis=1)     # unique -> exact slot
    shifted = jnp.concatenate([hs[:, 1:], jnp.full((P, 1), -1, jnp.int32)], axis=1)
    hands_sorted = jnp.where(slot_h >= pos[:, None], shifted, hs)

    return EnvState(
        board=board,
        row_len=row_len,
        hands=hands,
        hands_sorted=hands_sorted,
        scores=state.scores - rewards,
        turn=state.turn + 1,
    ), rewards


# ---------------------------------------------------------------- observations


def sorted_hands(cfg: EnvConfig, hands: jnp.ndarray) -> jnp.ndarray:
    """Ascending card ids per player, -1 padded: ``int32[P, hand_size]``.

    Reproduces the reference's sorted-hand observation block (env.py:206-212).

    TPU note: card ids are already ordered along the card axis, so the sorted
    hand is a *rank-scatter*, not a sort -- each held card's slot is its
    prefix count among held cards (one cumsum + one scatter, O(C) on the VPU,
    vs O(C log C) for ``jnp.sort``).  Non-held lanes scatter into a dumped
    overflow slot.
    """
    H = cfg.hand_size
    ranks = jnp.cumsum(hands, axis=1, dtype=jnp.int32) - 1
    ids = lax.broadcasted_iota(jnp.int32, hands.shape, 1)
    slots = jnp.where(hands, ranks, -1)                      # [P, C]
    onehot = slots[:, :, None] == jnp.arange(H)[None, None, :]  # [P, C, H]
    gathered = jnp.sum(ids[:, :, None] * onehot, axis=1)     # [P, H]
    filled = jnp.any(onehot, axis=1)
    return jnp.where(filled, gathered, -1)


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
    hand_block = state.hands_sorted

    pieces = [jnp.full((1,), P, dtype=jnp.int32)]
    if cfg.include_summaries:
        # One-hot select, not take_along_axis: gathers lower to a slow path.
        slot = lax.broadcasted_iota(jnp.int32, state.board.shape, 1)
        highest = jnp.sum(
            jnp.where(slot == (state.row_len - 1)[:, None], state.board, 0), axis=1
        )
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
    """Compiled (deal, step, observe, init_from_deck) for a single game.

    Pinned to the host CPU device when one exists: this is the interactive
    path's engine (one tiny single-game call per decision), and on tunneled
    accelerator backends each default-device call would pay a full dispatch
    round trip.  Batched work (vmapped rollouts, search playouts) uses the
    functional core directly on the default device instead.
    """
    try:
        device = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        device = None

    def pin(fn):
        jitted = jax.jit(functools.partial(fn, cfg))
        if device is None:
            return jitted
        # Committing the inputs pins the computation (device= on jit is
        # deprecated); host numpy -> CPU device_put is a local copy.
        return lambda *args: jitted(*jax.device_put(args, device))

    return (pin(deal), pin(step), pin(observe), pin(init_from_deck))
