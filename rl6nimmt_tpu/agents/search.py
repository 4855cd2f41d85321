"""Batched determinized playout engine for the Monte-Carlo search agents.

The reference plays each search playout as a fresh Python ``SechsNimmtEnv``
game, one at a time (mcts.py:91-154) -- the dominant compute of the whole
repo.  Here a playout batch is a single device program: K determinized
initial states (unknown opponent hands re-dealt from the card memory) are
stacked into a batched :class:`EnvState` and a ``lax.scan`` over the
remaining turns plays all K games in lockstep, with the per-move policy
(uniform for MCS, the action-in-input policy net for PolicyMCS/PUCT)
evaluated for all K x P players in one fused forward.

Player 0's first move is *forced* per playout (chosen host-side by the
variant's root strategy -- uniform / policy sample / PUCT), which is how the
sequential root logic of the reference decomposes from the embarrassingly
parallel playout bodies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..engine.env import observe, step
from ..engine.state import EnvConfig, EnvState
from ..nets import MLPSpec
from ..utils.tpu_ops import onehot_select
from .reinforce import action_in_input_logits

NEG_INF = -jnp.inf


def _uniform_actions(masks, key):
    """One uniform legal card per player: ``masks bool[P, C] -> int32[P]``."""
    logits = jnp.where(masks, 0.0, NEG_INF)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _policy_actions(spec: MLPSpec, params, cfg: EnvConfig, state: EnvState, obs, key):
    """Sample every player's move from the shared action-in-input policy net."""
    hands = state.hands_sorted  # [P, H], -1 padded
    logits = jax.vmap(lambda o, h: action_in_input_logits(spec, params, o, h))(obs, hands)
    idx = jax.random.categorical(key, logits, axis=-1)
    return onehot_select(hands, idx.astype(jnp.int32)).astype(jnp.int32)


def make_single_playout(cfg: EnvConfig, policy: str, spec: MLPSpec | None):
    """The un-vmapped playout body shared by :func:`make_playout_fn` and the
    fully-device decision programs (:mod:`device_search`).

    ``(params, state0, first_action, n_turns, key) -> f32`` — player 0's
    summed reward over ``n_turns`` turns from ``state0`` with the first own
    move forced (mcts.py:129-154).

    ``policy="mixed"`` serves the kind-traced tournament programs
    (:mod:`..runtime.device_tournament`): the body takes one extra traced
    bool ``use_net`` selecting per call between the uniform and the policy-net
    move rule.  Both candidates draw from the SAME subkey, so a mixed body
    with ``use_net`` fixed reproduces the corresponding pure body bit-for-bit.
    """

    def single(params, state0: EnvState, first_action, n_turns, key, use_net=None):
        # Traced-bound fori_loop instead of a fixed hand_size scan with tail
        # masking: a playout at decision depth t only has n = hand_size - t
        # turns left, and ``n_turns`` is SHARED across the playout/seat vmaps
        # (in_axes=None), so the while loop genuinely stops after n
        # iterations — ~1.8x less sequential env-step depth averaged over a
        # game's ten decision depths.  Bit-exact vs the masked scan: live
        # iterations (t < n_turns) split the identical subkey chain and
        # perform the identical update; the dropped dead iterations only
        # consumed keys whose results the mask discarded.
        def turn(t, carry):
            state, key, ret = carry
            key, sub = jax.random.split(key)
            obs, masks = observe(cfg, state)
            if policy == "uniform":
                actions = _uniform_actions(masks, sub)
            elif policy == "mixed":
                actions = jnp.where(
                    use_net,
                    _policy_actions(spec, params, cfg, state, obs, sub),
                    _uniform_actions(masks, sub),
                )
            else:
                assert policy == "net", policy
                actions = _policy_actions(spec, params, cfg, state, obs, sub)
            actions = actions.at[0].set(
                jnp.where(t == 0, first_action, actions[0]).astype(jnp.int32)
            )
            state, rewards = step(cfg, state, actions)
            ret = ret + rewards[0].astype(jnp.float32)
            return (state, key, ret)

        _, _, ret = lax.fori_loop(
            0,
            jnp.asarray(n_turns, jnp.int32),
            turn,
            (state0, key, jnp.zeros((), jnp.float32)),
        )
        return ret

    return single


@functools.lru_cache(maxsize=None)
def make_playout_fn(cfg: EnvConfig, policy: str, spec: MLPSpec | None):
    """Compile ``(params, states0, first_actions, n_turns, key) -> f32[K]``.

    ``states0`` is a K-batched :class:`EnvState`; ``first_actions[k]`` is
    forced as player 0's move on the first turn of playout ``k``; the result
    is player 0's summed reward over ``n_turns`` turns (mcts.py:129-154).

    ``n_turns`` is a *traced* scalar: the scan always runs ``hand_size``
    iterations and masks the tail, so one compiled program serves every
    remaining-hand size (vs. one slow tunnel compile per decision depth).
    """
    single = make_single_playout(cfg, policy, spec)
    batched = jax.vmap(single, in_axes=(None, 0, 0, None, 0))
    return jax.jit(batched)


def build_root_states_batch(
    cfg: EnvConfig,
    boards_rows: list,
    my_hands: list,
    opponent_hands: np.ndarray,
) -> EnvState:
    """Assemble root states for G games x K determinizations each.

    Cross-game generalization of :func:`build_root_state` for the block
    driver: ``boards_rows[g]`` / ``my_hands[g]`` describe game ``g``'s shared
    board and searcher hand, ``opponent_hands`` is ``int64[G, K, P-1, n]``.
    Returns a game-major ``[G*K]``-batched :class:`EnvState` of host numpy
    arrays (transferred on first jit use).
    """
    G, K, Pm1, n = opponent_hands.shape
    R, T, P, C, H = cfg.num_rows, cfg.threshold, cfg.num_players, cfg.num_cards, cfg.hand_size
    assert Pm1 == P - 1 and len(boards_rows) == G and len(my_hands) == G

    board = np.full((G, R, T), -1, dtype=np.int32)
    row_len = np.zeros((G, R), dtype=np.int32)
    hands = np.zeros((G, K, P, C), dtype=bool)
    hands_sorted = np.full((G, K, P, H), -1, dtype=np.int32)
    for g in range(G):
        for r, cards in enumerate(boards_rows[g]):
            board[g, r, : len(cards)] = cards
            row_len[g, r] = len(cards)
        hands[g, :, 0, list(my_hands[g])] = True
        hands_sorted[g, :, 0, : len(my_hands[g])] = sorted(my_hands[g])

    g_idx = np.repeat(np.arange(G), K * Pm1 * n)
    k_idx = np.tile(np.repeat(np.arange(K), Pm1 * n), G)
    p_idx = np.tile(np.repeat(np.arange(1, P), n), G * K)
    hands[g_idx, k_idx, p_idx, opponent_hands.reshape(-1)] = True
    hands_sorted[:, :, 1:, :n] = np.sort(opponent_hands, axis=3)

    B = G * K
    return EnvState(
        board=np.repeat(board, K, axis=0),
        row_len=np.repeat(row_len, K, axis=0),
        hands=hands.reshape(B, P, C),
        hands_sorted=hands_sorted.reshape(B, P, H),
        scores=np.zeros((B, P), np.int32),
        turn=np.zeros((B,), np.int32),
    )


def build_root_state(
    cfg: EnvConfig,
    board_rows: list,
    my_hand: list,
    opponent_hands: np.ndarray,
) -> EnvState:
    """Assemble a K-batched mid-game EnvState for one determinization batch.

    ``opponent_hands`` is ``int64[K, P-1, n]`` of card ids per playout; the
    board and player-0 hand are shared across the batch.  (Single-game
    convenience over :func:`build_root_states_batch`.)
    """
    return build_root_states_batch(cfg, [board_rows], [my_hand], opponent_hands[None])
