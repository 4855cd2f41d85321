"""Human-vs-device game as ONE jitted program with an io_callback seat.

SURVEY.md §5 maps the reference's CLI play onto the TPU-native design as
"host-callback only for Human/CLI play": the game loop — deal, device-search
decisions for every AI seat, resolution, all ten turns — compiles into a
single program, and ONLY the human's card choice crosses to the host, via
``jax.experimental.io_callback`` (ordered; one host round trip per turn).

The prompt/retry semantics replicate the reference ``Human`` agent
(human.py:7-33): 1-indexed card faces, re-prompt until a held card is named;
the board is rendered from the observation the program hands the callback
(same grid the engine's ``observe`` lays out, env.py:174-212).

This is the host-callback twin of :class:`~rl6nimmt_tpu.runtime.session
.GameSession`-with-``Human`` (which remains the reference-protocol path);
use it when the AI seats should stay on device for the whole game.
"""

from __future__ import annotations

import functools
import logging
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..agents.device_search import (
    KIND_RANDOM,
    _make_decide_unified,
    factorial_table,
    playout_budget,
)
from ..agents.human import prompt_for_card
from ..engine.cards import format_card
from ..engine.env import deal, observe, step
from ..engine.state import EnvConfig
from ..nets import MLPSpec

logger = logging.getLogger(__name__)


def _prompt_human(obs, hand, name: str = "Human", num_rows: int = 4, threshold: int = 6):
    """Board render from obs + the shared reference prompt loop (human.py)."""
    legal = [int(c) for c in np.asarray(hand) if c >= 0]
    _render_board(np.asarray(obs), num_rows, threshold)
    return np.int32(prompt_for_card(legal, name))


def _render_board(obs, num_rows: int, threshold: int):
    """Print the board grid from the tail of a 47-dim observation."""
    grid = obs[-num_rows * threshold :].reshape(num_rows, threshold).astype(int)
    print("Board:")
    for row in grid:
        cells = [format_card(c) if c >= 0 else "  _  " for c in row]
        print("  " + " ".join(cells))


@functools.lru_cache(maxsize=None)
def make_callback_human_game(
    cfg: EnvConfig,
    spec: MLPSpec,
    mc_max: int = 100,
    mc_per_card: int = 10,
    batch: int = 8,
    c_puct: float = 2.0,
    name: str = "Human",
):
    """Compile ``(params [P,...], kinds int32[P], key) -> scores f32[P]``.

    Seat 0 is the human (its ``kinds`` entry is ignored); seats 1.. use the
    kind-traced device decision (KIND_RANDOM/UNIFORM/POLICY/PUCT).  Every AI
    decision, the deal and the resolution stay on device; the human's choice
    is one ordered ``io_callback`` per turn.
    """
    from jax.experimental import io_callback

    P, C, H = cfg.num_players, cfg.num_cards, cfg.hand_size
    fact = factorial_table(H)
    decide = _make_decide_unified(cfg, spec, mc_max, batch)
    prompt = functools.partial(
        _prompt_human, name=name, num_rows=cfg.num_rows, threshold=cfg.threshold
    )

    def board_seen(state):
        cards = state.board.reshape(-1)
        return jnp.any(cards[:, None] == jnp.arange(C)[None, :], axis=0)

    def game(params, kinds, key):
        # Seat 0 is the human: its kind is forced to KIND_RANDOM so the
        # decide vmap never runs a (discarded) search for it.
        kinds = kinds.at[0].set(KIND_RANDOM)
        key, k_deal = jax.random.split(key)
        state = deal(cfg, k_deal)
        seen0 = board_seen(state)

        def turn(carry, t):
            state, seen, key = carry
            n = H - t
            seen = seen | board_seen(state)
            obs, _ = observe(cfg, state)
            human_card = io_callback(
                prompt,
                jax.ShapeDtypeStruct((), jnp.int32),
                obs[0],
                state.hands_sorted[0],
                ordered=True,
            )
            n_mc = playout_budget(mc_max, mc_per_card, fact[n])
            n_mc = jnp.where(kinds == KIND_RANDOM, 0, n_mc)
            avail = ~(seen[None, :] | state.hands)
            key, k_dec = jax.random.split(key)
            ai_actions, _, _ = jax.vmap(
                decide, in_axes=(0, 0, None, None, 0, None, 0, None, 0, 0, 0)
            )(
                params,
                kinds,
                state.board,
                state.row_len,
                state.hands_sorted,
                n,
                n_mc,
                c_puct,
                avail,
                obs,
                jax.random.split(k_dec, P),
            )
            actions = ai_actions.at[0].set(human_card)
            new_state, _ = step(cfg, state, actions)
            return (new_state, seen, key), None

        (state, _, _), _ = lax.scan(turn, (state, seen0, key), jnp.arange(H))
        return -state.scores.astype(jnp.float32)

    return jax.jit(game)


def play_callback_game(
    opponents: Sequence[str],
    params=None,
    mc_max: int = 100,
    seed: int = 0,
    name: str = "Human",
):
    """Play one human-vs-device game; returns final scores (seat 0 = human).

    ``opponents`` are kinds per AI seat: "random" / "uniform" (MCS) /
    "policy" / "puct" / "puct_uniform".  ``params`` is one prior-net pytree shared by all
    policy/puct seats (fresh-initialized when None).
    """
    from ..agents.device_search import (
        KIND_POLICY,
        KIND_PUCT,
        KIND_PUCT_UNIFORM,
        KIND_UNIFORM,
    )
    from ..nets import mlp_init
    from .device_tournament import _zero_params

    kind_of = {
        "random": KIND_RANDOM,
        "uniform": KIND_UNIFORM,
        "policy": KIND_POLICY,
        "puct": KIND_PUCT,
        "puct_uniform": KIND_PUCT_UNIFORM,
    }
    P = 1 + len(opponents)
    cfg = EnvConfig(num_players=P)
    spec = MLPSpec(input_size=cfg.state_length + 1, hidden_sizes=(100, 100), head_sizes=(1,))
    if params is None:
        params = mlp_init(jax.random.key(seed), spec)
    kinds = np.asarray([KIND_RANDOM] + [kind_of[o] for o in opponents], np.int32)
    zero = _zero_params(spec)
    stacked = jax.tree.map(
        lambda z, p: np.stack([z] + [np.asarray(p)] * (P - 1)), zero, params
    )
    game = make_callback_human_game(cfg, spec, mc_max=mc_max, name=name)
    scores = np.asarray(game(stacked, kinds, jax.random.key(seed + 1)))
    print("Final scores:", {name: float(scores[0]),
                            **{f"seat{i}": float(s) for i, s in enumerate(scores[1:], 1)}})
    return scores
