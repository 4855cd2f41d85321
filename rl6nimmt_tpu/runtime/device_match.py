"""Whole search-vs-search matches as ONE device program.

The host drivers (GameSession / BlockSession) cross the host-device boundary
at least once per turn even with device-root decisions.  For rosters made of
search/random agents — exactly the shape of strength evaluations and
head-to-head experiments — nothing in the game loop needs the host at all:
this module fuses deal → (decide per seat → step) x hand_size into a single
jitted program over G parallel matches, including each searcher's
determinization card memory (mcts.py:62-73) maintained on device.

One call = G complete matches.  Per-seat roster kinds:

* ``"random"`` — uniform legal card (DrunkHamster, random.py:5-13),
* ``"uniform"`` — MCS: determinized playouts, uniform playout policy,
* ``"policy"`` — PolicyMCS: policy root sampling + policy playouts,
* ``"puct"`` — Alpha0.5: PUCT root over policy playouts.

Search seats replicate the device-root decision exactly
(:mod:`..agents.device_search`), with the per-decision budget
``n_mc = min(mc_max, mc_per_card * n!)`` (mcts.py:105-106) computed from a
factorial table on device.  Intended for evaluation/head-to-head runs —
learning agents keep the host drivers (their replay buffers are host-side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..agents.device_search import _make_decide, factorial_table, playout_budget
from ..engine.env import deal, observe, step
from ..engine.state import EnvConfig
from ..nets import MLPSpec

_PLAYOUT_POLICY = {
    "random": None,
    "uniform": "uniform",
    "policy": "net",
    "puct": "net",
    # Decoupled Alpha0.5: the net drives the ROOT prior only; determinized
    # playouts stay uniform.  Separates the prior's root-exploration value
    # from its playout-policy bias (the round-1 diagnosis of why trained
    # priors lose strength -- see experiments/prior_decoupled_eval.py).
    "puct_uniform": "uniform",
}
_ROOT = {
    "uniform": "uniform",
    "policy": "policy",
    "puct": "puct",
    "puct_uniform": "puct",
}


@functools.lru_cache(maxsize=None)
def make_device_match_fn(
    cfg: EnvConfig,
    roster: tuple,
    spec: MLPSpec | None,
    num_games: int,
    mc_max: int = 100,
    mc_per_card: int = 10,
    batch: int = 8,
    c_puct: float = 2.0,
):
    """Compile ``(params_per_seat, key) -> scores f32[G, P]`` (rewards ≤ 0).

    ``roster`` is one kind per seat (len == cfg.num_players); ``params_per_seat``
    is a tuple with one params pytree per seat (None for random/uniform
    seats).  Returns the final accumulated reward per seat per game
    (negated penalties, the GameSession ``results`` convention).
    """
    assert len(roster) == cfg.num_players, (roster, cfg.num_players)
    P, C, H, G = cfg.num_players, cfg.num_cards, cfg.hand_size, num_games
    fact = factorial_table(H)

    deciders = {}
    for kind in set(roster) - {"random"}:
        needs_net = _ROOT[kind] in ("policy", "puct") or _PLAYOUT_POLICY[kind] == "net"
        deciders[kind] = _make_decide(
            cfg, _PLAYOUT_POLICY[kind], spec if needs_net else None,
            _ROOT[kind], mc_max, batch, c_puct,
        )

    def board_seen(state):
        # [G, C] mask of cards currently visible on the board.
        cards = state.board.reshape(G, -1)
        hit = cards[:, :, None] == jnp.arange(C)[None, None, :]
        return jnp.any(hit, axis=1)

    def match(params_per_seat, key):
        key, k_deal = jax.random.split(key)
        states = jax.vmap(lambda k: deal(cfg, k))(jax.random.split(k_deal, G))
        seen0 = board_seen(states)

        def turn(carry, t):
            state, seen, key = carry
            n = H - t
            n_mc = playout_budget(mc_max, mc_per_card, fact[n])
            seen = seen | board_seen(state)
            obs, masks = jax.vmap(lambda s: observe(cfg, s))(state)

            actions = []
            for p, kind in enumerate(roster):
                key, k_p = jax.random.split(key)
                if kind == "random":
                    logits = jnp.where(masks[:, p], 0.0, -jnp.inf)
                    act = jax.random.categorical(k_p, logits, axis=-1).astype(jnp.int32)
                else:
                    # Card memory: unseen cards, own hand excluded
                    # (mcts.py:62-73 semantics, cumulative `seen`).
                    avail = ~(seen | state.hands[:, p])
                    act, _ = jax.vmap(
                        deciders[kind],
                        in_axes=(None, 0, 0, 0, None, None, 0, 0, 0),
                    )(
                        params_per_seat[p],
                        state.board,
                        state.row_len,
                        state.hands_sorted[:, p],
                        n,
                        n_mc,
                        avail,
                        obs[:, p],
                        jax.random.split(k_p, G),
                    )
                actions.append(act)

            new_state, _ = jax.vmap(lambda s, a: step(cfg, s, a))(
                state, jnp.stack(actions, axis=1)
            )
            return (new_state, seen, key), None

        (state, _, _), _ = lax.scan(turn, (states, seen0, key), jnp.arange(H))
        return -state.scores.astype(jnp.float32)

    return jax.jit(match)
