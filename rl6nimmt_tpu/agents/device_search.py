"""Fully device-resident search decisions: one XLA program per decision.

The host search path (:mod:`mcs`) keeps root logic — determinization draws,
PUCT selection, outcome bookkeeping — on the host and dispatches one device
program per playout *round*, so a PUCT decision with ``mc_max=400, batch=8``
costs ~50 round trips.  This module compiles the **entire decision** into a
single program: a ``lax.fori_loop`` over playout rounds where every round

1. picks the K forced first moves on device (uniform / policy sample / PUCT
   over the accumulated outcome statistics, replicating mcts.py:276-323),
2. re-deals the unseen cards to opponents (uniform determinization by
   key-sort of the availability mask, mcts.py:116-127),
3. plays the K determinized games in lockstep through the shared playout
   body (:func:`search.make_single_playout`), and
4. folds the returns into per-action sums/counts and the flat return buffer
   that feeds PUCT's min/max/median normalization (mcts.py:304-315).

The final choice is the host rule — argmax mean outcome, never-rolled-out
actions excluded (mcts.py:156-172).  ``vmap`` over the game axis turns this
into ONE device call per (agent, turn) for a whole block of tournament
games.

Shapes are decision-depth agnostic: the hand arrives ``-1``-padded to
``hand_size`` and both the remaining-hand size ``n`` and the playout budget
``n_mc`` are *traced* scalars (the round loop is a traced-bound
``fori_loop``), so ONE compiled program serves all ten decision depths of a
game — compile count is one per (players, root kind, batch, mc_max ceiling),
which matters when every compile crosses a remote-device tunnel.

Semantics match the host path's documented deviation set (PARITY.md): same
round structure, same cold-start constants, same all-equal-q fallback; only
the PRNG stream differs (JAX keys here vs host numpy there), so strength is
equivalent while trajectories are not bit-identical to the host path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from ..engine.state import EnvConfig, EnvState
from ..nets import MLPSpec
from .reinforce import action_in_input_logits
from .search import make_single_playout

NEG_INF = -jnp.inf


def factorial_table(hand_size: int):
    """int32-saturated factorial table (13! would overflow at build time)."""
    cap = 2**31 - 1
    return jnp.asarray(
        [min(math.factorial(i), cap) for i in range(hand_size + 1)], jnp.int32
    )


def playout_budget(mc_max, mc_per, fact_n):
    """``min(mc_max, mc_per * n!)`` (mcts.py:105-106) without int32 overflow.

    The product is computed only when it provably fits: whenever
    ``fact_n > mc_max // mc_per`` the true product already exceeds ``mc_max``,
    so the clamp resolves without multiplying.
    """
    mc_max = jnp.asarray(mc_max, jnp.int32)
    mc_per = jnp.asarray(mc_per, jnp.int32)
    capped = (mc_per > 0) & (fact_n > mc_max // jnp.maximum(mc_per, 1))
    return jnp.minimum(mc_max, jnp.where(capped, mc_max, mc_per * fact_n))


def build_root_state(cfg: EnvConfig, board, row_len, my_hand, opp):
    """Mid-game :class:`EnvState` for one determinization (searcher = seat 0).

    ``-1`` pads scatter out of bounds and drop; sorted views keep -1 tails.
    Shared by the kind-static and kind-traced decision programs.
    """
    P, C = cfg.num_players, cfg.num_cards
    hands = jnp.zeros((P, C), bool)
    hands = hands.at[0, jnp.where(my_hand >= 0, my_hand, C)].set(True, mode="drop")
    hands = hands.at[
        jnp.arange(1, P)[:, None], jnp.where(opp >= 0, opp, C)
    ].set(True, mode="drop")
    return EnvState(
        board=board,
        row_len=row_len,
        hands=hands,
        hands_sorted=jnp.concatenate([my_hand[None], opp], axis=0),
        scores=jnp.zeros((P,), jnp.int32),
        turn=jnp.zeros((), jnp.int32),
    )


def _masked_median(rets_buf, count):
    """np.median over ``rets_buf[:count]`` with ``count`` traced.

    Invalid slots sort to +inf; even counts average the two middles
    (matching ``np.median`` in the host path's ``_normalize_q``).
    """
    valid = jnp.arange(rets_buf.shape[0]) < count
    ordered = jnp.sort(jnp.where(valid, rets_buf, jnp.inf))
    lo = ordered[jnp.maximum((count - 1) // 2, 0)]
    hi = ordered[jnp.maximum(count // 2, 0)]
    return 0.5 * (lo + hi)


def _normalized_q(act_sum, act_cnt, rets_buf, completed):
    """Min-max normalized per-action q from completed outcomes.

    Replicates ``PUCTAgent._compute_pucts``/``_normalize_q`` (mcts.py:276-315
    semantics incl. the <10-outcomes cold-start constants and the PARITY.md
    all-equal fallback q=0.5).
    """
    valid = jnp.arange(rets_buf.shape[0]) < completed
    cold = completed < 10
    max_r = jnp.where(cold, 0.0, jnp.max(jnp.where(valid, rets_buf, -jnp.inf)))
    min_r = jnp.where(cold, -10.0, jnp.min(jnp.where(valid, rets_buf, jnp.inf)))
    mid_r = jnp.where(cold, -5.0, _masked_median(rets_buf, completed))
    q = jnp.where(act_cnt > 0, act_sum / jnp.maximum(act_cnt, 1), mid_r)
    flat = max_r == min_r
    q = jnp.where(
        flat, 0.5, jnp.clip((q - min_r) / jnp.where(flat, 1.0, max_r - min_r), 0.0, 1.0)
    )
    return q


def puct_select(q, probs, act_cnt, valid, active, c_puct):
    """K sequential PUCT picks with pending visit counts (one round).

    Replicates ``PUCTAgent._choose_first_moves`` (mcts.py:276-302): ``q`` is
    fixed for the round (completed outcomes only), the visit counts grow by
    one per pick.  ``valid`` masks the -1 hand pads; ``active[i]=False``
    slots still pick (their playouts are masked out later) but do not bump
    the pending counts.
    """
    K, n = active.shape[0], q.shape[0]

    def body(i, carry):
        counts, firsts = carry
        n_total = jnp.sum(counts)
        puct = q + c_puct * probs * jnp.sqrt(n_total + 1e-9) / (1.0 + counts)
        pick = jnp.argmax(jnp.where(valid, puct, NEG_INF)).astype(jnp.int32)
        counts = counts + jnp.where(
            active[i], jax.nn.one_hot(pick, n, dtype=counts.dtype), 0.0
        )
        return counts, firsts.at[i].set(pick)

    _, firsts = lax.fori_loop(0, K, body, (act_cnt, jnp.zeros((K,), jnp.int32)))
    return firsts


def deal_opponents(avail, key, num_opponents: int, n, slots: int):
    """Uniform determinization: sorted opponent hands of ``n`` unseen cards.

    Random order of the available cards by key-sort of the availability mask,
    first ``num_opponents * n`` fill the opponents (mcts.py:116-127).  ``n``
    may be traced; hands come back ``[num_opponents, slots]`` ascending with
    ``-1`` pads past ``n`` (the engine's hands_sorted convention).
    """
    C = avail.shape[0]
    u = jnp.where(avail, jax.random.uniform(key, (C,)), jnp.inf)
    order = jnp.argsort(u).astype(jnp.int32)
    lin = jnp.arange(num_opponents)[:, None] * n + jnp.arange(slots)[None, :]
    picked = order[jnp.clip(lin, 0, C - 1)]
    valid = jnp.arange(slots)[None, :] < n
    hands = jnp.sort(jnp.where(valid, picked, C + 1), axis=1)
    return jnp.where(hands > C, -1, hands)


@functools.lru_cache(maxsize=None)
def _make_decide(
    cfg: EnvConfig,
    playout_policy: str,
    spec: MLPSpec | None,
    root: str,
    max_n_mc: int,
    batch: int,
    c_puct: float,
):
    """Build the raw (unjitted) decision program.

    Returns ``decide(params, board, row_len, my_hand, n, n_mc, avail, obs,
    key) -> (action, log_prob)`` where

    * ``board int32[R, T]`` / ``row_len int32[R]`` — the current public board,
    * ``my_hand int32[hand_size]`` — the searcher's legal cards, ascending,
      ``-1``-padded past ``n``,
    * ``n`` / ``n_mc`` — traced scalars: remaining-hand size and playout
      budget (``min(mc_max, mc_per_card * n!)``, computed on host),
    * ``avail bool[C]`` — the card memory (unseen cards, mcts.py:62-73),
    * ``obs f32[S]`` — the searcher's current observation (root prior input),
    * ``root`` in {"uniform", "policy", "puct"} — MCS / PolicyMCS / Alpha0.5.

    ``max_n_mc`` (the mc_max ceiling) and ``batch`` are static: they size the
    outcome buffer and the per-round playout batch.
    """
    assert root in ("uniform", "policy", "puct"), root
    P, C, H = cfg.num_players, cfg.num_cards, cfg.hand_size
    K = min(batch, max_n_mc)
    max_rounds = math.ceil(max_n_mc / K)
    single = make_single_playout(cfg, playout_policy, spec)

    def choose_firsts(valid, logp, probs, q, act_cnt, active, key):
        if root == "uniform":
            logits = jnp.broadcast_to(jnp.where(valid, 0.0, NEG_INF), (K, H))
            return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
        if root == "policy":
            # logp is already -inf on pad slots.
            return jax.random.categorical(
                key, jnp.broadcast_to(logp, (K, H)), axis=-1
            ).astype(jnp.int32)
        return puct_select(q, probs, act_cnt, valid, active, c_puct)

    def decide(params, board, row_len, my_hand, n, n_mc, avail, obs, key):
        my_hand = my_hand.astype(jnp.int32)
        board = board.astype(jnp.int32)
        row_len = row_len.astype(jnp.int32)
        valid = my_hand >= 0
        if root == "uniform":
            logp = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
            probs = jnp.where(valid, 1.0 / n, 0.0).astype(jnp.float32)
        else:
            logp = jax.nn.log_softmax(
                action_in_input_logits(spec, params, obs, my_hand)
            )
            probs = jnp.exp(logp)

        rets_buf0 = jnp.zeros((max_rounds * K,), jnp.float32)
        act_sum0 = jnp.zeros((H,), jnp.float32)
        act_cnt0 = jnp.zeros((H,), jnp.float32)
        n_turns = jnp.asarray(n, jnp.int32)
        n_rounds = (n_mc + K - 1) // K

        def round_body(r, carry):
            rets_buf, act_sum, act_cnt, key = carry
            key, k_first, k_deal, k_play = jax.random.split(key, 4)
            completed = jnp.minimum(r * K, n_mc)
            active = (r * K + jnp.arange(K)) < n_mc
            q = _normalized_q(act_sum, act_cnt, rets_buf, completed)
            firsts = choose_firsts(valid, logp, probs, q, act_cnt, active, k_first)

            deal_keys = jax.random.split(k_deal, K)
            opp = jax.vmap(lambda k: deal_opponents(avail, k, P - 1, n, H))(deal_keys)
            states0 = jax.vmap(
                lambda o: build_root_state(cfg, board, row_len, my_hand, o)
            )(opp)
            play_keys = jax.random.split(k_play, K)
            rets = jax.vmap(single, in_axes=(None, 0, 0, None, 0))(
                params, states0, my_hand[firsts], n_turns, play_keys
            )

            # Masked scatter append (inactive slots drop out of bounds).
            idx = r * K + jnp.arange(K)
            rets_buf = rets_buf.at[jnp.where(active, idx, rets_buf.shape[0])].set(
                rets, mode="drop"
            )
            hit = (firsts[:, None] == jnp.arange(H)[None, :]) & active[:, None]
            act_sum = act_sum + jnp.sum(jnp.where(hit, rets[:, None], 0.0), axis=0)
            act_cnt = act_cnt + jnp.sum(hit, axis=0).astype(jnp.float32)
            return rets_buf, act_sum, act_cnt, key

        rets_buf, act_sum, act_cnt, _ = lax.fori_loop(
            0, n_rounds, round_body, (rets_buf0, act_sum0, act_cnt0, key)
        )

        # argmax mean outcome; never-rolled-out actions excluded
        # (mcts.py:156-172; first-max tie-break like np.argmax).
        mean = jnp.where(act_cnt > 0, act_sum / jnp.maximum(act_cnt, 1), NEG_INF)
        pick = jnp.argmax(mean).astype(jnp.int32)
        return my_hand[pick], logp[pick]

    return decide


KIND_RANDOM, KIND_UNIFORM, KIND_POLICY, KIND_PUCT = 0, 1, 2, 3
# Decoupled Alpha0.5 (net ROOT prior, uniform playouts -- agents.mcs
# .PUCTUniformAgent).  Ordered after the net-prior kinds so `kind >=
# KIND_POLICY` still means "root prior from the net".
KIND_PUCT_UNIFORM = 4


@functools.lru_cache(maxsize=None)
def _make_decide_unified(
    cfg: EnvConfig,
    spec: MLPSpec,
    max_n_mc: int,
    batch: int,
    puct_free: bool = False,
    uniform_playouts: bool = False,
):
    """Kind-TRACED decision program: one compile covers every agent family.

    Same decision semantics as :func:`_make_decide`, but the root kind
    (``KIND_RANDOM`` DrunkHamster / ``KIND_UNIFORM`` MCS / ``KIND_POLICY``
    PolicyMCS / ``KIND_PUCT`` Alpha0.5 / ``KIND_PUCT_UNIFORM`` decoupled
    Alpha0.5 with net root + uniform playouts) arrives as a traced int32 and
    ``c_puct`` as a traced float, so heterogeneous tournament rosters share
    ONE compiled program per (players, spec, mc_max ceiling, batch) instead
    of one per roster combination — the compile count that matters when every
    program crosses a remote-device tunnel.

    Returns ``decide(params, kind, board, row_len, my_hand, n, n_mc, c_puct,
    avail, obs, key) -> (action, log_prob, pick)`` where ``pick`` is the
    chosen index into the padded hand (the ``step_record`` chosen idx).
    Parity with the kind-static programs is bit-exact for equal keys: the
    round key-split structure is identical, all root variants draw from the
    same subkeys, and the mixed playout body selects between the uniform and
    net move rules after drawing from the same subkey
    (tests/test_device_tournament.py).  Random seats pass ``n_mc = 0`` (the
    round loop never runs) and sample a uniform legal card from a post-loop
    key.

    ``puct_free=True`` builds the variant for lineups WITHOUT PUCT-family
    seats (kinds 0-2 only): the sequential-rounds structure exists solely
    because PUCT's root selection reads the accumulated outcome statistics
    between rounds (mcts.py:276-302), while uniform/policy roots draw their
    first moves iid — so a puct_free group runs ONE parallel round of
    ``batch >= n_mc`` playouts (the caller passes ``batch = mc_ceiling``),
    collapsing the decision's sequential env-step depth ~``n_rounds``-fold
    with an outcome distribution identical to the multi-round schedule
    (same iid determinizations + first-move draws, different key layout —
    within PARITY.md's documented device-path key-stream deviation).  The
    PUCT bookkeeping (running min/max/median normalization, sequential
    pending-count selection) is statically elided; feeding a PUCT seat to a
    puct_free program would silently sample its root like PolicyMCS, so the
    block driver gates the variant on the group's kinds
    (:meth:`..runtime.device_tournament.DeviceBlockSession.dispatch`).

    ``uniform_playouts=True`` is the orthogonal specialization for lineups
    without NET-playout seats (no ``KIND_POLICY``, no ``KIND_PUCT``): the
    playout body is built with the static uniform move rule, so the
    per-lane policy forward — the dominant FLOPs once playouts run wide —
    and the playout observations feeding it are dead code the compiler
    drops entirely.  Net ROOT priors (``KIND_PUCT_UNIFORM``) still work:
    the root forward is per-seat, not per-lane.  Same driver-side gating
    contract as ``puct_free``.
    """
    P, C, H = cfg.num_players, cfg.num_cards, cfg.hand_size
    K = min(batch, max_n_mc)
    max_rounds = math.ceil(max_n_mc / K)
    if uniform_playouts:
        _single_u = make_single_playout(cfg, "uniform", None)
        # Same signature as the mixed body; use_net is statically dead.
        single = lambda params, s0, first, n, k, use_net: _single_u(
            None, s0, first, n, k
        )
    else:
        single = make_single_playout(cfg, "mixed", spec)

    def decide(params, kind, board, row_len, my_hand, n, n_mc, c_puct, avail, obs, key):
        my_hand = my_hand.astype(jnp.int32)
        board = board.astype(jnp.int32)
        row_len = row_len.astype(jnp.int32)
        valid = my_hand >= 0
        net_root = kind >= KIND_POLICY  # policy/puct/puct_uniform: net prior
        net_playout = (kind == KIND_POLICY) | (kind == KIND_PUCT)
        logp_net = jax.nn.log_softmax(
            action_in_input_logits(spec, params, obs, my_hand)
        )
        logp_uni = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
        logp = jnp.where(net_root, logp_net, logp_uni)
        probs = jnp.where(
            net_root,
            jnp.exp(logp_net),
            jnp.where(valid, 1.0 / n, 0.0).astype(jnp.float32),
        )

        rets_buf0 = jnp.zeros((max_rounds * K,), jnp.float32)
        act_sum0 = jnp.zeros((H,), jnp.float32)
        act_cnt0 = jnp.zeros((H,), jnp.float32)
        n_turns = jnp.asarray(n, jnp.int32)
        n_rounds = (n_mc + K - 1) // K

        def round_body(r, carry):
            rets_buf, act_sum, act_cnt, key = carry
            key, k_first, k_deal, k_play = jax.random.split(key, 4)
            active = (r * K + jnp.arange(K)) < n_mc
            # Same k_first feeds both root samplers; only one is kept.
            samp = jax.random.categorical(
                k_first,
                jnp.broadcast_to(jnp.where(kind == KIND_POLICY, logp, logp_uni), (K, H)),
                axis=-1,
            ).astype(jnp.int32)
            if puct_free:
                firsts = samp
            else:
                completed = jnp.minimum(r * K, n_mc)
                q = _normalized_q(act_sum, act_cnt, rets_buf, completed)
                pucts = puct_select(q, probs, act_cnt, valid, active, c_puct)
                firsts = jnp.where(
                    (kind == KIND_PUCT) | (kind == KIND_PUCT_UNIFORM), pucts, samp
                )

            deal_keys = jax.random.split(k_deal, K)
            opp = jax.vmap(lambda k: deal_opponents(avail, k, P - 1, n, H))(deal_keys)
            states0 = jax.vmap(
                lambda o: build_root_state(cfg, board, row_len, my_hand, o)
            )(opp)
            play_keys = jax.random.split(k_play, K)
            rets = jax.vmap(single, in_axes=(None, 0, 0, None, 0, None))(
                params, states0, my_hand[firsts], n_turns, play_keys, net_playout
            )

            idx = r * K + jnp.arange(K)
            rets_buf = rets_buf.at[jnp.where(active, idx, rets_buf.shape[0])].set(
                rets, mode="drop"
            )
            hit = (firsts[:, None] == jnp.arange(H)[None, :]) & active[:, None]
            act_sum = act_sum + jnp.sum(jnp.where(hit, rets[:, None], 0.0), axis=0)
            act_cnt = act_cnt + jnp.sum(hit, axis=0).astype(jnp.float32)
            return rets_buf, act_sum, act_cnt, key

        rets_buf, act_sum, act_cnt, key = lax.fori_loop(
            0, n_rounds, round_body, (rets_buf0, act_sum0, act_cnt0, key)
        )

        mean = jnp.where(act_cnt > 0, act_sum / jnp.maximum(act_cnt, 1), NEG_INF)
        pick_search = jnp.argmax(mean).astype(jnp.int32)
        # Random seats: uniform legal card from a post-loop key (the key
        # stream up to here is untouched, preserving kind>=1 parity).
        pick_random = jax.random.categorical(
            jax.random.fold_in(key, 0), logp_uni
        ).astype(jnp.int32)
        pick = jnp.where(kind == KIND_RANDOM, pick_random, pick_search)
        return my_hand[pick], logp[pick], pick

    return decide


@functools.lru_cache(maxsize=None)
def make_unified_decision_fn(*key):
    """Jitted single-seat unified decision (:func:`_make_decide_unified`)."""
    return jax.jit(_make_decide_unified(*key))


@functools.lru_cache(maxsize=None)
def make_device_decision_fn(*key):
    """Jitted single-game decision (see :func:`_make_decide` for the args)."""
    return jax.jit(_make_decide(*key))


@functools.lru_cache(maxsize=None)
def make_device_decision_fn_many(*key):
    """Game-batched variant: per-game arguments gain a leading games axis and
    ONE call decides a whole block of games (params, n, n_mc stay shared —
    the block driver groups games by player count and hand size)."""
    return jax.jit(
        jax.vmap(_make_decide(*key), in_axes=(None, 0, 0, 0, None, None, 0, 0, 0))
    )
