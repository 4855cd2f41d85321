"""Pallas TPU kernel playing ENTIRE greedy-DQN games in VMEM.

The VERDICT-r3-named "fused act-rollout": where :mod:`game_kernel` plays
whole *random* games on-chip, this kernel plays whole *policy* games -- the
flagship noisy-DQN act (dealing, per-turn observations, the Q-network
forward, legal-masked greedy action choice, and the ascending-order turn
resolution) all inside one kernel invocation, emitting the full trajectory
(observations, actions, per-turn rewards) the DQN learn phase consumes.

Design (all layouts games-last, zero explicit transposes):

* Per grid block a (8, 128) tile of 1024 games lives in VMEM as int32
  registers (board cells, row lengths, sorted hands), exactly like the
  random game kernel.
* The per-turn Q forward runs the noisy net's *effective weights* (one
  [state, hidden] / [hidden, actions] pair per turn, precomputed XLA-side
  from key-reproducible threefry noise -- ``nets.noisy_effective_params``):
  ``lax.dot_general`` contracts the feature-major observation stack
  ``[S, 8, 128]`` against ``w1 [S, H]`` over dim 0, so the MXU performs the
  games->rows transposition implicitly and the hidden/adv activations come
  out ``[8, 128, H]`` with games still on (sublane, lane).
* Noisy nets act greedily (reference dqn.py:247-261): action = argmax over
  the player's hand of the advantage head.  The dueling aggregation
  ``Q = V + A - mean(A)`` shifts every action's value by a per-state
  constant, so the masked argmax over A equals the masked argmax over Q
  (up to float-rounding resolution of near-ties; this is a non-bit-exact
  fast path like the random-play kernel).  The legality mask comes from
  comparing a broadcast action-iota against the hand registers.
* RNG: the TPU hardware PRNG deals the decks (same stream layout as
  :func:`game_kernel._deal_in_kernel`, so ``make_deal_kernel`` with the same
  seed reproduces this kernel's exact deals for validation); the network
  noise stays key-reproducible because the effective weights are inputs.

Outputs (per call, G games):

* ``obs``   int8 ``[(T+1)*P*S, G]`` feature-major observation trajectory
  (slot ``t*P*S + p*S + f``); slot ``T`` holds the terminal observation the
  n-step harvest bootstraps from.  Observation entries are exact small
  integers (pinned by ``test_observations_are_small_integers``), so int8 is
  lossless.
* ``actions`` int32 ``[T*P, G]`` chosen card ids.
* ``rewards`` int32 ``[T*P, G]`` per-turn rewards (0 or -captured penalty;
  one capture max per seat per turn, so magnitudes stay < 128).

The wrapper reshapes these to the ``[T, G, P, ...]`` layout the vectorized
DQN cycle's transition harvest expects (one XLA relayout per generation
instead of per-turn work).

Reference behavior covered: dqn.py:196-230 (legal-masked greedy act),
nets.py:36-63/135-144 (factorized-noisy dueling forward), env.py:64-239
(rules, via the shared ``_apply_subplay`` registers).

Masking assumption (shared with the XLA act path's identical ``NEG_INF``
pattern, dqn.py:201-217): legal-action advantages must stay ``>> -1e9``.
If every legal advantage fell below ``NEG_INF`` the masked argmax would
pick an illegal card, and *in the kernel* that corrupts the sorted-hand
shift/legal-mask registers for the rest of the game in VMEM (the XLA path
merely plays the illegal card for one step).  With 47-scale integer inputs
and Adam-scale weights, |adv| stays within a few hundred in practice; the
structural-invariant test (every chosen action in the acting hand,
``tests/test_act_rollout.py``) would catch a violation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine.state import EnvConfig
from .game_kernel import _deal_in_kernel, _seed_hash
from .step_kernel import (
    LANES,
    SUBLANES,
    TILE,
    _apply_subplay,
    _row_aggregates,
)

NEG_INF = -1e9  # same masking constant as the XLA act path


def _play_block(cfg: EnvConfig, seed_ref, w1_ref, b1_ref, wa_ref, ba_ref,
                emit_obs, emit_action, emit_rewards):
    """Shared per-tile greedy-DQN game loop (deal, per-turn observations, Q
    forward on effective weights, legal-masked argmax, resolution).

    The emission strategy is injected at TRACE time: ``emit_obs(t, p,
    obs_regs)`` (``t == cfg.max_turns`` for the terminal observation),
    ``emit_action(t, p, card)``, ``emit_rewards(t, turn_rew)``.  Both the
    trajectory-emitting rollout kernel and the direct-insert kernel build
    on this single loop, so the act semantics cannot drift between them.
    """
    R, T, P, H, S = (cfg.num_rows, cfg.threshold, cfg.num_players,
                     cfg.hand_size, cfg.state_length)
    A = cfg.num_actions
    n_turns = cfg.max_turns

    pltpu.prng_seed(_seed_hash(seed_ref[0] + pl.program_id(0)))
    board, row_len, hands = _deal_in_kernel(cfg, (SUBLANES, LANES))
    aggr = _row_aggregates(cfg, board, row_len)
    row_pts, row_last, row_csum = aggr

    iota_a = lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES, A), 2)

    # Persistent per-seat legality masks over the action axis.  Built once
    # from the dealt hands, then maintained with ONE compare + and per played
    # card -- the naive per-turn rebuild (one compare+or per hand slot on
    # [8,128,A] every seat-turn) measured ~1.0 ms/generation at G=4096, ~5x
    # the entire rest of the act path (experiments/act_rollout_ablate.py).
    #
    # Layout note: the action domain [8,128,A] carries games on the SUBLANE
    # axis of its [128, A] slices, while the env registers carry games on
    # LANES.  Broadcasting a [8,128] env register into the action domain
    # forces a full cross-layout shuffle per op; instead ONE tiny identity
    # contraction per seat re-lays all H hand slots at once on the MXU
    # (``hand_sub [8,128,H]``), after which every mask compare is a cheap
    # in-layout lane-broadcast slice.
    eye_h = jnp.eye(H, dtype=jnp.float32)
    legal = []
    for p in range(P):
        hand_f32 = jnp.stack(
            [hands[p * H + i] for i in range(H)]
        ).astype(jnp.float32)                                      # [H, 8, 128]
        hand_sub = lax.dot_general(
            hand_f32, eye_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                                        # [8, 128, H]
        m = jnp.zeros((SUBLANES, LANES, A), jnp.bool_)
        for i in range(H):
            m = m | (iota_a == hand_sub[:, :, i : i + 1])
        legal.append(m)

    def game_features():
        """The per-game observation features shared by every seat.

        Order matches ``engine.env.observe`` (reference env.py:174-212):
        num_players | cards/row | highest/row | points/row | board R*T.
        """
        regs = [jnp.full((SUBLANES, LANES), P, jnp.int32)]
        if cfg.include_summaries:
            regs += [row_len[r] for r in range(R)]
            regs += [row_last[r] for r in range(R)]
            regs += [row_pts[r] for r in range(R)]
        regs += [board[i] for i in range(R * T)]
        return regs

    n_game = S - H  # shared game-feature count (37 by default)

    for t in range(n_turns):
        count = H - t
        game_regs = game_features()
        # The 37 shared features contract against their w1 rows ONCE per
        # turn; each seat adds only its 10-row hand contribution.
        game_f32 = jnp.stack(game_regs).astype(jnp.float32)        # [S-H, 8, 128]
        h_game = lax.dot_general(
            game_f32, w1_ref[t][H:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[t]                                              # [8, 128, Hd]

        packed = []
        for p in range(P):
            hand_regs = [hands[p * H + i] for i in range(H)]
            emit_obs(t, p, hand_regs + game_regs)

            # ---- Q forward on effective weights (games stay on (8,128)) ----
            hand_f32 = jnp.stack(hand_regs).astype(jnp.float32)    # [H, 8, 128]
            h = lax.dot_general(
                hand_f32, w1_ref[t][:H], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + h_game                                             # [8, 128, Hd]
            h = jnp.maximum(h, 0.0)
            adv = lax.dot_general(
                h, wa_ref[t], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + ba_ref[t]                                          # [8, 128, A]

            # ---- legal-masked greedy argmax off the persistent mask --------
            # Per-2D-slice: a masked 3D reduce_index (argmax of where over
            # [8,128,A]) hits a pathological Mosaic path costing ~0.6 ms per
            # generation; the same math sliced into 8 [128,A] wheres+argmaxes
            # costs ~0.2 (experiments/act_rollout_ablate.py, variant map in
            # RESULTS.md).  Values identical either way.
            cards = []
            for s in range(SUBLANES):
                masked_s = jnp.where(legal[p][s], adv[s], NEG_INF)
                cards.append(jnp.argmax(masked_s, axis=1))
            card = jnp.stack(cards).astype(jnp.int32)              # [8, 128]
            emit_action(t, p, card)
            legal[p] = legal[p] & (iota_a != card[:, :, None])

            # ---- remove the played card from the sorted hand ---------------
            # Slots at/after the card's position shift left (hand is sorted
            # ascending and the card is guaranteed present).
            for i in range(count - 1):
                hands[p * H + i] = jnp.where(
                    hands[p * H + i] >= card, hands[p * H + i + 1], hands[p * H + i]
                )
            hands[p * H + count - 1] = jnp.where(
                hands[p * H + count - 1] >= card,
                jnp.full_like(card, -1),
                hands[p * H + count - 1],
            )
            packed.append((card << 4) | p)

        # ---- ascending-order resolution (shared sub-play registers) --------
        for i in range(P):
            for j in range(P - 1 - i):
                packed[j], packed[j + 1] = (
                    jnp.minimum(packed[j], packed[j + 1]),
                    jnp.maximum(packed[j], packed[j + 1]),
                )
        turn_rew = [jnp.zeros((SUBLANES, LANES), jnp.int32) for _ in range(P)]
        for i in range(P):
            _apply_subplay(
                cfg, board, row_len, aggr, turn_rew,
                packed[i] >> 4, packed[i] & jnp.int32(15),
            )
        emit_rewards(t, turn_rew)

    # Terminal observation (post-game state): the harvest's n-step bootstrap
    # target for every tail transition (reference dqn.py:270-301).
    game_regs = game_features()
    for p in range(P):
        emit_obs(n_turns, p, [hands[p * H + i] for i in range(H)] + game_regs)


def _act_rollout_kernel(cfg: EnvConfig, feature_major: bool, seed_ref, w1_ref,
                        b1_ref, wa_ref, ba_ref, obs_out, act_out, rew_out):
    """Trajectory-emitting kernel: obs/actions/rewards into blocked outputs."""
    P, S = cfg.num_players, cfg.state_length
    n_turns = cfg.max_turns

    def emit_obs(t, p, obs_regs):
        if feature_major:
            # Row order (f, t, p): the output reshapes to [S, (T+1)*P, G]
            # with features leading, so the replay insert consumes it with
            # ZERO relayout (per_init_fm storage, slots on lanes).
            for f, reg in enumerate(obs_regs):
                obs_out[f * (n_turns + 1) * P + t * P + p] = reg.astype(jnp.int8)
        else:
            base = (t * P + p) * S
            for f, reg in enumerate(obs_regs):
                obs_out[base + f] = reg.astype(jnp.int8)

    def emit_action(t, p, card):
        act_out[t * P + p] = card

    def emit_rewards(t, turn_rew):
        for p in range(P):
            rew_out[t * P + p] = turn_rew[p]

    _play_block(cfg, seed_ref, w1_ref, b1_ref, wa_ref, ba_ref,
                emit_obs, emit_action, emit_rewards)


@functools.lru_cache(maxsize=None)
def make_act_rollout_kernel(cfg: EnvConfig, num_games: int,
                            hidden: int, interpret: bool = False,
                            feature_major: bool = False):
    """Compile the fused greedy-DQN rollout.

    Returns ``play(seed, w1 [T,S,hidden], b1 [T,hidden], wa [T,hidden,A],
    ba [T,A]) -> (obs int8 [T+1, G, P, S], actions int32 [T, G, P],
    rewards int32 [T, G, P])`` with ``T = cfg.max_turns``; block ``i`` of a
    call uses hardware-PRNG stream ``seed + i`` (same convention as the
    random game kernel -- space consecutive seeds by ``num_games // TILE``).

    ``feature_major=True`` keeps every output in the kernel's native
    games-on-lanes layout -- ``(obs int8 [S, (T+1)*P, G], actions int32
    [T*P, G], rewards int32 [T*P, G])``, identical values, zero transposes
    -- for the feature-major replay path (``per_init_fm`` storage with
    transition columns ordered (t, p, g)).  Same hardware-PRNG deals and
    greedy act either way.
    """
    R, T, P, H, S = (cfg.num_rows, cfg.threshold, cfg.num_players,
                     cfg.hand_size, cfg.state_length)
    A = cfg.num_actions
    n_turns = cfg.max_turns
    G = num_games
    assert G % TILE == 0, f"num_games={G} must be a multiple of {TILE}"
    assert P < 16, P  # player id packs into the low 4 bits
    grid = (G // TILE,)

    kernel = functools.partial(_act_rollout_kernel, cfg, feature_major)
    blk = lambda rows, : pl.BlockSpec(
        (rows, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shaped = lambda rows, dtype: jax.ShapeDtypeStruct(
        (rows, G // LANES, LANES), dtype
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # seed [1]
            full((n_turns, S, hidden)),                   # w1
            full((n_turns, hidden)),                      # b1
            full((n_turns, hidden, A)),                   # wa
            full((n_turns, A)),                           # ba
        ],
        out_specs=(blk((n_turns + 1) * P * S), blk(n_turns * P), blk(n_turns * P)),
        out_shape=(
            shaped((n_turns + 1) * P * S, jnp.int8),
            shaped(n_turns * P, jnp.int32),
            shaped(n_turns * P, jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def play(seed, w1, b1, wa, ba):
        obs_t, act_t, rew_t = call(
            jnp.asarray(seed, jnp.int32).reshape(1),
            w1.astype(jnp.float32), b1.astype(jnp.float32),
            wa.astype(jnp.float32), ba.astype(jnp.float32),
        )
        if feature_major:
            # Native layout out: pure reshapes (the leading row axis already
            # factors as (S, (T+1)*P) / (T*P); games stay on lanes).
            return (
                obs_t.reshape(S, (n_turns + 1) * P, G),
                act_t.reshape(n_turns * P, G),
                rew_t.reshape(n_turns * P, G),
            )
        # feature-major [(T+1)*P*S, G] -> [T+1, G, P, S]; ditto actions/rewards.
        obs = obs_t.reshape(n_turns + 1, P, S, G).transpose(0, 3, 1, 2)
        actions = act_t.reshape(n_turns, P, G).transpose(0, 2, 1)
        rewards = rew_t.reshape(n_turns, P, G).transpose(0, 2, 1)
        return obs, actions, rewards

    return jax.jit(play)


# ------------------------------------------------- direct-insert variant

S_PAD = 48   # state rows padded to the int8 DMA row tile (8); row 47 is zero
SCAL_ROWS = 8  # f32 scalar plane rows: 0=reward, 1=action, 2=done, rest zero


def _act_insert_kernel(cfg: EnvConfig, gamma: float, n_steps: int,
                       reward_lag: bool, cap_blocks: int,
                       seed_ref, ptr_ref, w1_ref, b1_ref, wa_ref, ba_ref,
                       state_in, next_in, scal_in,
                       state_out, next_out, scal_out, rew_out,
                       state_stage, next_stage, scal_stage,
                       state_sem, next_sem, scal_sem):
    """Play the tile's games AND write its finished n-step transitions
    straight into the (aliased) replay storage planes.

    Replaces the XLA-side harvest + ring insert entirely (the flagship
    cycle's largest phase, experiments/roofline_cycle.py): transition
    columns land at their ring positions via per-tile async DMA, so the
    trajectory is never materialized in HBM and no wrap-branch copies run.

    Column order: (tile, t, p, g-in-tile) -- tile ``i`` owns the contiguous
    T*P-block region at block offset ``(ptr_blk + i*T*P) % cap_blocks``
    (the wrapper requires ``capacity %% (T*P*TILE) == 0``, so a region
    never straddles the ring end).  Transition semantics match
    ``to_transitions_fm`` for the flagship ``n_steps >= max_turns`` case:
    lagged rewards (play.py:29-72), discounted suffix sums, terminal
    bootstrap observation, done-tail flags (reference dqn.py:264-301).
    """
    del state_in, next_in, scal_in  # aliased storage; written via DMA only
    P, S = cfg.num_players, cfg.state_length
    T = cfg.max_turns
    TP = T * P
    base_blk = ptr_ref[0] // LANES // SUBLANES  # element ptr -> TILE blocks
    base_blk = (base_blk + pl.program_id(0) * TP) % cap_blocks

    actions: list = [None] * TP
    rewards: list = [None] * TP

    def emit_obs(t, p, obs_regs):
        if t < T:
            for f, reg in enumerate(obs_regs):
                state_stage[f, t * P + p] = reg.astype(jnp.int8)
        else:  # terminal observation -> the shared bootstrap target
            for f, reg in enumerate(obs_regs):
                next_stage[f, p] = reg.astype(jnp.int8)

    def emit_action(t, p, card):
        actions[t * P + p] = card

    def emit_rewards(t, turn_rew):
        for p in range(P):
            rewards[t * P + p] = turn_rew[p]
            rew_out[t * P + p] = turn_rew[p]

    _play_block(cfg, seed_ref, w1_ref, b1_ref, wa_ref, ba_ref,
                emit_obs, emit_action, emit_rewards)

    # Zero the pad rows once (storage invariants: pad rows stay 0).
    for f in range(S, S_PAD):
        zero8 = jnp.zeros((SUBLANES, LANES), jnp.int8)
        for tp in range(TP):
            state_stage[f, tp] = zero8
        for p in range(P):
            next_stage[f, p] = zero8

    # n-step returns (n >= T case): R[t] = sum_{j>=t} gamma^(j-t) r'_j with
    # the lagged stream r'_t = r_{t-1} (r'_0 = 0) when reward_lag, else
    # r'_t = r_t -- a reverse discounted suffix recursion per seat.
    tail_start = (T - n_steps + 1) if n_steps > 1 else (T - 1)
    for p in range(P):
        acc = jnp.zeros((SUBLANES, LANES), jnp.float32)
        for t in range(T - 1, -1, -1):
            if reward_lag:
                r = (rewards[(t - 1) * P + p].astype(jnp.float32)
                     if t > 0 else jnp.zeros((SUBLANES, LANES), jnp.float32))
            else:
                r = rewards[t * P + p].astype(jnp.float32)
            acc = r + gamma * acc
            tp = t * P + p
            scal_stage[0, tp] = acc
            scal_stage[1, tp] = actions[tp].astype(jnp.float32)
            scal_stage[2, tp] = jnp.full(
                (SUBLANES, LANES), 1.0 if t >= tail_start else 0.0, jnp.float32
            )
    zero32 = jnp.zeros((SUBLANES, LANES), jnp.float32)
    for f in range(3, SCAL_ROWS):
        for tp in range(TP):
            scal_stage[f, tp] = zero32

    # ---- DMA the tile's finished region into the ring storage -----------
    dst = state_out.at[:, pl.ds(base_blk, TP)]
    dma = pltpu.make_async_copy(state_stage, dst, state_sem)
    dma.start()

    sdma = pltpu.make_async_copy(
        scal_stage, scal_out.at[:, pl.ds(base_blk, TP)], scal_sem
    )
    sdma.start()

    # next_state: the SAME terminal [S_PAD, P] block broadcast over t.
    for t in range(T):
        ndma = pltpu.make_async_copy(
            next_stage, next_out.at[:, pl.ds(base_blk + t * P, P)], next_sem
        )
        ndma.start()
        ndma.wait()
    dma.wait()
    sdma.wait()


@functools.lru_cache(maxsize=None)
def make_act_insert_kernel(cfg: EnvConfig, num_games: int, hidden: int,
                           capacity: int, gamma: float, n_steps: int,
                           reward_lag: bool = True):
    """Compile the fused rollout-plus-insert: whole greedy games in VMEM,
    finished n-step transitions DMA'd straight into the replay planes.

    ``insert(seed, ptr, w1, b1, wa, ba, state, next, scal) -> (state',
    next', scal', rewards int32 [T*P, G])`` where the three storage planes
    are ALIASED in/out (donated by the caller's jit):

    * ``state``/``next``: int8 ``[S_PAD, capacity]`` (rows 0..S-1 =
      features, pad rows zero),
    * ``scal``: f32 ``[SCAL_ROWS, capacity]`` (rows: n-step reward, action,
      done; rest zero).

    Requires the flagship kernel-path constraints (noisy greedy act, one
    hidden layer, ``num_games % TILE == 0``) plus ``n_steps >=
    cfg.max_turns`` (every transition bootstraps from the terminal
    observation) and ``capacity % (max_turns * num_players * TILE) == 0``
    (per-tile regions never straddle the ring end).
    """
    T, P, S, A = cfg.max_turns, cfg.num_players, cfg.state_length, cfg.num_actions
    G = num_games
    TP = T * P
    if G % TILE:
        raise ValueError(f"num_games={G} must be a multiple of {TILE}")
    if n_steps < T:
        raise ValueError("direct-insert kernel requires n_steps >= max_turns")
    if capacity % (TP * TILE):
        raise ValueError(
            f"capacity={capacity} must be a multiple of T*P*TILE={TP * TILE}"
        )
    cap_blocks = capacity // TILE
    grid = (G // TILE,)

    kernel = functools.partial(
        _act_insert_kernel, cfg, gamma, n_steps, reward_lag, cap_blocks
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    blk = lambda rows: pl.BlockSpec(
        (rows, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    n_turns = T

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # seed [1]
            pl.BlockSpec(memory_space=pltpu.SMEM),        # ptr [1]
            full((n_turns, S, hidden)),                   # w1
            full((n_turns, hidden)),                      # b1
            full((n_turns, hidden, A)),                   # wa
            full((n_turns, A)),                           # ba
            pl.BlockSpec(memory_space=pltpu.ANY),         # state plane
            pl.BlockSpec(memory_space=pltpu.ANY),         # next plane
            pl.BlockSpec(memory_space=pltpu.ANY),         # scal plane
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            blk(TP),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S_PAD, cap_blocks, SUBLANES, LANES), jnp.int8),
            jax.ShapeDtypeStruct((S_PAD, cap_blocks, SUBLANES, LANES), jnp.int8),
            jax.ShapeDtypeStruct((SCAL_ROWS, cap_blocks, SUBLANES, LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((TP, G // LANES, LANES), jnp.int32),
        ),
        input_output_aliases={6: 0, 7: 1, 8: 2},
        scratch_shapes=[
            pltpu.VMEM((S_PAD, TP, SUBLANES, LANES), jnp.int8),
            pltpu.VMEM((S_PAD, P, SUBLANES, LANES), jnp.int8),
            pltpu.VMEM((SCAL_ROWS, TP, SUBLANES, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )

    def insert(seed, ptr, w1, b1, wa, ba, state, nxt, scal):
        """state/nxt [S_PAD, cap] int8; scal [SCAL_ROWS, cap] f32 (2-D
        logical planes; reshaped block-wise for the kernel, both free)."""
        to4 = lambda x, rows: x.reshape(rows, cap_blocks, SUBLANES, LANES)
        s4, n4, c4 = (to4(state, S_PAD), to4(nxt, S_PAD), to4(scal, SCAL_ROWS))
        s4, n4, c4, rew = call(
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(ptr, jnp.int32).reshape(1),
            w1.astype(jnp.float32), b1.astype(jnp.float32),
            wa.astype(jnp.float32), ba.astype(jnp.float32),
            s4, n4, c4,
        )
        back = lambda x, rows: x.reshape(rows, capacity)
        return (back(s4, S_PAD), back(n4, S_PAD), back(c4, SCAL_ROWS),
                rew.reshape(TP, G))

    return jax.jit(insert, donate_argnums=(6, 7, 8))

