"""Device-block tournament driver: heterogeneous lineups as ONE program.

:mod:`device_match` fuses complete search-vs-search games into one jitted
program but compiles per roster tuple — fine for head-to-head evaluations,
ruinous for a tournament whose lineups are re-sampled every game
(reference tournament.py:166-177).  This module makes the agent family a
*traced* per-seat input (:func:`..agents.device_search._make_decide_unified`),
so ONE compiled program per player count serves every lineup drawn from the
random/MCS/PolicyMCS/PUCT families, and it additionally records the full
trajectory — per turn, per seat: observation, padded legal hand, chosen
index, reward — so the search learners' self-imitation updates
(mcts.py:191-261) replay on host exactly as :class:`..runtime.block
.BlockSession` replays them.

Learner seats run on device too: the DQN lattice (dqn.py:196-261 acting:
masked argmax, epsilon-greedy, noisy argmax), ACER (actor_critic.py:85-106
softmax over the legal [action|state] rows), both REINFORCE variants
(policy.py:15-201), and PUCTCustomed's value-argmax (mcts.py:325-451) are
single net forwards per decision, compiled into the same kind-traced
program as static "learner slots" (:class:`LearnerSlot`, one per distinct
(family, architecture) in the population).  Their *learning* — replay-buffer
updates, episode losses — replays from the captured trajectory in the exact
GameSession argument stream: host-side by default (like the search learners'
self-imitation), or fused into per-agent device programs with
``device_learning=True`` (:mod:`.device_learn` — same np.random/key
consumption order, same update math, buffers resident on device).

Protocol notes (the block deviations of PARITY.md #10/#11 extended):

* acting uses parameters frozen for the whole block (bounded staleness,
  as in block mode); for epsilon-greedy DQNs the frozen quantity includes
  ``self.eps`` (refreshed by the replayed ``learn`` calls at block end);
* ``learn`` receives the identical GameSession argument stream — reward lag,
  ``num_episode=0``, agent-info round trip with ``log_prob``/``step_record``
  /``log_probs``/``action_id`` — replayed per game in block order after the
  device call returns;
* the PRNG stream is JAX-key based (deals, determinizations, random seats,
  epsilon draws, noisy-net noise, policy sampling), so trajectories are not
  bit-identical to the host drivers; strength equivalence is the tested
  property (see RESULTS.md);
* only Human seats (stdin) and PUCT with temperature sampling have no device
  decision; :meth:`..tournament.Tournament.play_device_block` routes those
  games through the host :class:`BlockSession` instead.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..agents.device_search import (
    KIND_POLICY,
    KIND_PUCT,
    KIND_PUCT_UNIFORM,
    KIND_RANDOM,
    KIND_UNIFORM,
    _make_decide_unified,
    factorial_table,
    playout_budget,
)
from ..agents.acer import BatchedACERAgent
from ..agents.dqn import DQNAgent
from ..agents.mcs import (
    MCSAgent,
    PolicyMCSAgent,
    PUCTAgent,
    PUCTCustomedAgent,
    PUCTUniformAgent,
)
from ..agents.random_agent import DrunkHamster
from ..agents.reinforce import BatchedReinforceAgent, MaskedReinforceAgent
from ..engine.env import deal, observe, step
from ..engine.state import EnvConfig
from ..nets import MLPSpec, mlp_init

# Traced seat kinds 0-4 are the search families (device_search.KIND_*);
# learner seats get 8 + (index into the program's static LearnerSlot tuple).
KIND_LEARNER_BASE = 8


@dataclass(frozen=True)
class LearnerSlot:
    """One static (family, architecture) acting rule inside the program.

    ``family``:

    * ``"dqn"`` — masked argmax / epsilon-greedy / noisy argmax over Q
      (dqn.py:196-261; dueling and noisy structure are encoded in ``spec``),
    * ``"acer"`` — categorical over the legal [action|state] policy logits
      with the reference's log-epsilon clamp (actor_critic.py:85-106),
    * ``"rai"`` — action-in-input REINFORCE sampling (policy.py:137-172),
    * ``"rmask"`` — masked 104-logit REINFORCE sampling (policy.py:40-77),
    * ``"pv"`` — PUCTCustomed value-argmax over the (pi, V) head
      (mcts.py:376-392 via _nn_choice).
    """

    family: str
    spec: MLPSpec

    def sort_key(self):
        return (self.family, repr(self.spec))


def _make_learner_decide(cfg: EnvConfig, slots: Tuple[LearnerSlot, ...]):
    """Per-seat learner decision: ``(lparams, kind, my_hand, obs, eps, key)
    -> (pick, log_prob, log_probs_vec)``.

    Every slot's (tiny) forward runs unconditionally and the traced ``kind``
    selects the result — learner decisions are single MLP evaluations, so
    computing all of them costs less than a branchy select would.  Keys are
    ``fold_in`` splits of the seat key at indices 1-3, leaving the search
    kinds' stream (loop key + ``fold_in(key, 0)`` for random seats) intact.
    ``log_probs_vec`` is ACER's behavior-policy vector over the padded hand
    (zeros for other families).
    """
    from ..agents.acer import actor_critic_heads
    from ..agents.mcs import _policy_value
    from ..agents.reinforce import action_in_input_logits, masked_policy_logits
    from ..nets import dueling_apply, mlp_apply

    C, H = cfg.num_cards, cfg.hand_size

    def decide(lparams, kind, my_hand, obs, eps, key):
        valid = my_hand >= 0
        logp_uni = jnp.where(valid, 0.0, -jnp.inf)
        k_samp = jax.random.fold_in(key, 1)
        k_noise = jax.random.fold_in(key, 2)
        k_eps = jax.random.fold_in(key, 3)
        picks, logps, vecs = [], [], []
        zeros_vec = jnp.zeros((H,), jnp.float32)
        for s, slot in enumerate(slots):
            p = lparams[s]
            if slot.family == "dqn":
                qkey = k_noise if slot.spec.noisy else None
                if len(slot.spec.head_sizes) == 2:
                    q = dueling_apply(slot.spec, p, obs[None], qkey)[0]
                else:
                    (q,) = mlp_apply(slot.spec, p, obs[None], qkey)
                    q = q[0]
                # argmax over the legal subset == the host's -1e8 masking
                # (hand ascending, first-max tie-break both ways).
                q_hand = jnp.where(valid, q[jnp.clip(my_hand, 0, C - 1)], -jnp.inf)
                pick_greedy = jnp.argmax(q_hand).astype(jnp.int32)
                explore = jax.random.uniform(k_eps) <= eps
                pick_rand = jax.random.categorical(
                    jax.random.fold_in(k_eps, 1), logp_uni
                ).astype(jnp.int32)
                pick = jnp.where(explore, pick_rand, pick_greedy)
                logp, vec = jnp.zeros((), jnp.float32), zeros_vec
            elif slot.family == "acer":
                lp, _ = actor_critic_heads(slot.spec, p, obs, my_hand)
                pick = jax.random.categorical(
                    k_samp, jnp.where(valid, lp, -jnp.inf)
                ).astype(jnp.int32)
                logp, vec = lp[pick], lp
            elif slot.family == "rai":
                logits = action_in_input_logits(slot.spec, p, obs, my_hand)
                pick = jax.random.categorical(k_samp, logits).astype(jnp.int32)
                logp, vec = jax.nn.log_softmax(logits)[pick], zeros_vec
            elif slot.family == "rmask":
                mask = (
                    jnp.zeros((C,), bool)
                    .at[jnp.where(valid, my_hand, C)]
                    .set(True, mode="drop")
                )
                logits = masked_policy_logits(slot.spec, p, obs, mask)
                card = jax.random.categorical(k_samp, logits).astype(jnp.int32)
                pick = jnp.argmax(my_hand == card).astype(jnp.int32)
                logp, vec = jax.nn.log_softmax(logits)[card], zeros_vec
            elif slot.family == "pv":
                lp, values = _policy_value(slot.spec, p, obs, my_hand)
                pick = jnp.argmax(values).astype(jnp.int32)
                logp, vec = lp[pick], zeros_vec
            else:  # pragma: no cover - slots are built by seat_slot below
                raise ValueError(f"unknown learner family {slot.family!r}")
            picks.append(pick)
            logps.append(logp.astype(jnp.float32))
            vecs.append(vec)
        sel = jnp.clip(kind - KIND_LEARNER_BASE, 0, len(slots) - 1)
        return jnp.stack(picks)[sel], jnp.stack(logps)[sel], jnp.stack(vecs)[sel]

    return decide


@functools.lru_cache(maxsize=None)
def _make_decide_unified_ext(
    cfg: EnvConfig,
    spec: MLPSpec,
    max_n_mc: int,
    batch: int,
    slots: Tuple[LearnerSlot, ...],
    puct_free: bool = False,
    uniform_playouts: bool = False,
):
    """Kind-traced decision covering search kinds 0-3 AND learner slots.

    Wraps :func:`..agents.device_search._make_decide_unified` (whose key
    stream and semantics stay bit-identical for kinds 0-3 — learner seats
    pass ``n_mc = 0``, so the search loop never runs for them) and overlays
    the learner families' single-forward decisions.  Returns ``(action,
    log_prob, pick, log_probs_vec)``.
    """
    base = _make_decide_unified(cfg, spec, max_n_mc, batch, puct_free, uniform_playouts)
    learner = _make_learner_decide(cfg, slots) if slots else None
    H = cfg.hand_size

    def decide(params, lparams, kind, board, row_len, my_hand, n, n_mc, c_puct, eps, avail, obs, key):
        action, logp, pick = base(
            params, kind, board, row_len, my_hand, n, n_mc, c_puct, avail, obs, key
        )
        vec = jnp.zeros((H,), jnp.float32)
        if learner is not None:
            hand = my_hand.astype(jnp.int32)
            pick_l, logp_l, vec_l = learner(lparams, kind, hand, obs, eps, key)
            is_learner = kind >= KIND_LEARNER_BASE
            pick = jnp.where(is_learner, pick_l, pick)
            logp = jnp.where(is_learner, logp_l, logp)
            vec = jnp.where(is_learner, vec_l, vec)
            action = hand[pick]
        return action, logp, pick, vec

    return decide

@functools.lru_cache(maxsize=None)
def _zero_params(spec: MLPSpec):
    """Host-numpy zero param tree for random/uniform seats (cached: building
    it on a tunneled accelerator costs dispatch round trips per block)."""
    return jax.tree.map(
        lambda x: np.zeros_like(np.asarray(x)), mlp_init(jax.random.key(0), spec)
    )


# ----------------------------------------------------------------- compile


@functools.lru_cache(maxsize=None)
def make_device_block_fn(
    cfg: EnvConfig,
    spec: MLPSpec,
    num_games: int,
    mc_max: int,
    batch: int = 8,
    slots: Tuple[LearnerSlot, ...] = (),
    puct_free: bool = False,
    uniform_playouts: bool = False,
):
    """Compile G heterogeneous games + trajectory capture into one program.

    ``(params, lparams, kinds, mc_maxes, mc_pers, c_pucts, epses, key) ->
    (scores f32[G, P], traj, final_obs f32[G, P, S])`` where

    * ``params`` — per-(game, seat) stacked search-net params ``[G, P, ...]``
      (zeros for seats without a prior net),
    * ``lparams`` — tuple over ``slots`` of per-(game, seat) stacked learner
      params ``[G, P, ...]`` (zeros for seats not using that slot),
    * ``kinds int32[G, P]`` — KIND_* per seat (learner seats:
      ``KIND_LEARNER_BASE + slot index``),
    * ``mc_maxes / mc_pers int32[G, P]`` — per-seat budget parameters
      (``n_mc = min(mc_max, mc_per * n!)``, mcts.py:105-106),
    * ``c_pucts f32[G, P]`` — PUCT exploration constants,
    * ``epses f32[G, P]`` — epsilon-greedy exploration rates (DQN seats),
    * ``traj`` — per-turn stacks: ``obs f32[T, G, P, S]``, ``hands
      int32[T, G, P, H]`` (the padded legal hands before the turn),
      ``picks int32[T, G, P]`` (chosen index into the padded hand),
      ``logps f32[T, G, P]``, ``logp_vecs f32[T, G, P, H]`` (ACER's
      behavior log-prob vectors), ``rewards int32[T, G, P]``.

    ``mc_max`` (static) is the budget ceiling sizing the outcome buffers;
    per-seat traced budgets below it run fewer rounds (the round loop bound
    is traced).  Random and learner seats run zero rounds.
    """
    P, C, H, G = cfg.num_players, cfg.num_cards, cfg.hand_size, num_games
    fact = factorial_table(H)
    decide = _make_decide_unified_ext(
        cfg, spec, mc_max, batch, slots, puct_free, uniform_playouts
    )

    def board_seen(state):
        cards = state.board.reshape(G, -1)
        hit = cards[:, :, None] == jnp.arange(C)[None, None, :]
        return jnp.any(hit, axis=1)

    def match(params, lparams, kinds, mc_maxes, mc_pers, c_pucts, epses, key):
        key, k_deal = jax.random.split(key)
        states = jax.vmap(lambda k: deal(cfg, k))(jax.random.split(k_deal, G))
        seen0 = board_seen(states)

        inner = jax.vmap(
            decide, in_axes=(0, 0, 0, None, None, 0, None, 0, 0, 0, 0, 0, 0)
        )
        outer = jax.vmap(inner, in_axes=(0, 0, 0, 0, 0, 0, None, 0, 0, 0, 0, 0, 0))

        def turn(carry, t):
            state, seen, key = carry
            n = H - t
            seen = seen | board_seen(state)
            obs, _ = jax.vmap(lambda s: observe(cfg, s))(state)
            n_mc = playout_budget(mc_maxes, mc_pers, fact[n])
            playout_free = (kinds == KIND_RANDOM) | (kinds >= KIND_LEARNER_BASE)
            n_mc = jnp.where(playout_free, 0, n_mc)
            # Card memory: unseen cards, own hand excluded (mcts.py:62-73).
            avail = ~(seen[:, None, :] | state.hands)
            key, k_dec = jax.random.split(key)
            actions, logps, picks, logp_vecs = outer(
                params,
                lparams,
                kinds,
                state.board,
                state.row_len,
                state.hands_sorted,
                n,
                n_mc,
                c_pucts,
                epses,
                avail,
                obs,
                jax.random.split(k_dec, (G, P)),
            )
            new_state, rewards = jax.vmap(lambda s, a: step(cfg, s, a))(state, actions)
            ys = dict(
                obs=obs,
                hands=state.hands_sorted,
                picks=picks,
                logps=logps,
                logp_vecs=logp_vecs,
                rewards=rewards,
            )
            return (new_state, seen, key), ys

        (state, _, _), traj = lax.scan(turn, (states, seen0, key), jnp.arange(H))
        final_obs, _ = jax.vmap(lambda s: observe(cfg, s))(state)
        return -state.scores.astype(jnp.float32), traj, final_obs

    return jax.jit(match)


# -------------------------------------------------------------- eligibility


def seat_kind(agent) -> Optional[int]:
    """KIND_* for agents with a device *search* decision, None otherwise.

    (Learner families are device-eligible too, via :func:`seat_slot`; this
    search-only view is kept for the kind-static decision callers.)
    """
    if isinstance(agent, DrunkHamster):
        return KIND_RANDOM
    if isinstance(agent, PUCTCustomedAgent):
        return None  # playout-free (pi, V) decisions: a "pv" learner slot
    if isinstance(agent, PUCTAgent):
        if agent.temperature is not None and agent.temperature > 1e-12:
            return None  # NotImplementedError parity (mcts.py:318-323)
        if (agent.batch_playouts or 8) != 8:
            # PUCT root statistics refresh per round; a non-default batch
            # would silently change that cadence vs the host path (uniform/
            # policy roots are round-agnostic, so only PUCT is restricted).
            return None
        return KIND_PUCT_UNIFORM if isinstance(agent, PUCTUniformAgent) else KIND_PUCT
    if isinstance(agent, PolicyMCSAgent):
        return KIND_POLICY
    if isinstance(agent, MCSAgent):
        return KIND_UNIFORM
    return None


def seat_slot(agent):
    """Device decision for one seat.

    Returns ``("search", KIND_*)`` for the search families, ``("learner",
    LearnerSlot)`` for single-forward families (DQN lattice, ACER, REINFORCE
    variants, PUCTCustomed), or ``None`` when the seat has no device decision
    (Human stdin seats, PUCT with temperature sampling, non-ACER actor-critic
    bases whose ``learn`` raises).
    """
    if isinstance(agent, PUCTCustomedAgent):
        return "learner", LearnerSlot("pv", agent.spec)
    kind = seat_kind(agent)
    if kind is not None:
        return "search", kind
    if isinstance(agent, DQNAgent):
        return "learner", LearnerSlot("dqn", agent.spec)
    if isinstance(agent, BatchedACERAgent):
        if agent.max_num_actions != agent.env_config.hand_size:
            return None  # padded log_probs would not line up with the hand
        return "learner", LearnerSlot("acer", agent.spec)
    if isinstance(agent, MaskedReinforceAgent):
        return "learner", LearnerSlot("rmask", agent.spec)
    if isinstance(agent, BatchedReinforceAgent):
        return "learner", LearnerSlot("rai", agent.spec)
    return None


def _seat_dims(agent, role) -> tuple:
    """Env dimensions a seat assumes (for mixed-lineup consistency checks)."""
    if role == "search" and not isinstance(agent, DrunkHamster):
        return (
            agent.num_rows,
            agent.num_cards,
            agent.threshold,
            agent.include_summaries,
            agent.handsize,
        )
    ec = agent.env_config
    return (ec.num_rows, ec.num_cards, ec.threshold, ec.include_summaries, ec.hand_size)


def lineup_signature(agents) -> Optional[tuple]:
    """(EnvConfig, MLPSpec | None, frozenset[LearnerSlot]) if the lineup can
    run on device, else None."""
    roles = [seat_slot(a) for a in agents]
    if any(r is None for r in roles):
        return None
    dims, specs, slots = set(), set(), set()
    for agent, (role, what) in zip(agents, roles):
        if role == "search":
            if what != KIND_RANDOM:
                dims.add(_seat_dims(agent, role))
            if what in (KIND_POLICY, KIND_PUCT, KIND_PUCT_UNIFORM):
                specs.add(agent.spec)
        else:
            dims.add(_seat_dims(agent, role))
            slots.add(what)
    if len(dims) > 1 or len(specs) > 1:
        return None
    num_rows, num_cards, threshold, summaries, handsize = (
        dims.pop() if dims else (4, 104, 6, True, 10)
    )
    cfg = EnvConfig(
        num_players=len(agents),
        num_rows=num_rows,
        num_cards=num_cards,
        threshold=threshold,
        include_summaries=summaries,
        hand_size=handsize,
    )
    return cfg, (specs.pop() if specs else None), frozenset(slots)


def device_lineup_eligible(agents) -> bool:
    return lineup_signature(agents) is not None


def lineup_fastclass(agents) -> tuple:
    """(has_puct, has_net_playout) — the static fast-path class of a lineup.

    PUCT-free lineups compile the single-parallel-round program and
    net-playout-free lineups additionally drop the per-lane policy forward
    (:func:`..agents.device_search._make_decide_unified` ``puct_free`` /
    ``uniform_playouts``).  The tournament groups games by this class on top
    of (env-config, net-spec) so a block's PUCT-free games are not dragged
    through the sequential-rounds program by sharing a group with an
    Alpha0.5 seat."""
    has_puct = has_net = False
    for a in agents:
        k = seat_kind(a)
        if k in (KIND_PUCT, KIND_PUCT_UNIFORM):
            has_puct = True
        if k in (KIND_POLICY, KIND_PUCT):
            has_net = True
    return has_puct, has_net


# ------------------------------------------------------------------ session


class DeviceBlockSession:
    """Play G same-player-count games as one device program, then replay
    learning host-side (the device twin of :class:`..runtime.block
    .BlockSession` for eligible lineups)."""

    def __init__(
        self,
        lineups: Sequence[Sequence],
        batch: int = 32,
        bucket: Optional[int] = None,
        mesh=None,
        slots: Optional[Tuple[LearnerSlot, ...]] = None,
        device_learning: bool = False,
    ):
        assert lineups, "need at least one game"
        P = len(lineups[0])
        assert all(len(l) == P for l in lineups), "uniform player count required"
        self.lineups = [list(agents) for agents in lineups]
        # PUCT round-batch K: ceil(n_mc / K) sequential playout rounds per
        # decision with pending-count root selection within a round.  The
        # host agents' batch_playouts default is 8; the device driver default
        # is 32 because the round count is the dominant sequential depth of
        # PUCT-containing groups and K=32 is measured strength-neutral vs
        # K=8 (paired delta +0.015 +/- 0.201 mean-score points, n=8192,
        # experiments/puct_batch_ab.py) -- a documented device-path deviation
        # on top of the batched-rounds deviation itself (PARITY.md).
        self.batch = batch
        # Game-axis compile width: defaults to the pow2 ceiling of the group
        # size; callers that split one block into per-player-count groups pass
        # a FIXED bucket so every group (and every remainder block) reuses the
        # same compiled program — compiles, not padded device compute, are
        # the scarce resource over a remote-device tunnel.
        self.bucket = bucket
        # Optional jax.sharding.Mesh: the game axis (and every per-game input)
        # shards across its devices — the matches are embarrassingly parallel,
        # so GSPMD partitions the whole program with no collectives until the
        # host fetch.  Numerics are unchanged (per-game PRNG splits are
        # position-, not device-, derived; tested on the virtual CPU mesh).
        self.mesh = mesh
        sigs = {lineup_signature(agents) for agents in self.lineups}
        assert None not in sigs, "ineligible lineup (use BlockSession)"
        cfgs = {cfg for cfg, _, _ in sigs}
        specs = {spec for _, spec, _ in sigs if spec is not None}
        assert len(cfgs) == 1 and len(specs) <= 1, "mixed env dims / net specs"
        self.cfg = cfgs.pop()
        self.spec = specs.pop() if specs else MLPSpec(
            input_size=self.cfg.state_length + 1,
            hidden_sizes=(100, 100),
            head_sizes=(1,),
        )
        # Learner slots: callers (the tournament) pass the population-wide
        # set so every block reuses ONE compiled program; standalone use
        # derives them from the lineups.  Order is canonicalized for the
        # compile cache.
        needed = set().union(*(s for _, _, s in sigs))
        if slots is None:
            slots = tuple(sorted(needed, key=LearnerSlot.sort_key))
        else:
            slots = tuple(slots)
            assert needed <= set(slots), "lineup uses a learner slot not provided"
        self.slots = slots
        # device_learning=True moves learner *updates* on device too: the
        # learn replay below hands DQN/ACER/REINFORCE streams to the planners
        # in runtime.device_learn (same np.random/key consumption order, same
        # update math, one fused device program per agent per block) instead
        # of a host `learn` call per step.  Search self-imitation (and DQN
        # agents with a summary_writer) still replay host-side.
        self.device_learning = device_learning
        self.results: List[np.ndarray] = []
        # Wall-clock split of the last play() call: host param assembly,
        # device program (incl. the result fetch, which bounds execution on
        # tunneled backends), and the host-side learn replay.
        self.timings: dict = {}

    def play(self) -> List[np.ndarray]:
        """Assemble + run + replay one block (dispatch then finalize)."""
        self.dispatch()
        return self.finalize()

    def dispatch(self) -> "DeviceBlockSession":
        """Async phase: assemble the block inputs and LAUNCH the fused
        device program, parking the un-fetched device handles for
        :meth:`finalize`.  JAX dispatch is asynchronous, so several
        sessions' programs can queue on the device back to back while the
        host finalizes earlier ones -- ``Tournament.play_device_block``
        pipelines its signature groups this way (group k's host-side learn
        replay overlaps groups k+1..'s device execution).  Returns self.
        """
        import time as _time

        # Stale-read guard: if play() raises mid-block, timings must not
        # silently retain a previous call's stamps.
        self.timings = {}
        t0 = _time.perf_counter()
        G, P, H = len(self.lineups), self.cfg.num_players, self.cfg.hand_size
        B = self.bucket or max(1, 1 << (G - 1).bit_length())  # pow2 game bucket
        if self.mesh is not None:
            # Round up to a multiple of the mesh size (device_put needs the
            # sharded game axis evenly divisible; mesh sizes need not be pow2).
            B = max(B, self.mesh.size)
            B = -(-B // self.mesh.size) * self.mesh.size
        assert B >= G, (B, G)

        slots = self.slots
        slot_index = {slot: s for s, slot in enumerate(slots)}
        kinds = np.zeros((B, P), np.int32)
        mc_maxes = np.zeros((B, P), np.int32)
        mc_pers = np.zeros((B, P), np.int32)
        c_pucts = np.zeros((B, P), np.float32)
        epses = np.zeros((B, P), np.float32)
        # families[g][p]: "random" | "search" | a LearnerSlot family string,
        # driving the learn-replay info per seat.
        families: List[List[str]] = [["random"] * P for _ in range(B)]
        zero_params = _zero_params(self.spec)
        rows, lrows = [], [[] for _ in slots]
        for g in range(B):
            agents = self.lineups[min(g, G - 1)]  # pad rows repeat the last game
            seat_params = []
            seat_lparams = [[] for _ in slots]
            for p, agent in enumerate(agents):
                role, what = seat_slot(agent)
                params = None
                if role == "search":
                    kinds[g, p] = what
                    families[g][p] = "random" if what == KIND_RANDOM else "search"
                    if what != KIND_RANDOM:
                        mc_maxes[g, p] = agent.mc_max
                        mc_pers[g, p] = agent.mc_per_card
                    c_pucts[g, p] = float(getattr(agent, "c_puct", 0.0) or 0.0)
                    if what in (KIND_POLICY, KIND_PUCT, KIND_PUCT_UNIFORM):
                        params = agent.params
                else:
                    s = slot_index[what]
                    kinds[g, p] = KIND_LEARNER_BASE + s
                    families[g][p] = what.family
                    if what.family == "dqn" and not what.spec.noisy:
                        epses[g, p] = float(agent.eps)
                seat_params.append(zero_params if params is None else params)
                for s, slot in enumerate(slots):
                    use = role == "learner" and slot_index[what] == s
                    seat_lparams[s].append(
                        agent.params if use else _zero_params(slot.spec)
                    )
            rows.append(jax.tree.map(lambda *l: np.stack(l), *seat_params))
            for s in range(len(slots)):
                lrows[s].append(jax.tree.map(lambda *l: np.stack(l), *seat_lparams[s]))
        params = jax.tree.map(lambda *l: np.stack(l), *rows)
        lparams = tuple(
            jax.tree.map(lambda *l: np.stack(l), *lrows[s]) for s in range(len(slots))
        )

        mc_ceiling = int(max(self.batch, mc_maxes.max(), 1))
        mc_ceiling = 1 << (mc_ceiling - 1).bit_length()  # pow2: bounded compiles
        # No PUCT-family seat in the block: sequential playout rounds exist
        # only for PUCT's between-round root statistics, so compile the
        # puct_free variant -- ONE round of mc_ceiling parallel playouts per
        # decision (identical outcome distribution for iid uniform/policy
        # roots, ~mc/batch-fold less sequential depth per decision).
        puct_free = not bool(
            np.any((kinds == KIND_PUCT) | (kinds == KIND_PUCT_UNIFORM))
        )
        # ... and no net-PLAYOUT seat (PolicyMCS / full PUCT): the playout
        # body compiles with the static uniform move rule, dropping the
        # per-lane policy forward (the dominant FLOPs of wide playouts).
        uniform_playouts = not bool(
            np.any((kinds == KIND_POLICY) | (kinds == KIND_PUCT))
        )
        batch = mc_ceiling if puct_free else self.batch
        fn = make_device_block_fn(
            self.cfg, self.spec, B, mc_ceiling, batch, slots, puct_free,
            uniform_playouts,
        )
        key = jax.random.key(int(np.random.randint(0, 2**31 - 1)))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            names = tuple(self.mesh.axis_names)
            games = NamedSharding(
                self.mesh, Pspec(names if len(names) > 1 else names[0])
            )
            put = lambda t: jax.tree.map(lambda x: jax.device_put(x, games), t)
            params, lparams, kinds, mc_maxes, mc_pers, c_pucts, epses = (
                put(params), put(lparams), put(kinds), put(mc_maxes),
                put(mc_pers), put(c_pucts), put(epses),
            )
            key = jax.device_put(key, NamedSharding(self.mesh, Pspec()))
        t1 = _time.perf_counter()
        scores, traj, final_obs = fn(
            params, lparams, kinds, mc_maxes, mc_pers, c_pucts, epses, key
        )
        # Park un-fetched device handles + the host context finalize needs.
        self._block = {
            "scores": scores, "traj": traj, "final_obs": final_obs,
            "families": families, "t0": t0, "t1": t1,
        }
        return self

    def finalize(self) -> List[np.ndarray]:
        """Blocking phase: fetch the trajectories (waits for THIS session's
        device program; later sessions' programs keep executing) and replay
        every learner's ``learn`` stream host-side in block order."""
        import time as _time

        blk = self._block
        self._block = None
        scores, traj, final_obs = blk["scores"], blk["traj"], blk["final_obs"]
        families, t0, t1 = blk["families"], blk["t0"], blk["t1"]
        G, P, H = len(self.lineups), self.cfg.num_players, self.cfg.hand_size

        # Start every device->host copy before the first blocking fetch:
        # the per-array np.asarray calls below would otherwise serialize one
        # transfer round trip per leaf (8 leaves x tunnel RTT).
        for leaf in jax.tree.leaves((scores, traj, final_obs)):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

        scores = np.asarray(scores)[:G]
        obs = np.asarray(traj["obs"], np.float32)[:, :G]
        hands = np.asarray(traj["hands"], np.int32)[:, :G]
        picks = np.asarray(traj["picks"], np.int32)[:, :G]
        logps = np.asarray(traj["logps"], np.float32)[:, :G]
        logp_vecs = np.asarray(traj["logp_vecs"], np.float32)[:, :G]
        rewards = np.asarray(traj["rewards"], np.int64)[:, :G]
        final_obs = np.asarray(final_obs, np.float32)[:G]
        t2 = _time.perf_counter()

        # ---- learn: replay the GameSession argument stream per game in
        # block order (reward lag incl., play.py:29-72; cf. BlockSession).
        # Per-family agent infos mirror what each host forward returns
        # (and its learn consumes): search/pv/reinforce step records,
        # ACER's behavior log_probs + action_id, nothing for DQN/random.
        # With device_learning, learner streams route to device planners
        # instead (identical bookkeeping/RNG order; updates fused on device).
        planners = {}
        if self.device_learning:
            from .device_learn import make_planner

            def planner_for(agent):
                if id(agent) not in planners:
                    planners[id(agent)] = make_planner(agent)
                return planners[id(agent)]

        else:

            def planner_for(agent):
                return None

        for g, agents in enumerate(self.lineups):
            prev_rewards = np.zeros(P, np.int64)
            for t in range(H):
                done = t == H - 1
                for i, agent in enumerate(agents):
                    pick = int(picks[t, g, i])
                    action = int(hands[t, g, i, pick])
                    fam = families[g][i]
                    if fam in ("dqn", "acer", "rai", "rmask"):
                        planner = planner_for(agent)
                        if planner is not None:
                            if fam == "dqn":
                                planner.on_step(
                                    state=obs[t, g, i],
                                    reward=prev_rewards[i],
                                    action=action,
                                    next_state=(
                                        final_obs[g, i] if done else obs[t + 1, g, i]
                                    ),
                                    done=done,
                                )
                            elif fam == "acer":
                                planner.on_step(
                                    state=obs[t, g, i],
                                    legal_cards=hands[t, g, i],
                                    log_probs=logp_vecs[t, g, i],
                                    action_id=pick,
                                    next_reward=rewards[t, g, i],
                                    done=done,
                                    episode_end=done,
                                )
                            elif fam == "rai":
                                planner.on_step(
                                    step_record={
                                        "state": obs[t, g, i],
                                        "legal_cards": hands[t, g, i],
                                        "chosen": np.int32(pick),
                                    },
                                    reward=prev_rewards[i],
                                    episode_end=done,
                                )
                            else:  # rmask
                                mask = np.zeros(self.cfg.num_cards, dtype=bool)
                                mask[hands[t, g, i][hands[t, g, i] >= 0]] = True
                                planner.on_step(
                                    step_record={
                                        "state": obs[t, g, i],
                                        "legal_mask": mask,
                                        "chosen": np.int32(action),
                                    },
                                    reward=prev_rewards[i],
                                    episode_end=done,
                                )
                            continue
                    if fam in ("random", "dqn"):
                        info = {}
                    elif fam == "acer":
                        info = {
                            "log_probs": logp_vecs[t, g, i],
                            "action_id": pick,
                        }
                    elif fam == "rmask":
                        mask = np.zeros(self.cfg.num_cards, dtype=bool)
                        mask[hands[t, g, i][hands[t, g, i] >= 0]] = True
                        info = {
                            "log_prob": float(logps[t, g, i]),
                            "step_record": {
                                "state": obs[t, g, i],
                                "legal_mask": mask,
                                # masked variant: chosen indexes the 104-card
                                # logit vector, i.e. the card itself.
                                "chosen": np.int32(action),
                            },
                        }
                    else:  # search / pv / rai: padded-hand step records
                        info = {
                            "log_prob": float(logps[t, g, i]),
                            "step_record": {
                                "state": obs[t, g, i],
                                "legal_cards": hands[t, g, i],
                                "chosen": np.int32(pick),
                            },
                        }
                    agent.learn(
                        state=obs[t, g, i],
                        legal_actions=[int(c) for c in hands[t, g, i] if c >= 0],
                        reward=prev_rewards[i],
                        action=action,
                        done=done,
                        next_state=final_obs[g, i] if done else obs[t + 1, g, i],
                        next_legal_actions=(
                            [] if done else [int(c) for c in hands[t + 1, g, i] if c >= 0]
                        ),
                        next_reward=rewards[t, g, i],
                        num_episode=0,  # fresh-session parity (play.py:69)
                        episode_end=done,
                        **info,
                    )
                prev_rewards = rewards[t, g]

        # Two-phase replay (VERDICT r3 #7): dispatch EVERY agent's fused
        # replay program first (async), then fetch all agents' host-needed
        # results in ONE jax.device_get -- a single tunnel round trip per
        # block instead of one per learner.
        import jax as _jax

        dispatched = [
            (planner, planner.dispatch())
            for planner in planners.values()
            if planner is not None
        ]
        live = [(p, h) for p, h in dispatched if h is not None]
        if live:
            fetched_all = _jax.device_get(tuple(h for _, h in live))
            for (planner, _), fetched in zip(live, fetched_all):
                planner.finalize(fetched)

        t3 = _time.perf_counter()
        self.timings = {
            "assemble_s": t1 - t0,
            "device_s": t2 - t1,
            "replay_s": t3 - t2,
        }
        self.results = [scores[g] for g in range(G)]
        return self.results
