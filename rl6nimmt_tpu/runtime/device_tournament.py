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

Protocol notes (the block deviations of PARITY.md #10/#11 extended):

* acting uses parameters frozen for the whole block (bounded staleness,
  as in block mode);
* ``learn`` receives the identical GameSession argument stream — reward lag,
  ``num_episode=0``, agent-info round trip with ``log_prob``/``step_record``
  — replayed per game in block order after the device call returns;
* the PRNG stream is JAX-key based (deals, determinizations, random seats),
  so trajectories are not bit-identical to the host drivers; strength
  equivalence is the tested property (see RESULTS.md);
* agents whose family has no device decision (DQN/ACER/REINFORCE/Human/
  PUCTCustomed, or PUCT with temperature sampling) make a lineup ineligible;
  :meth:`..tournament.Tournament.play_device_block` routes those games
  through the host :class:`BlockSession` instead.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..agents.device_search import (
    KIND_POLICY,
    KIND_PUCT,
    KIND_RANDOM,
    KIND_UNIFORM,
    _make_decide_unified,
    factorial_table,
    playout_budget,
)
from ..agents.mcs import MCSAgent, PolicyMCSAgent, PUCTAgent, PUCTCustomedAgent
from ..agents.random_agent import DrunkHamster
from ..engine.env import deal, observe, step
from ..engine.state import EnvConfig
from ..nets import MLPSpec, mlp_init

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
):
    """Compile G heterogeneous games + trajectory capture into one program.

    ``(params, kinds, mc_maxes, mc_pers, c_pucts, key) ->
    (scores f32[G, P], traj, final_obs f32[G, P, S])`` where

    * ``params`` — per-(game, seat) stacked net params ``[G, P, ...]``
      (zeros for random/uniform seats),
    * ``kinds int32[G, P]`` — KIND_* per seat,
    * ``mc_maxes / mc_pers int32[G, P]`` — per-seat budget parameters
      (``n_mc = min(mc_max, mc_per * n!)``, mcts.py:105-106),
    * ``c_pucts f32[G, P]`` — PUCT exploration constants,
    * ``traj`` — per-turn stacks: ``obs f32[T, G, P, S]``, ``hands
      int32[T, G, P, H]`` (the padded legal hands before the turn),
      ``picks int32[T, G, P]`` (chosen index into the padded hand),
      ``logps f32[T, G, P]``, ``rewards int32[T, G, P]``.

    ``mc_max`` (static) is the budget ceiling sizing the outcome buffers;
    per-seat traced budgets below it run fewer rounds (the round loop bound
    is traced).  Random seats run zero rounds.
    """
    P, C, H, G = cfg.num_players, cfg.num_cards, cfg.hand_size, num_games
    fact = factorial_table(H)
    decide = _make_decide_unified(cfg, spec, mc_max, batch)

    def board_seen(state):
        cards = state.board.reshape(G, -1)
        hit = cards[:, :, None] == jnp.arange(C)[None, None, :]
        return jnp.any(hit, axis=1)

    def match(params, kinds, mc_maxes, mc_pers, c_pucts, key):
        key, k_deal = jax.random.split(key)
        states = jax.vmap(lambda k: deal(cfg, k))(jax.random.split(k_deal, G))
        seen0 = board_seen(states)

        inner = jax.vmap(decide, in_axes=(0, 0, None, None, 0, None, 0, 0, 0, 0, 0))
        outer = jax.vmap(inner, in_axes=(0, 0, 0, 0, 0, None, 0, 0, 0, 0, 0))

        def turn(carry, t):
            state, seen, key = carry
            n = H - t
            seen = seen | board_seen(state)
            obs, _ = jax.vmap(lambda s: observe(cfg, s))(state)
            n_mc = playout_budget(mc_maxes, mc_pers, fact[n])
            n_mc = jnp.where(kinds == KIND_RANDOM, 0, n_mc)
            # Card memory: unseen cards, own hand excluded (mcts.py:62-73).
            avail = ~(seen[:, None, :] | state.hands)
            key, k_dec = jax.random.split(key)
            actions, logps, picks = outer(
                params,
                kinds,
                state.board,
                state.row_len,
                state.hands_sorted,
                n,
                n_mc,
                c_pucts,
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
                rewards=rewards,
            )
            return (new_state, seen, key), ys

        (state, _, _), traj = lax.scan(turn, (states, seen0, key), jnp.arange(H))
        final_obs, _ = jax.vmap(lambda s: observe(cfg, s))(state)
        return -state.scores.astype(jnp.float32), traj, final_obs

    return jax.jit(match)


# -------------------------------------------------------------- eligibility


def seat_kind(agent) -> Optional[int]:
    """KIND_* for agents with a device decision, None otherwise."""
    if isinstance(agent, DrunkHamster):
        return KIND_RANDOM
    if isinstance(agent, PUCTCustomedAgent):
        return None  # playout-free (pi, V) decisions stay host-side
    if isinstance(agent, PUCTAgent):
        if agent.temperature is not None and agent.temperature > 1e-12:
            return None  # NotImplementedError parity (mcts.py:318-323)
        if (agent.batch_playouts or 8) != 8:
            # PUCT root statistics refresh per round; a non-default batch
            # would silently change that cadence vs the host path (uniform/
            # policy roots are round-agnostic, so only PUCT is restricted).
            return None
        return KIND_PUCT
    if isinstance(agent, PolicyMCSAgent):
        return KIND_POLICY
    if isinstance(agent, MCSAgent):
        return KIND_UNIFORM
    return None


def lineup_signature(agents) -> Optional[tuple]:
    """(EnvConfig, MLPSpec | None) if the lineup can run on device, else None."""
    kinds = [seat_kind(a) for a in agents]
    if any(k is None for k in kinds):
        return None
    dims, specs = set(), set()
    for agent, kind in zip(agents, kinds):
        if kind != KIND_RANDOM:
            dims.add(
                (
                    agent.num_rows,
                    agent.num_cards,
                    agent.threshold,
                    agent.include_summaries,
                    agent.handsize,
                )
            )
        if kind in (KIND_POLICY, KIND_PUCT):
            specs.add(agent.spec)
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
    return cfg, (specs.pop() if specs else None)


def device_lineup_eligible(agents) -> bool:
    return lineup_signature(agents) is not None


# ------------------------------------------------------------------ session


class DeviceBlockSession:
    """Play G same-player-count games as one device program, then replay
    learning host-side (the device twin of :class:`..runtime.block
    .BlockSession` for eligible lineups)."""

    def __init__(
        self,
        lineups: Sequence[Sequence],
        batch: int = 8,
        bucket: Optional[int] = None,
        mesh=None,
    ):
        assert lineups, "need at least one game"
        P = len(lineups[0])
        assert all(len(l) == P for l in lineups), "uniform player count required"
        self.lineups = [list(agents) for agents in lineups]
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
        cfgs = {cfg for cfg, _ in sigs}
        specs = {spec for _, spec in sigs if spec is not None}
        assert len(cfgs) == 1 and len(specs) <= 1, "mixed env dims / net specs"
        self.cfg = cfgs.pop()
        self.spec = specs.pop() if specs else MLPSpec(
            input_size=self.cfg.state_length + 1,
            hidden_sizes=(100, 100),
            head_sizes=(1,),
        )
        self.results: List[np.ndarray] = []

    def play(self) -> List[np.ndarray]:
        G, P, H = len(self.lineups), self.cfg.num_players, self.cfg.hand_size
        B = self.bucket or max(1, 1 << (G - 1).bit_length())  # pow2 game bucket
        if self.mesh is not None:
            # Round up to a multiple of the mesh size (device_put needs the
            # sharded game axis evenly divisible; mesh sizes need not be pow2).
            B = max(B, self.mesh.size)
            B = -(-B // self.mesh.size) * self.mesh.size
        assert B >= G, (B, G)

        kinds = np.zeros((B, P), np.int32)
        mc_maxes = np.zeros((B, P), np.int32)
        mc_pers = np.zeros((B, P), np.int32)
        c_pucts = np.zeros((B, P), np.float32)
        zero_params = _zero_params(self.spec)
        rows = []
        for g in range(B):
            agents = self.lineups[min(g, G - 1)]  # pad rows repeat the last game
            seat_params = []
            for p, agent in enumerate(agents):
                kind = seat_kind(agent)
                kinds[g, p] = kind
                if kind != KIND_RANDOM:
                    mc_maxes[g, p] = agent.mc_max
                    mc_pers[g, p] = agent.mc_per_card
                c_pucts[g, p] = float(getattr(agent, "c_puct", 0.0) or 0.0)
                params = agent.params if kind in (KIND_POLICY, KIND_PUCT) else None
                seat_params.append(zero_params if params is None else params)
            rows.append(jax.tree.map(lambda *l: np.stack(l), *seat_params))
        params = jax.tree.map(lambda *l: np.stack(l), *rows)

        mc_ceiling = int(max(self.batch, mc_maxes.max(), 1))
        mc_ceiling = 1 << (mc_ceiling - 1).bit_length()  # pow2: bounded compiles
        fn = make_device_block_fn(self.cfg, self.spec, B, mc_ceiling, self.batch)
        key = jax.random.key(int(np.random.randint(0, 2**31 - 1)))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            names = tuple(self.mesh.axis_names)
            games = NamedSharding(
                self.mesh, Pspec(names if len(names) > 1 else names[0])
            )
            put = lambda t: jax.tree.map(lambda x: jax.device_put(x, games), t)
            params, kinds, mc_maxes, mc_pers, c_pucts = (
                put(params), put(kinds), put(mc_maxes), put(mc_pers), put(c_pucts)
            )
            key = jax.device_put(key, NamedSharding(self.mesh, Pspec()))
        scores, traj, final_obs = fn(params, kinds, mc_maxes, mc_pers, c_pucts, key)

        scores = np.asarray(scores)[:G]
        obs = np.asarray(traj["obs"], np.float32)[:, :G]
        hands = np.asarray(traj["hands"], np.int32)[:, :G]
        picks = np.asarray(traj["picks"], np.int32)[:, :G]
        logps = np.asarray(traj["logps"], np.float32)[:, :G]
        rewards = np.asarray(traj["rewards"], np.int64)[:, :G]
        final_obs = np.asarray(final_obs, np.float32)[:G]

        # ---- learn: replay the GameSession argument stream per game in
        # block order (reward lag incl., play.py:29-72; cf. BlockSession).
        for g, agents in enumerate(self.lineups):
            prev_rewards = np.zeros(P, np.int64)
            for t in range(H):
                done = t == H - 1
                for i, agent in enumerate(agents):
                    action = int(hands[t, g, i, picks[t, g, i]])
                    if kinds[g, i] == KIND_RANDOM:
                        info = {}
                    else:
                        info = {
                            "log_prob": float(logps[t, g, i]),
                            "step_record": {
                                "state": obs[t, g, i],
                                "legal_cards": hands[t, g, i],
                                "chosen": np.int32(picks[t, g, i]),
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

        self.results = [scores[g] for g in range(G)]
        return self.results
