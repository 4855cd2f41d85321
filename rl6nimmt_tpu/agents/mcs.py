"""Monte-Carlo search agents: MCS, PolicyMCS, PUCT ("Alpha0.5"), PUCTCustomed.

Rebuilds the reference search family (/root/reference/rl_6_nimmt/agents/
mcts.py) around the batched playout engine in :mod:`search`:

* :class:`MCSAgent` -- determinized Monte-Carlo search with uniform-random
  playout policies for everyone (mcts.py:181-188).
* :class:`PolicyMCSAgent` -- playout moves sampled from a learned
  action-in-input policy net; learns by self-imitation of its own final
  choices (mcts.py:191-261).
* :class:`PUCTAgent` -- "Alpha0.5": the first own move of each playout is
  chosen by PUCT ``q_hat + c_puct * pi * sqrt(N) / (1 + n)`` with min-max
  normalized q over observed outcomes (mcts.py:264-323).
* :class:`PUCTCustomedAgent` -- playout-free variant: a single (pi, V) net
  evaluation; picks argmax-V; trains the value head against the episode
  return plus self-imitation (mcts.py:325-451).

Search state per episode: a host-side card memory (``available_cards``)
tracking which card ids have never been observed; unknown opponent hands are
re-dealt uniformly from it for each playout (mcts.py:62-73, 116-127).

Controlled deviation from the reference (SURVEY.md §7): the reference updates
root statistics after *every* playout; here playouts run in device batches of
``batch_playouts``, with PUCT visit counts updated inside a batch and outcome
statistics between batches.  At ``batch_playouts=1`` the scheduling matches
the reference exactly; larger batches trade root-statistics freshness for
device utilization (ELO-equivalent in play strength, far faster).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.state import EnvConfig
from ..nets import MLPSpec, mlp_init
from .base import Agent, pad_cards
from .reinforce import action_in_input_logits
from .search import build_root_states_batch, make_playout_fn
from ..utils.tpu_ops import onehot_select

# Playout-call shaping for the cross-game block path: totals above PLAYOUT_CHUNK
# run as exact fixed-size chunks (one compiled shape), the remainder pads up to
# a power of two (bounded compile count, <=2x padding waste).
PLAYOUT_CHUNK = 16384


class BaseMCAgent(Agent):
    """Shared search scaffolding: card memory, determinization, batching."""

    playout_policy = "uniform"
    root_strategy = "uniform"
    batched_forward = True  # block driver may route through forward_many

    def __init__(
        self,
        handsize: int = 10,
        num_rows: int = 4,
        num_cards: int = 104,
        threshold: int = 6,
        mc_per_card: int = 10,
        mc_max: int = 100,
        include_summaries: bool = True,
        batch_playouts: Optional[int] = None,
        device_root: bool = False,
        *args,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.device_root = device_root
        self.handsize = handsize
        self.num_rows = num_rows
        self.num_cards = num_cards
        self.threshold = threshold
        self.mc_per_card = mc_per_card
        self.mc_max = mc_max
        self.include_summaries = include_summaries
        self.batch_playouts = batch_playouts
        self.num_players: Optional[int] = None
        self.available_cards: List[int] = []

    # ------------------------------------------------------------ interface

    def forward(self, state, legal_actions, *args, **kwargs):
        state = np.asarray(state, np.float32)
        n = len(legal_actions)
        if n == self.handsize:
            self._initialize_game(state)
        self._memorize_cards(state, legal_actions)

        if n == 1:
            return legal_actions[0], {"log_prob": 0.0, "step_record": self._record(state, legal_actions, 0)}
        return self._mcts(legal_actions, state)

    def forward_many(self, states, legal_lists, memories):
        """Batched forward across concurrent games (the block driver's path).

        One call decides this agent's move in MANY simultaneous games:
        per-game card memory lives in the caller-threaded ``memories`` dicts
        (:func:`new_memory`), and every playout round batches all games'
        determinized playouts into a single device program.  Root semantics
        per game are identical to :meth:`forward` -- same memory updates,
        same round structure (``batch_playouts`` chunks for PUCT), same
        choice rules -- so a single-request call consumes the exact same
        numpy/PRNG stream as the sequential path (tested).
        """
        results: List[Optional[tuple]] = [None] * len(states)
        groups = {}
        for i, (state, legal, mem) in enumerate(zip(states, legal_lists, memories)):
            state = np.asarray(state, np.float32)
            # Bind this game's memory to the instance attrs the single-game
            # helpers use (host path is single-threaded), then write back.
            self.available_cards = mem["available_cards"]
            self.num_players = mem["num_players"]
            n = len(legal)
            if n == self.handsize:
                self._initialize_game(state)
            self._memorize_cards(state, legal)
            mem["available_cards"] = self.available_cards
            mem["num_players"] = self.num_players
            if n == 1:
                results[i] = (
                    legal[0],
                    {"log_prob": 0.0, "step_record": self._record(state, legal, 0)},
                )
            else:
                groups.setdefault((mem["num_players"], n), []).append(
                    (i, state, legal, mem)
                )
        for (num_players, n), group in groups.items():
            for i, result in zip(
                [g[0] for g in group], self._mcts_many(num_players, n, group)
            ):
                results[i] = result
        return results

    @staticmethod
    def new_memory() -> dict:
        """Fresh per-(game, seat) card memory for :meth:`forward_many`."""
        return {"available_cards": [], "num_players": None}

    def learn(self, *args, **kwargs):
        raise NotImplementedError

    # ---------------------------------------------------------- card memory

    def _initialize_game(self, state) -> None:
        self.available_cards = list(range(self.num_cards))
        self.num_players = int(state[10])

    def _memorize_cards(self, state, legal_actions) -> None:
        for card in list(legal_actions) + self._board_from_state(state, flatten=True):
            if card >= 0 and card in self.available_cards:
                self.available_cards.remove(card)

    def _board_from_state(self, state, flatten: bool = True):
        grid = np.asarray(state)[-self.num_rows * self.threshold :].reshape(
            self.num_rows, self.threshold
        )
        rows = [[int(c) for c in row if c >= 0] for row in grid]
        return [c for row in rows for c in row] if flatten else rows

    # --------------------------------------------------------------- search

    def _mcts(self, legal_actions, state):
        """Single-game search = the cross-game path with one request."""
        mem = {"available_cards": self.available_cards, "num_players": self.num_players}
        group = [(0, np.asarray(state, np.float32), legal_actions, mem)]
        return self._mcts_many(self.num_players, len(legal_actions), group)[0]

    def _mcts_many(self, num_players: int, n: int, group):
        """Cross-game search: one playout program per round for ALL games.

        ``group`` is a list of ``(idx, state, legal_actions, memory)`` tuples
        sharing player count and hand size (the block driver's lockstep
        guarantee).  Per game the root logic -- round structure, first-move
        choice, outcome bookkeeping -- is exactly :meth:`_mcts`; only the
        playout execution is fused across games.
        """
        G = len(group)
        n_mc = self._compute_n_mc(n)
        env_cfg = EnvConfig(
            num_players=num_players,
            num_rows=self.num_rows,
            num_cards=self.num_cards,
            threshold=self.threshold,
            include_summaries=self.include_summaries,
        )
        if self.device_root:
            return self._mcts_many_device(env_cfg, n, n_mc, group)
        playout = make_playout_fn(env_cfg, self.playout_policy, self._playout_spec())
        boards = [self._board_from_state(state, flatten=False) for _, state, _, _ in group]
        my_hands = [list(legal) for _, _, legal, _ in group]
        outcomes = [{a: [] for a in legal} for _, _, legal, _ in group]
        rlps = [self._root_log_probs(state, legal) for _, state, legal, _ in group]

        remaining = n_mc
        batch = self.batch_playouts or n_mc
        while remaining > 0:
            K = min(batch, remaining)
            firsts = np.stack(
                [
                    self._choose_first_moves(K, group[g][2], outcomes[g], rlps[g])
                    for g in range(G)
                ]
            )  # [G, K]
            opp = np.stack(
                [
                    self._deal_opponent_hands(
                        K, n, pool=group[g][3]["available_cards"], num_players=num_players
                    )
                    for g in range(G)
                ]
            )  # [G, K, P-1, n]
            states0 = build_root_states_batch(env_cfg, boards, my_hands, opp)
            rets = self._run_playout_batch(playout, states0, firsts.reshape(-1), n)
            rets = rets.reshape(G, K)
            for g in range(G):
                for a, r in zip(firsts[g], rets[g]):
                    outcomes[g][int(a)].append(float(r))
            remaining -= K

        results = []
        for g, (_, state, legal, _) in enumerate(group):
            action, info = self._choose_action_from_outcomes(outcomes[g], rlps[g])
            idx = list(legal).index(action)
            info["step_record"] = self._record(state, legal, idx)
            results.append((action, info))
        return results

    def _mcts_many_device(self, env_cfg: EnvConfig, n: int, n_mc: int, group):
        """One device program decides every game of the group (device_root).

        The whole decision — determinization, root selection, playout rounds,
        outcome aggregation — runs inside a single jitted call
        (:mod:`device_search`), so a block of G games costs ONE dispatch per
        (agent, turn) instead of one per playout round per game.  Root
        semantics match the host path; only the PRNG stream differs
        (documented in PARITY.md).
        """
        from .device_search import make_device_decision_fn_many

        if getattr(self, "temperature", None) is not None and self.temperature > 1e-12:
            raise NotImplementedError(
                "visit-count temperature sampling (parity: mcts.py:318-323)"
            )
        G = len(group)
        R, T, C, H = self.num_rows, self.threshold, self.num_cards, self.handsize
        boards = np.full((G, R, T), -1, np.int32)
        row_lens = np.zeros((G, R), np.int32)
        hands = np.full((G, H), -1, np.int32)
        avails = np.zeros((G, C), bool)
        obses = np.zeros((G, env_cfg.state_length), np.float32)
        for g, (_, state, legal, mem) in enumerate(group):
            for r, cards in enumerate(self._board_from_state(state, flatten=False)):
                boards[g, r, : len(cards)] = cards
                row_lens[g, r] = len(cards)
            hands[g, :n] = sorted(legal)
            avails[g, mem["available_cards"]] = True
            obses[g] = state

        # n / n_mc are traced scalars shared by the group: one compiled
        # program covers every decision depth (see device_search docstring).
        fn = make_device_decision_fn_many(
            env_cfg,
            self.playout_policy,
            self._playout_spec(),
            self.root_strategy,
            self.mc_max,
            self.batch_playouts or self.mc_max,
            float(getattr(self, "c_puct", 0.0)),
        )
        # Pad the game axis to a power-of-two bucket with a floor of 8: block
        # group sizes vary per turn (1..block), and each distinct vmap width
        # is a separate compile of a large program — ruinous through a
        # remote-device tunnel.  The floor trades a little padded compute
        # (cheap) for 2x fewer compiled widths (expensive).
        B = max(8, 1 << (G - 1).bit_length())
        pad = lambda x: np.concatenate([x, np.repeat(x[-1:], B - G, axis=0)]) if B > G else x
        # Agent keys live on the host CPU (interactive path); the decision
        # program runs on the default (accelerator) device like the playouts.
        keys = jax.device_put(
            jax.random.split(self.next_key(), B), jax.devices()[0]
        )
        actions, logps = fn(
            self._playout_params(), pad(boards), pad(row_lens), pad(hands), n,
            n_mc, pad(avails), pad(obses), keys,
        )
        actions, logps = np.asarray(actions)[:G], np.asarray(logps)[:G]

        results = []
        for g, (_, state, legal, _) in enumerate(group):
            action = int(actions[g])
            idx = list(legal).index(action)
            results.append(
                (
                    action,
                    {
                        "log_prob": float(logps[g]),
                        "step_record": self._record(state, legal, idx),
                    },
                )
            )
        return results

    def _run_playout_batch(self, playout, states0, first, n) -> np.ndarray:
        """Run B playouts through fixed-size chunks + one pow2-padded tail.

        Chunking keeps compiled-shape count bounded (one program for the
        ``PLAYOUT_CHUNK`` body, <=12 pow2 buckets for tails) while padding
        waste stays under 2x of the tail only.  Pad rows repeat the last real
        playout and their returns are discarded.
        """
        B = first.shape[0]
        params = self._playout_params()
        n_turns = jnp.asarray(n, jnp.int32)
        device = jax.devices()[0]
        rets = np.empty(B, np.float32)
        sliced = lambda sl: jax.tree.map(lambda x: x[sl], states0)

        start = 0
        while B - start > PLAYOUT_CHUNK:
            sl = slice(start, start + PLAYOUT_CHUNK)
            keys = jax.device_put(
                jax.random.split(self.next_key(), PLAYOUT_CHUNK), device
            )
            rets[sl] = np.asarray(
                playout(params, sliced(sl), jnp.asarray(first[sl], jnp.int32), n_turns, keys)
            )
            start += PLAYOUT_CHUNK

        rem = B - start
        bucket = max(8, 1 << (rem - 1).bit_length())
        pad = bucket - rem
        sl = slice(start, B)
        tail = jax.tree.map(
            lambda x: np.concatenate([x[sl], np.repeat(x[B - 1 : B], pad, axis=0)])
            if pad
            else x[sl],
            states0,
        )
        first_tail = np.concatenate([first[sl], np.repeat(first[B - 1 : B], pad)])
        keys = jax.device_put(jax.random.split(self.next_key(), bucket), device)
        rets[sl] = np.asarray(
            playout(params, tail, jnp.asarray(first_tail, jnp.int32), n_turns, keys)
        )[:rem]
        return rets

    def _compute_n_mc(self, n_actions: int) -> int:
        return min(self.mc_max, self.mc_per_card * math.factorial(n_actions))

    def _deal_opponent_hands(self, K: int, n: int, pool=None, num_players=None) -> np.ndarray:
        """K determinizations: (P-1) sorted hands of n unseen cards each."""
        pool = np.asarray(
            self.available_cards if pool is None else pool, dtype=np.int64
        )
        P = self.num_players if num_players is None else num_players
        perms = np.argsort(np.random.random((K, pool.shape[0])), axis=1)
        need = (P - 1) * n
        picked = pool[perms[:, :need]].reshape(K, P - 1, n)
        return np.sort(picked, axis=2)

    def _choose_action_from_outcomes(self, outcomes, root_log_probs):
        best_action = next(iter(outcomes))
        best_mean = -float("inf")
        for action, rets in outcomes.items():
            mean = np.mean(rets) if rets else float("nan")
            if mean > best_mean:
                best_action, best_mean = action, mean
        return best_action, {"log_prob": float(root_log_probs[best_action])}

    # -------------------------------------------------------- variant hooks

    def _playout_spec(self):
        return None

    def _playout_params(self):
        return None

    def _root_log_probs(self, state, legal_actions):
        return {a: 0.0 for a in legal_actions}

    def _choose_first_moves(self, K, legal_actions, outcomes, root_log_probs):
        raise NotImplementedError

    def _record(self, state, legal_actions, chosen_idx):
        padded = pad_cards(legal_actions, self.handsize)
        return {
            "state": np.asarray(state, np.float32),
            "legal_cards": padded,
            "chosen": np.int32(chosen_idx),
        }


class MCSAgent(BaseMCAgent):
    """Uniform-random playouts for everyone; no learning (mcts.py:181-188)."""

    def _choose_first_moves(self, K, legal_actions, outcomes, root_log_probs):
        return np.random.choice(np.asarray(legal_actions, np.int64), size=K)

    def learn(self, *args, **kwargs):
        return None


class PolicyMCSAgent(BaseMCAgent):
    """Learned playout policy + self-imitation updates (mcts.py:191-261)."""

    playout_policy = "net"
    root_strategy = "policy"

    def __init__(
        self,
        hidden_sizes: Tuple[int, ...] = (100, 100),
        r_factor: float = 0.1,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.r_factor = r_factor
        self.spec = MLPSpec(
            input_size=self.state_length + 1, hidden_sizes=tuple(hidden_sizes), head_sizes=(1,)
        )
        self.params = self.host_put(mlp_init(self.next_key(), self.spec))
        self._episode = []
        self._train_step = None
        self._accel_params_cache = None
        self._rebuild_jit()

    def _rebuild_jit(self) -> None:
        spec = self.spec
        self._root_fn = jax.jit(
            lambda params, s, cards: jax.nn.log_softmax(
                action_in_input_logits(spec, params, s, cards)
            )
        )
        if self.training:
            self._train_step = jax.jit(self._make_train_step())

    def parameters(self):
        return self.params

    def set_parameters(self, params) -> None:
        self.params = params

    def train(self, mode: bool = True) -> None:
        super().train(mode)
        if mode:
            self._train_step = jax.jit(self._make_train_step())

    def _playout_spec(self):
        return self.spec

    def _playout_params(self):
        # Playouts run batched on the default (accelerator) device while the
        # interactive params live on the host CPU; re-stage on change only.
        cache = getattr(self, "_accel_params_cache", None)
        if cache is not None and cache[0] is self.params:
            return cache[1]
        import jax as _jax

        staged = _jax.device_put(self.params, _jax.devices()[0])
        self._accel_params_cache = (self.params, staged)
        return staged

    def _root_log_probs(self, state, legal_actions):
        padded = pad_cards(legal_actions, self.handsize)
        logp = np.asarray(
            self._root_fn(self.params, np.asarray(state, np.float32), padded)
        )
        return {a: float(logp[i]) for i, a in enumerate(legal_actions)}

    def _choose_first_moves(self, K, legal_actions, outcomes, root_log_probs):
        probs = np.exp([root_log_probs[a] for a in legal_actions])
        probs = probs / probs.sum()
        return np.random.choice(np.asarray(legal_actions, np.int64), size=K, p=probs)

    # ----------------------------------------------------------------- learn

    def learn(
        self, state, reward, action, done, next_state, next_reward, episode_end, num_episode,
        legal_actions=None, **kwargs,
    ):
        self._episode.append(
            {**kwargs["step_record"], "reward": np.float32(reward * self.r_factor)}
        )
        if not episode_end or not self.training:
            if episode_end:
                self._episode = []  # eval mode: never accumulate across games
            return 0.0
        batch = {
            k: np.stack([rec[k] for rec in self._episode])
            for k in self._episode[0]
        }
        self.params, self.opt_state, loss = self._train_step(self.params, self.opt_state, batch)
        self._episode = []
        return float(loss)

    def _make_train_step(self):
        spec = self.spec

        def loss_fn(params, batch):
            logits = jax.vmap(lambda s, c: action_in_input_logits(spec, params, s, c))(
                batch["state"], batch["legal_cards"]
            )
            logp = jax.nn.log_softmax(logits)
            chosen = onehot_select(logp, batch["chosen"])
            return -jnp.sum(chosen)  # imitate own search choices (mcts.py:245-256)

        def train(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train


class PUCTAgent(PolicyMCSAgent):
    """Alpha0.5: PUCT root selection over determinized playouts (mcts.py:264-323)."""

    root_strategy = "puct"

    def __init__(self, c_puct: float = 2.0, temperature: Optional[float] = None, **kwargs):
        kwargs.setdefault("batch_playouts", 8)
        super().__init__(**kwargs)
        self.c_puct = c_puct
        self.temperature = temperature

    def _choose_first_moves(self, K, legal_actions, outcomes, root_log_probs):
        """Sequential PUCT with intra-batch pending visit counts."""
        probs = np.exp([root_log_probs[a] for a in legal_actions])
        counts = np.asarray([len(outcomes[a]) for a in legal_actions], dtype=np.float64)
        chosen = []
        for _ in range(K):
            pucts = self._compute_pucts(legal_actions, outcomes, probs, counts)
            pick = int(np.argmax(pucts))
            chosen.append(int(legal_actions[pick]))
            counts[pick] += 1
        return np.asarray(chosen, dtype=np.int64)

    def _compute_pucts(self, legal_actions, outcomes, probs, counts):
        n_total = counts.sum()
        max_r, min_r, mid_r = self._normalize_q(outcomes)
        q = np.asarray(
            [np.mean(outcomes[a]) if outcomes[a] else mid_r for a in legal_actions]
        )
        if max_r == min_r:
            # All observed outcomes equal: the reference's (q-min)/(max-min)
            # is 0/0 -> NaN and argmax silently degenerates to index 0
            # (mcts.py:276-302).  Controlled deviation (PARITY.md): treat all
            # moves as mid-value so exploration falls to the prior term.
            q = np.full_like(q, 0.5)
        else:
            q = np.clip((q - min_r) / (max_r - min_r), 0.0, 1.0)
        return q + self.c_puct * probs * (n_total + 1e-9) ** 0.5 / (1.0 + counts)

    @staticmethod
    def _normalize_q(outcomes):
        rets = [r for rs in outcomes.values() for r in rs]
        if len(rets) < 10:
            return 0.0, -10.0, -5.0  # cold-start constants (mcts.py:304-315)
        return float(np.max(rets)), float(np.min(rets)), float(np.median(rets))

    def _choose_action_from_outcomes(self, outcomes, root_log_probs):
        if self.temperature is None or self.temperature <= 1e-12:
            return super()._choose_action_from_outcomes(outcomes, root_log_probs)
        raise NotImplementedError("visit-count temperature sampling (parity: mcts.py:318-323)")


class PUCTUniformAgent(PUCTAgent):
    """Decoupled Alpha0.5: the net drives the PUCT ROOT prior only; the
    determinized playouts stay uniform.

    This framework-original variant (no reference analog) separates the
    prior's two roles — root exploration vs playout opponent model — whose
    coupling was diagnosed as the reason trained priors lose strength in
    standard Alpha0.5 (RESULTS.md rounds 2-3).  Measured at 10,240
    games/cell (`experiments/results/prior_decoupled_r3.json`): with a
    trained prior it wins 0.539 ± 0.005 vs a fresh prior at mc_max=8 (and
    the architecture alone is strength-neutral, 0.506 ± 0.005 vs standard
    Alpha0.5).  Self-imitation learning, root semantics, and the device
    decision path are all inherited from :class:`PUCTAgent`; only the
    playout policy differs.
    """

    playout_policy = "uniform"


class PUCTCustomedAgent(PUCTAgent):
    """Playout-free PUCT variant with a (pi, V) net (mcts.py:325-451)."""

    # No playouts to batch: decisions are one tiny (pi, V) forward each, so
    # the block driver calls plain forward per game.  (The interleaved card
    # memory this leaves on the instance is never read by _nn_choice.)
    batched_forward = False

    def __init__(self, hidden_sizes: Tuple[int, ...] = (100, 100), **kwargs):
        super().__init__(hidden_sizes=hidden_sizes, **kwargs)
        # Single head of width 2: column 0 = policy logit, column 1 = value.
        self.spec = MLPSpec(
            input_size=self.state_length + 1, hidden_sizes=tuple(hidden_sizes), head_sizes=(2,)
        )
        self.params = self.host_put(mlp_init(self.next_key(), self.spec))
        self._rebuild_jit()

    def _rebuild_jit(self) -> None:
        super()._rebuild_jit()
        spec = self.spec
        self._pv_fn = jax.jit(lambda params, s, cards: _policy_value(spec, params, s, cards))

    def forward(self, state, legal_actions, *args, **kwargs):
        state = np.asarray(state, np.float32)
        n = len(legal_actions)
        if n == self.handsize:
            self._initialize_game(state)
        self._memorize_cards(state, legal_actions)

        action, info = self._nn_choice(state, legal_actions)
        if n == 1:
            idx = 0
            action = legal_actions[0]
            info = {"log_prob": 0.0, "outcome": info["outcome"]}
        else:
            idx = list(legal_actions).index(action)
        info["step_record"] = self._record(state, legal_actions, idx)
        return action, info

    def _nn_choice(self, state, legal_actions):
        padded = pad_cards(legal_actions, self.handsize)
        logp, values = self._pv_fn(
            self.params, np.asarray(state, np.float32), padded
        )
        values = np.asarray(values)[: len(legal_actions)]
        idx = int(np.argmax(values))
        return int(legal_actions[idx]), {
            "log_prob": float(np.asarray(logp)[idx]),
            "outcome": float(values[idx]),
        }

    def learn(
        self, state, reward, action, done, next_state, next_reward, episode_end, num_episode,
        legal_actions=None, **kwargs,
    ):
        self._episode.append(
            {**kwargs["step_record"], "reward": np.float32(reward * self.r_factor)}
        )
        if not episode_end or not self.training:
            if episode_end:
                self._episode = []  # eval mode: never accumulate across games
            return 0.0
        batch = {
            k: np.stack([rec[k] for rec in self._episode])
            for k in self._episode[0]
        }
        self.params, self.opt_state, loss = self._train_step(self.params, self.opt_state, batch)
        self._episode = []
        return float(loss)

    def _make_train_step(self):
        spec, r_factor = self.spec, self.r_factor

        def loss_fn(params, batch):
            logp, values = jax.vmap(lambda s, c: _policy_value(spec, params, s, c))(
                batch["state"], batch["legal_cards"]
            )
            chosen = batch["chosen"]
            chosen_logp = onehot_select(logp, chosen)
            chosen_v = onehot_select(values, chosen)
            reward_sum = jnp.sum(batch["reward"]) / r_factor
            outcome_loss = jnp.mean((chosen_v - reward_sum) ** 2)
            policy_loss = -jnp.sum(chosen_logp)
            return outcome_loss + policy_loss

        def train(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train


def _policy_value(spec: MLPSpec, params, state, legal_cards):
    """(log pi over legal slots, V per slot) from the width-2 head."""
    from .reinforce import action_in_input_heads

    (out,) = action_in_input_heads(spec, params, state, legal_cards)
    valid = legal_cards >= 0
    logits = jnp.where(valid, out[:, 0], -jnp.inf)
    return jax.nn.log_softmax(logits), jnp.where(valid, out[:, 1], -jnp.inf)
