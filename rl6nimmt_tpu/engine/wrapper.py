"""Host-side, gym-flavored wrapper around the JAX engine core.

Provides the same surface as the reference ``SechsNimmtEnv``
(/root/reference/rl_6_nimmt/env.py:13-77): ``reset() -> (states,
legal_actions)``, ``reset_to(board, hands)``, ``step(actions) -> ((states,
legal_actions), rewards, done, info)``, ``render()``.  Internally every call
dispatches to the compiled single-game engine; this class exists for the
interactive / heterogeneous-agent path (GameSession, Human play, debug
scripts).  Batched training never goes through it -- it uses the functional
core directly under vmap/scan.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import jax
import numpy as np

from .cards import format_card
from .env import InvalidMoveException, is_done, jitted_core, observe
from .state import EnvConfig, EnvState

logger = logging.getLogger(__name__)


class Discrete:
    """Minimal stand-in for ``gym.spaces.Discrete`` (no gym dependency)."""

    def __init__(self, n: int):
        self.n = int(n)
        self.shape = ()
        self.dtype = np.int64

    def contains(self, x) -> bool:
        return 0 <= int(x) < self.n

    def __repr__(self):
        return f"Discrete({self.n})"


class Box:
    """Minimal stand-in for ``gym.spaces.Box`` (no gym dependency)."""

    def __init__(self, low: float, high: float, shape, dtype=np.float32):
        self.shape = tuple(shape)
        self.dtype = dtype
        self.low = np.full(self.shape, low, dtype)
        self.high = np.full(self.shape, high, dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return x.shape == self.shape and bool(
            np.all(x >= self.low) and np.all(x <= self.high)
        )

    def __repr__(self):
        return f"Box({self.low.flat[0]}, {self.high.flat[0]}, {self.shape})"


class SechsNimmtEnv:
    """Single-game 6 nimmt! environment backed by the TPU engine."""

    def __init__(
        self,
        num_players: int,
        num_rows: int = 4,
        num_cards: int = 104,
        threshold: int = 6,
        include_summaries: bool = True,
        player_names: Optional[Sequence[str]] = None,
        verbose: bool = True,
        seed: Optional[int] = None,
    ):
        self.config = EnvConfig(
            num_players=num_players,
            num_rows=num_rows,
            num_cards=num_cards,
            threshold=threshold,
            include_summaries=include_summaries,
        )
        self._player_names = list(player_names) if player_names is not None else None
        self.verbose = verbose
        self._deal, self._step, self._observe, self._init_from_deck = jitted_core(self.config)
        self.seed(np.random.randint(0, 2**31 - 1) if seed is None else seed)
        self._state: Optional[EnvState] = None

        # Reference-compatible metadata (env.py:34-39).  The reference
        # exposes gym spaces (Discrete(104), Box(-1, 2, (47,))); gym is not a
        # dependency here, so minimal structural stand-ins carry the same
        # attributes.  As in the reference, the Box bounds describe the
        # *normalized* state -- raw observations are not clipped to them.
        self.num_actions = self.config.num_actions
        self.state_length = self.config.state_length
        self.reward_range = (-float("inf"), 0)
        self.action_space = Discrete(self.config.num_actions)
        self.observation_space = Box(-1.0, 2.0, (self.config.state_length,))

    # ------------------------------------------------------------------- API

    def seed(self, seed: int) -> None:
        self._key = jax.random.key(seed)
        try:  # keep host-side key splits off tunneled accelerator backends
            self._key = jax.device_put(self._key, jax.local_devices(backend="cpu")[0])
        except RuntimeError:
            pass

    def reset(self):
        self._key, sub = jax.random.split(self._key)
        self._state = self._deal(sub)
        return self._states_tuple()

    def reset_with_deck(self, deck: Sequence[int]):
        """Deal deterministically from an explicit deck (parity mode)."""
        self._state = self._init_from_deck(np.asarray(deck, dtype=np.int32))
        return self._states_tuple()

    def reset_to(self, board: Sequence[Sequence[int]], hands: Sequence[Sequence[int]]):
        """Re-enter an arbitrary mid-game position (reference env.py:53-62)."""
        cfg = self.config
        b = np.full((cfg.num_rows, cfg.threshold), -1, dtype=np.int32)
        row_len = np.zeros(cfg.num_rows, dtype=np.int32)
        for r, cards in enumerate(board):
            b[r, : len(cards)] = cards
            row_len[r] = len(cards)
        hand_mask = np.zeros((cfg.num_players, cfg.num_cards), dtype=bool)
        hands_sorted = np.full((cfg.num_players, cfg.hand_size), -1, dtype=np.int32)
        for p, cards in enumerate(hands):
            hand_mask[p, list(cards)] = True
            hands_sorted[p, : len(cards)] = sorted(cards)
        self._state = EnvState(
            board=b,
            row_len=row_len,
            hands=hand_mask,
            hands_sorted=hands_sorted,
            scores=np.zeros((cfg.num_players,), dtype=np.int32),
            turn=np.zeros((), dtype=np.int32),
        )
        return self._states_tuple()

    def step(self, actions: Sequence[int]):
        assert self._state is not None, "call reset() first"
        assert len(actions) == self.config.num_players
        hands = np.asarray(self._state.hands)
        for p, card in enumerate(actions):
            if not (0 <= card < self.config.num_cards) or not hands[p, card]:
                held = sorted(np.flatnonzero(hands[p]).tolist())
                # Message replicates the reference VERBATIM (env.py:117)
                # including its mixed convention: 1-based played card, raw
                # 0-based hand list.
                raise InvalidMoveException(
                    f"Player {p + 1} tried to play card {card + 1}, but their hand is {held}"
                )
        # Plain numpy input: the pinned jit transfers host->CPU directly
        # (jnp.asarray would build it on the default device first -- a full
        # tunnel round trip per step on remote accelerator backends).
        self._state, rewards = self._step(self._state, np.asarray(actions, dtype=np.int32))
        return self._states_tuple(), np.asarray(rewards), bool(is_done(self._state)), {}

    # ------------------------------------------------------------ inspection

    @property
    def scores(self) -> np.ndarray:
        return np.asarray(self._state.scores)

    @property
    def board(self) -> List[List[int]]:
        b, lens = np.asarray(self._state.board), np.asarray(self._state.row_len)
        return [b[r, : lens[r]].tolist() for r in range(self.config.num_rows)]

    @property
    def hands(self) -> List[List[int]]:
        h = np.asarray(self._state.hands)
        return [sorted(np.flatnonzero(h[p]).tolist()) for p in range(self.config.num_players)]

    @property
    def done(self) -> bool:
        return bool(is_done(self._state))

    def render(self, mode: str = "human") -> None:
        """Log the board, hands and scores (reference env.py:79-97)."""
        cfg = self.config
        logger.info("-" * 120)
        logger.info("Board:")
        for cards in self.board:
            line = "  " + " ".join(format_card(c) for c in cards)
            line += "   _ " * (cfg.threshold - len(cards) - 1) + "   * "
            logger.info(line)
        logger.info("Players:")
        for p, (score, hand) in enumerate(zip(self.scores, self.hands)):
            cards = "no cards " if not hand else "cards " + " ".join(format_card(c) for c in hand)
            logger.info(f"  {self._player_name(p)}: {score:>3d} Hornochsen, {cards}")
        if self.done:
            winner, loser = int(np.argmin(self.scores)), int(np.argmax(self.scores))
            logger.info(
                f"The game is over! {self._player_name(winner)} wins, "
                f"{self._player_name(loser)} loses. Congratulations!"
            )
        logger.info("-" * 120)

    # --------------------------------------------------------------- helpers

    def _states_tuple(self):
        obs, masks = self._observe(self._state)
        obs = np.asarray(obs)
        masks = np.asarray(masks)
        states = [obs[p] for p in range(self.config.num_players)]
        legal = [np.flatnonzero(masks[p]).tolist() for p in range(self.config.num_players)]
        return states, legal

    def _player_name(self, player: int) -> str:
        if self._player_names is None:
            return f"Player {player + 1:d}"
        width = max(len(n) for n in self._player_names)
        return f"{self._player_names[player]:<{width}} (player {player + 1:d})"
