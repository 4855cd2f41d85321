"""Population tournament with ELO tracking and evolutionary clone-and-cull.

Rebuilds the reference ``Tournament`` (/root/reference/rl_6_nimmt/
tournament.py:12-262) with the same observable behavior:

* games pick a uniform random player count in [min_players, max_players] and
  a uniform random subset of active agents (tournament.py:166-177);
* scoring records per-agent scores, midrank tie positions, wins, and
  multi-player ELO with configurable K (tournament.py:140-164, 240-256);
* ``evolve`` ranks active agents by a metric (elo = last value; others =
  mean), clones top finishers ``copies[pos]`` times, culls past
  ``max_players`` / ``max_per_descendant`` (tournament.py:78-130);
* ``baseline_eval`` plays each agent against fixed baseline opponents every
  ``baseline_condition`` games (tournament.py:182-195);
* the ASCII results table matches the reference format (tournament.py:208-238).

Cloning is an in-memory pickle round trip of the agent (params + optimizer
moments), replacing the reference's ``torch.save("temp_model.pt")`` disk
bounce.
"""

from __future__ import annotations

import copy
import logging
import pickle
from typing import Optional, Sequence

import numpy as np

from ..runtime.session import GameSession
from .elo import EloPlayer, calc_elo

logger = logging.getLogger(__name__)


class Tournament:
    def __init__(
        self,
        min_players: int = 2,
        max_players: int = 4,
        baseline_agents: Optional[Sequence] = None,
        baseline_num_games: int = 1,
        baseline_condition: int = 10,
        elo_initial: float = 1600,
        elo_k: float = 32,
    ):
        assert 0 < min_players <= max_players
        self.min_players = min_players
        self.max_players = max_players
        self.baseline_agents = baseline_agents
        self.baseline_num_games = baseline_num_games
        self.baseline_condition = baseline_condition
        self.elo_initial = elo_initial
        self.elo_k = elo_k

        self.total_games = 0
        self.agents = {}
        self.descendants = {}
        self.active = {}
        self.played_games = {}
        self.tournament_scores = {}
        self.tournament_positions = {}
        self.tournament_wins = {}
        self.baseline_scores = {}
        self.baseline_positions = {}
        self.baseline_wins = {}
        self.elos = {}

    # ------------------------------------------------------------ population

    def add_player(self, name: str, agent) -> None:
        assert name not in self.agents
        agent.__name__ = name
        self.agents[name] = agent
        self.descendants[name] = name
        self.active[name] = True
        self.played_games[name] = 0
        self.tournament_scores[name] = []
        self.tournament_positions[name] = []
        self.tournament_wins[name] = []
        self.baseline_scores[name] = []
        self.baseline_positions[name] = []
        self.baseline_wins[name] = []
        self.elos[name] = [self.elo_initial]

    def copy_player(self, old_name: str, new_name: str) -> None:
        for stats in (
            self.active, self.elos, self.descendants, self.played_games,
            self.tournament_scores, self.tournament_positions, self.tournament_wins,
            self.baseline_scores, self.baseline_positions, self.baseline_wins,
        ):
            stats[new_name] = copy.deepcopy(stats[old_name])
        clone = pickle.loads(pickle.dumps(self.agents[old_name]))
        clone.__name__ = new_name
        self.agents[new_name] = clone

    def remove_player(self, name: str, full_delete: bool = False) -> None:
        if full_delete:
            for stats in (
                self.agents, self.active, self.descendants, self.played_games,
                self.tournament_scores, self.tournament_positions, self.tournament_wins,
                self.baseline_scores, self.baseline_positions, self.baseline_wins, self.elos,
            ):
                del stats[name]
        else:
            self.active[name] = False

    def evolve(
        self,
        copies=(2,),
        max_players: Optional[int] = None,
        max_per_descendant: Optional[int] = 2,
        metric: str = "elo",
    ) -> None:
        if metric == "tournament_scores":
            scores, reverse, mean = self.tournament_scores, True, True
        elif metric == "tournament_positions":
            scores, reverse, mean = self.tournament_positions, False, True
        elif metric == "tournament_wins":
            scores, reverse, mean = self.tournament_wins, False, True
        elif metric == "elo":
            scores, reverse, mean = self.elos, True, False
        else:
            raise NotImplementedError(metric)

        if mean:
            key = lambda n: (np.mean(scores[n]) if scores[n] else 0.0)
        else:
            key = lambda n: (scores[n][-1] if scores[n] else 0.0)
        ranked = sorted(self.active_agents(), key=key, reverse=reverse)

        new_count = 0
        new_descendants = {}
        for pos, name in enumerate(ranked):
            desc = self.descendants[name]
            new_descendants.setdefault(desc, 0)

            if pos < len(copies):
                n_copies = copies[pos]
                logger.info(f"Copying player {name} into {n_copies} instances!")
            elif max_players is not None and new_count >= max_players:
                n_copies = 0
                logger.info(f"Removing player {name}")
            elif max_per_descendant is not None and new_descendants[desc] >= max_per_descendant:
                n_copies = 0
                logger.info(f"Removing player {name}")
            else:
                n_copies = 1

            for c in range(n_copies):
                self.copy_player(name, f"{name}_{c}")
            self.remove_player(name, full_delete=n_copies > 0)

            new_count += n_copies
            new_descendants[desc] += n_copies

    # ----------------------------------------------------------------- games

    def play_game(self, num_players: Optional[int] = None) -> None:
        agent_names, agents = self._choose_players(num_players)
        session = GameSession(*agents)
        session.play_game(render=False)
        self.score_game(agent_names, session.results[0])

    def play_block(self, n_games: int, num_players: Optional[int] = None) -> None:
        """Play ``n_games`` in lockstep with cross-game batched search acting.

        Lineup sampling and scoring are identical to ``n_games`` sequential
        :meth:`play_game` calls; games run through
        :class:`~rl6nimmt_tpu.runtime.block.BlockSession`, which batches all
        search agents' playouts across games (orders of magnitude faster for
        search-heavy populations) and replays learning + ELO updates in game
        order at block end (the bounded-staleness deviation documented
        there).  ``play_block(1)`` reproduces sequential semantics exactly.
        """
        from ..runtime.block import BlockSession

        picks = [self._choose_players(num_players) for _ in range(n_games)]
        scores = BlockSession([agents for _, agents in picks]).play()
        for (names, _), game_scores in zip(picks, scores):
            self.score_game(names, game_scores)

    def play_device_block(
        self,
        n_games: int,
        num_players: Optional[int] = None,
        bucket: Optional[int] = None,
        mesh=None,
    ) -> None:
        """Play ``n_games`` with eligible lineups fused into device programs.

        Lineup sampling and scoring are identical to :meth:`play_block`;
        games whose every seat has a device decision — the search families
        (random / MCS / PolicyMCS / PUCT) AND the single-forward learner
        families (the DQN lattice, ACER, both REINFORCE variants,
        PUCTCustomed), :func:`~rl6nimmt_tpu.runtime.device_tournament
        .seat_slot` — run as COMPLETE games inside one kind-traced jitted
        program per player count (deal, per-seat determinized search with
        on-device card memory, per-seat learner forwards, resolution, all
        turns), with every learner's updates replayed host-side from the
        captured trajectories.  Remaining games (Human seats, PUCT with
        temperature sampling) go through the host :class:`BlockSession`.
        Parameter staleness is bounded by the block, as in
        :meth:`play_block` (PARITY.md deviations #10/#11/#12).
        """
        from ..runtime.block import BlockSession
        from ..runtime.device_tournament import (
            DeviceBlockSession,
            LearnerSlot,
            lineup_signature,
            seat_slot,
        )

        # Learner slots are population-wide (not per-lineup) so every block
        # of the tournament reuses the same compiled programs regardless of
        # which lineups the sampler draws; culled-but-retained agents keep
        # their slot alive so evolution never forces a recompile.
        slots = set()
        for name in self.agents:
            role = seat_slot(self.agents[name])
            if role is not None and role[0] == "learner":
                slots.add(role[1])
        slots = tuple(sorted(slots, key=LearnerSlot.sort_key))

        picks = [self._choose_players(num_players) for _ in range(n_games)]
        device_groups, host = {}, []
        for j, (names, agents) in enumerate(picks):
            # Group by env dims + search-net spec, not just player count:
            # individually-eligible lineups may still mix architectures that
            # cannot share one compiled program.
            sig = lineup_signature(agents)
            if sig is not None:
                device_groups.setdefault(sig[:2], []).append((j, agents))
            else:
                host.append((j, agents))

        scores = {}
        for group in device_groups.values():
            results = DeviceBlockSession(
                [agents for _, agents in group], bucket=bucket, mesh=mesh,
                slots=slots,
            ).play()
            for (j, _), game_scores in zip(group, results):
                scores[j] = game_scores
        if host:
            results = BlockSession([agents for _, agents in host]).play()
            for (j, _), game_scores in zip(host, results):
                scores[j] = game_scores
        for j, (names, _) in enumerate(picks):
            self.score_game(names, scores[j])

    def score_game(self, agent_names, scores) -> None:
        scores = np.asarray(scores)
        relative_positions = self._compute_relative_positions(scores)
        winner = agent_names[int(np.argmax(scores))]
        new_elos = self._compute_elos(agent_names, scores)

        self.total_games += 1
        for name, score, rel_pos, elo in zip(agent_names, scores, relative_positions, new_elos):
            self.played_games[name] += 1
            self.tournament_scores[name].append(score)
            self.tournament_positions[name].append(rel_pos)
            self.tournament_wins[name].append(1.0 if winner == name else 0.0)
            self.elos[name].append(elo)
            if self.played_games[name] % self.baseline_condition == 0:
                self.baseline_eval(name)

    def _compute_elos(self, agent_names, scores):
        old = [self.elos[name][-1] for name in agent_names]
        places = self._compute_absolute_positions(np.asarray(scores))
        players = [EloPlayer(place=p, elo=e) for p, e in zip(places, old)]
        return calc_elo(players, self.elo_k)

    def _choose_players(self, num_players: Optional[int]):
        if num_players is None:
            # Clamp to the active population so a small roster doesn't crash
            # (the reference asserts instead, tournament.py:170).
            upper = min(self.max_players, len(self))
            num_players = int(np.random.choice(range(self.min_players, upper + 1)))
        assert len(self) >= num_players
        names = self.active_agents()
        idx = np.random.choice(len(names), size=num_players, replace=False)
        chosen = [names[i] for i in idx]
        return chosen, [self.agents[n] for n in chosen]

    def active_agents(self):
        return [n for n in self.agents if self.active[n]]

    def baseline_eval(self, agent_name: str) -> None:
        if self.baseline_agents is None:
            return
        session = GameSession(self.agents[agent_name], *self.baseline_agents)
        for _ in range(self.baseline_num_games):
            session.play_game(render=False)
        scores = np.mean(np.asarray(session.results), axis=0)
        relative_positions = self._compute_relative_positions(scores)
        self.baseline_scores[agent_name].append(scores[0])
        self.baseline_positions[agent_name].append(relative_positions[0])
        self.baseline_wins[agent_name].append(float(np.argmax(scores) == 0))

    def winner(self):
        best, who = -float("inf"), None
        for name, agent in self.agents.items():
            mean_pos = np.mean(self.tournament_positions[name]) if self.tournament_positions[name] else -float("inf")
            if mean_pos > best:
                best, who = mean_pos, agent
        return who

    # ------------------------------------------------------------- reporting

    def __str__(self) -> str:
        hline = "-----------------------------------------------------------------"
        lines = [f"Tournament after {self.total_games} games:", hline]
        lines.append(" Agent                | Games | Mean score | Win fraction |  ELO ")
        lines.append(hline)

        def row(name):
            score = "-" if not self.tournament_scores[name] else f"{np.mean(self.tournament_scores[name]):>5.2f}"
            wins = "-" if not self.tournament_wins[name] else f"{np.mean(self.tournament_wins[name]):>5.2f}"
            return (
                f" {name:>20s} | {self.played_games[name]:>5} | {score:>10} "
                f"| {wins:>12} | {self.elos[name][-1]:>4.0f} "
            )

        for name in self.agents:
            if self.active[name]:
                lines.append(row(name))
        lines.append(hline)
        for name in self.agents:
            if not self.active[name]:
                lines.append(row(name))
        if lines[-1] != hline:
            lines.append(hline)
        return "\n".join(lines)

    __repr__ = __str__

    def __len__(self) -> int:
        return len(self.active_agents())

    # ------------------------------------------------------------- positions

    @staticmethod
    def _compute_absolute_positions(scores: np.ndarray) -> np.ndarray:
        """0 = best ... n-1 = worst, ties midranked (tournament.py:240-247)."""
        eps = 0.5
        left = np.asarray(
            [np.searchsorted(sorted(-scores), -s - eps) for s in scores], np.float32
        )
        right = 1.0 + np.asarray(
            [np.searchsorted(sorted(-scores), -s + eps) for s in scores], np.float32
        )
        return 0.5 * (left + right)

    @staticmethod
    def _compute_relative_positions(scores: np.ndarray) -> np.ndarray:
        """1 = best ... 0 = worst, ties midranked (tournament.py:249-256)."""
        eps = 0.5
        left = np.asarray(
            [np.searchsorted(sorted(scores), s + eps) for s in scores], np.float32
        )
        right = 1.0 + np.asarray(
            [np.searchsorted(sorted(scores), s - eps) for s in scores], np.float32
        )
        positions = 0.5 * (left + right)
        return (positions - 1) / (len(scores) - 1)
