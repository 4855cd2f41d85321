"""Golden test: vectorized multi-player ELO vs the scalar-loop oracle.

``rl6nimmt_tpu/tournament/elo.py`` reimplements the external ``multi_elo``
package's pairwise update (reference tournament.py:157-164).  The package is
unavailable offline, so the oracle is an independent scalar transcription of
its semantics (tests/vendor/multi_elo_reference.py) — written with loops and
``math.pow`` so a bug would have to appear identically in two very different
implementations to slip through.  Randomized placements (including fractional
midrank ties), ratings, player counts 2-6, and K factors.
"""

import importlib.util
import pathlib

import numpy as np
import pytest

from rl6nimmt_tpu.tournament import EloPlayer, calc_elo

_spec = importlib.util.spec_from_file_location(
    "multi_elo_reference",
    pathlib.Path(__file__).parent / "vendor" / "multi_elo_reference.py",
)
oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(oracle)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("n", [2, 3, 4, 5, 6])
def test_calc_elo_matches_scalar_oracle_randomized(seed, n):
    rng = np.random.RandomState(1000 * n + seed)
    for trial in range(20):
        k = float(rng.choice([4, 8, 16, 32, 64]))
        elos = rng.uniform(1200, 2000, n)
        # Placements as the tournament produces them: midranked, so ties are
        # fractional and shared (e.g. [1.5, 1.5, 3.0]).
        scores = rng.randint(-30, 0, n).astype(np.float64)
        if trial % 3 == 0 and n > 2:
            scores[1] = scores[0]  # force ties regularly
        from rl6nimmt_tpu.tournament.tournament import Tournament

        places = Tournament._compute_absolute_positions(scores)

        ours = calc_elo(
            [EloPlayer(place=p, elo=e) for p, e in zip(places, elos)], k
        )
        theirs = oracle.calc_elo(
            [oracle.EloPlayer(place=p, elo=e) for p, e in zip(places, elos)], k
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), rtol=1e-12)


def test_calc_elo_all_tied_is_a_fixed_point_at_equal_ratings():
    players = [EloPlayer(place=1.5, elo=1600) for _ in range(4)]
    np.testing.assert_allclose(calc_elo(players, 32), [1600] * 4)


def test_calc_elo_single_player_unchanged():
    assert list(calc_elo([EloPlayer(place=1, elo=1700)], 32)) == [1700]


def test_calc_elo_matches_oracle_on_exact_reference_shapes():
    """The tournament's real call shape: places from midranked game scores,
    k annealed 32 -> 4 as in the notebook protocol."""
    rng = np.random.RandomState(99)
    elos = [1806.0, 1745.0, 1629.0, 1577.0]  # README headline ratings
    for k in (32, 16, 8, 4):
        scores = rng.randint(-25, 0, 4).astype(np.float64)
        from rl6nimmt_tpu.tournament.tournament import Tournament

        places = Tournament._compute_absolute_positions(scores)
        ours = calc_elo([EloPlayer(p, e) for p, e in zip(places, elos)], k)
        theirs = oracle.calc_elo(
            [oracle.EloPlayer(p, e) for p, e in zip(places, elos)], k
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), rtol=1e-12)
