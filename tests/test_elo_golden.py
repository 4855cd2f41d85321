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


# --------------------------------------------------------------------------
# Transcription-independent invariants (VERDICT r3 #6): properties that hold
# for the pairwise multi-player ELO scheme regardless of implementation, so
# they cannot share a bug with the vendored oracle.


def _classic_two_player(elo_a, elo_b, score_a, k):
    """Closed-form classic ELO for one two-player game."""
    expected_a = 1.0 / (1.0 + 10.0 ** ((elo_b - elo_a) / 400.0))
    return elo_a + k * (score_a - expected_a)


@pytest.mark.parametrize("k", [4.0, 16.0, 32.0])
def test_two_player_reduces_to_classic_elo(k):
    rng = np.random.RandomState(42)
    for _ in range(20):
        a, b = rng.uniform(1200, 2000, 2)
        for pa, pb, sa in [(1.0, 2.0, 1.0), (2.0, 1.0, 0.0), (1.5, 1.5, 0.5)]:
            new = calc_elo([EloPlayer(pa, a), EloPlayer(pb, b)], k=k)
            np.testing.assert_allclose(new[0], _classic_two_player(a, b, sa, k), rtol=1e-12)
            np.testing.assert_allclose(new[1], _classic_two_player(b, a, 1.0 - sa, k), rtol=1e-12)


def test_permutation_invariance():
    """Reordering the player list permutes the output identically."""
    rng = np.random.RandomState(7)
    for n in (3, 4, 6):
        places = rng.permutation(n).astype(float) + 1.0
        places[0] = places[1]  # include a tie
        elos = rng.uniform(1300, 1900, n)
        base = calc_elo([EloPlayer(p, e) for p, e in zip(places, elos)], k=32)
        for _ in range(5):
            perm = rng.permutation(n)
            out = calc_elo([EloPlayer(places[i], elos[i]) for i in perm], k=32)
            np.testing.assert_allclose(out, base[perm], rtol=1e-12)


def test_k_over_n_minus_1_pairwise_decomposition():
    """An n-player update is exactly the sum of classic two-player updates
    against each opponent at K' = k / (n-1) -- the scheme's defining
    property (multi_elo semantics, reference tournament.py:157-164)."""
    rng = np.random.RandomState(11)
    k = 32.0
    for n in (3, 4, 5, 6):
        places = (rng.permutation(n) + 1).astype(float)
        elos = rng.uniform(1200, 2000, n)
        new = calc_elo([EloPlayer(p, e) for p, e in zip(places, elos)], k=k)
        kp = k / (n - 1)
        for i in range(n):
            delta = 0.0
            for j in range(n):
                if i == j:
                    continue
                s = 1.0 if places[i] < places[j] else (0.5 if places[i] == places[j] else 0.0)
                delta += _classic_two_player(elos[i], elos[j], s, kp) - elos[i]
            np.testing.assert_allclose(new[i], elos[i] + delta, rtol=1e-12)


def test_update_is_linear_in_k():
    rng = np.random.RandomState(13)
    places = [2.0, 1.0, 3.5, 3.5]
    elos = rng.uniform(1300, 1900, 4)
    players = [EloPlayer(p, e) for p, e in zip(places, elos)]
    d8 = calc_elo(players, k=8.0) - elos
    d32 = calc_elo(players, k=32.0) - elos
    np.testing.assert_allclose(d32, 4.0 * d8, rtol=1e-12)


def test_midrank_tie_neutrality():
    """A midrank tie between equally-rated players moves both identically,
    and the tied pair exchanges exactly zero rating between themselves."""
    # Equal ratings, tied placement: identical updates.
    players = [EloPlayer(1.5, 1500.0), EloPlayer(1.5, 1500.0), EloPlayer(3.0, 1700.0)]
    new = calc_elo(players, k=32)
    assert new[0] == new[1]
    # The pair's mutual contribution is zero: removing the third player, two
    # tied equals are a fixed point.
    pair = calc_elo([EloPlayer(1.5, 1500.0), EloPlayer(1.5, 1500.0)], k=32)
    np.testing.assert_allclose(pair, [1500.0, 1500.0], rtol=1e-15)
    # Tied UNEQUAL ratings: the favorite loses exactly what the underdog
    # gains (antisymmetry), and the underdog gains from a draw.
    pair2 = calc_elo([EloPlayer(1.0, 1800.0), EloPlayer(1.0, 1400.0)], k=32)
    np.testing.assert_allclose(pair2[0] - 1800.0, -(pair2[1] - 1400.0), rtol=1e-12)
    assert pair2[1] > 1400.0


def test_rating_conservation():
    """Pairwise actual and expected scores are both antisymmetric, so total
    rating is conserved in every game (zero-sum), ties included."""
    rng = np.random.RandomState(17)
    for n in (2, 3, 4, 6):
        for _ in range(10):
            places = rng.randint(1, n + 1, n).astype(float)
            elos = rng.uniform(1200, 2000, n)
            new = calc_elo([EloPlayer(p, e) for p, e in zip(places, elos)], k=16)
            np.testing.assert_allclose(new.sum(), elos.sum(), rtol=1e-12)
