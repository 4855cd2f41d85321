"""Golden parity tests: JAX engine vs the NumPy rules oracle.

BASELINE.json configs 1-2: fixed-seed random-vs-random games must produce
bit-exact trajectories, penalties and returns between the TPU engine and the
reference-rule transcription in ``rl6nimmt_tpu.parity``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl6nimmt_tpu.engine import (
    EnvConfig,
    SechsNimmtEnv,
    init_from_deck,
    is_done,
    observe,
    step,
)
from rl6nimmt_tpu.parity import IllegalMoveError, ParityEnv


def random_legal_actions(rng, legal_lists):
    return [int(rng.choice(hand)) for hand in legal_lists]


def play_parity_game(num_players, seed, include_summaries=True):
    """Play one full game in both engines from the same deck and compare."""
    rng = np.random.RandomState(seed)
    deck = np.arange(104)
    rng.shuffle(deck)

    ref = ParityEnv(num_players=num_players, include_summaries=include_summaries)
    ref_states, ref_legal = ref.reset_with_deck(deck)

    env = SechsNimmtEnv(num_players, include_summaries=include_summaries, verbose=False)
    jax_states, jax_legal = env.reset_with_deck(deck)

    total_ref = np.zeros(num_players, dtype=np.int64)
    total_jax = np.zeros(num_players, dtype=np.int64)

    for turn in range(10):
        assert ref_legal == jax_legal, f"legal actions diverge at turn {turn}"
        for p in range(num_players):
            np.testing.assert_array_equal(
                np.asarray(ref_states[p], dtype=np.float32),
                np.asarray(jax_states[p], dtype=np.float32),
                err_msg=f"state diverges at turn {turn} player {p}",
            )

        actions = random_legal_actions(rng, ref_legal)
        (ref_states, ref_legal), ref_rewards, ref_done, _ = ref.step(actions)
        (jax_states, jax_legal), jax_rewards, jax_done, _ = env.step(actions)

        np.testing.assert_array_equal(ref_rewards, jax_rewards, err_msg=f"turn {turn}")
        assert ref_done == jax_done
        total_ref += ref_rewards
        total_jax += jax_rewards

    assert ref_done and jax_done
    np.testing.assert_array_equal(ref.scores, env.scores)
    np.testing.assert_array_equal(total_ref, total_jax)
    np.testing.assert_array_equal(-total_jax, env.scores)


@pytest.mark.parametrize("num_players", [2, 3, 4, 6])
@pytest.mark.parametrize("seed", [0, 1, 17])
def test_full_game_parity(num_players, seed):
    play_parity_game(num_players, seed)


def test_parity_without_summaries():
    play_parity_game(4, 5, include_summaries=False)


def test_batched_trajectory_parity():
    """Config 2: a vmapped batch of games matches per-game oracle trajectories."""
    num_players, batch = 4, 64
    cfg = EnvConfig(num_players=num_players)
    rng = np.random.RandomState(123)

    decks = np.stack([rng.permutation(104) for _ in range(batch)])
    batched_init = jax.vmap(lambda d: init_from_deck(cfg, d))
    batched_step = jax.jit(jax.vmap(lambda s, a: step(cfg, s, a)))
    batched_obs = jax.jit(jax.vmap(lambda s: observe(cfg, s)))

    state = batched_init(jnp.asarray(decks, dtype=jnp.int32))
    refs = [ParityEnv(num_players=num_players) for _ in range(batch)]
    ref_legal = [r.reset_with_deck(d)[1] for r, d in zip(refs, decks)]

    for turn in range(10):
        actions = np.stack(
            [[rng.choice(hand) for hand in legal] for legal in ref_legal]
        ).astype(np.int32)
        state, rewards = batched_step(state, jnp.asarray(actions))
        rewards = np.asarray(rewards)
        for g in range(batch):
            _, ref_r, _, _ = refs[g].step(actions[g].tolist())
            ref_legal[g] = refs[g]._observe()[1]
            np.testing.assert_array_equal(ref_r, rewards[g], err_msg=f"game {g} turn {turn}")

    for g in range(batch):
        np.testing.assert_array_equal(refs[g].scores, np.asarray(state.scores[g]))
    obs, masks = batched_obs(state)
    assert obs.shape == (batch, num_players, cfg.state_length)
    assert not np.asarray(masks).any()  # all hands empty at game end


def test_illegal_move_raises():
    env = SechsNimmtEnv(2, verbose=False)
    _, legal = env.reset_with_deck(np.arange(104))
    bad = next(c for c in range(104) if c not in legal[0])
    try:
        env.step([bad, legal[1][0]])
        assert False, "expected InvalidMoveException"
    except Exception as e:
        assert type(e).__name__ == "InvalidMoveException"

    ref = ParityEnv(num_players=2)
    ref.reset_with_deck(np.arange(104))
    with pytest.raises(IllegalMoveError):
        ref.step([bad, legal[1][0]])


def test_reset_to_midgame():
    """reset_to must reproduce a mid-game position in both engines."""
    board = [[10, 30], [5], [90, 91, 92], [50]]
    hands = [[0, 1, 2], [100, 101, 102]]
    env = SechsNimmtEnv(2, verbose=False)
    states, legal = env.reset_to(board, hands)
    ref = ParityEnv(num_players=2)
    ref_states, ref_legal = ref.reset_to(board, hands)
    assert legal == ref_legal
    for p in range(2):
        np.testing.assert_array_equal(
            np.asarray(ref_states[p], dtype=np.float32), states[p]
        )
    assert env.board == board
    assert env.hands == [sorted(h) for h in hands]


def test_observation_layout_default():
    """Default config observation is 47-dim (reference env.py:37)."""
    cfg = EnvConfig(num_players=4)
    assert cfg.state_length == 47
    assert EnvConfig(num_players=4, include_summaries=False).state_length == 35


def test_wrapper_space_metadata():
    """Gym-style spaces match the reference's (env.py:34-39)."""
    env = SechsNimmtEnv(4, verbose=False, seed=0)
    assert env.action_space.n == 104
    assert env.action_space.contains(103) and not env.action_space.contains(104)
    assert env.observation_space.shape == (47,)
    assert float(env.observation_space.low[0]) == -1.0
    assert float(env.observation_space.high[0]) == 2.0
    assert env.reward_range == (-float("inf"), 0)


def test_done_semantics():
    cfg = EnvConfig(num_players=2)
    state = init_from_deck(cfg, jnp.arange(104, dtype=jnp.int32))
    assert not bool(is_done(state))
