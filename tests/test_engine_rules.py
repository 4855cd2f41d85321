"""Unit tests for specific 6 nimmt! rule cases in the JAX engine."""

import jax.numpy as jnp
import numpy as np

from rl6nimmt_tpu.engine import (
    EnvConfig,
    EnvState,
    build_points_table,
    card_points,
    observe,
    row_points,
    step,
)


def make_state(cfg, board_rows, hands):
    board = np.full((cfg.num_rows, cfg.threshold), -1, dtype=np.int32)
    row_len = np.zeros(cfg.num_rows, dtype=np.int32)
    for r, cards in enumerate(board_rows):
        board[r, : len(cards)] = cards
        row_len[r] = len(cards)
    hand_mask = np.zeros((cfg.num_players, cfg.num_cards), dtype=bool)
    hands_sorted = np.full((cfg.num_players, cfg.hand_size), -1, dtype=np.int32)
    for p, cards in enumerate(hands):
        hand_mask[p, cards] = True
        hands_sorted[p, : len(cards)] = sorted(cards)
    return EnvState(
        board=jnp.asarray(board),
        row_len=jnp.asarray(row_len),
        hands=jnp.asarray(hand_mask),
        hands_sorted=jnp.asarray(hands_sorted),
        scores=jnp.zeros((cfg.num_players,), dtype=jnp.int32),
        turn=jnp.zeros((), dtype=jnp.int32),
    )


def test_card_points_table():
    # Reference env.py:224-239: 55 -> 7, mult-of-11 -> 5, mult-of-10 -> 3,
    # ends-in-5 -> 2, else 1 (faces are card id + 1).
    table = build_points_table(104)
    assert table[54] == 7      # face 55
    assert table[10] == 5      # face 11
    assert table[98] == 5      # face 99
    assert table[9] == 3       # face 10
    assert table[99] == 3      # face 100
    assert table[4] == 2       # face 5
    assert table[94] == 2      # face 95
    assert table[0] == 1       # face 1
    assert table.sum() == sum(card_points(c) for c in range(104))


def test_simple_placement_no_capture():
    cfg = EnvConfig(num_players=2)
    state = make_state(cfg, [[10], [20], [30], [40]], [[15], [25]])
    state, rewards = step(cfg, state, jnp.asarray([15, 25]))
    # 15 goes after 10 (row 0); 25 goes after 20 (row 1).
    assert np.asarray(rewards).tolist() == [0, 0]
    assert np.asarray(state.board)[0, :2].tolist() == [10, 15]
    assert np.asarray(state.board)[1, :2].tolist() == [20, 25]


def test_sixth_card_capture():
    cfg = EnvConfig(num_players=2)
    row0 = [10, 11, 12, 13, 14]  # faces 11..15: points 5+1+1+1+2 = 10
    state = make_state(cfg, [row0, [90], [95], [100]], [[15], [99]])
    state, rewards = step(cfg, state, jnp.asarray([15, 99]))
    # Player 0's 15 is the 6th card in row 0 -> captures 10 points.
    assert np.asarray(rewards).tolist() == [-10, 0]
    assert np.asarray(state.scores).tolist() == [10, 0]
    assert np.asarray(state.board)[0, :2].tolist() == [15, -1]
    assert np.asarray(state.row_len)[0] == 1


def test_undercut_takes_cheapest_row():
    cfg = EnvConfig(num_players=2)
    # Rows: values incl. last -> row0: face 100 = 3; row1: face 55 = 7;
    # row2: faces 61,62 = 2; row3: face 91+92 = 2. First-min tiebreak -> row2.
    state = make_state(cfg, [[99], [54], [60, 61], [90, 91]], [[5], [70]])
    state, rewards = step(cfg, state, jnp.asarray([5, 70]))
    # Card 5 undercuts everything -> captures row 2 (2 points incl. both cards).
    assert np.asarray(rewards)[0] == -2
    assert np.asarray(state.board)[2, :2].tolist() == [5, -1]
    # Card 70 goes after 62? No: row2 now holds [5]; highest last below 70 is 62 gone;
    # lasts now are 99, 54, 5, 91 -> below 70: 54 and 5 -> row 1 (54).
    assert np.asarray(state.board)[1, :2].tolist() == [54, 70]


def test_ascending_resolution_order():
    cfg = EnvConfig(num_players=2)
    # Both players play into the same row; lower card resolves first.
    state = make_state(cfg, [[10, 11, 12, 13], [90], [95], [100]], [[20], [14]])
    state, rewards = step(cfg, state, jnp.asarray([20, 14]))
    # 14 lands first (5th card), then 20 is the 6th card -> player 0 captures.
    # Row was 10,11,12,13,14: faces 11,12,13,14,15 -> 5+1+1+1+2 = 10 points.
    assert np.asarray(rewards).tolist() == [-10, 0]
    assert np.asarray(state.board)[0, 0] == 20


def test_replacement_penalty_includes_whole_old_row():
    cfg = EnvConfig(num_players=2)
    # Undercutting captures the cheapest row *including* its last card
    # (reference env.py:154-172). Row values incl. last: row0 faces 6,7 -> 2;
    # row1 face 55 -> 7; row2 face 10 -> 3; row3 face 99 -> 5. Cheapest: row0.
    state = make_state(cfg, [[5, 6], [54], [9], [98]], [[0], [101]])
    state, rewards = step(cfg, state, jnp.asarray([0, 101]))
    assert np.asarray(rewards)[0] == -2
    assert np.asarray(state.scores)[0] == 2
    assert np.asarray(state.board)[0, :2].tolist() == [0, -1]


def test_row_points_include_last():
    cfg = EnvConfig(num_players=2)
    state = make_state(cfg, [[54], [9, 10], [0], [1]], [[50], [60]])
    pts = np.asarray(row_points(cfg, state.board, state.row_len))
    assert pts.tolist() == [7, 8, 1, 1]  # 55->7; 10&11 -> 3+5


def test_observation_blocks():
    cfg = EnvConfig(num_players=2)
    state = make_state(cfg, [[10], [20], [30, 31], [40]], [[1, 5, 99], [2, 6]])
    obs, mask = observe(cfg, state)
    obs = np.asarray(obs)
    # Hand block: sorted ascending, -1 padded.
    assert obs[0, :10].tolist() == [1, 5, 99, -1, -1, -1, -1, -1, -1, -1]
    assert obs[1, :10].tolist() == [2, 6, -1, -1, -1, -1, -1, -1, -1, -1]
    assert obs[0, 10] == 2  # num_players
    assert obs[0, 11:15].tolist() == [1, 1, 2, 1]  # cards per row
    assert obs[0, 15:19].tolist() == [10, 20, 31, 40]  # highest per row
    # Board grid: row 2 has two cards then -1s.
    grid = obs[0, 23:].reshape(4, 6)
    assert grid[2, :3].tolist() == [30, 31, -1]
    mask = np.asarray(mask)
    assert sorted(np.flatnonzero(mask[0]).tolist()) == [1, 5, 99]
