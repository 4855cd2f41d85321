"""Golden parity against the ACTUAL reference implementation.

Unlike test_engine_parity.py (which diffs the engine against this repo's
independent NumPy transcription of the rules), these tests load the real
``/root/reference/rl_6_nimmt/env.py`` and play identical games step by step:
same deck (via ``parity.reference_deck``'s RNG-stream replay of the global
``np.random.shuffle`` deal, env.py:99-112), same actions, and assert
bit-exact states, legal hands, rewards, and termination every step.

The reference depends on ``gym`` only for the ``Env`` base class and two
space constructors (env.py:34-38); a minimal stub satisfies that so the
original module runs unmodified.  Skipped when the reference checkout is
absent.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_ENV = "/root/reference/rl_6_nimmt/env.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_ENV), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def ref_module():
    # One COMPLETE shared gym stub (spaces with .n/.shape) for every golden
    # suite, so collection order can never leave a poorer stub installed
    # (the order-dependence VERDICT r4 reproduced).
    from rl6nimmt_tpu.parity.refload import install_stubs

    install_stubs()
    spec = importlib.util.spec_from_file_location("_golden_ref_env", REF_ENV)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _policy(name, picker):
    """Action chooser stressing different rule paths.

    ``lowest`` maximizes undercut-replacement events (cheapest-row picks);
    ``highest`` maximizes row-overflow captures; ``random`` covers the mix.
    """
    if name == "lowest":
        return lambda hand: int(hand[0])
    if name == "highest":
        return lambda hand: int(hand[-1])
    return lambda hand: int(hand[picker.randint(len(hand))])


@pytest.mark.parametrize("policy", ["random", "lowest", "highest"])
@pytest.mark.parametrize("num_players", [2, 4, 6])
@pytest.mark.parametrize("seed", [3, 1234])
def test_full_game_bit_exact_vs_reference(ref_module, num_players, seed, policy):
    from rl6nimmt_tpu.engine import SechsNimmtEnv
    from rl6nimmt_tpu.parity import reference_deck

    deck = reference_deck(seed=seed)
    np.random.seed(seed)
    ref = ref_module.SechsNimmtEnv(num_players)
    ref_states, ref_legal = ref.reset()

    ours = SechsNimmtEnv(num_players, verbose=False)
    our_states, our_legal = ours.reset_with_deck(deck)

    picker = np.random.RandomState(seed + 1)
    choose = _policy(policy, picker)
    done = False
    turn = 0
    while not done:
        np.testing.assert_array_equal(
            np.asarray(our_states), np.asarray(ref_states),
            err_msg=f"states diverged at turn {turn}",
        )
        assert [list(h) for h in our_legal] == [list(h) for h in ref_legal], turn

        actions = [choose(h) for h in ref_legal]
        (ref_states, ref_legal), ref_rewards, ref_done, _ = ref.step(list(actions))
        (our_states, our_legal), our_rewards, our_done, _ = ours.step(list(actions))

        np.testing.assert_array_equal(
            np.asarray(our_rewards), np.asarray(ref_rewards),
            err_msg=f"rewards diverged at turn {turn}",
        )
        assert bool(our_done) == bool(ref_done), turn
        done = ref_done
        turn += 1
    assert turn == 10


def test_reset_to_midgame_matches_reference(ref_module):
    """reset_to parity: seed both envs from the same mid-game position."""
    from rl6nimmt_tpu.engine import SechsNimmtEnv

    board = [[23, 40], [1], [88, 90, 95], [52]]
    hands = [[0, 7, 99], [13, 61, 103]]

    ref = ref_module.SechsNimmtEnv(2)
    ref_states, ref_legal = ref.reset_to([list(r) for r in board], [list(h) for h in hands])
    ours = SechsNimmtEnv(2, verbose=False)
    our_states, our_legal = ours.reset_to(board, hands)

    np.testing.assert_array_equal(np.asarray(our_states), np.asarray(ref_states))
    assert [list(h) for h in our_legal] == [list(h) for h in ref_legal]

    actions = [99, 13]
    (ref_states, _), ref_rewards, _, _ = ref.step(list(actions))
    (our_states, _), our_rewards, _, _ = ours.step(list(actions))
    np.testing.assert_array_equal(np.asarray(our_rewards), np.asarray(ref_rewards))
    np.testing.assert_array_equal(np.asarray(our_states), np.asarray(ref_states))


def test_illegal_move_raises_like_reference(ref_module):
    from rl6nimmt_tpu.engine import SechsNimmtEnv
    from rl6nimmt_tpu.engine.wrapper import InvalidMoveException
    from rl6nimmt_tpu.parity import reference_deck

    deck = reference_deck(seed=99)
    np.random.seed(99)
    ref = ref_module.SechsNimmtEnv(2)
    _, ref_legal = ref.reset()
    ours = SechsNimmtEnv(2, verbose=False)
    _, our_legal = ours.reset_with_deck(deck)

    bad = next(c for c in range(104) if c not in ref_legal[0])
    with pytest.raises(ref_module.InvalidMoveException):
        ref.step([bad, int(ref_legal[1][0])])
    with pytest.raises(InvalidMoveException):
        ours.step([bad, int(our_legal[1][0])])


def _load_ref_prb():
    """Load the reference PriorityReplayBuffer with the numba jit stubbed."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    spec = importlib.util.spec_from_file_location(
        "_golden_ref_rb", "/root/reference/rl_6_nimmt/utils/replay_buffer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not os.path.exists("/root/reference/rl_6_nimmt/utils/replay_buffer.py"),
    reason="reference checkout not mounted",
)
def test_prb_priority_and_weight_math_matches_reference():
    """Same operation sequence -> identical leaf priorities and IS weights.

    The reference tracks priorities in a SumTree addressed by TREE indices
    (leaf = slot + capacity - 1, replay_buffer.py:175-189); ours in a flat
    array addressed by slot.  Both implement store-at-max-priority,
    priority = (min(|err|+eps, 1))^alpha, and IS weight = (p/min_p)^-beta
    with the same beta anneal, so identical stores and updates must produce
    identical leaves, and the reference's sampled IS weights must equal the
    weights our formula assigns to the same slots.
    """
    from rl6nimmt_tpu.buffers.host import HostPriorityBuffer

    rb = _load_ref_prb()
    cap = 64
    ref = rb.PriorityReplayBuffer(max_length=cap)
    ours = HostPriorityBuffer(max_length=cap)

    rng = np.random.RandomState(5)
    for i in range(100):  # wraps the ring once
        ref.store(x=i)
        ours.store(x=i)
        if i % 3 == 2:
            idx = rng.randint(0, min(i + 1, cap), size=4)
            errs = rng.random(4) * 2.0
            # reference batch_update takes TREE ids and mutates errs in place
            ref.batch_update(idx + cap - 1, errs.copy())
            ours.batch_update(idx, errs)

    np.testing.assert_allclose(ours.priorities, ref.tree.tree[-cap:], rtol=1e-12)

    # IS weights: the reference anneals beta at sample() start, then weights
    # w = (p/min_p)^-beta.  Recompute from our flat priorities for the slots
    # the reference actually drew.
    import random as pyrandom

    ref.beta = 0.7
    pyrandom.seed(11)
    ref_idx, ref_w, _ = ref.sample(8)
    slots = np.asarray(ref_idx) - (cap - 1)
    beta = min(1.0, 0.7 + ref.beta_increment)
    total = ours.priorities.sum()
    probs = ours.priorities[slots] / total
    min_prob = ours.priorities.min() / total
    expect_w = np.power(probs / min_prob, -beta)
    np.testing.assert_allclose(np.asarray(ref_w).ravel(), expect_w, rtol=1e-9)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/rl_6_nimmt/utils/replay_buffer.py"),
    reason="reference checkout not mounted",
)
def test_prb_sampling_distribution_matches_reference():
    """Chi-square agreement of sampling frequencies over identical priorities."""
    from rl6nimmt_tpu.buffers.host import HostPriorityBuffer

    rb = _load_ref_prb()
    cap = 32
    ref = rb.PriorityReplayBuffer(max_length=cap)
    ours = HostPriorityBuffer(max_length=cap)
    rng = np.random.RandomState(9)
    errs = rng.random(cap) * 3.0
    for i in range(cap):
        ref.store(x=i)
        ours.store(x=i)
    ref.batch_update(np.arange(cap) + cap - 1, errs.copy())
    ours.batch_update(np.arange(cap), errs)
    np.testing.assert_allclose(ours.priorities, ref.tree.tree[-cap:], rtol=1e-12)

    import random as pyrandom

    pyrandom.seed(3)
    np.random.seed(3)
    draws = 3000
    ref_counts = np.zeros(cap)
    our_counts = np.zeros(cap)
    for _ in range(draws // 10):
        ref_idx, _, _ = ref.sample(10)
        ref_counts[np.asarray(ref_idx) - (cap - 1)] += 1
        idx, _, _ = ours.sample(10)
        our_counts[idx] += 1

    expected = draws * ours.priorities / ours.priorities.sum()
    for counts in (ref_counts, our_counts):
        chi2 = np.sum((counts - expected) ** 2 / np.maximum(expected, 1e-9))
        # dof = 31; 5-sigma-ish bound ~ 80
        assert chi2 < 80, (chi2, counts)


def _load_ref_utils(name):
    spec = importlib.util.spec_from_file_location(
        f"_golden_ref_{name}", f"/root/reference/rl_6_nimmt/utils/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not os.path.exists("/root/reference/rl_6_nimmt/utils/nets.py"),
    reason="reference checkout not mounted",
)
def test_mlp_forward_matches_reference_with_identical_weights():
    """Copy torch MultiHeadedMLP / DuellingDQNNet weights into our param tree
    and compare forwards: same math, torch-vs-XLA agreement to f32 tolerance."""
    import torch

    from rl6nimmt_tpu.nets import MLPSpec, dueling_apply, mlp_apply

    nets = _load_ref_utils("nets")
    torch.manual_seed(0)
    ref = nets.MultiHeadedMLP(
        input_size=48, hidden_sizes=(100, 100), head_sizes=(1, 5),
        activation=torch.nn.ReLU(), head_activations=(None, None),
    )
    spec = MLPSpec(input_size=48, hidden_sizes=(100, 100), head_sizes=(1, 5))

    def grab(linear):
        return {
            "w": np.asarray(linear.weight.detach().numpy().T),
            "b": np.asarray(linear.bias.detach().numpy()),
        }

    trunk = [grab(m) for m in ref.latent_net if isinstance(m, torch.nn.Linear)]
    heads = [grab(h[0]) for h in ref.head_nets]
    params = {"trunk": trunk, "heads": heads}

    x = np.random.RandomState(1).standard_normal((7, 48)).astype(np.float32)
    ref_out = [o.detach().numpy() for o in ref(torch.tensor(x))]
    our_out = [np.asarray(o) for o in mlp_apply(spec, params, x)]
    for r, o in zip(ref_out, our_out):
        np.testing.assert_allclose(o, r, atol=2e-5)

    # Dueling aggregation Q = V + (A - mean A) over a (1, A)-headed MLP.
    torch.manual_seed(2)
    ref_duel = nets.DuellingDQNNet(
        input_size=48, hidden_sizes=(64,), out_size=5, activation=torch.nn.ReLU()
    )
    duel_spec = MLPSpec(input_size=48, hidden_sizes=(64,), head_sizes=(1, 5))
    inner = ref_duel.mlp
    duel_params = {
        "trunk": [grab(m) for m in inner.latent_net if isinstance(m, torch.nn.Linear)],
        "heads": [grab(h[0]) for h in inner.head_nets],
    }
    (ref_q,) = ref_duel(torch.tensor(x))
    our_q = np.asarray(dueling_apply(duel_spec, duel_params, x))
    np.testing.assert_allclose(our_q, ref_q.detach().numpy(), atol=2e-5)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/rl_6_nimmt/utils/preprocessing.py"),
    reason="reference checkout not mounted",
)
def test_state_normalization_matches_reference():
    import torch

    from rl6nimmt_tpu.nets import normalize_state

    pre = _load_ref_utils("preprocessing")
    rng = np.random.RandomState(4)
    # A plausible raw 47-dim state: hand block, num players, summaries, board.
    state = np.concatenate([
        rng.randint(-1, 104, size=10),
        [4],
        rng.randint(1, 6, size=4),
        rng.randint(0, 104, size=4),
        rng.randint(1, 11, size=4),
        rng.randint(-1, 104, size=24),
    ]).astype(np.float32)

    ref_norm = pre.SechsNimmtStateNormalization(action=False)
    ref_out = ref_norm(torch.tensor(state)).numpy()
    our_out = np.asarray(normalize_state(state))
    np.testing.assert_allclose(our_out, ref_out.ravel(), atol=1e-6)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/rl_6_nimmt/utils/various.py"),
    reason="reference checkout not mounted",
)
def test_discounted_returns_match_reference():
    from rl6nimmt_tpu.utils.returns import discounted_returns

    various = _load_ref_utils("various")
    rewards = np.asarray([0.0, -3.0, 0.0, -7.0, 1.5], np.float32)
    ref = various.compute_discounted_returns(rewards, gamma=0.99).numpy()
    ours = np.asarray(discounted_returns(rewards, 0.99))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_install_stubs_upgrades_poor_gym_stub():
    """Regression for the order-dependence VERDICT r4 reproduced: a poorer
    gym stub left by an earlier test file must be REPLACED by the complete
    one (spaces carrying .n/.shape), never silently kept."""
    from rl6nimmt_tpu.parity.refload import install_stubs

    saved = {k: sys.modules.get(k) for k in ("gym", "gym.spaces")}
    try:
        poor = types.ModuleType("gym")  # no spaces, no Env -- worst case
        sys.modules["gym"] = poor
        sys.modules.pop("gym.spaces", None)
        install_stubs()
        gym = sys.modules["gym"]
        assert gym is not poor
        assert gym.spaces.Box(-1, 2, (47,)).shape == (47,)
        assert gym.spaces.Discrete(104).n == 104
        assert isinstance(type("E", (gym.Env,), {})(), gym.Env)
        # Idempotent: a second call keeps OUR stub (class identity stable
        # for anything the reference already bound).
        install_stubs()
        assert sys.modules["gym"] is gym
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
