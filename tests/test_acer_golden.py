"""Golden ACER: our update vs the ACTUAL reference ``BatchedACERAgent._train``.

Loads the real ``/root/reference/rl_6_nimmt/agents/actor_critic.py`` (with
import stubs for gym / numba / matplotlib / multi_elo -- none touch the math),
copies the torch MLP weights into our param tree, replays ONE identical
recorded experience stream through both agents' ``learn`` (same states,
legal hands, behavior log-probs, action ids, rewards, done flags; mixed
episode lengths so sequences of 10/7/4 steps land in the buffer), then
compares ``_train`` loss triples:

* on-policy (latest sequence; the retrace recursion + truncated-IS actor
  term + bias correction + SmoothL1 critic, actor_critic.py:152-207), and
* off-policy over a pinned 3-sequence minibatch -- the reference flattens
  the sequences into ONE stream with ``first``-flag re-initialization
  (actor_critic.py:195-207); ours is a padded [B, T] batch with a
  per-sequence reverse scan.  Equal losses on mixed-length streams prove the
  layouts equivalent.
"""

import os
import sys

import numpy as np
import pytest

REF_AC = "/root/reference/rl_6_nimmt/agents/actor_critic.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_AC), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def ref_pkg():
    # The one COMPLETE shared stub set (gym spaces with .n/.shape, numba
    # passthrough, vendored multi_elo) -- order-independent with every other
    # golden suite (matplotlib is real in this image; no stub needed).
    from rl6nimmt_tpu.parity.refload import install_stubs

    install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import rl_6_nimmt.agents.actor_critic as ref_ac
    from rl_6_nimmt.env import SechsNimmtEnv as RefEnv

    return ref_ac, RefEnv


def make_stream(episode_lengths, seed=0):
    """A recorded experience stream both agents consume identically."""
    rng = np.random.RandomState(seed)
    stream = []
    for L in episode_lengths:
        for t in range(L):
            n_cards = 10 - t
            hand = sorted(rng.choice(104, size=n_cards, replace=False).tolist())
            state = rng.uniform(-1, 104, size=47).astype(np.float32)
            logits = rng.randn(n_cards).astype(np.float32)
            logp = logits - np.log(np.exp(logits).sum())
            log_probs = np.full(10, -20.0, np.float32)
            log_probs[:n_cards] = np.maximum(logp, -20.0)
            action_id = int(rng.randint(n_cards))
            stream.append(
                dict(
                    state=state,
                    legal_actions=[int(c) for c in hand],
                    log_probs=log_probs,
                    action_id=action_id,
                    reward=float(rng.randint(-10, 0)),       # lagged (unused)
                    next_reward=float(rng.randint(-10, 0)),
                    done=(t == L - 1),
                )
            )
    return stream


def grab(linear):
    return {
        "w": np.asarray(linear.weight.detach().numpy().T),
        "b": np.asarray(linear.bias.detach().numpy()),
    }


def test_acer_train_matches_reference_on_recorded_stream(ref_pkg):
    import torch

    from rl6nimmt_tpu.agents import BatchedACERAgent as OurACER

    ref_ac, RefEnv = ref_pkg
    torch.manual_seed(3)
    ref = ref_ac.BatchedACERAgent(
        env=RefEnv(num_players=4), warmup=10**9, minibatch=3,
        optim_kwargs=dict(lr=0.0),
    )
    ref.train()

    ours = OurACER(seed=1, warmup=10**9, minibatch=3, optim_kwargs={"lr": 0.0})
    ours.train()
    ours.params = {
        "trunk": [m for m in (grab(l) for l in ref.actor_critic.latent_net
                              if isinstance(l, torch.nn.Linear))],
        "heads": [grab(h[0]) for h in ref.actor_critic.head_nets],
    }

    # Replay the identical stream through both learn() paths.
    for rec in make_stream([10, 7, 10, 4]):
        ref.learn(
            state=torch.tensor(rec["state"]),
            reward=rec["reward"],
            action=rec["legal_actions"][rec["action_id"]],
            done=rec["done"],
            next_state=torch.tensor(rec["state"]),
            next_reward=rec["next_reward"],
            episode_end=rec["done"],
            num_episode=0,
            legal_actions=rec["legal_actions"],
            log_probs=torch.tensor(rec["log_probs"]),
            action_id=rec["action_id"],
        )
        ours.learn(
            state=rec["state"],
            reward=rec["reward"],
            action=rec["legal_actions"][rec["action_id"]],
            done=rec["done"],
            next_state=rec["state"],
            next_reward=rec["next_reward"],
            episode_end=rec["done"],
            num_episode=0,
            legal_actions=rec["legal_actions"],
            log_probs=rec["log_probs"],
            action_id=rec["action_id"],
        )

    assert len(ref.history) == 4 and len(ours.history) == 4
    # Identical first-flag layout in the stored sequences.
    ref_firsts = [rec["first"] for rec in ref.history.memories[:4]]
    our_firsts = [rec["first"] for rec in ours.history._records]
    assert ref_firsts == our_firsts

    # On-policy: the latest flushed sequence (length 4).
    ref_on = ref._train(on_policy=True)
    our_on = ours._train(on_policy=True)
    np.testing.assert_allclose(our_on, ref_on, rtol=2e-4, atol=1e-5)

    # Off-policy: pin both samplers to the first three sequences (10/7/10
    # steps) -- the flattened stream crosses two first-flag boundaries.
    ref.history.sample = lambda n: (
        None, None,
        {k: [rec[k] for rec in ref.history.memories[:3]]
         for k in ref.history.memories[0]},
    )
    ours.history.sample = lambda n: (
        None, None, ours.history._collate(ours.history._records[:3])
    )
    ref_off = ref._train(on_policy=False)
    our_off = ours._train(on_policy=False)
    np.testing.assert_allclose(our_off, ref_off, rtol=2e-4, atol=1e-5)


def test_host_sequential_history_matches_reference_layout(ref_pkg):
    """Buffer-level twin check: same records, same nesting, same first flags,
    same flush cadence, for arbitrary fields."""
    import torch

    ref_ac, _ = ref_pkg
    from rl_6_nimmt.utils.replay_buffer import SequentialHistory

    from rl6nimmt_tpu.buffers.host import HostSequentialHistory

    ref_buf = SequentialHistory(max_length=8)
    our_buf = HostSequentialHistory(max_length=8)
    rng = np.random.RandomState(7)
    for seq_len in (3, 1, 5):
        for t in range(seq_len):
            x = float(rng.randn())
            ref_buf.store(x=x, t=t)
            our_buf.store(x=x, t=t)
            assert ref_buf.current_sequence_length() == our_buf.current_sequence_length()
        ref_buf.flush()
        our_buf.flush()
    assert len(ref_buf) == len(our_buf) == 3
    for i in range(3):
        ref_rec = ref_buf.memories[i]
        our_rec = our_buf._records[i]
        assert set(ref_rec) == set(our_rec)
        for k in ref_rec:
            assert list(ref_rec[k]) == list(our_rec[k]), k
    # rollout(n=1) returns the latest sequence in both.
    assert ref_buf.rollout(n=1)["t"] == our_buf.rollout(n=1)["t"]
