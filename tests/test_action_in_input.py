"""The fused action-in-input forward must equal the naive row construction."""

import jax
import jax.numpy as jnp
import numpy as np

from rl6nimmt_tpu.agents.reinforce import action_in_input_heads, action_in_input_logits
from rl6nimmt_tpu.nets import MLPSpec, mlp_apply, mlp_init, normalize_state


def naive_heads(spec, params, state, legal_cards):
    H = legal_cards.shape[0]
    rows = jnp.concatenate(
        [legal_cards[:, None].astype(jnp.float32), jnp.broadcast_to(state, (H,) + state.shape)],
        axis=1,
    )
    return mlp_apply(spec, params, normalize_state(rows, action=True))


def test_fused_equals_naive_single_head():
    spec = MLPSpec(input_size=48, hidden_sizes=(100, 100), head_sizes=(1,))
    params = mlp_init(jax.random.key(0), spec)
    state = jax.random.uniform(jax.random.key(1), (47,)) * 100
    cards = jnp.asarray([3, 17, 55, 99, -1, -1, -1, -1, -1, -1], jnp.int32)

    (naive,) = naive_heads(spec, params, state, cards)
    (fused,) = action_in_input_heads(spec, params, state, cards)
    # Padded rows diverge (naive feeds -1 through the net; fused feeds its own
    # -1 encoding) but callers mask them; compare valid slots only.
    np.testing.assert_allclose(
        np.asarray(naive[:4, 0]), np.asarray(fused[:4, 0]), rtol=1e-4, atol=1e-4
    )

    logits = action_in_input_logits(spec, params, state, cards)
    assert np.asarray(logits[4:]).max() < -1e8  # pads masked to -inf


def test_fused_equals_naive_two_heads():
    spec = MLPSpec(input_size=48, hidden_sizes=(64,), head_sizes=(1, 1))
    params = mlp_init(jax.random.key(2), spec)
    state = jax.random.uniform(jax.random.key(3), (47,)) * 50
    cards = jnp.asarray([0, 50, 103, -1, -1, -1, -1, -1, -1, -1], jnp.int32)

    n_pi, n_q = naive_heads(spec, params, state, cards)
    f_pi, f_q = action_in_input_heads(spec, params, state, cards)
    np.testing.assert_allclose(np.asarray(n_pi[:3]), np.asarray(f_pi[:3]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(n_q[:3]), np.asarray(f_q[:3]), rtol=1e-4, atol=1e-4)


def test_gradients_flow_through_fused_path():
    spec = MLPSpec(input_size=48, hidden_sizes=(32,), head_sizes=(1,))
    params = mlp_init(jax.random.key(4), spec)
    state = jnp.ones(47)
    cards = jnp.asarray([1, 2, 3, -1, -1, -1, -1, -1, -1, -1], jnp.int32)

    def loss(p):
        logits = action_in_input_logits(spec, p, state, cards)
        return -jax.nn.log_softmax(logits)[0]

    grads = jax.grad(loss)(params)
    assert any(float(jnp.abs(g).sum()) > 0 for g in jax.tree.leaves(grads))
