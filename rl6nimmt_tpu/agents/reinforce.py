"""REINFORCE agents (reference policy.py:15-201), rebuilt on pure JAX.

Two variants with identical update rules but different policy parameterization:

* :class:`MaskedReinforceAgent` -- a 104-logit head over all cards, masked to
  the legal hand before the softmax (policy.py:15-106).
* :class:`BatchedReinforceAgent` -- the "action-in-input" form: one row
  ``[action | state]`` per legal card through a 1-logit net, softmax across
  the legal-action rows (policy.py:109-201).  This is the registry's
  ``"reinforce"``.

Update (both): at episode end, ``loss = -sum_t gamma^t * G_t * log pi(a_t)``
plus ``-entropy_weight * sum_t H_t``, one Adam step (policy.py:79-101).

JAX twist: the reference stores autograd-graph ``log_prob`` tensors during
the episode and backprops through them at episode end.  Here the episode
buffer holds plain arrays (state, legal set, chosen index, reward) and the
loss *recomputes* the log-probs under the current parameters -- bitwise the
same gradient, since the reference's parameters do not change within an
episode, but now the whole update is one fused jit with fixed shapes.

The stored ``reward`` is whatever the session hands over, i.e. the previous
step's reward (the reference reward-lag protocol, play.py:52-71), times
``r_factor``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nets import MLPSpec, mlp_apply, mlp_init, normalize_state
from ..utils.returns import discounted_returns
from ..utils.tpu_ops import onehot_select
from .base import Agent, pad_cards

NEG_INF = -1e9


# ----------------------------------------------------------- pure policy math


def masked_policy_logits(spec: MLPSpec, params, state, legal_mask):
    """Logits over all cards with illegal entries at -inf (masked variant)."""
    x = normalize_state(state)
    (logits,) = mlp_apply(spec, params, x)
    return jnp.where(legal_mask, logits, NEG_INF)


def action_in_input_logits(spec: MLPSpec, params, state, legal_cards):
    """One logit per candidate row ``[action | state]`` (batched variant).

    ``legal_cards`` is ``int32[H]`` padded with -1; padded rows get -inf.
    """
    heads = action_in_input_heads(spec, params, state, legal_cards)
    return jnp.where(legal_cards >= 0, heads[0][:, 0], NEG_INF)


def action_in_input_heads(spec: MLPSpec, params, state, legal_cards):
    """All head outputs for the ``[action | state]`` candidate batch: ``[H, head]``.

    TPU optimization (exact, not approximate): the candidate rows share the
    state and differ only in the leading action feature, and the first layer
    is linear -- so its state contribution is computed ONCE and the per-action
    contribution is a rank-1 add:

        h1[h] = act(norm(state) @ W1[1:] + b1 + norm(a_h) * W1[0])

    This removes the H-fold duplication of the first matmul and never
    materializes the ``[H, 1+S]`` row tensor.  Layers past the first see
    genuinely different activations and run on the ``[H, hidden]`` batch.
    """
    H = legal_cards.shape[0]
    state_norm = normalize_state(state)                     # [S]
    # Action feature normalization: first block of the action=True layout.
    cards = 104  # matches normalize_state default used throughout
    a_norm = -1.0 + 2.0 * legal_cards.astype(jnp.float32) / (cards - 1)

    from ..nets.mlp import _activation, _mm, linear_apply

    act = _activation(spec.activation)
    dtype = spec.compute_dtype
    first = params["trunk"][0]
    w, b = first["w"], first["b"]                           # [1+S, D], [D]
    shared = _mm(state_norm, w[1:], dtype) + b
    h = act(shared[None, :] + a_norm[:, None] * w[0][None, :])  # [H, D]

    for layer in params["trunk"][1:]:
        h = act(linear_apply(layer, h, dtype=dtype))
    return tuple(linear_apply(head, h, dtype=dtype) for head in params["heads"])


def log_probs_and_entropy(logits):
    logp = jax.nn.log_softmax(logits)
    p = jnp.exp(logp)
    entropy = -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1)
    return logp, entropy


# ------------------------------------------------------------------- episodes


def reinforce_loss(
    per_step_logits_fn, params, batch, gamma: float, actor_weight: float, entropy_weight: float
):
    """Episode REINFORCE loss from recomputed log-probs.

    ``batch`` carries per-step arrays with leading time axis T; ``chosen`` is
    the index into the logit vector (card id for the masked variant, hand slot
    for the batched one).
    """
    logits = per_step_logits_fn(params, batch)           # [T, A]
    logp, entropy = log_probs_and_entropy(logits)
    t = jnp.arange(logp.shape[0], dtype=jnp.float32)
    chosen_logp = onehot_select(logp, batch["chosen"])
    returns = discounted_returns(batch["reward"], gamma)
    actor_loss = -jnp.sum(gamma**t * returns * chosen_logp)
    entropy_loss = -jnp.sum(entropy)
    return actor_weight * actor_loss + entropy_weight * entropy_loss, (actor_loss, entropy_loss)


class _ReinforceBase(Agent):
    """Shared forward/learn scaffolding for both REINFORCE variants."""

    def __init__(
        self,
        env=None,
        gamma: float = 0.99,
        optim_kwargs=None,
        history_length=None,
        hidden_sizes: Tuple[int, ...] = (100, 100),
        r_factor: float = 1.0,
        actor_weight: float = 1.0,
        entropy_weight: float = 0.0,
        seed: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(env, gamma, optim_kwargs, history_length, seed=seed)
        self.r_factor = r_factor
        self.actor_weight = actor_weight
        self.entropy_weight = entropy_weight
        self.spec = self._build_spec(tuple(hidden_sizes))
        self.params = self.host_put(mlp_init(self.next_key(), self.spec))
        self._episode = []
        self._train_step = None
        self._rebuild_jit()

    # -- subclass hooks

    def _build_spec(self, hidden_sizes) -> MLPSpec:
        raise NotImplementedError

    _logits_single = None  # subclass: (spec, params, state, aux) -> logits

    def _rebuild_jit(self) -> None:
        spec, fn = self.spec, type(self)._logits_single
        if fn is not None:
            self._logits_fn = jax.jit(lambda params, s, aux: fn(spec, params, s, aux))

    def _make_train_step(self):
        raise NotImplementedError

    def parameters(self):
        return self.params

    def set_parameters(self, params) -> None:
        self.params = params

    def train(self, mode: bool = True) -> None:
        super().train(mode)
        if mode:
            # (Re)build the jitted update around the freshly created optimizer.
            self._train_step = jax.jit(self._make_train_step())

    # -- protocol

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
            return np.zeros(3)

        # numpy batch: placement follows the CPU-committed params.
        batch = {
            k: np.stack([rec[k] for rec in self._episode])
            for k in self._episode[0]
        }
        self.params, self.opt_state, actor_loss, entropy_loss = self._train_step(
            self.params, self.opt_state, batch
        )
        self._episode = []
        return np.asarray([float(actor_loss), 0.0, float(entropy_loss)])


class MaskedReinforceAgent(_ReinforceBase):
    """104-logit masked-softmax REINFORCE (reference policy.py:15-106)."""

    def _build_spec(self, hidden_sizes) -> MLPSpec:
        return MLPSpec(
            input_size=self.state_length, hidden_sizes=hidden_sizes, head_sizes=(self.num_actions,)
        )

    _logits_single = staticmethod(masked_policy_logits)

    def forward(self, state, legal_actions, **kwargs):
        state = np.asarray(state, np.float32)
        mask = np.zeros(self.num_actions, dtype=bool)
        mask[legal_actions] = True
        logits = self._logits_fn(self.params, state, mask)
        action = int(jax.random.categorical(self.next_key(), logits))
        logp, entropy = log_probs_and_entropy(logits)
        info = {
            "log_prob": float(logp[action]),
            "entropy": float(entropy),
            "step_record": {
                "state": np.asarray(state),
                "legal_mask": mask,
                "chosen": np.int32(action),
            },
        }
        return action, info

    def _make_train_step(self):
        spec, gamma = self.spec, self.gamma
        aw, ew = self.actor_weight, self.entropy_weight

        def logits_fn(params, batch):
            return jax.vmap(lambda s, m: masked_policy_logits(spec, params, s, m))(
                batch["state"], batch["legal_mask"]
            )

        def train(params, opt_state, batch):
            (loss, (al, el)), grads = jax.value_and_grad(
                lambda p: reinforce_loss(logits_fn, p, batch, gamma, aw, ew), has_aux=True
            )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, al, el

        return train


class BatchedReinforceAgent(_ReinforceBase):
    """Action-in-input REINFORCE; the registry's ``"reinforce"``."""

    def _build_spec(self, hidden_sizes) -> MLPSpec:
        return MLPSpec(
            input_size=self.state_length + 1, hidden_sizes=hidden_sizes, head_sizes=(1,)
        )

    _logits_single = staticmethod(action_in_input_logits)

    def forward(self, state, legal_actions, **kwargs):
        state = np.asarray(state, np.float32)
        H = self.env_config.hand_size
        padded = pad_cards(legal_actions, H)
        logits = self._logits_fn(self.params, state, padded)
        idx = int(jax.random.categorical(self.next_key(), logits))
        logp, entropy = log_probs_and_entropy(logits)
        action = int(legal_actions[idx])
        info = {
            "log_prob": float(logp[idx]),
            "entropy": float(entropy),
            "step_record": {
                "state": np.asarray(state),
                "legal_cards": padded,
                "chosen": np.int32(idx),
            },
        }
        return action, info

    def _make_train_step(self):
        spec, gamma = self.spec, self.gamma
        aw, ew = self.actor_weight, self.entropy_weight

        def logits_fn(params, batch):
            return jax.vmap(lambda s, c: action_in_input_logits(spec, params, s, c))(
                batch["state"], batch["legal_cards"]
            )

        def train(params, opt_state, batch):
            (loss, (al, el)), grads = jax.value_and_grad(
                lambda p: reinforce_loss(logits_fn, p, batch, gamma, aw, ew), has_aux=True
            )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, al, el

        return train
