"""The DQN family as one configurable learner.

The reference builds an 11-class lattice by MRO mixin composition
(/root/reference/rl_6_nimmt/agents/dqn.py): vanilla / double / dueling /
n-step / prioritized-replay / noisy-nets, culminating in the tournament's
flagship ``Noisy_D3QN_PRB_NStep``.  Here the lattice is a single agent driven
by :class:`DQNConfig` feature flags -- every reference class maps to a config
(see :data:`DQN_VARIANTS` and the named constructors at the bottom), and the
whole Bellman update is one fused jitted step.

Behavioral parity notes (reference citations):

* epsilon schedule ``max(exp(-0.0025 * episode), 0.05)`` refreshed in
  ``learn`` (dqn.py:34-39, 92); noisy variants act by pure argmax instead
  (dqn.py:251-261).
* illegal actions are masked to -1e8 only at act time; the Bellman max runs
  over all 104 actions, exactly like the reference (dqn.py:182-194).
* the stored ``reward`` is the session's lagged reward (play.py:52-71).
* n-step aggregation keeps the popped step's ``done`` flag and flushes the
  episode tail with ``done=True`` (dqn.py:270-301).
* double-DQN soft-updates the target net every ``retrain_interval`` learn
  steps with ``tau = 1e-2`` (dqn.py:304-353).
* PER uses IS-weighted squared error and writes back ``|q_eval - q_target|``
  (dqn.py:356-379).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..buffers.host import HostHistory, HostPriorityBuffer
from ..utils.tpu_ops import onehot_select
from ..nets import MLPSpec, dueling_apply, mlp_apply, mlp_init
from .base import Agent

MASK_VALUE = -1e8


def eps_func_decay(episode: int) -> float:
    """Exponential epsilon decay with floor 0.05 (reference dqn.py:34-39)."""
    return max(math.exp(-0.0025 * episode), 0.05)


@dataclass(frozen=True)
class DQNConfig:
    """Feature flags spanning the reference's class lattice."""

    double: bool = False          # target net + double-DQN bootstrap
    dueling: bool = False         # Q = V + (A - mean A) head
    noisy: bool = False           # factorized noisy linears, argmax action
    per: bool = False             # prioritized replay + IS weights
    n_steps: int = 1              # n-step returns
    hidden_sizes: Tuple[int, ...] = (64,)
    minibatch: int = 64
    tau: float = 1e-2
    retrain_interval: int = 4
    noisy_init_sigma: float = 0.5


def q_network_spec(cfg: DQNConfig, state_length: int, num_actions: int) -> MLPSpec:
    head_sizes = (1, num_actions) if cfg.dueling else (num_actions,)
    return MLPSpec(
        input_size=state_length,
        hidden_sizes=cfg.hidden_sizes,
        head_sizes=head_sizes,
        noisy=cfg.noisy,
        sigma_init=cfg.noisy_init_sigma,
    )


def q_values(cfg: DQNConfig, spec: MLPSpec, params, states, key=None, noise=None):
    """Q(s, .) for a batch of states; raw states (the reference DQNs do not
    normalize their inputs, dqn.py:219-230).

    ``noise`` passes precomputed factorized noise (``nets.draw_mlp_noise``) --
    bit-identical to drawing from the key it was derived from, but off the
    caller's critical path (the vectorized runtime batches all turn/update
    draws into one pass).
    """
    if cfg.dueling:
        return dueling_apply(spec, params, states, key, noise=noise)
    (q,) = mlp_apply(spec, params, states, key, noise=noise)
    return q


def make_learn_step(
    cfg: DQNConfig, spec: MLPSpec, optimizer, gamma: float, axis_name=None
):
    """Build the fused jitted Bellman update.

    Signature: ``(params, target_params, opt_state, batch, do_soft_update,
    key) -> (params, target_params, opt_state, loss, abs_err, q_target)``
    where batch holds ``state/action/reward/next_state/done/weights`` with
    leading minibatch axis.  ``target_params`` is ignored for single-net
    configs.  ``q_target`` is the Bellman target vector (host observability:
    the reference logs ``q_target.max()`` as ``debug/bellman_target``,
    dqn.py:134-135).

    With ``axis_name`` set (for use under ``shard_map``), gradients and the
    loss are ``lax.pmean``-reduced over that mesh axis *before* the optimizer
    update -- true synchronous data parallelism: every device applies the
    gradient of the concatenated global minibatch (per-device minibatches of
    equal size), so replicated params/opt-state stay bit-identical without
    any post-hoc averaging.  ``abs_err`` stays local (it feeds the device's
    own PER priorities).  The returned function is then *not* jitted.
    """

    def bellman_target(params, target_params, batch, key, noise):
        r = batch["reward"]
        not_done = 1.0 - batch["done"]
        if cfg.double:
            k1, k2 = (jax.random.split(key) if key is not None else (None, None))
            n1, n2 = (noise if noise is not None else (None, None))
            q_local = q_values(cfg, spec, params, batch["next_state"], k1, noise=n1)
            q_target = q_values(cfg, spec, target_params, batch["next_state"], k2, noise=n2)
            idx = jnp.argmax(q_local, axis=-1)
            bootstrap = onehot_select(q_target, idx)  # gather-free on TPU
        else:
            n1 = noise[0] if noise is not None else None
            q_next = q_values(cfg, spec, params, batch["next_state"], key, noise=n1)
            bootstrap = jnp.max(q_next, axis=-1)
        return r + (gamma**cfg.n_steps) * bootstrap * not_done

    def loss_fn(params, target_params, batch, key_eval, key_tgt, noise_eval, noise_tgt):
        q = q_values(cfg, spec, params, batch["state"], key_eval, noise=noise_eval)
        q_eval = onehot_select(q, batch["action"])
        q_target = jax.lax.stop_gradient(
            bellman_target(params, target_params, batch, key_tgt, noise_tgt)
        )
        err = q_eval - q_target
        if cfg.per:
            loss = jnp.mean(batch["weights"] * err**2)
        else:
            loss = jnp.mean(err**2)
        return loss, (jnp.abs(err), q_target)

    def learn_step(params, target_params, opt_state, batch, do_soft_update, key, noise=None):
        # ``noise``: optional precomputed (noise_eval, noise_tgt) replacing
        # the in-step key-derived draws bit-for-bit (see learn_noise below).
        if cfg.noisy and noise is not None:
            key_eval = key_tgt = None
            noise_eval, noise_tgt = noise
        elif cfg.noisy:
            key_eval, key_tgt = jax.random.split(key)
            noise_eval = noise_tgt = None
        else:
            key_eval = key_tgt = None
            noise_eval = noise_tgt = None
        (loss, (abs_err, q_target)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, target_params, batch, key_eval, key_tgt, noise_eval, noise_tgt
        )
        if axis_name is not None:
            # ONE fused collective per update (VERDICT r3 #2): the gradient
            # tree and the scalar loss ride a single raveled all-reduce
            # instead of one tiny pmean per leaf (12+ for the noisy dueling
            # net, ~100 sequential sub-KB all-reduces per 8-update cycle).
            from ..utils.tpu_ops import pmean_fused

            grads, loss = pmean_fused((grads, loss), axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if cfg.double:
            tau = jnp.where(do_soft_update, cfg.tau, 0.0)
            target_params = jax.tree.map(
                lambda t, l: tau * l + (1.0 - tau) * t, target_params, params
            )
        return params, target_params, opt_state, loss, abs_err, q_target

    return learn_step if axis_name is not None else jax.jit(learn_step)


def learn_noise(cfg: DQNConfig, spec: MLPSpec, key):
    """Precompute the noise ``make_learn_step`` would draw from ``key``.

    Exactly mirrors the in-step derivation (split into eval/target keys,
    double-DQN splits the target key again), so passing the result as the
    step's ``noise`` argument is bit-identical to passing ``key``.  Vmap over
    stacked keys to batch all of a cycle's update draws into one pass.
    """
    from ..nets import draw_mlp_noise

    key_eval, key_tgt = jax.random.split(key)
    noise_eval = draw_mlp_noise(spec, key_eval)
    if cfg.double:
        k1, k2 = jax.random.split(key_tgt)
        noise_tgt = (draw_mlp_noise(spec, k1), draw_mlp_noise(spec, k2))
    else:
        noise_tgt = (draw_mlp_noise(spec, key_tgt),)
    return noise_eval, noise_tgt


class DQNAgent(Agent):
    """Configurable deep Q-learner covering the reference lattice."""

    dqn_config: DQNConfig = DQNConfig()

    def __init__(
        self,
        env=None,
        gamma: float = 0.99,
        optim_kwargs=None,
        history_length: Optional[int] = None,
        hidden_sizes: Optional[Tuple[int, ...]] = None,
        n_steps: Optional[int] = None,
        eps_func=None,
        minibatch: Optional[int] = None,
        seed: Optional[int] = None,
        summary_writer=None,
        **kwargs,
    ):
        super().__init__(env, gamma, optim_kwargs, history_length, seed=seed)
        cfg = self.dqn_config
        if hidden_sizes is not None:
            cfg = replace(cfg, hidden_sizes=tuple(hidden_sizes))
        if n_steps is not None:
            cfg = replace(cfg, n_steps=int(n_steps))
        if minibatch is not None:
            cfg = replace(cfg, minibatch=int(minibatch))
        self.cfg = cfg
        self.summary_writer = summary_writer

        self.spec = q_network_spec(cfg, self.state_length, self.num_actions)
        self.params = self.host_put(mlp_init(self.next_key(), self.spec))
        # Hard-copy target at init (reference soft_update(tau=1), dqn.py:321).
        self.target_params = jax.tree.map(jnp.copy, self.params) if cfg.double else None

        self.eps_func = eps_func or eps_func_decay
        self.eps = 0.0
        self.step = 0
        self._n_step_buffer = []
        if cfg.per:
            self.history = HostPriorityBuffer(history_length or 100_000)
        else:
            self.history = HostHistory(history_length)
        self._learn_step = None
        self._rebuild_jit()

    # ------------------------------------------------------------- plumbing

    def _rebuild_jit(self) -> None:
        cfg, spec = self.cfg, self.spec
        self._q_fn = jax.jit(lambda params, s, key: q_values(cfg, spec, params, s, key))
        if self.training and self.optimizer is not None:
            self._learn_step = make_learn_step(cfg, spec, self.optimizer, self.gamma)

    def parameters(self):
        return self.params

    def set_parameters(self, params) -> None:
        self.params = params
        if self.cfg.double:
            self.target_params = jax.tree.map(jnp.copy, params)

    def train(self, mode: bool = True) -> None:
        super().train(mode)
        self.eps = self.eps_func(0)
        if mode:
            self._learn_step = make_learn_step(self.cfg, self.spec, self.optimizer, self.gamma)

    # ------------------------------------------------------------------ act

    def forward(self, state, legal_actions=None, **kwargs):
        # NOTE host path: pass plain numpy into the jitted fn.  Params are
        # CPU-committed, so placement follows them; an eager jnp.asarray here
        # would stage the input onto the default (possibly remote) device and
        # cost a tunnel round trip per decision.
        state = np.asarray(state, np.float32)
        key = self.next_key() if self.cfg.noisy else None
        scores = np.array(self._q_fn(self.params, state[None], key)[0])

        if self.cfg.noisy:
            # Pure argmax over the legal subset (reference dqn.py:251-261).
            if legal_actions:
                sub = scores[legal_actions]
                pick = int(np.argmax(sub))
                return int(legal_actions[pick]), {"value": float(sub[pick])}
            return int(np.argmax(scores)), {"value": float(np.max(scores))}

        # Epsilon-greedy with -1e8 masking (reference dqn.py:196-217).
        if legal_actions:
            illegal = np.setdiff1d(np.arange(self.num_actions), legal_actions)
            scores[illegal] = MASK_VALUE
        if np.random.random() > self.eps:
            action = int(np.argmax(scores))
            value = float(np.max(scores))
        else:
            action = int(np.random.choice(legal_actions if legal_actions else self.num_actions))
            value = -1.0
        return action, {"value": value, "eps": self.eps}

    # ---------------------------------------------------------------- learn

    def learn(
        self, state, reward, action, done, next_state, next_reward, episode_end, num_episode,
        legal_actions=None, **kwargs,
    ):
        self.step += 1
        self.eps = self.eps_func(num_episode)
        loss = 0.0

        # Reference's TensorBoard hook: eps once per episode (dqn.py:97-98).
        if self.summary_writer is not None and episode_end:
            self.summary_writer.add_scalar("debug/eps", self.eps, num_episode)

        self._store(
            state=np.asarray(state, np.float32),
            reward=float(reward),
            action=int(action),
            next_state=np.asarray(next_state, np.float32),
            done=bool(done),
        )

        if len(self.history) > self.cfg.minibatch and self.training:
            loss = self._learn(num_episode, episode_end)

        if done:
            self._finish_episode()
        return np.asarray([loss])

    def _store(self, **experience) -> None:
        cfg = self.cfg
        if cfg.n_steps <= 1:
            self.history.store(**experience)
            return
        self._n_step_buffer.append(experience)
        if len(self._n_step_buffer) < cfg.n_steps:
            return
        R = sum(
            self._n_step_buffer[i]["reward"] * (self.gamma**i) for i in range(cfg.n_steps)
        )
        head = self._n_step_buffer.pop(0)
        head["reward"] = R
        head["next_state"] = experience["next_state"]
        self.history.store(**head)

    def _finish_episode(self) -> None:
        # Flush the n-step tail with done=True (reference dqn.py:288-301).
        if not self._n_step_buffer:
            return
        last = self._n_step_buffer[-1]
        while self._n_step_buffer:
            R = sum(
                self._n_step_buffer[i]["reward"] * (self.gamma**i)
                for i in range(len(self._n_step_buffer))
            )
            head = self._n_step_buffer.pop(0)
            head["reward"] = R
            head["next_state"] = last["next_state"]
            head["done"] = True
            self.history.store(**head)

    def _learn(self, num_episode: int = 0, episode_end: bool = False) -> float:
        idx, weights, raw = self.history.sample(self.cfg.minibatch)
        # numpy minibatch: placement follows the CPU-committed params (see
        # forward's host-path note).
        batch = {
            "state": np.stack(raw["state"]),
            "action": np.asarray(raw["action"], np.int32),
            "reward": np.asarray(raw["reward"], np.float32),
            "next_state": np.stack(raw["next_state"]),
            "done": np.asarray(raw["done"], np.float32),
            "weights": (
                np.asarray(weights, np.float32)
                if weights is not None
                else np.ones(self.cfg.minibatch, np.float32)
            ),
        }
        do_soft = (self.step % self.cfg.retrain_interval) == 0
        (
            self.params, self.target_params, self.opt_state, loss, abs_err, q_target,
        ) = self._learn_step(
            self.params, self.target_params, self.opt_state, batch, do_soft, self.next_key()
        )
        # Reference's TensorBoard hook: max Bellman target every 10th episode
        # (dqn.py:134-135).
        if self.summary_writer is not None and episode_end and num_episode % 10 == 0:
            self.summary_writer.add_scalar(
                "debug/bellman_target", float(jnp.max(q_target)), num_episode
            )
        if self.cfg.per:
            self.history.batch_update(idx, np.asarray(abs_err))
        return float(loss)


# ------------------------------------------------- reference class lattice


def _variant(name: str, **flags) -> type:
    return type(name, (DQNAgent,), {"dqn_config": DQNConfig(**flags)})


DQNVanilla = _variant("DQNVanilla")
Noisy_DQN = _variant("Noisy_DQN", noisy=True)
# NOTE: the "NStep" classes default to n_steps=1 EXACTLY like the reference
# (ref dqn.py:45); they are only n-step when constructed with n_steps=N (the
# notebook's flagship uses n_steps=10, simple_tournament cell 3).  Pinned by
# tests/test_buffers.py::test_nstep_named_classes_default_to_vanilla_like_reference.
DQN_NStep_Agent = _variant("DQN_NStep_Agent")          # n_steps set via kwarg
DDQNAgent = _variant("DDQNAgent", double=True)
DQN_PRBAgent = _variant("DQN_PRBAgent", per=True)
DuellingDQNAgent = _variant("DuellingDQNAgent", dueling=True)
DuellingDDQNAgent = _variant("DuellingDDQNAgent", double=True, dueling=True)
Noisy_D3QN = _variant("Noisy_D3QN", double=True, dueling=True, noisy=True)
DDQN_PRBAgent = _variant("DDQN_PRBAgent", double=True, per=True)
DuellingDDQN_PRBAgent = _variant("DuellingDDQN_PRBAgent", double=True, dueling=True, per=True)
D3QN_PRB_NStep = _variant("D3QN_PRB_NStep", double=True, dueling=True, per=True)
Noisy_D3QN_PRB_NStep = _variant(
    "Noisy_D3QN_PRB_NStep", double=True, dueling=True, per=True, noisy=True
)

DQN_VARIANTS = {
    "dqn": DQNVanilla,
    "noisy_dqn": Noisy_DQN,
    "dqn_nstep": DQN_NStep_Agent,
    "ddqn": DDQNAgent,
    "dqn_prb": DQN_PRBAgent,
    "duelling_dqn": DuellingDQNAgent,
    "duelling_ddqn": DuellingDDQNAgent,
    "noisy_d3qn": Noisy_D3QN,
    "ddqn_prb": DDQN_PRBAgent,
    "duelling_ddqn_prb": DuellingDDQN_PRBAgent,
    "d3qn_prb_nstep": D3QN_PRB_NStep,
    "noisy_d3qn_prb_nstep": Noisy_D3QN_PRB_NStep,
}
