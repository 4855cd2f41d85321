"""Agent protocol for the interactive (host) game path.

Mirrors the reference's abstract ``Agent``
(/root/reference/rl_6_nimmt/agents/base.py:7-62): an agent exposes

* ``forward(state, legal_actions, **kwargs) -> (action, agent_info)`` -- pick
  a card given the per-player observation and the list of held card ids;
* ``learn(state, reward, action, done, next_state, next_reward, episode_end,
  num_episode, legal_actions, **agent_info)`` -- called once per step by the
  game session, with the *previous* step's reward in ``reward`` and the fresh
  one in ``next_reward`` (the reference's reward-lag protocol, play.py:52-71).

Unlike the reference there is no ``nn.Module`` statefulness: parameters and
optimizer state are explicit pytrees on the instance, updated by jitted pure
functions.  ``train()`` (re)creates the Adam optimizer exactly like the
reference does on every call (base.py:29-33).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.state import EnvConfig

DEFAULT_ENV_CONFIG = EnvConfig(num_players=4)


def pad_cards(legal_actions, width: int) -> "np.ndarray":
    """Legal-card list -> fixed-width int32 vector padded with -1.

    The padding convention shared by every action-in-input agent and the
    search agents' step records (pad value -1 marks illegal slots).
    """
    import numpy as np

    padded = np.full(width, -1, dtype=np.int32)
    padded[: len(legal_actions)] = legal_actions
    return padded


class Agent:
    """Base class for host-path agents."""

    def __init__(
        self,
        env: Optional[EnvConfig] = None,
        gamma: float = 0.99,
        optim_kwargs: Optional[dict] = None,
        history_length: Optional[int] = None,
        seed: Optional[int] = None,
    ):
        self.env_config = env if env is not None else DEFAULT_ENV_CONFIG
        self.gamma = gamma
        self.state_length = self.env_config.state_length
        self.num_actions = self.env_config.num_actions
        self.optim_kwargs = dict(optim_kwargs or {})
        self.history_length = history_length
        self.optimizer = None
        self.opt_state = None
        self.training = False
        self._rng = jax.random.key(np.random.randint(0, 2**31 - 1) if seed is None else seed)

        # Host-path inference device: the interactive protocol issues one tiny
        # net call per decision; on a remote accelerator each such call pays a
        # full dispatch round trip, so host agents pin their parameters (and
        # thus their jitted computations) to the local CPU.  The vectorized
        # runtime never touches these objects; search agents re-stage their
        # params onto the accelerator for batched playouts (mcs.py).
        try:
            self._host_device = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            self._host_device = None
        if self._host_device is not None:
            self._rng = jax.device_put(self._rng, self._host_device)

    def host_put(self, tree):
        """Pin a pytree to the host inference device (no-op without one)."""
        if self._host_device is None:
            return tree
        return jax.device_put(tree, self._host_device)

    # ---------------------------------------------------- (de)serialization
    #
    # Agents are picklable: jitted callables and the optax optimizer are
    # dropped on pickle and rebuilt on load.  This replaces the reference's
    # torch.save/torch.load round trip through "temp_model.pt"
    # (tournament.py:54-60) -- cloning is an in-memory pickle cycle, and the
    # same path serves checkpointing.

    TRANSIENT_ATTRS = (
        "optimizer",
        "_train_step",
        "_learn_step",
        "_q_fn",
        "_heads_fn",
        "_logits_fn",
        "_root_fn",
        "_pv_fn",
        "_host_device",
        "_accel_params_cache",
    )

    def __getstate__(self):
        state = {k: v for k, v in self.__dict__.items() if k not in self.TRANSIENT_ATTRS}
        state["_rng"] = np.asarray(jax.random.key_data(state["_rng"]))
        return state

    def __setstate__(self, state):
        state = dict(state)
        state["_rng"] = jax.random.wrap_key_data(jnp.asarray(state["_rng"]))
        self.__dict__.update(state)
        for attr in self.TRANSIENT_ATTRS:
            if attr not in self.__dict__:
                self.__dict__[attr] = None
        try:
            self._host_device = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            self._host_device = None
        if self._host_device is not None:
            self._rng = jax.device_put(self._rng, self._host_device)
            if self.__dict__.get("params") is not None:
                self.params = jax.device_put(self.params, self._host_device)
        saved_opt_state = self.__dict__.get("opt_state")
        if self.training:
            self.train(True)
            if saved_opt_state is not None:
                self.opt_state = saved_opt_state  # keep Adam moments across clone
        self._rebuild_jit()

    def _rebuild_jit(self) -> None:
        """Hook for subclasses to rebuild non-training jitted callables."""

    def clone(self) -> "Agent":
        import pickle

        return pickle.loads(pickle.dumps(self))

    # --------------------------------------------------------------- plumbing

    def next_key(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def parameters(self):
        """The trainable parameter pytree (None for learning-free agents)."""
        return None

    def set_parameters(self, params) -> None:
        raise NotImplementedError(f"{type(self).__name__} has no parameters")

    def train(self, mode: bool = True) -> None:
        """Enter/leave training mode; (re)creates Adam like the reference."""
        self.training = mode
        if mode and self.parameters() is not None:
            lr = self.optim_kwargs.get("lr", 1e-3)  # torch.optim.Adam default
            self.optimizer = optax.adam(
                lr,
                b1=self.optim_kwargs.get("betas", (0.9, 0.999))[0],
                b2=self.optim_kwargs.get("betas", (0.9, 0.999))[1],
                eps=self.optim_kwargs.get("eps", 1e-8),
            )
            self.opt_state = self.optimizer.init(self.parameters())

    def eval(self) -> None:
        self.train(mode=False)

    def __call__(self, state, legal_actions, **kwargs):
        return self.forward(state, legal_actions, **kwargs)

    # ------------------------------------------------------------- interface

    def forward(self, state, legal_actions, **kwargs):
        raise NotImplementedError

    def learn(
        self,
        state,
        reward,
        action,
        done,
        next_state,
        next_reward,
        episode_end,
        num_episode,
        legal_actions,
        **kwargs,
    ):
        raise NotImplementedError
