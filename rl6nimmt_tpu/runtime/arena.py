"""Device arena: heterogeneous-policy matchups, thousands of games at a time.

The reference evaluates matchups one hosted game at a time (GameSession in a
Python loop, tournament.py:132-138).  For *device-representable* agents --
random, REINFORCE, ACER, any DQN-lattice member -- the whole matchup can run
on device instead: each seat is driven by its own policy inside one jitted
program, G games in lockstep.  This powers fast baseline evaluation and ELO
estimation between learned agents (search and human agents still go through
the host GameSession).

Acting rules mirror each agent family's ``forward``:

* ``random`` -- uniform over the hand (random.py:5-13);
* ``policy`` -- sample from the action-in-input softmax (REINFORCE forward,
  policy.py:137-156; ACER uses the same actor head, a-c.py:49-57);
* ``dqn`` -- epsilon-greedy masked argmax, or pure noisy argmax for noisy
  configs (dqn.py:196-230, 251-261).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..agents.dqn import DQNAgent, DQNConfig, q_values
from ..agents.reinforce import action_in_input_logits
from ..engine.env import deal, observe, step
from ..engine.state import EnvConfig
from ..utils.tpu_ops import onehot_select, uniform_index

NEG_INF = -1e9


class SeatPolicy(NamedTuple):
    """Static per-seat policy description (hashable; params passed at call).

    Epsilon for non-noisy dqn seats is deliberately NOT part of this static
    description: it decays during training, and baking it into the compile
    cache key would recompile (and permanently cache) a new arena program per
    distinct value.  It flows into the compiled program as a traced argument.
    """

    kind: str                      # "random" | "policy" | "dqn"
    spec: object = None            # MLPSpec for nets
    dqn_cfg: Optional[DQNConfig] = None


def _seat_actions(policy: SeatPolicy, params, eps, obs, hands_sorted, masks, key):
    """Actions for one seat across all games: ``[G]``."""
    if policy.kind == "random":
        count = jnp.sum(hands_sorted >= 0, axis=-1)
        r = uniform_index(key, count)
        return onehot_select(hands_sorted, r).astype(jnp.int32)

    if policy.kind == "policy":
        logits = jax.vmap(
            lambda o, h: action_in_input_logits(policy.spec, params, o, h)
        )(obs, hands_sorted)
        idx = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
        return onehot_select(hands_sorted, idx).astype(jnp.int32)

    if policy.kind == "dqn":
        cfg = policy.dqn_cfg
        noise_key, eps_key, rand_key = jax.random.split(key, 3)
        q = q_values(cfg, policy.spec, params, obs, noise_key if cfg.noisy else None)
        greedy = jnp.argmax(jnp.where(masks, q, NEG_INF), axis=-1).astype(jnp.int32)
        if cfg.noisy:
            return greedy
        count = jnp.sum(hands_sorted >= 0, axis=-1)
        r = uniform_index(rand_key, count)
        uniform = onehot_select(hands_sorted, r).astype(jnp.int32)
        explore = jax.random.uniform(eps_key, greedy.shape) < eps  # traced
        return jnp.where(explore, uniform, greedy)

    raise ValueError(f"unknown seat policy kind: {policy.kind}")


@functools.lru_cache(maxsize=None)
def make_arena(cfg: EnvConfig, policies: Tuple[SeatPolicy, ...], num_games: int):
    """Compile ``(params_per_seat, key) -> scores int32[G, P]`` (total rewards).

    ``policies`` must have one entry per seat (``cfg.num_players``); pass
    ``None`` in the params tuple for parameter-free seats.
    """
    assert len(policies) == cfg.num_players
    deal_batch = jax.vmap(functools.partial(deal, cfg))
    step_batch = jax.vmap(functools.partial(step, cfg))
    observe_batch = jax.vmap(functools.partial(observe, cfg))

    def run(params_tuple, eps_tuple, key):
        key, deal_key = jax.random.split(key)
        state = deal_batch(jax.random.split(deal_key, num_games))

        def turn(carry, t):
            state, key = carry
            key, *seat_keys = jax.random.split(key, cfg.num_players + 1)
            obs, masks = observe_batch(state)
            actions = jnp.stack(
                [
                    _seat_actions(
                        policies[p], params_tuple[p], eps_tuple[p],
                        obs[:, p], state.hands_sorted[:, p], masks[:, p], seat_keys[p],
                    )
                    for p in range(cfg.num_players)
                ],
                axis=1,
            )
            state, rewards = step_batch(state, actions)
            return (state, key), rewards

        (state, _), rewards = lax.scan(turn, (state, key), jnp.arange(cfg.max_turns))
        return -state.scores

    return jax.jit(run)


def seat_policy_of(agent) -> Optional[Tuple[SeatPolicy, object]]:
    """Map a host agent to its (SeatPolicy, params); None if host-only."""
    from ..agents.acer import BatchedActionValueActorCriticAgent
    from ..agents.mcs import BaseMCAgent
    from ..agents.random_agent import DrunkHamster
    from ..agents.reinforce import BatchedReinforceAgent

    if isinstance(agent, DrunkHamster):
        return SeatPolicy("random"), None
    if isinstance(agent, BaseMCAgent):
        return None  # search agents need host-side determinization
    if isinstance(agent, BatchedReinforceAgent):
        return SeatPolicy("policy", spec=agent.spec), agent.params
    if isinstance(agent, BatchedActionValueActorCriticAgent):
        return SeatPolicy("policy", spec=agent.spec), agent.params
    if isinstance(agent, DQNAgent):
        return SeatPolicy("dqn", spec=agent.spec, dqn_cfg=agent.cfg), agent.params
    return None


def play_match(agents, num_games: int, seed: int = 0) -> np.ndarray:
    """Play ``num_games`` device games between host agents; returns scores [G, P].

    Raises ``ValueError`` if any agent is not device-representable (Human,
    search agents) -- fall back to the host GameSession for those.
    """
    mapped = [seat_policy_of(a) for a in agents]
    if any(m is None for m in mapped):
        bad = [type(a).__name__ for a, m in zip(agents, mapped) if m is None]
        raise ValueError(f"agents not device-representable: {bad}")
    policies = tuple(m[0] for m in mapped)
    params = tuple(m[1] for m in mapped)
    # Per-seat epsilon enters as a traced value (decays during training
    # without recompiling the arena).
    eps = tuple(
        jnp.float32(float(getattr(a, "eps", 0.0))) for a in agents
    )
    cfg = EnvConfig(num_players=len(agents))
    arena = make_arena(cfg, policies, num_games)
    return np.asarray(arena(params, eps, jax.random.key(seed)))
