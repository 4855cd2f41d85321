"""Device mesh + sharding: the framework's distributed backbone.

The reference has no distributed code at all (SURVEY.md §2.5); scaling here
is a first-class design requirement: the games axis of the vectorized
runtime shards across a named device mesh, learner parameters stay
replicated, and gradients reduce with ``lax.pmean`` over ICI -- XLA
collectives over a ``jax.sharding.Mesh``, no hand-written communication.

Two levels are provided:

* :func:`make_mesh` / :func:`game_sharding` / :func:`replicated` -- sharding
  handles for annotating the games axis of states/trajectories under plain
  ``jit`` (XLA inserts the collectives).
* :func:`make_dp_reinforce_step` / :func:`make_dp_dqn_step` /
  :func:`make_dp_acer_step` -- explicit ``shard_map`` data-parallel training
  steps: each device plays its local shard of games, and every optimizer
  update consumes ``lax.pmean``-reduced gradients riding the interconnect
  (true synchronous DP -- the update equals a single-device step on the
  concatenated global minibatch; replicated params/opt-state stay
  bit-identical by construction).  On a multi-host pod slice the same code
  spans hosts (``jax.distributed`` + the global device mesh); on one host it
  spans local devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..agents.dqn import DQNConfig
from ..engine.state import EnvConfig
from ..nets import MLPSpec
from ..runtime.vector import make_dqn_selfplay_step, make_reinforce_train_step

GAMES_AXIS = "games"


def make_mesh(num_devices: Optional[int] = None, axis: str = GAMES_AXIS) -> Mesh:
    """1-D mesh over (up to) ``num_devices`` devices with a named games axis."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


DCN_AXIS, ICI_AXIS = "dcn", "ici"


def make_mesh_2level(
    num_slices: int, devices_per_slice: Optional[int] = None
) -> Mesh:
    """DCN-aware 2-level mesh: axes ``("dcn", "ici")`` (SURVEY.md §5).

    Row-major device order keeps each slice's devices contiguous, so the
    inner ``ici`` axis maps to the fast in-slice interconnect and the outer
    ``dcn`` axis to the data-center network.  Reductions over
    ``(DCN_AXIS, ICI_AXIS)`` then lower to hierarchical collectives: an
    all-reduce inside every slice rides ICI, and only the per-slice partials
    cross DCN.  The games axis shards over *both* axes
    (``P((DCN_AXIS, ICI_AXIS))``), giving every device an equal local batch.

    On real multi-slice hardware the device list from ``jax.devices()`` is
    already grouped by slice; on a single host this builds a virtual 2-level
    mesh for testing the sharding (e.g. 2 "slices" x 4 virtual CPU devices).
    """
    devices = jax.devices()
    if devices_per_slice is None:
        assert len(devices) % num_slices == 0, (len(devices), num_slices)
        devices_per_slice = len(devices) // num_slices
    n = num_slices * devices_per_slice
    grid = np.asarray(devices[:n]).reshape(num_slices, devices_per_slice)
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def mesh_axes(mesh: Mesh):
    """All mesh axis names as a tuple (the reduce spec for a full pmean)."""
    return tuple(mesh.axis_names)


def game_sharding(mesh: Mesh, axis: str = GAMES_AXIS) -> NamedSharding:
    """Shard the leading (games) axis of an array over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_dp_reinforce_step(
    cfg: EnvConfig,
    spec: MLPSpec,
    optimizer: optax.GradientTransformation,
    games_per_device: int,
    mesh: Mesh,
    axis=None,
    **reinforce_kwargs,
):
    """Data-parallel REINFORCE self-play step over a device mesh.

    Signature: ``(params, opt_state, keys) -> (params, opt_state, metrics)``
    where ``keys`` is one PRNG key per device (``jax.random.split(key,
    mesh.size)``).  Each device plays ``games_per_device`` games; gradients
    are pmean-reduced so the update is identical everywhere.

    ``axis`` defaults to *all* mesh axes: on a :func:`make_mesh_2level` mesh
    the games axis shards over ``(dcn, ici)`` and the gradient pmean lowers
    to a hierarchical in-slice (ICI) + cross-slice (DCN) all-reduce.
    """
    if axis is None:
        axis = mesh_axes(mesh) if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    local_step = make_reinforce_train_step(
        cfg, spec, optimizer, games_per_device, axis_name=axis, **reinforce_kwargs
    )

    def sharded(params, opt_state, keys):
        return local_step(params, opt_state, keys[0])

    mapped = shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def stack_for_mesh(tree, mesh: Mesh):
    """Give every leaf a leading device axis (one independent copy per device).

    Used for per-device state such as replay buffers: shard the stacked axis
    with ``P(axis)`` and each device sees its own copy inside ``shard_map``.
    """
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (mesh.size,) + x.shape), tree
    )



def make_dp_dqn_step(
    cfg: EnvConfig,
    dqn_cfg: DQNConfig,
    optimizer: optax.GradientTransformation,
    games_per_device: int,
    mesh: Mesh,
    axis=None,
    **dqn_kwargs,
):
    """Data-parallel DQN self-play cycle over a device mesh.

    True synchronous data parallelism: every device keeps its *own* replay
    buffer (create one local buffer and lift it with :func:`stack_for_mesh`),
    plays its own games, and samples its own minibatch, but every Bellman
    update applies the ``lax.pmean`` of the per-device gradients -- i.e. the
    gradient of the concatenated global minibatch.  Replicated
    params/target/opt-state therefore stay bit-identical across devices with
    no post-hoc averaging (see ``tests/test_dp_sync.py`` for the N-device ==
    1-device-on-global-batch equivalence proof).  Signature: ``(params,
    target_params, opt_state, stacked_buffer, keys, eps) -> (params,
    target_params, opt_state, stacked_buffer, metrics)``.

    Note: with ``noisy=True`` each device draws its own noisy-net noise, so
    the synced gradient averages over ``mesh.size`` independent noise
    samples rather than one global draw -- a variance reduction, not a
    semantic change.
    """
    if axis is None:
        axis = mesh_axes(mesh) if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    inner = make_dqn_selfplay_step(
        cfg, dqn_cfg, optimizer, games_per_device, axis_name=axis, **dqn_kwargs
    )

    def sharded(params, target_params, opt_state, buf, keys, eps):
        local_buf = jax.tree.map(lambda x: x[0], buf)
        params, target_params, opt_state, local_buf, metrics = inner(
            params, target_params, opt_state, local_buf, keys[0], eps
        )
        buf = jax.tree.map(lambda x: x[None], local_buf)
        return params, target_params, opt_state, buf, metrics

    mapped = shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P()),
        out_specs=(P(), P(), P(), P(axis), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_dp_acer_step(
    cfg: EnvConfig,
    spec: MLPSpec,
    optimizer: optax.GradientTransformation,
    games_per_device: int,
    mesh: Mesh,
    axis=None,
    **acer_kwargs,
):
    """Data-parallel ACER self-play cycle over a device mesh.

    Mirrors :func:`make_dp_dqn_step`'s scheme for stateful learners: every
    device keeps its own sequence buffer (lift one with
    :func:`stack_for_mesh`) and plays/replays locally, but both the on- and
    off-policy updates apply ``lax.pmean``-reduced gradients -- true
    synchronous DP over the concatenated global sequence batches; replicated
    params/opt-state stay bit-identical by construction.  Signature:
    ``(params, opt_state, stacked_buf, keys) -> (params, opt_state,
    stacked_buf, metrics)``.
    """
    from ..runtime.vector import make_acer_selfplay_step

    if axis is None:
        axis = mesh_axes(mesh) if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    inner = make_acer_selfplay_step(
        cfg, spec, optimizer, games_per_device, axis_name=axis, **acer_kwargs
    )

    def sharded(params, opt_state, buf, keys):
        local_buf = jax.tree.map(lambda x: x[0], buf)
        params, opt_state, local_buf, metrics = inner(
            params, opt_state, local_buf, keys[0]
        )
        buf = jax.tree.map(lambda x: x[None], local_buf)
        return params, opt_state, buf, metrics

    mapped = shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P(axis), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
