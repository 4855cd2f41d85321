"""rl6nimmt_tpu: a TPU-native 6 nimmt! reinforcement-learning framework.

A from-scratch JAX/XLA rebuild of the capabilities of the reference
``coolo/rl-6-nimmt`` repo: a pure-functional batched game engine, seven agent
families (random, human CLI, REINFORCE, ACER, the DQN lattice up to
noisy-D3QN-PER-n-step, Monte-Carlo search, and Alpha0.5-style PUCT), replay
buffers, a vectorized self-play runtime, and a population tournament with
multi-player ELO and evolutionary clone-and-cull.

Top-level exports mirror the reference package root
(/root/reference/rl_6_nimmt/__init__.py).
"""

from .engine import EnvConfig, EnvState, InvalidMoveException, SechsNimmtEnv
from .runtime import GameSession
from .tournament import Tournament

__version__ = "0.1.0"


def use_platform(name: str) -> None:
    """Force the JAX platform (e.g. "cpu") before any backend initializes.

    The container may pin ``JAX_PLATFORMS`` to an accelerator tunnel in
    ``sitecustomize``; env vars alone arrive too late once jax is imported,
    so scripts call this instead.
    """
    import jax

    jax.config.update("jax_platforms", name)


def enable_debug_nans(enable: bool = True) -> None:
    """Toggle JAX NaN checking (the framework's numerical-sanitizer mode).

    With it on, any NaN produced inside a jitted computation raises at the
    producing op -- the TPU-native analog of torch's anomaly detection.
    """
    import jax

    jax.config.update("jax_debug_nans", enable)


def enable_compilation_cache(path: str = "~/.cache/rl6nimmt_jax") -> None:
    """Persist XLA compilations across processes.

    Worth calling at the top of any script: search agents and vectorized
    trainers compile a handful of programs whose (remote) compilation can
    dominate short runs.
    """
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__all__ = [
    "EnvConfig",
    "EnvState",
    "GameSession",
    "InvalidMoveException",
    "SechsNimmtEnv",
    "Tournament",
    "__version__",
]
