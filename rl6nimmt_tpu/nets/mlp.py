"""Functional neural nets for the agents.

Rebuilds the reference net zoo (/root/reference/rl_6_nimmt/utils/nets.py) as
pure functions over parameter pytrees -- no module objects, no hidden state:

* :func:`mlp_init` / :func:`mlp_apply` -- the multi-headed MLP (shared trunk,
  N linear heads; nets.py:100-132).
* :func:`dueling_apply` -- ``Q = V + (A - mean(A))`` over a 2-head MLP
  (nets.py:135-144).
* noisy linears -- NoisyNet layers with independent or factorized Gaussian
  noise (nets.py:12-63); noise comes from explicit PRNG keys instead of
  mutable buffers, so nets stay pure and vmap/pmap-safe.

TPU notes: parameters are f32; matmuls run through ``preferred_element_type``
so XLA keeps MXU accumulation in f32 even if inputs are cast to bf16 later.
Weights are stored ``[in, out]`` (activation-row-major) so the forward pass is
a plain ``x @ w`` with no transposes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MLPSpec:
    """Static architecture description (hashable -> usable under jit).

    ``noisy`` selects factorized-noisy linears for *all* layers, matching how
    the reference wires ``NoisyFactorizedLinear`` through every layer of a
    noisy net (nets.py:103-127 with ``linear=NoisyFactorizedLinear``).
    """

    input_size: int
    hidden_sizes: Tuple[int, ...] = (100, 100)
    head_sizes: Tuple[int, ...] = (1,)
    noisy: bool = False
    sigma_init: float = 0.5
    activation: str = "relu"
    # Matmul input dtype: "bfloat16" feeds the MXU at full rate (params and
    # accumulation stay f32 -- mixed precision, not quantized storage).
    # Default f32 keeps bit-exact parity with the NumPy test replicas.
    compute_dtype: str = "float32"

    @property
    def layer_sizes(self) -> Tuple[Tuple[int, int], ...]:
        dims = (self.input_size,) + tuple(self.hidden_sizes)
        trunk = tuple(zip(dims[:-1], dims[1:]))
        heads = tuple((dims[-1], h) for h in self.head_sizes)
        return trunk + heads


def _activation(name: str):
    return {"relu": jax.nn.relu, "tanh": jnp.tanh, "gelu": jax.nn.gelu}[name]


# ------------------------------------------------------------------- linears


def linear_init(key: jax.Array, in_dim: int, out_dim: int) -> dict:
    """Torch-style default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    bound = 1.0 / math.sqrt(in_dim)
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (out_dim,), jnp.float32, -bound, bound),
    }


def _mm(x: jnp.ndarray, w: jnp.ndarray, dtype: Optional[str]) -> jnp.ndarray:
    """Matmul with optional low-precision inputs and f32 accumulation."""
    if dtype is not None and dtype != "float32":
        x, w = x.astype(dtype), w.astype(dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def linear_apply(params: dict, x: jnp.ndarray, dtype: Optional[str] = None) -> jnp.ndarray:
    return _mm(x, params["w"], dtype) + params["b"]


def noisy_linear_init(
    key: jax.Array, in_dim: int, out_dim: int, sigma_init: float = 0.5, factorized: bool = True
) -> dict:
    """Noisy layer parameters.

    Factorized variant scales sigma by 1/sqrt(in) at init (reference
    nets.py:42-49); the independent variant fills sigma with ``sigma_init``
    directly and re-draws uniform weights with bound sqrt(3/in)
    (nets.py:13-25).
    """
    params = linear_init(key, in_dim, out_dim)
    if factorized:
        sigma0 = sigma_init / math.sqrt(in_dim)
    else:
        sigma0 = sigma_init
        bound = math.sqrt(3.0 / in_dim)
        wk, bk = jax.random.split(jax.random.fold_in(key, 1))
        params["w"] = jax.random.uniform(wk, (in_dim, out_dim), jnp.float32, -bound, bound)
        params["b"] = jax.random.uniform(bk, (out_dim,), jnp.float32, -bound, bound)
    params["sigma_w"] = jnp.full((in_dim, out_dim), sigma0, jnp.float32)
    params["sigma_b"] = jnp.full((out_dim,), sigma0, jnp.float32)
    return params


def _factorized_noise(key: jax.Array, in_dim: int, out_dim: int) -> dict:
    """The factorized noise pair exactly as :func:`noisy_linear_apply` draws it."""
    ki, ko = jax.random.split(key)
    f = lambda v: jnp.sign(v) * jnp.sqrt(jnp.abs(v))
    return {
        "eps_in": f(jax.random.normal(ki, (in_dim, 1))),
        "eps_out": f(jax.random.normal(ko, (1, out_dim))),
    }


def noisy_linear_apply(
    params: dict, x: jnp.ndarray, key: Optional[jax.Array], factorized: bool = True,
    dtype: Optional[str] = None, noise: Optional[dict] = None,
) -> jnp.ndarray:
    """Noisy forward pass; ``key=None`` silences the noise (deterministic eval).

    ``noise`` (a :func:`_factorized_noise` dict) substitutes precomputed noise
    for in-line key draws -- bit-identical values when the dict was drawn from
    the key this call would have used (lets callers batch the threefry work
    for many forwards into one draw off the critical path).
    """
    w, b = params["w"], params["b"]
    if key is None and noise is None:
        return _mm(x, w, dtype) + b

    in_dim, out_dim = w.shape
    if noise is not None:
        eps_in, eps_out = noise["eps_in"], noise["eps_out"]
        w_noise = eps_in * eps_out
        b_noise = eps_out[0]
    elif factorized:
        nz = _factorized_noise(key, in_dim, out_dim)
        w_noise = nz["eps_in"] * nz["eps_out"]         # rank-1 factorized noise
        b_noise = nz["eps_out"][0]
    else:
        kw, kb = jax.random.split(key)
        w_noise = jax.random.normal(kw, (in_dim, out_dim))
        b_noise = jax.random.normal(kb, (out_dim,))

    w_eff = w + params["sigma_w"] * w_noise
    b_eff = b + params["sigma_b"] * b_noise
    return _mm(x, w_eff, dtype) + b_eff


# ----------------------------------------------------------------------- MLP


def mlp_init(key: jax.Array, spec: MLPSpec) -> dict:
    """Initialize trunk + head parameters for an :class:`MLPSpec`."""
    sizes = spec.layer_sizes
    keys = jax.random.split(key, len(sizes))
    init = (
        (lambda k, i, o: noisy_linear_init(k, i, o, spec.sigma_init, factorized=True))
        if spec.noisy
        else linear_init
    )
    layers = [init(k, i, o) for k, (i, o) in zip(keys, sizes)]
    n_trunk = len(spec.hidden_sizes)
    return {"trunk": layers[:n_trunk], "heads": layers[n_trunk:]}


def draw_mlp_noise(spec: MLPSpec, key: jax.Array) -> list:
    """Precompute the per-layer factorized noise :func:`mlp_apply` would draw.

    Exactly replicates the in-apply key schedule (one split into n_layers
    keys, then one factorized draw per layer), so
    ``mlp_apply(spec, p, x, noise=draw_mlp_noise(spec, k))`` is bit-identical
    to ``mlp_apply(spec, p, x, key=k)``.  Vmap over stacked keys to batch the
    threefry work for many forwards into one dispatch-free pass.
    """
    sizes = spec.layer_sizes
    keys = jax.random.split(key, len(sizes))
    return [_factorized_noise(k, i, o) for k, (i, o) in zip(keys, sizes)]


def noisy_effective_params(spec: MLPSpec, params: dict, noise: list) -> dict:
    """Collapse a noisy net + drawn noise into plain ``{"w","b"}`` layers.

    Computes exactly the effective weights :func:`noisy_linear_apply` forms
    inline (``w + sigma_w * eps_in*eps_out``, ``b + sigma_b * eps_out``), so
    ``mlp_apply(replace(spec, noisy=False), noisy_effective_params(spec, p,
    nz), x)`` is bit-identical to ``mlp_apply(spec, p, x, noise=nz)`` --
    same elementwise expressions, same matmul shapes.  Vmap over stacked
    noise to materialize many forwards' weights in one pass: the vectorized
    DQN rollout precomputes all T turns' effective weights before its turn
    scan, cutting the per-turn act to plain matmuls (the in-scan per-layer
    noise application serialized ~6 small kernels per turn behind the env
    step chain).
    """
    layers = list(params["trunk"]) + list(params["heads"])
    effs = [
        {
            "w": p["w"] + p["sigma_w"] * (z["eps_in"] * z["eps_out"]),
            "b": p["b"] + p["sigma_b"] * z["eps_out"][0],
        }
        for p, z in zip(layers, noise)
    ]
    n_trunk = len(params["trunk"])
    return {"trunk": effs[:n_trunk], "heads": effs[n_trunk:]}


def mlp_apply(
    spec: MLPSpec, params: dict, x: jnp.ndarray, key: Optional[jax.Array] = None,
    noise: Optional[list] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Forward pass; returns one output per head.

    For noisy specs, fresh noise is drawn per layer from ``key`` (pass ``None``
    to run the mean network), or supplied precomputed via ``noise``
    (:func:`draw_mlp_noise`).  Accepts ``[..., input_size]`` batches.
    """
    act = _activation(spec.activation)
    n_layers = len(params["trunk"]) + len(params["heads"])
    if spec.noisy and noise is not None:
        keys = [None] * n_layers
        noises = list(noise)
    elif spec.noisy and key is not None:
        keys = list(jax.random.split(key, n_layers))
        noises = [None] * n_layers
    else:
        keys = [None] * n_layers
        noises = [None] * n_layers

    dtype = spec.compute_dtype
    apply = (
        (lambda p, v, k, nz: noisy_linear_apply(p, v, k, factorized=True, dtype=dtype, noise=nz))
        if spec.noisy
        else (lambda p, v, k, nz: linear_apply(p, v, dtype=dtype))
    )

    h = x
    for p, k, nz in zip(params["trunk"], keys, noises):
        h = act(apply(p, h, k, nz))
    n_trunk = len(params["trunk"])
    outs = tuple(
        apply(p, h, k, nz)
        for p, k, nz in zip(params["heads"], keys[n_trunk:], noises[n_trunk:])
    )
    return outs


def dueling_apply(
    spec: MLPSpec, params: dict, x: jnp.ndarray, key: Optional[jax.Array] = None,
    noise: Optional[list] = None,
) -> jnp.ndarray:
    """Dueling aggregation ``Q = V + (A - mean(A))`` (reference nets.py:135-144).

    ``spec.head_sizes`` must be ``(1, num_actions)``.
    """
    v, a = mlp_apply(spec, params, x, key, noise=noise)
    return v + (a - jnp.mean(a, axis=-1, keepdims=True))
