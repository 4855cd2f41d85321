"""Functional convolutional stack (parity with the reference's unused CNN).

The reference ships a WIP conv net that no agent uses (nets.py:66-97); this
is its functional equivalent -- conv blocks of (conv -> activation -> 2x2 max
pool) -- provided for inventory parity and as a building block for image-like
board encodings.  Uses ``lax.conv_general_dilated`` with NHWC layout (the
TPU-preferred convolution layout).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class CNNSpec:
    in_channels: int
    hidden_channels: Tuple[int, ...]
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    activation: str = "relu"

    @property
    def channel_sizes(self) -> Tuple[int, ...]:
        return (self.in_channels,) + tuple(self.hidden_channels) + (self.out_channels,)

    def linear_out_size(self, h: int, w: int) -> int:
        """Flattened feature size after all blocks (reference nets.py:88-94)."""
        blocks = len(self.channel_sizes)
        return int(h * 0.5**blocks) * int(w * 0.5**blocks) * self.out_channels


def cnn_init(key: jax.Array, spec: CNNSpec) -> list:
    layers = []
    sizes = spec.channel_sizes
    keys = jax.random.split(key, len(sizes) - 1)
    k = spec.kernel_size
    for key_i, (c_in, c_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
        bound = 1.0 / math.sqrt(c_in * k * k)
        wk, bk = jax.random.split(key_i)
        layers.append(
            {
                "w": jax.random.uniform(wk, (k, k, c_in, c_out), jnp.float32, -bound, bound),
                "b": jax.random.uniform(bk, (c_out,), jnp.float32, -bound, bound),
            }
        )
    return layers


def cnn_apply(spec: CNNSpec, params: list, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass over NHWC inputs ``[B, H, W, C_in]``."""
    act = {"relu": jax.nn.relu, "tanh": jnp.tanh, "gelu": jax.nn.gelu}[spec.activation]
    for layer in params:
        x = lax.conv_general_dilated(
            x,
            layer["w"],
            window_strides=(spec.stride, spec.stride),
            padding=[(spec.padding, spec.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = act(x + layer["b"])
        x = lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
    return x
