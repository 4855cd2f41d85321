from .cnn import CNNSpec, cnn_apply, cnn_init
from .mlp import (
    MLPSpec,
    draw_mlp_noise,
    noisy_effective_params,
    dueling_apply,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
    noisy_linear_apply,
    noisy_linear_init,
)
from .normalize import normalize_state

__all__ = [
    "CNNSpec",
    "cnn_apply",
    "cnn_init",
    "MLPSpec",
    "draw_mlp_noise",
    "noisy_effective_params",
    "dueling_apply",
    "linear_apply",
    "linear_init",
    "mlp_apply",
    "mlp_init",
    "noisy_linear_apply",
    "noisy_linear_init",
    "normalize_state",
]
