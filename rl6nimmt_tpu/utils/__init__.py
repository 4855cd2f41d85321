from .checkpoint import load_checkpoint, load_params, save_checkpoint, save_params
from .returns import discounted_returns
from .various import iter_flatten

__all__ = [
    "discounted_returns",
    "iter_flatten",
    "load_checkpoint",
    "load_params",
    "save_checkpoint",
    "save_params",
]
