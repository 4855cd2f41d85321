"""Metrics, timing and profiling utilities.

Replaces the reference's observability odds and ends (SURVEY.md §5): the
``timeit`` decorator (various.py:53-61), the optional TensorBoard scalars in
DQN (dqn.py:97-98, 134-135), and the never-called ``plot_grad_flow``
gradient diagnostic (various.py:11-38) -- rebuilt TPU-appropriately:

* :func:`timeit` -- logging wall-clock decorator (host-side code paths).
* :class:`Timer` / :func:`device_time` -- ``block_until_ready`` timing of
  jitted programs (the honest way to time XLA work).
* :class:`MetricLogger` -- scalar series sink with jsonl persistence; drop-in
  for the ``summary_writer.add_scalar`` call sites.
* :func:`grad_stats` -- per-layer gradient magnitude summary (the data behind
  plot_grad_flow).
* :func:`plot_grad_flow` -- the reference's matplotlib gradient-flow figure
  over a JAX gradient pytree (invoked by experiments/debug_gradflow.py; the
  reference imported it into dqn.py but never called it).
* :func:`trace` -- context manager around ``jax.profiler`` for TPU traces.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def timeit(fn):
    """Log wall-clock duration of each call (reference various.py:53-61)."""

    def timed(*args, **kwargs):
        start = time.perf_counter()
        result = fn(*args, **kwargs)
        logger.info(f"{fn.__name__}  {(time.perf_counter() - start) * 1000:2.2f} ms")
        return result

    return timed


class Timer:
    """Accumulating block timer: ``with timer.measure("step"): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str, block_on: Any = None):
        start = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - start
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }


def device_time(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median seconds per call of a jitted function, blocking on outputs."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - start)
    return sorted(times)[len(times) // 2]


class MetricLogger:
    """Scalar series recorder with optional jsonl persistence.

    Drop-in for the reference's optional ``summary_writer`` hooks: pass an
    instance as ``summary_writer`` to a DQN agent and ``add_scalar`` records
    the series.
    """

    def __init__(self, path: Optional[str] = None):
        self.series: Dict[str, list] = defaultdict(list)
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def add_scalar(self, name: str, value, step: int) -> None:
        value = float(value)
        self.series[name].append((step, value))
        if self._fh:
            self._fh.write(json.dumps({"name": name, "step": step, "value": value}) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


def grad_stats(grads: Any) -> Dict[str, Dict[str, float]]:
    """Per-leaf |grad| mean/max — the plot_grad_flow data (various.py:11-38)."""
    stats = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        arr = np.abs(np.asarray(leaf))
        stats[name] = {"mean_abs": float(arr.mean()), "max_abs": float(arr.max())}
    return stats


def plot_grad_flow(grads: Any, path: Optional[str] = None, ylim: float = 0.02):
    """Gradient-flow bar chart (reference various.py:11-38), JAX-native.

    Takes a gradient pytree (instead of torch ``named_parameters``), keeps
    the reference's layout -- overlaid max/mean |grad| bars per layer,
    vertical layer names, zero line, zoomed y-axis -- and drops bias leaves
    like the reference's ``"bias" not in n`` filter (here: leaf names ending
    in ``/b`` or ``/sigma_b``).  Writes the figure to ``path`` (or returns
    it) using the Agg backend, so it works headless on a TPU host.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.lines import Line2D

    stats = grad_stats(grads)
    layers, ave_grads, max_grads = [], [], []
    for name, s in stats.items():
        if name.endswith("/b") or name.endswith("/sigma_b"):
            continue
        layers.append(name)
        ave_grads.append(s["mean_abs"])
        max_grads.append(s["max_abs"])

    fig, ax = plt.subplots(figsize=(max(6, len(layers) * 0.8), 4))
    ax.bar(np.arange(len(max_grads)), max_grads, alpha=0.1, lw=1, color="c")
    ax.bar(np.arange(len(ave_grads)), ave_grads, alpha=0.1, lw=1, color="b")
    ax.hlines(0, 0, len(ave_grads) + 1, lw=2, color="k")
    ax.set_xticks(range(len(layers)))
    ax.set_xticklabels(layers, rotation="vertical")
    ax.set_xlim(left=-0.5, right=len(ave_grads) - 0.5 if ave_grads else 0.5)
    ax.set_ylim(bottom=-0.001, top=ylim)  # zoom on the small-gradient region
    ax.set_xlabel("Layers")
    ax.set_ylabel("average gradient")
    ax.set_title("Gradient flow")
    ax.grid(True)
    ax.legend(
        [Line2D([0], [0], color="c", lw=4), Line2D([0], [0], color="b", lw=4),
         Line2D([0], [0], color="k", lw=4)],
        ["max-gradient", "mean-gradient", "zero-gradient"],
    )
    fig.tight_layout()
    if path is not None:
        fig.savefig(path)
        plt.close(fig)
        return path
    return fig


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context for TPU timeline capture."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
