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
  plot_grad_flow, sans matplotlib).
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


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context for TPU timeline capture."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
