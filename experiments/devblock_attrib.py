"""Attribute device-block program time by seat kind (controlled probe).

Builds ONE ``make_device_block_fn`` program (fixed G, P, mc_max, batch) and
times warm executions with every seat forced to a single kind:

* RANDOM        — block skeleton only (10 env turns, decide overhead, n_mc=0)
* UNIFORM (MCS) — + playout rounds with uniform moves
* PUCT_UNIFORM  — + PUCT root selection (uniform playouts)
* PUCT          — + net playouts (policy forward inside every playout turn)

The deltas attribute the per-block device seconds the tournament profile
(`profile_devblock.py`) reports in aggregate.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from rl6nimmt_tpu.agents.device_search import (
    KIND_PUCT,
    KIND_PUCT_UNIFORM,
    KIND_RANDOM,
    KIND_UNIFORM,
)
from rl6nimmt_tpu.engine.state import EnvConfig
from rl6nimmt_tpu.nets import MLPSpec, mlp_init
from rl6nimmt_tpu.runtime.device_tournament import make_device_block_fn


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=32)
    parser.add_argument("--players", type=int, default=4)
    parser.add_argument("--mc-max", type=int, default=200)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args(argv)

    G, P = args.games, args.players
    cfg = EnvConfig(num_players=P)
    spec = MLPSpec(input_size=48, hidden_sizes=(100, 100), head_sizes=(1,))
    fn = make_device_block_fn(cfg, spec, G, args.mc_max, args.batch, ())

    p1 = mlp_init(jax.random.key(0), spec)
    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (G, P) + x.shape), p1
    )
    mc_maxes = jnp.full((G, P), args.mc_max, jnp.int32)
    mc_pers = jnp.full((G, P), 10, jnp.int32)
    c_pucts = jnp.full((G, P), 2.0, jnp.float32)
    epses = jnp.zeros((G, P), jnp.float32)
    key = jax.random.key(42)

    mc_ceiling = 1 << (args.mc_max - 1).bit_length()
    fn_free = make_device_block_fn(
        cfg, spec, G, mc_ceiling, mc_ceiling, (), True
    )
    fn_freeu = make_device_block_fn(
        cfg, spec, G, mc_ceiling, mc_ceiling, (), True, True
    )
    fn32 = make_device_block_fn(cfg, spec, G, mc_ceiling, 32, ())

    for name, kind, f in [
        ("random", KIND_RANDOM, fn),
        ("mcs", KIND_UNIFORM, fn),
        ("puct_uniform", KIND_PUCT_UNIFORM, fn),
        ("puct", KIND_PUCT, fn),
        ("mcs/puct_free", KIND_UNIFORM, fn_free),
        ("mcs/pf+uni", KIND_UNIFORM, fn_freeu),
        ("puct/K32", KIND_PUCT, fn32),
    ]:
        kinds = jnp.full((G, P), kind, jnp.int32)
        run = lambda: jax.block_until_ready(
            f(params, (), kinds, mc_maxes, mc_pers, c_pucts, epses, key)
        )
        run()  # warm (compile once; kind is traced so one program serves all)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        print(f"{name:13s} min={min(ts)*1e3:8.1f} ms  per-game={min(ts)/G*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
