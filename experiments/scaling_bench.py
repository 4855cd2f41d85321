"""Weak-scaling benchmark for the data-parallel training steps.

Measures updates/s of the DP REINFORCE step at fixed games-per-device while
growing the device count 1, 2, 4, ... over the available mesh, and reports
parallel efficiency (rate_N / (N * rate_1)).  BASELINE.json's config-5 target
is >=85% efficiency at 2+ hosts.

On real hardware (a pod slice, one process per host via ``jax.distributed``)
this measures true ICI/DCN scaling.  On a single host with
``--xla_force_host_platform_device_count=N`` virtual CPU devices it validates
the code path only — virtual devices share the same cores, so "efficiency"
there reflects host parallelism, not interconnect behavior; the script
labels such runs accordingly.

    python experiments/scaling_bench.py --games-per-device 256 --steps 20
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import rl6nimmt_tpu

rl6nimmt_tpu.enable_compilation_cache()

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--games-per-device", type=int, default=256)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax
    import optax

    from rl6nimmt_tpu.engine import EnvConfig
    from rl6nimmt_tpu.nets import MLPSpec, mlp_init
    from rl6nimmt_tpu.parallel import make_dp_reinforce_step, make_mesh

    cfg = EnvConfig(num_players=4)
    spec = MLPSpec(input_size=cfg.state_length + 1, head_sizes=(1,))
    params = mlp_init(jax.random.key(args.seed), spec)
    optimizer = optax.adam(1e-3)

    n_total = len(jax.devices())
    virtual = jax.devices()[0].platform == "cpu"
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    rows = []
    for n in sizes:
        mesh = make_mesh(num_devices=n)
        step = make_dp_reinforce_step(
            cfg, spec, optimizer, games_per_device=args.games_per_device, mesh=mesh
        )
        opt_state = optimizer.init(params)
        keys = jax.random.split(jax.random.key(args.seed + 1), n)
        p, o, m = step(params, opt_state, keys)  # compile
        jax.block_until_ready(m)
        start = time.perf_counter()
        for _ in range(args.steps):
            p, o, m = step(p, o, keys)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - start) / args.steps
        games_s = n * args.games_per_device / dt
        rows.append({"devices": n, "ms_per_update": dt * 1e3, "games_per_s": games_s})

    base = rows[0]["games_per_s"]
    for r in rows:
        r["efficiency"] = r["games_per_s"] / (r["devices"] * base)
        print(
            f"devices {r['devices']:>3}  {r['ms_per_update']:8.2f} ms/update  "
            f"{r['games_per_s']:>12,.0f} games/s  eff {r['efficiency']:.2f}"
            + ("  [virtual CPU mesh: code-path check only]" if virtual else "")
        )
    print(json.dumps({"virtual_mesh": virtual, "rows": rows}))


if __name__ == "__main__":
    main()
