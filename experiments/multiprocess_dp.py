"""True multi-process data-parallel training via ``jax.distributed``.

The virtual 8-device CPU mesh used by the unit tests exercises the sharded
*program*, but every device still lives in one OS process.  This script runs
the same DP REINFORCE step (``parallel.mesh.make_dp_reinforce_step``) across
**separate processes** — each process owns its local CPU device(s), a Gloo
coordinator wires them into one global mesh, and the gradient ``pmean``
crosses process boundaries — i.e. the exact code path a multi-host TPU pod
uses (one process per host, ICI/DCN instead of Gloo), minus the hardware.

Checked per run:

* every process sees the *global* device count (``num_processes x
  local_devices``) but only its local devices are addressable;
* the step executes with cross-process collectives (params/opt-state
  replicated, per-device PRNG keys sharded over the games axis);
* after N steps the parameter pytrees are **byte-identical** across
  processes (sha256 digest compared by the launcher) — the replication
  invariant that makes multi-host checkpoint/resume trivial.

Usage (launcher spawns the workers):

    python experiments/multiprocess_dp.py --num-processes 2 --steps 5

On a real pod each host runs the worker entry point directly:

    python experiments/multiprocess_dp.py --worker --process-id $HOST_ID \
        --num-processes $N --coordinator host0:29531

Timing is reported, but on a shared-core host the processes contend for the
same CPUs, so efficiency there validates the code path only (the printed
JSON labels such runs ``"shared_host": true``).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def worker(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rl6nimmt_tpu.engine import EnvConfig
    from rl6nimmt_tpu.nets import MLPSpec, mlp_init
    from rl6nimmt_tpu.parallel import make_dp_reinforce_step, make_mesh

    assert len(jax.devices()) == args.num_processes * args.local_devices, (
        jax.devices(),
        args.num_processes,
        args.local_devices,
    )

    cfg = EnvConfig(num_players=4)
    optimizer = optax.adam(1e-3)
    mesh = make_mesh()  # all global devices

    # Identical host values on every process, assembled into *global* arrays
    # (each process materializes only its addressable shards): replicated
    # params/opt-state, games-axis-sharded per-device PRNG keys.
    def globalize(tree, sharding):
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), sharding, lambda idx, x=x: np.asarray(x)[idx]
            ),
            tree,
        )

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(*mesh.axis_names))
    key_data = np.asarray(
        jax.random.key_data(jax.random.split(jax.random.key(args.seed + 1), mesh.size))
    )
    keys = jax.random.wrap_key_data(globalize(key_data, shd))

    if args.algo == "dqn":
        from rl6nimmt_tpu.agents.dqn import DQNConfig, q_network_spec
        from rl6nimmt_tpu.buffers import per_init
        from rl6nimmt_tpu.parallel import make_dp_dqn_step, stack_for_mesh

        dqn_cfg = DQNConfig(
            double=True, dueling=True, per=True, n_steps=10,
            hidden_sizes=(64,), minibatch=64,
        )
        spec = q_network_spec(dqn_cfg, cfg.state_length, cfg.num_actions)
        host_params = jax.tree.map(np.asarray, mlp_init(jax.random.key(args.seed), spec))
        params = globalize(host_params, rep)
        target = globalize(host_params, rep)
        opt_state = globalize(optimizer.init(host_params), rep)
        example = {
            "state": np.zeros(cfg.state_length, np.float32),
            "action": np.zeros((), np.int32),
            "reward": np.zeros((), np.float32),
            "next_state": np.zeros(cfg.state_length, np.float32),
            "done": np.zeros((), np.float32),
        }
        cap = max(8192, 2 * args.games_per_device * cfg.num_players * cfg.max_turns)
        buf = globalize(
            jax.tree.map(np.asarray, stack_for_mesh(per_init(cap, example), mesh)),
            shd,
        )
        step = make_dp_dqn_step(
            cfg, dqn_cfg, optimizer,
            games_per_device=args.games_per_device, mesh=mesh, learn_iters=8,
        )
        import jax.numpy as jnp

        eps = jnp.asarray(0.1)
        p, t, o, b, m = step(params, target, opt_state, buf, keys, eps)
        jax.block_until_ready(m)
        start = time.perf_counter()
        for _ in range(args.steps):
            p, t, o, b, m = step(p, t, o, b, keys, eps)
        jax.block_until_ready(m)
    else:
        spec = MLPSpec(input_size=cfg.state_length + 1, head_sizes=(1,))
        step = make_dp_reinforce_step(
            cfg, spec, optimizer, games_per_device=args.games_per_device, mesh=mesh
        )
        host_params = jax.tree.map(np.asarray, mlp_init(jax.random.key(args.seed), spec))
        params = globalize(host_params, rep)
        opt_state = globalize(optimizer.init(host_params), rep)

        p, o, m = step(params, opt_state, keys)  # compile + first step
        jax.block_until_ready(m)
        start = time.perf_counter()
        for _ in range(args.steps):
            p, o, m = step(p, o, keys)
        jax.block_until_ready(m)
    dt = (time.perf_counter() - start) / max(args.steps, 1)

    # Replication invariant: the post-training params must be byte-identical
    # on every process.  Replicated outputs are fully addressable locally.
    digest = hashlib.sha256()
    params_l1 = 0.0
    for leaf in jax.tree.leaves(p):
        host = np.ascontiguousarray(jax.device_get(leaf))
        digest.update(host.tobytes())
        params_l1 += float(np.abs(host).sum())
    metrics = {k: float(jax.device_get(v)) for k, v in m.items()}
    print(
        "RESULT "
        + json.dumps(
            {
                "process_id": args.process_id,
                "global_devices": len(jax.devices()),
                "local_devices": len(jax.local_devices()),
                "algo": args.algo,
                "ms_per_update": dt * 1e3,
                "games_per_s": mesh.size * args.games_per_device / dt,
                "env_steps_per_s": mesh.size * args.games_per_device * cfg.max_turns / dt,
                "params_digest": digest.hexdigest(),
                "params_l1": params_l1,
                "metrics": metrics,
            }
        ),
        flush=True,
    )


def launch(args) -> int:
    port = args.port or (29400 + os.getpid() % 1000)
    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
        )
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()
        cmd = [
            sys.executable,
            __file__,
            "--worker",
            "--process-id",
            str(pid),
            "--num-processes",
            str(args.num_processes),
            "--local-devices",
            str(args.local_devices),
            "--coordinator",
            f"localhost:{port}",
            "--games-per-device",
            str(args.games_per_device),
            "--steps",
            str(args.steps),
            "--seed",
            str(args.seed),
            "--algo",
            args.algo,
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
            )
        )

    results, failed = [], False
    try:
        for pid, proc in enumerate(procs):
            out, _ = proc.communicate(timeout=args.timeout)
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results.append(json.loads(line[len("RESULT ") :]))
                    break
            else:
                failed = True
                print(f"--- worker {pid} produced no RESULT (rc={proc.returncode}) ---")
                print(out[-4000:])
            if proc.returncode != 0:
                failed = True
    finally:
        # A hung worker (e.g. stale coordinator port) must not orphan the
        # rest blocked in Gloo collectives: kill whatever is still alive.
        for proc in procs:
            if proc.poll() is None:
                proc.kill()
                proc.wait()

    if failed or len(results) != args.num_processes:
        print(json.dumps({"ok": False}))
        return 1

    digests = {r["params_digest"] for r in results}
    replicated = len(digests) == 1
    summary = {
        "ok": replicated,
        "algo": args.algo,
        "num_processes": args.num_processes,
        "local_devices_per_process": args.local_devices,
        "global_devices": results[0]["global_devices"],
        "params_replicated_across_processes": replicated,
        "ms_per_update": max(r["ms_per_update"] for r in results),
        "games_per_s": min(r["games_per_s"] for r in results),
        "env_steps_per_s": min(r["env_steps_per_s"] for r in results),
        "shared_host": True,
        "params_digest": results[0]["params_digest"],
        "params_l1": results[0]["params_l1"],
        "metrics": results[0]["metrics"],
    }
    for r in sorted(results, key=lambda r: r["process_id"]):
        print(
            f"process {r['process_id']}: {r['local_devices']} local / "
            f"{r['global_devices']} global devices, "
            f"{r['ms_per_update']:.1f} ms/update, digest {r['params_digest'][:12]}"
        )
    print(json.dumps(summary))
    if args.summary_out:
        Path(args.summary_out).write_text(json.dumps(summary))
    return 0 if replicated else 1


def scaling(args) -> int:
    """Weak-scaling measurement on the CPU-process mesh (VERDICT r2 #7).

    Times the DP training cycle with the SAME global device count and global
    batch in two layouts: (a) 1 process x N local virtual devices (all
    collectives in-process XLA) and (b) N processes x 1 device each (the
    gradient all-reduce crosses process boundaries through Gloo -- the
    multi-host code path).  Cross-process efficiency = t_a / t_b.

    Honest caveat, recorded in the artifact: on a shared-core host the
    layouts contend for the same CPUs and Gloo is not ICI, so this validates
    the code path and bounds the framework-side overhead; it is NOT a
    prediction of pod ICI efficiency (see scaling_bench.py for the pod
    recipe).
    """
    import copy

    results = {}
    for label, (nproc, ndev) in {
        "1proc": (1, args.num_processes * args.local_devices),
        f"{args.num_processes}proc": (args.num_processes, args.local_devices),
    }.items():
        sub = copy.copy(args)
        sub.num_processes, sub.local_devices, sub.summary_out = nproc, ndev, ""
        print(f"=== {label}: {nproc} processes x {ndev} devices ===", flush=True)
        port = 29400 + (os.getpid() + hash(label)) % 1000
        sub.port = port
        rc = launch_capture(sub, results, label)
        if rc != 0:
            print(json.dumps({"ok": False, "failed_layout": label}))
            return rc
    t1 = results["1proc"]["ms_per_update"]
    tn = results[f"{args.num_processes}proc"]["ms_per_update"]
    out = {
        "ok": True,
        "algo": args.algo,
        "global_devices": results["1proc"]["global_devices"],
        "games_per_device": args.games_per_device,
        "ms_per_update_1proc": t1,
        f"ms_per_update_{args.num_processes}proc": tn,
        "cross_process_efficiency": t1 / tn,
        "env_steps_per_s_multiproc": results[f"{args.num_processes}proc"].get(
            "env_steps_per_s"
        ),
        "params_bit_identical_across_layouts": (
            results["1proc"]["params_digest"]
            == results[f"{args.num_processes}proc"]["params_digest"]
        ),
        "shared_host_caveat": (
            "both layouts share this host's cores and Gloo is not ICI; this "
            "bounds framework-side DP overhead, it does not predict pod ICI "
            "efficiency (scaling_bench.py is the pod recipe)"
        ),
        "layouts": results,
    }
    print(json.dumps(out))
    if args.summary_out:
        Path(args.summary_out).write_text(json.dumps(out, indent=1))
    return 0


def launch_capture(args, results: dict, label: str) -> int:
    """Run launch() and stash its summary dict under results[label]."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    with redirect_stdout(Tee()):
        rc = launch(args)
    for line in reversed(buf.getvalue().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            results[label] = json.loads(line)
            break
    return rc


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--worker", action="store_true")
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--num-processes", type=int, default=2)
    parser.add_argument("--local-devices", type=int, default=1)
    parser.add_argument("--coordinator", default="localhost:29531")
    parser.add_argument("--games-per-device", type=int, default=64)
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--timeout", type=float, default=600.0)
    parser.add_argument("--algo", choices=("reinforce", "dqn"), default="reinforce")
    parser.add_argument("--summary-out", default="")
    args = parser.parse_args(argv)
    if args.worker:
        worker(args)
        return 0
    if args.scaling:
        return scaling(args)
    return launch(args)


if __name__ == "__main__":
    raise SystemExit(main())
