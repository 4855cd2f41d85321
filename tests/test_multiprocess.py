"""Multi-process jax.distributed data parallelism (SURVEY.md §2.5 / §5).

Spawns real OS processes wired into one global mesh by a Gloo coordinator
(``experiments/multiprocess_dp.py``) — the same code path a multi-host TPU
pod runs with one process per host — and checks that

* the DP REINFORCE step executes with cross-process collectives,
* parameters end byte-identical on every process (replication invariant),
* the 2-process x 2-device run matches the same mesh built as 1 process x
  4 virtual devices: identical rollout metrics, parameters equal up to the
  cross-process all-reduce's summation order (Gloo vs in-process XLA).
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # real multi-process runs; run via `pytest -m slow`


REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "experiments" / "multiprocess_dp.py"


def _launch(num_processes: int, local_devices: int, port: int) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            str(SCRIPT),
            "--num-processes",
            str(num_processes),
            "--local-devices",
            str(local_devices),
            "--games-per-device",
            "16",
            "--steps",
            "2",
            "--port",
            str(port),
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["ok"], summary
    return summary


@pytest.mark.slow
def test_cross_process_dp_matches_single_process():
    multi = _launch(num_processes=2, local_devices=2, port=29611)
    single = _launch(num_processes=1, local_devices=4, port=29613)
    assert multi["global_devices"] == single["global_devices"] == 4
    assert multi["params_replicated_across_processes"]
    # Trajectories (and hence metrics) are bit-identical; params agree up to
    # summation order of the cross-process all-reduce.
    assert multi["metrics"] == pytest.approx(single["metrics"], rel=1e-6)
    assert multi["params_l1"] == pytest.approx(single["params_l1"], rel=1e-5)
