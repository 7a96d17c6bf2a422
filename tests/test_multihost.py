"""Multi-host path test — SURVEY §4's own recipe: N local CPU processes
under ``jax.distributed`` (Gloo collectives standing in for DCN).

Exercises, across 2 simulated hosts x 2 virtual devices each:
- ``launch.init_distributed`` / ``global_data_mesh`` / ``per_host_batch``;
- ``mesh.shard_global_batch`` (hosts populate only their addressable rows);
- a sharded ``sweep.solve_sweep_step`` whose result shards match the
  fully-local solve, plus a metric all-reduce spanning both processes;
- ``SweepCheckpointer`` save/restore of a *sharded* pytree across hosts.

Run in subprocesses because a ``jax.distributed`` runtime cannot share the
test process's already-initialized single-process backend.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_WORKER = os.path.join(_HERE, "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nprocs", [2])
def test_two_process_sharded_sweep_and_checkpoint(tmp_path, nprocs):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_"))
    }
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(_HERE), ".jax_cache"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nprocs), str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        path = tmp_path / f"result_{pid}.json"
        assert path.exists(), f"worker {pid} wrote no result:\n{out[-3000:]}"
        res = json.loads(path.read_text())
        assert res["ok"], res
        assert res["devices"] == 2 * nprocs
        assert res["per_host_batch"] == 8 // nprocs
