"""Kill-and-resume of the production sweep entry point (SURVEY §5.4).

The reference has nothing to checkpoint (live sim + controller objects);
here the sweep's WHOLE loop state — env states, controller carries incl. QP
warm starts, KF state, absolute tick — is one orbax-checkpointed pytree, so
an interrupted sweep continues exactly.  These tests run
``examples/sweep.py`` as real subprocesses: one run is stopped after chunk 1
(simulated preemption), resumed in a fresh process, and its final
checkpoint must be BITWISE identical to an uninterrupted run's.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(REPO, "examples", "sweep.py")


def run_sweep(ckpt_dir, extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    cmd = [
        sys.executable, SWEEP, "--batch", "4", "--seconds", "0.3",
        "--chunk-ticks", "100", "--ckpt-dir", ckpt_dir, *extra,
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def restore_latest(ckpt_dir):
    """Raw (structure-free) restore of the newest checkpoint."""
    import orbax.checkpoint as ocp

    steps = sorted(
        int(p) for p in os.listdir(ckpt_dir) if p.isdigit()
    )
    with ocp.StandardCheckpointer() as ck:
        return steps[-1], ck.restore(
            os.path.join(ckpt_dir, str(steps[-1]), "default")
        )


def test_kill_resume_bitwise(tmp_path):
    straight = str(tmp_path / "straight")
    resumed = str(tmp_path / "resumed")

    out_a = run_sweep(straight)                                # 3 chunks
    out_b1 = run_sweep(resumed, ["--stop-after-chunks", "1"])  # killed after 1
    out_b2 = run_sweep(resumed)                                # fresh process resumes
    assert "resuming at chunk 1 (tick 100)" in out_b2

    step_a, state_a = restore_latest(straight)
    step_b, state_b = restore_latest(resumed)
    assert step_a == step_b == 3

    flat_a = {}
    def flatten(prefix, obj, into):
        if isinstance(obj, dict):
            for k, v in obj.items():
                flatten(f"{prefix}/{k}", v, into)
        elif isinstance(obj, (list, tuple)):
            for i, v in enumerate(obj):
                flatten(f"{prefix}/{i}", v, into)
        else:
            into[prefix] = np.asarray(obj)
    flatten("", state_a, flat_a)
    flat_b = {}
    flatten("", state_b, flat_b)
    assert set(flat_a) == set(flat_b)
    assert flat_a["/tick"] == 300
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)


def test_resume_threads_state_not_restarts(tmp_path):
    """The resumed chunk continues from the walked-forward state: the final
    x displacement is ~3 chunks of travel, not one chunk from the origin."""
    d = str(tmp_path / "ck")
    run_sweep(d, ["--stop-after-chunks", "1"])
    run_sweep(d)
    _, state = restore_latest(d)
    x = np.asarray(state["env"]["pos"])[:, 0]
    # 0.3 s at ~1 m/s with start-up transient: must exceed one chunk's reach.
    assert float(np.mean(x)) > 0.12, x
