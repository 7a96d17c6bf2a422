"""Run the jax_debug_nans harness in a subprocess (the flag is global and
the main suite intentionally injects NaNs in its fault tests)."""
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))


def test_hot_paths_produce_no_nans():
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(_HERE), ".jax_cache"
    )
    out = subprocess.run(
        [sys.executable, os.path.join(_HERE, "nan_harness.py")],
        env=env,
        capture_output=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr.decode(errors="replace")[-3000:]
    assert b"nan harness OK" in out.stdout
