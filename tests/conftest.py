"""Test configuration: force a deterministic 8-device CPU mesh.

Tests always run on CPU with 8 virtual devices so multi-chip sharding paths
compile and execute without TPU hardware (SURVEY.md §4's multi-node strategy).
The real-chip paths are exercised by ``bench.py`` / ``__graft_entry__.py``.

NOTE: the axon TPU plugin in this image force-appends itself to
``jax_platforms`` regardless of the ``JAX_PLATFORMS`` env var, and its client
initialization can deadlock when other native libs (scipy) are loaded first.
We therefore pin ``jax_platforms`` to "cpu" via ``jax.config`` immediately
after importing jax, before any backend initialization.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Escape hatch: PYMPC_TPU_TESTS=1 leaves the real backend in place so the
# TPU-gated lane (Pallas parity/stress in test_admm_fast.py) runs on the
# chip:  PYMPC_TPU_TESTS=1 python -m pytest tests/test_admm_fast.py -q
_TPU_LANE = os.environ.get("PYMPC_TPU_TESTS", "").lower() not in ("", "0", "false", "no")

if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = flags + " --xla_force_host_platform_device_count=8"
    # XLA:CPU's LLVM backend applies fast-math at -O2+, which breaks the
    # error-free float-float transformations in ops/ffprec.py (it rewrites
    # (a+b)-a style patterns).  O0 preserves IEEE semantics op-for-op — the
    # same behavior the TPU backend gives — at negligible cost for
    # test-sized kernels.  See tests/test_ffprec.py.
    if "xla_backend_optimization_level" not in flags:
        flags = flags + " --xla_backend_optimization_level=0"
    os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: this box has 2 cores and XLA compiles
# dominate test wall-clock; cache compiled executables across pytest runs.
#
# READS ONLY by default inside the suite: `executable.serialize()` (the
# write path) segfaults nondeterministically late in a full-suite process
# (observed twice at the first uncached lqr_factor compile after ~180
# tests; the identical compile + write succeeds in a fresh process, so the
# trigger is accumulated native-lib state, not the entry itself).  The
# min-compile-time gate runs BEFORE serialize (jax/_src/compiler.py
# `_cache_write`), so an effectively-infinite threshold disables writes
# while cache reads still hit.  To (re)populate the cache, run the heavy
# files individually:  PYMPC_CACHE_WRITE=1 python -m pytest tests/<file> -q
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
if os.environ.get("PYMPC_CACHE_WRITE", "").lower() in ("1", "true", "yes"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_FIXTURE = {
    # Hard-coded robot state from the reference's inline tests
    # (ref utils/robot_data.py:234-246, swing_foot_trajectory_generator.py:146-157)
    # — the de-facto golden input vectors of the reference.
    "pos": np.array([0.00727408, 0.00061764, 0.43571295]),
    "vel": np.array([0.0189759, 0.00054278, 0.02322867]),
    "quat": np.array([9.99951619e-01, -9.13191258e-03, 3.57360542e-03, 7.72221709e-04]),
    "omega": np.array([-0.06964452, -0.01762341, -0.00088601]),
    "q": np.array(
        [
            0.00687206, 0.52588717, -1.22975589,
            0.02480081, 0.51914926, -1.21463939,
            0.00892169, 0.51229961, -1.20195572,
            0.02621839, 0.50635251, -1.18849609,
        ]
    ),
    "qdot": np.array(
        [
            0.06341452, -0.02158136, 0.16191205,
            0.07448259, -0.04855474, 0.21399941,
            0.06280346, 0.00562435, 0.10597827,
            0.07388069, -0.02180622, 0.15909948,
        ]
    ),
}


def _vm_map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no map accounting, no guard needed here
        return 0


@pytest.fixture(autouse=True)
def _bound_jit_maps():
    """Keep the process under the kernel's vm.max_map_count (65,530 default).

    XLA:CPU JIT-links every compiled executable into dedicated anonymous
    mappings that live as long as the jit caches do — measured ~290 maps for
    ONE horizon-sized solver compile on this image — so a full-suite process
    accumulates 50k+ mappings and then SEGFAULTS in whatever native code
    mmaps next (observed three times: twice in executable serialize, once
    inside XLA compilation, always at the first uncached compile after ~186
    tests).  ``jax.clear_caches()`` releases the mappings (measured
    3811 -> 656), so clear whenever we cross a threshold with comfortable
    headroom; the persistent compile cache (reads above) makes the
    subsequent recompiles cheap.
    """
    yield
    if _vm_map_count() > 30_000:
        jax.clear_caches()


@pytest.fixture
def ref_state():
    return {k: v.copy() for k, v in REFERENCE_FIXTURE.items()}


@pytest.fixture(scope="session")
def aliengo_xml_path(tmp_path_factory):
    """Aliengo MJCF: the reference's hand-written model when mounted (an
    *independent* geometry oracle), else the framework's generated model
    (self-contained fallback — the suite stays green without /root/reference).
    """
    ref = "/root/reference/robot/aliengo/aliengo.xml"
    if os.path.exists(ref):
        return ref
    from pympc_quadruped_tpu.env import mjcf

    path = tmp_path_factory.mktemp("mjcf") / "aliengo.xml"
    mjcf.write_model(str(path), "aliengo")
    return str(path)
