"""Multi-device sharding tests on the 8-device virtual CPU mesh.

SURVEY.md §4: sharded results must equal single-device results bitwise
(deterministic lockstep solvers), and the driver's ``dryrun_multichip``
contract must hold.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pympc_quadruped_tpu.parallel import mesh as mesh_lib
from pympc_quadruped_tpu.parallel import sweep


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_solve_matches_unsharded():
    import bench

    batch = 16
    robot, mpc, x_t, yaw, feet, X_ref, tables = bench.build_inputs(batch, horizon=10)

    U_plain = np.asarray(
        sweep.solve_sweep_step(robot, mpc, x_t, yaw, feet, X_ref, tables)
    )

    mesh = mesh_lib.data_mesh()
    x_t_s, yaw_s, feet_s, X_ref_s, tables_s = mesh_lib.shard_batch(
        (x_t, yaw, feet, X_ref, tables), mesh
    )
    U_sharded = sweep.solve_sweep_step(robot, mpc, x_t_s, yaw_s, feet_s, X_ref_s, tables_s)
    assert len(U_sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(U_sharded), U_plain, atol=1e-5)


def test_dryrun_multichip_contract():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    carry, ctrl_out = out
    assert np.all(np.isfinite(np.asarray(ctrl_out.torques)))
