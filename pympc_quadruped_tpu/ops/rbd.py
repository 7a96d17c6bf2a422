"""Batched full-order rigid-body dynamics for the fixed quadruped topology.

The reference runs its full-order physics in external native engines —
MuJoCo C (ref ``scripts/mujoco_aliengo.py:7,227``) and IsaacGym PhysX
CUDA (ref ``scripts/isaacgym_a1.py:8``, 4 robots, per-robot host
round-trips).  This module is the TPU-native replacement for the *dynamics
core* of those engines, specialised to the one articulated topology this
framework controls: a floating trunk with four identical hip(x)-thigh(y)-
calf(y) chains (the same tree ``env/mjcf.py`` emits for MuJoCo, so the two
engines are cross-checkable body for body).

Design (TPU-first):

- **fixed topology, closed form**: no generic tree walker — the trunk +
  4x3-link structure is unrolled, with the four legs batched along a leading
  ``vmap`` axis (they are structurally identical; only parameters differ).
  No data-dependent control flow anywhere.
- **spatial (Plücker) algebra in body coordinates**, Featherstone
  conventions with (angular, linear) component ordering:
  CRBA for the 18x18 mass matrix, RNEA for the bias forces, both as small
  dense einsums that batch over scenarios with an outer ``vmap``.
- **18x18 SPD solve** per step: tiny; one batched Cholesky (the sequential
  cost is irrelevant at n=18, and the env steps at most once per control
  tick).

Generalized-velocity convention (internal): ``u = [omega_b (3, body frame),
v_b (3, body frame), qd (12)]``.  MuJoCo's free joint stores
``[v_world, omega_body]`` with the linear part in world axes; the
conversion (and its acceleration counterpart, which picks up an
``omega x v`` term) lives in :func:`u_from_mujoco` / :func:`qacc_to_mujoco`
and is exercised by the MuJoCo cross-check in ``tests/test_rbd.py``.

Model layout: 13 bodies — 0: trunk; per leg l: hip (axis x, origin
``hip_offset[l]``), thigh (axis y, origin ``[0, hip_len[l], 0]`` in the hip
frame), calf (axis y, origin ``[0, 0, -l_thigh]``); the foot is the point
``[0, 0, -l_calf]`` of the calf.  All body frames are axis-aligned with the
trunk at q = 0 (no fixed rotations in the tree), matching the generated
MJCF.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.ops import lie


class RbdModel(NamedTuple):
    """Pytree of dynamic parameters (all f32; batchable on a leading axis).

    Leg-indexed arrays follow the package leg order FL, FR, RL, RR.
    """

    # trunk
    trunk_mass: jnp.ndarray       # ()
    trunk_com: jnp.ndarray        # (3,)
    trunk_inertia: jnp.ndarray    # (3,3) about the COM, trunk axes
    # per-leg link chain: index 0 = hip, 1 = thigh, 2 = calf
    link_mass: jnp.ndarray        # (4,3)
    link_com: jnp.ndarray         # (4,3,3) in the link frame
    link_inertia: jnp.ndarray     # (4,3,3,3) about the COM, link axes
    joint_origin: jnp.ndarray     # (4,3,3) joint origin in the parent frame
    joint_axis: jnp.ndarray       # (4,3,3) hinge axis in the child frame
    foot_offset: jnp.ndarray      # (4,3) foot point in the calf frame
    armature: jnp.ndarray         # (4,3) reflected rotor inertia per hinge
    damping: jnp.ndarray          # (4,3) viscous joint damping
    gravity: jnp.ndarray          # () positive magnitude


# ---------------------------------------------------------------------------
# Spatial-algebra helpers ((angular, linear) ordering, body coordinates)
# ---------------------------------------------------------------------------

def _hat(v):
    """Skew matrix, batched over leading axes."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def _xmat(E, t):
    """6x6 Plücker motion transform parent->child for a child frame at
    origin ``t`` (parent coords) with rotation ``E`` (maps parent coords to
    child coords): m_child = X @ m_parent."""
    Z = jnp.zeros_like(E)
    top = jnp.concatenate([E, Z], axis=-1)
    bot = jnp.concatenate([-E @ _hat(t), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _spatial_inertia(mass, com, I_com):
    """6x6 spatial inertia about the body-frame origin."""
    ch = _hat(com)
    I_o = I_com - mass * ch @ ch
    top = jnp.concatenate([I_o, mass * ch], axis=-1)
    bot = jnp.concatenate([-mass * ch, mass * jnp.eye(3, dtype=ch.dtype)], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _cross_motion(a, b):
    """Spatial motion cross product a x b for 6-vectors (w, v)."""
    aw, av = a[..., :3], a[..., 3:]
    bw, bv = b[..., :3], b[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, bw), jnp.cross(aw, bv) + jnp.cross(av, bw)], axis=-1
    )


def _cross_force(a, f):
    """Spatial force cross product a x* f for motion a = (w, v), force
    f = (n, F)."""
    aw, av = a[..., :3], a[..., 3:]
    n, F = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, n) + jnp.cross(av, F), jnp.cross(aw, F)], axis=-1
    )


def _rot_axis(axis, q):
    """Rodrigues rotation about a unit axis; returns E = R(q)^T (parent
    coords -> child coords for a frame rotated by q about ``axis``)."""
    K = _hat(axis)
    s, c = jnp.sin(q), jnp.cos(q)
    R = jnp.eye(3, dtype=axis.dtype) + s[..., None, None] * K + (
        1.0 - c
    )[..., None, None] * (K @ K)
    return jnp.swapaxes(R, -1, -2)


# ---------------------------------------------------------------------------
# Per-leg kinematic sweep (shared by CRBA and RNEA)
# ---------------------------------------------------------------------------

# vmap axes for mapping a per-leg computation over the model: leg-indexed
# leaves map along their leading (leg) axis; trunk/global leaves broadcast.
LEG_AXES = RbdModel(
    trunk_mass=None, trunk_com=None, trunk_inertia=None,
    link_mass=0, link_com=0, link_inertia=0,
    joint_origin=0, joint_axis=0, foot_offset=0,
    armature=0, damping=0, gravity=None,
)

def _leg_transforms(model: RbdModel, q_leg):
    """Per-link (E, t, X) for one leg's 3-joint chain.

    Args: per-leg slices (vmapped by the caller): q_leg (3,).
    Returns (E (3,3,3), t (3,3), X (3,6,6)) indexed hip, thigh, calf.
    """
    E = jax.vmap(_rot_axis)(model.joint_axis, q_leg)        # (3,3,3)
    t = model.joint_origin                                   # (3,3)
    X = jax.vmap(_xmat)(E, t)                                # (3,6,6)
    return E, t, X


def _leg_spatial_inertias(model: RbdModel):
    """(3,6,6) link spatial inertias for one leg (vmapped by the caller)."""
    return jax.vmap(_spatial_inertia)(
        model.link_mass, model.link_com, model.link_inertia
    )


# ---------------------------------------------------------------------------
# CRBA: 18x18 mass matrix
# ---------------------------------------------------------------------------

def mass_matrix(model: RbdModel, q: jnp.ndarray) -> jnp.ndarray:
    """Composite-rigid-body mass matrix H (18,18) in the internal u order
    [omega_b, v_b, qd].  Armature adds to the 12 hinge diagonals."""
    q_legs = q.reshape(4, 3)

    def leg(model_leg, q_leg):
        E, t, X = _leg_transforms(model_leg, q_leg)
        I_links = _leg_spatial_inertias(model_leg)           # (3,6,6)
        S = jnp.concatenate(
            [model_leg.joint_axis, jnp.zeros_like(model_leg.joint_axis)], axis=-1
        )                                                    # (3,6)

        # Composite inertias up the chain (calf -> thigh -> hip).
        Ic2 = I_links[2]
        Ic1 = I_links[1] + X[2].T @ Ic2 @ X[2]
        Ic0 = I_links[0] + X[1].T @ Ic1 @ X[1]
        Ic = jnp.stack([Ic0, Ic1, Ic2])                      # (3,6,6)

        # F_j = Ic_j S_j, expressed in j's frame, then propagated to every
        # ancestor (and finally the base) with X^T.
        F = jnp.einsum("jab,jb->ja", Ic, S)                  # (3,6)
        F2_at1 = X[2].T @ F[2]
        F2_at0 = X[1].T @ F2_at1
        F1_at0 = X[1].T @ F[1]

        Hl = jnp.zeros((3, 3), q.dtype)
        Hl = Hl.at[0, 0].set(S[0] @ F[0])
        Hl = Hl.at[1, 1].set(S[1] @ F[1])
        Hl = Hl.at[2, 2].set(S[2] @ F[2])
        Hl = Hl.at[1, 2].set(S[1] @ F2_at1).at[2, 1].set(S[1] @ F2_at1)
        Hl = Hl.at[0, 1].set(S[0] @ F1_at0).at[1, 0].set(S[0] @ F1_at0)
        Hl = Hl.at[0, 2].set(S[0] @ F2_at0).at[2, 0].set(S[0] @ F2_at0)
        Hl = Hl + jnp.diag(model_leg.armature)

        # Base coupling: propagate each F_j to the base frame.
        F_base = jnp.stack([X[0].T @ F[0], X[0].T @ F1_at0, X[0].T @ F2_at0])
        # Leg's composite inertia contribution at the base.
        Ic_base = X[0].T @ Ic0 @ X[0]
        return Hl, F_base, Ic_base

    Hl, F_base, Ic_base = jax.vmap(leg, in_axes=(LEG_AXES, 0))(model, q_legs)

    I_trunk = _spatial_inertia(
        model.trunk_mass, model.trunk_com, model.trunk_inertia
    )
    H_bb = I_trunk + jnp.sum(Ic_base, axis=0)                # (6,6)

    H = jnp.zeros((18, 18), q.dtype)
    H = H.at[:6, :6].set(H_bb)
    for l in range(4):
        sl = slice(6 + 3 * l, 9 + 3 * l)
        H = H.at[sl, sl].set(Hl[l])
        H = H.at[:6, sl].set(F_base[l].T)
        H = H.at[sl, :6].set(F_base[l])
    return H


# ---------------------------------------------------------------------------
# RNEA: bias forces (gravity + velocity products + external foot forces)
# ---------------------------------------------------------------------------

def bias_forces(
    model: RbdModel,
    q: jnp.ndarray,
    u: jnp.ndarray,
    R_base: jnp.ndarray,
    f_feet_world: jnp.ndarray,
) -> jnp.ndarray:
    """C(q, u) - tau_ext: generalized forces such that H du = tau - C.

    ``R_base`` is the base orientation (world <- body); gravity enters as
    the standard fictitious base acceleration.  ``f_feet_world`` (4,3) are
    external world-frame forces applied at the foot points (the env's
    contact model feeds these; zero for the MuJoCo mid-air cross-check).
    Joint damping is NOT included here (the env treats it semi-implicitly).
    """
    q_legs = q.reshape(4, 3)
    qd_legs = u[6:].reshape(4, 3)
    v0 = u[:6]
    # Fictitious upward base acceleration == gravity (Featherstone trick),
    # expressed in base coords.
    g_up = R_base.T @ jnp.array([0.0, 0.0, 1.0], q.dtype) * model.gravity
    a0 = jnp.concatenate([jnp.zeros((3,), q.dtype), g_up])

    def leg_full(model_leg, q_leg, qd_leg, f_foot_world):
        E, t, X = _leg_transforms(model_leg, q_leg)
        I_links = _leg_spatial_inertias(model_leg)
        S = jnp.concatenate(
            [model_leg.joint_axis, jnp.zeros_like(model_leg.joint_axis)], axis=-1
        )

        vp, ap = v0, a0
        Rlink = jnp.eye(3, dtype=q.dtype)                     # base <- link
        vs, accs, fs = [], [], []
        for j in range(3):
            vj = X[j] @ vp + S[j] * qd_leg[j]
            aj = X[j] @ ap + _cross_motion(vj, S[j] * qd_leg[j])
            Rlink = Rlink @ E[j].T
            fj = I_links[j] @ aj + _cross_force(vj, I_links[j] @ vj)
            vs.append(vj)
            accs.append(aj)
            fs.append(fj)
            vp, ap = vj, aj

        # Foot force (world) -> spatial force in calf coords.
        f_lin = (R_base @ Rlink).T @ f_foot_world
        n = jnp.cross(model_leg.foot_offset, f_lin)
        fs[2] = fs[2] - jnp.concatenate([n, f_lin])

        # Backward pass.
        tau = jnp.zeros((3,), q.dtype)
        fcur = fs[2]
        tau = tau.at[2].set(S[2] @ fcur)
        fcur = fs[1] + X[2].T @ fcur
        tau = tau.at[1].set(S[1] @ fcur)
        fcur = fs[0] + X[1].T @ fcur
        tau = tau.at[0].set(S[0] @ fcur)
        f_to_base = X[0].T @ fcur
        return tau, f_to_base

    tau_legs, f_to_base = jax.vmap(leg_full, in_axes=(LEG_AXES, 0, 0, 0))(
        model, q_legs, qd_legs, f_feet_world
    )

    I_trunk = _spatial_inertia(
        model.trunk_mass, model.trunk_com, model.trunk_inertia
    )
    f_base = I_trunk @ a0 + _cross_force(v0, I_trunk @ v0) + jnp.sum(
        f_to_base, axis=0
    )
    return jnp.concatenate([f_base, tau_legs.reshape(12)])


# ---------------------------------------------------------------------------
# Forward dynamics + convention conversions
# ---------------------------------------------------------------------------

def forward_dynamics(
    model: RbdModel,
    q: jnp.ndarray,
    u: jnp.ndarray,
    R_base: jnp.ndarray,
    tau: jnp.ndarray,
    f_feet_world: jnp.ndarray,
) -> jnp.ndarray:
    """du (18,): H^{-1} (tau_gen - C - d*qd).

    ``tau`` (12,) are the hinge motor torques; the base rows carry no
    actuation.  Joint damping is applied as an EXPLICIT passive generalized
    force -d*qd on the right-hand side — exactly MuJoCo's continuous
    passive-force model, which the ``tests/test_rbd.py`` qacc parity check
    requires.  (A fully implicit treatment would fold it into the left-hand
    side as (H + dt*D); the envs' semi-implicit Euler does not.)
    """
    C = bias_forces(model, q, u, R_base, f_feet_world)
    damp = jnp.concatenate(
        [jnp.zeros((6,), q.dtype), model.damping.reshape(12) * u[6:]]
    )
    rhs = jnp.concatenate([jnp.zeros((6,), q.dtype), tau]) - C - damp
    H = mass_matrix(model, q)
    # 18x18 SPD solve; Cholesky is fine at this size (one per env step).
    L = jnp.linalg.cholesky(H)
    return jax.scipy.linalg.cho_solve((L, True), rhs)


def u_from_mujoco(qvel: jnp.ndarray, R_base: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo free-joint qvel [v_world, omega_body, qd] -> internal
    [omega_body, v_body, qd]."""
    v_world, w_body, qd = qvel[:3], qvel[3:6], qvel[6:]
    return jnp.concatenate([w_body, R_base.T @ v_world, qd])


def qacc_to_mujoco(
    du: jnp.ndarray, u: jnp.ndarray, R_base: jnp.ndarray
) -> jnp.ndarray:
    """Internal du -> MuJoCo qacc ordering [a_world, alpha_body, qdd].

    a_world = R (dv_b + omega_b x v_b) — the omega x v term converts the
    body-frame rate of the body-frame velocity into a world-frame
    acceleration.
    """
    dw, dv, qdd = du[:3], du[3:6], du[6:]
    w, v = u[:3], u[3:6]
    a_world = R_base @ (dv + jnp.cross(w, v))
    return jnp.concatenate([a_world, dw, qdd])
