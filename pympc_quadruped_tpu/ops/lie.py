"""Quaternion / rotation / Euler utilities (jittable, batch-friendly).

Reproduces the exact conventions of the reference's math library
(reference ``utils/kinematics.py``):

- quaternions are ``(w, x, y, z)`` — real part first (ref kinematics.py:44-45),
- Euler angles are intrinsic ZYX: ``R = Rz(psi) @ Ry(theta) @ Rx(phi)`` and
  the returned triple is ``[phi(roll), theta(pitch), psi(yaw)]``
  (ref kinematics.py:40-49, 74-100).

All functions are written for unbatched inputs and are safe under ``vmap``;
nothing here allocates Python-side state.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(4,) wxyz quaternion -> (3,3) rotation matrix (ref kinematics.py:51-71).

    Uses the unnormalized Hamilton form; for a unit quaternion this is the
    standard rotation matrix.
    """
    w, x, y, z = q[0], q[1], q[2], q[3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2.0 * (x * y - w * z), 2.0 * (w * y + x * z)]),
            jnp.stack([2.0 * (w * z + x * y), ww - xx + yy - zz, 2.0 * (y * z - w * x)]),
            jnp.stack([2.0 * (x * z - w * y), 2.0 * (w * x + y * z), ww - xx - yy + zz]),
        ]
    )


def quat_to_zyx(q: jnp.ndarray) -> jnp.ndarray:
    """(4,) wxyz quaternion -> (3,) [roll, pitch, yaw] (ref kinematics.py:40-49)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    # Clip for numerical safety: |arg| can exceed 1 by rounding.
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw])


def zyx_to_rotmat(rpy: jnp.ndarray) -> jnp.ndarray:
    """(3,) [roll, pitch, yaw] -> R = Rz(yaw) Ry(pitch) Rx(roll)."""
    cr, sr = jnp.cos(rpy[0]), jnp.sin(rpy[0])
    cp, sp = jnp.cos(rpy[1]), jnp.sin(rpy[1])
    cy, sy = jnp.cos(rpy[2]), jnp.sin(rpy[2])
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr]),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr]),
            jnp.stack([-sp, cp * sr, cp * cr]),
        ]
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(3,3) -> (4,) wxyz, valid away from trace = -1 (ref kinematics.py:133-164)."""
    w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12))
    coef = 0.25 / w
    return jnp.stack(
        [
            w,
            coef * (R[2, 1] - R[1, 2]),
            coef * (R[0, 2] - R[2, 0]),
            coef * (R[1, 0] - R[0, 1]),
        ]
    )


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(3,) -> (3,3) cross-product matrix [v]x (ref kinematics.py:166-177)."""
    zero = jnp.zeros_like(v[0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[2], v[1]]),
            jnp.stack([v[2], zero, -v[0]]),
            jnp.stack([-v[1], v[0], zero]),
        ]
    )


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 linear solve via the adjugate (Cramer), batched over
    leading axes.

    The hot control/physics ticks solve many tiny (...,3,3) systems (leg
    Jacobian rates, world-inertia Euler step); ``jnp.linalg.solve`` lowers
    those through a generic LU path that dominates the per-tick cost on
    TPU, while the adjugate is ~40 fused elementwise ops.  Fine for the
    well-conditioned 3x3s here (leg Jacobians away from singularity,
    SPD inertias); NOT a general replacement for ill-conditioned systems.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    inv_det = 1.0 / det
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) * inv_det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) * inv_det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def rot_x(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero]),
            jnp.stack([zero, c, -s]),
            jnp.stack([zero, s, c]),
        ]
    )


def rot_y(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, zero, s]),
            jnp.stack([zero, one, zero]),
            jnp.stack([-s, zero, c]),
        ]
    )


def rot_z(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero]),
            jnp.stack([s, c, zero]),
            jnp.stack([zero, zero, one]),
        ]
    )


def exp_so3(omega: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula for a unit axis (ref kinematics.py:179-186)."""
    K = skew(omega)
    return jnp.eye(3, dtype=K.dtype) + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)


# --------------------------------------------------------------------------
# SE(3) / product-of-exponentials sublibrary.
#
# The reference ships these as part of its math library (ref
# utils/kinematics.py:188-306: invT, adSE3_T, adSE3_Rp, Rp2T, exp_se3,
# compute_screw_axis, twist2se3, fk_open_chain) but no controller path ever
# calls them — the shipped surface is completed here for migration parity.
# Unlike the reference's branchy list-normalizing numpy, these are total,
# branch-free closed forms: jittable, vmap-safe, and defined for ANY screw
# (the reference's exp_se3 prints an error and returns None unless
# ||omega|| is exactly 1 or (0 with ||v||==1); here the small-angle limit
# is handled with a Taylor-safe select so theta may also carry the norm).
# --------------------------------------------------------------------------


def rp_to_se3(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(3,3) rotation + (3,) translation -> (4,4) homogeneous transform
    (ref kinematics.py:226-235)."""
    T = jnp.zeros((4, 4), dtype=R.dtype)
    T = T.at[:3, :3].set(R).at[:3, 3].set(p)
    return T.at[3, 3].set(1.0)


def inv_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a homogeneous transform: (R,p) -> (R^T, -R^T p)
    (ref kinematics.py:188-198)."""
    R, p = T[:3, :3], T[:3, 3]
    return rp_to_se3(R.T, -R.T @ p)


def adjoint_rp(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """6x6 SE(3) adjoint [[R, 0], [ [p]x R, R ]] in the reference's
    (omega-first) twist convention (ref kinematics.py:213-224)."""
    Z = jnp.zeros((3, 3), dtype=R.dtype)
    pR = skew(p) @ R
    return jnp.block([[R, Z], [pR, R]])


def adjoint_se3(T: jnp.ndarray) -> jnp.ndarray:
    """6x6 adjoint of a homogeneous transform (ref kinematics.py:200-211)."""
    return adjoint_rp(T[:3, :3], T[:3, 3])


def screw_axis(omega: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Screw axis (6,) of a revolute joint: unit axis ``omega`` through the
    point ``q`` -> ``[omega, -omega x q]`` (ref kinematics.py:264-273)."""
    return jnp.concatenate([omega, -jnp.cross(omega, q)])


def twist_to_se3(twist: jnp.ndarray) -> jnp.ndarray:
    """(6,) twist [omega, v] -> 4x4 se(3) matrix [[ [omega]x, v],[0,0]]
    (ref kinematics.py:276-292)."""
    out = jnp.zeros((4, 4), dtype=twist.dtype)
    return out.at[:3, :3].set(skew(twist[:3])).at[:3, 3].set(twist[3:])


def exp_se3(S: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Matrix exponential of the screw ``S*theta`` -> (4,4) transform.

    Total closed form (ref kinematics.py:237-262 branches on exact unit
    norms and returns None otherwise): with w = ||omega||,

        R = I + sin(w t)/w [o]x + (1-cos(w t))/w^2 [o]x^2
        p = (I t + (1-cos(w t))/w^2 [o]x + (w t - sin(w t))/w^3 [o]x^2) v

    and the w -> 0 limit (R = I, p = t v) taken via a guarded select, so
    pure translations and non-unit axes are both defined.  For unit omega
    this matches the reference bit-for-bit in its valid domain.
    """
    omega, v = S[:3], S[3:]
    w2 = jnp.dot(omega, omega)
    w = jnp.sqrt(w2)
    small = w < 1e-6
    ws = jnp.where(small, 1.0, w)  # guarded divisor
    a = w * theta
    K = skew(omega)
    K2 = K @ K
    sin_c = jnp.where(small, theta, jnp.sin(a) / ws)
    cos_c = jnp.where(small, 0.5 * theta * theta, (1.0 - jnp.cos(a)) / w2)
    V_c = jnp.where(small, theta**3 / 6.0, (a - jnp.sin(a)) / (w2 * ws))
    eye = jnp.eye(3, dtype=S.dtype)
    R = eye + sin_c * K + cos_c * K2
    V = theta * eye + cos_c * K + V_c * K2
    return rp_to_se3(R, V @ v)


def fk_open_chain(
    home: jnp.ndarray, screws: jnp.ndarray, thetas: jnp.ndarray
) -> jnp.ndarray:
    """Product-of-exponentials forward kinematics (ref kinematics.py:294-306):
    ``T = exp(S_0 q_0) ... exp(S_{J-1} q_{J-1}) @ home``.

    ``screws`` is a stacked (J, 6) array (the reference takes a Python list);
    the chain is folded with ``lax.scan`` so J is a static shape, not a
    Python loop over traced values.
    """
    import jax

    def step(T, sq):
        S, q = sq[:6], sq[6]
        return T @ exp_se3(S, q), None

    sq = jnp.concatenate([screws, thetas[:, None]], axis=1)
    T, _ = jax.lax.scan(step, jnp.eye(4, dtype=home.dtype), sq)
    return T @ home


def quat_integrate(q: jnp.ndarray, omega_body: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    """Integrate a wxyz quaternion by a body-frame angular velocity over dt.

    Exponential-map update; used by the on-device SRB rollout.
    """
    angle = jnp.linalg.norm(omega_body) * dt
    axis = omega_body / jnp.maximum(jnp.linalg.norm(omega_body), 1e-9)
    half = 0.5 * angle
    dq = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])
    # Hamilton product q * dq (body-frame increment).
    w1, v1 = q[0], q[1:]
    w2, v2 = dq[0], dq[1:]
    w = w1 * w2 - jnp.dot(v1, v2)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    out = jnp.concatenate([w[None], v])
    return out / jnp.linalg.norm(out)
