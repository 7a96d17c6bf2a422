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
