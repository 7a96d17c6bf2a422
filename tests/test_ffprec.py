"""Float-float compensated arithmetic: exactness vs float64.

These identities demand IEEE-exact f32 ops; the conftest pins the XLA CPU
backend to -O0 because LLVM fast-math at higher levels rewrites the
cancellation patterns (the TPU backend preserves them — checked on-chip by
``examples/tpu_parity_check.py``).
"""
import numpy as np

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.ops import ffprec

RNG = np.random.default_rng(42)


def test_two_sum_exact():
    a = RNG.normal(scale=1e4, size=1000).astype(np.float32)
    b = RNG.normal(scale=1e-3, size=1000).astype(np.float32)
    s, e = jax.jit(ffprec.two_sum)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, a.astype(np.float64) + b.astype(np.float64))


def test_two_prod_exact():
    a = RNG.normal(size=1000).astype(np.float32)
    b = RNG.normal(scale=37.0, size=1000).astype(np.float32)
    p, e = jax.jit(ffprec.two_prod)(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_array_equal(got, a.astype(np.float64) * b.astype(np.float64))


def test_ff_matvec_near_float64():
    A = RNG.normal(size=(120, 120)).astype(np.float32)
    x = RNG.normal(scale=10.0, size=120).astype(np.float32)
    hi, lo = jax.jit(ffprec.ff_matvec)(jnp.asarray(A), jnp.asarray(x))
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    ref = A.astype(np.float64) @ x.astype(np.float64)
    assert np.max(np.abs(got - ref)) < 1e-9, np.max(np.abs(got - ref))


def test_ff_matvec_cancellation():
    """Cancellation-heavy case: residual-style r = H x + g with r ~ 0."""
    n = 80
    H = RNG.normal(size=(n, n)).astype(np.float32)
    H = (H @ H.T + n * np.eye(n)).astype(np.float32)
    x_true = RNG.normal(size=n).astype(np.float32)
    g = (-(H.astype(np.float64) @ x_true.astype(np.float64))).astype(np.float32)
    hi, lo = jax.jit(ffprec.ff_matvec)(jnp.asarray(H), jnp.asarray(x_true))
    r_hi, r_lo = ffprec.ff_add(hi, lo, jnp.asarray(g))
    got = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
    ref = H.astype(np.float64) @ x_true.astype(np.float64) + g.astype(np.float64)
    # Plain f32 computes this residual to ~1e-3 abs; ff must be ~1e-9.
    assert np.max(np.abs(got - ref)) < 1e-8, np.max(np.abs(got - ref))
