"""Float-float (double-single) compensated arithmetic building blocks.

TPU v5e has no float64 ALU (jax silently downcasts f64 to f32 on device),
but the reference MPC's condensed QP is near-degenerate along internal-force
directions: its reduced Hessian has lambda_min ~ 2*R = 4e-5 (from the
reference's R = 1e-5 input weight, ref config/linear_mpc_configs.py:20), so
float32 rounding in the dual residual is amplified ~2.5e4x into the
solution.  Raw 1e-3 GRF parity therefore requires residuals accurate to
~1e-8 absolute — beyond plain float32 but far below float64.

These primitives implement error-free transformations in pure float32
(Knuth TwoSum and Dekker split/TwoProd — branch-free, no FMA dependence),
giving ~2e-14 effective precision where the solver needs it.  The
fixed-iteration IPM uses them only in its *refinement* phase
(:mod:`pympc_quadruped_tpu.ops.qp.ipm`), so the batched throughput path
stays pure f32 matmuls.

CAUTION: these identities rely on IEEE-exact f32 add/mul per op.  XLA
preserves op-by-op semantics (no reassociation of user ops), which tests
verify numerically against float64 (``tests/test_ffprec.py``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SPLITTER = jnp.float32(4097.0)  # 2^12 + 1 for float32 Dekker splitting

# XLA's algebraic simplifier rewrites patterns like (s - a) or c - (c - a)
# symbolically, which destroys error-free transformations.  Every
# cancellation-bearing intermediate is pinned behind an optimization
# barrier so the emitted code performs the literal IEEE operations.
_B = jax.lax.optimization_barrier


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s + e == a + b exactly (Knuth)."""
    s = _B(a + b)
    bb = _B(s - a)
    e = (a - _B(s - bb)) + (b - bb)
    return _B((s, e))


def quick_two_sum(a, b):
    """Error-free sum assuming |a| >= |b|."""
    s = _B(a + b)
    e = b - _B(s - a)
    return _B((s, e))


def split(a):
    """Dekker split: a == hi + lo with hi, lo each having <=12 mantissa bits."""
    c = _B(_SPLITTER * a)
    hi = _B(c - _B(c - a))
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free product: returns (p, e) with p + e == a * b exactly."""
    p = _B(a * b)
    a_hi, a_lo = split(a)
    b_hi, b_lo = split(b)
    e = (_B(a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return _B((p, e))


def ff_add(hi, lo, b_hi, b_lo=None):
    """(hi, lo) + (b_hi[, b_lo]) -> renormalized float-float pair."""
    if b_lo is None:
        b_lo = jnp.zeros_like(b_hi)
    s, e = two_sum(hi, b_hi)
    e = e + (lo + b_lo)
    # Full TwoSum renormalization: under cancellation (hi ~ -b_hi) the
    # quick variant's |s| >= |e| precondition fails and drops bits.
    return two_sum(s, e)


def ff_matvec(A, x_hi, x_lo=None, A_lo=None):
    """Compensated matvec: A @ x with float-float accumulation.

    A: (n, m) float32; x_hi/x_lo: (m,) float-float vector; optional A_lo
    carries a float-float matrix's low part.  Returns the (n,) result as a
    float-float pair accurate to ~|A||x| * eps^2.

    Accumulates column contributions sequentially under ``lax.scan`` with
    TwoProd products and TwoSum accumulation — O(n*m) work like a plain
    matvec, ~6x the flops, fully vmappable over a batch axis.  Used only on
    accuracy-critical paths (single-scenario parity, solution polish).
    """
    m = A.shape[1]
    if x_lo is None:
        x_lo = jnp.zeros_like(x_hi)

    def body(carry, k):
        acc_hi, acc_lo = carry
        col = A[:, k]
        p, e = two_prod(col, x_hi[k])
        e = e + col * x_lo[k]
        if A_lo is not None:
            e = e + A_lo[:, k] * (x_hi[k] + x_lo[k])
        acc_hi, acc_lo = ff_add(acc_hi, acc_lo, p, e)
        return (acc_hi, acc_lo), None

    init = (jnp.zeros(A.shape[0], A.dtype), jnp.zeros(A.shape[0], A.dtype))
    (hi, lo), _ = jax.lax.scan(body, init, jnp.arange(m))
    return hi, lo


def ff_matmul(A_hi, A_lo, B_hi, B_lo):
    """Compensated dense matmul: (A_hi + A_lo) @ (B_hi + B_lo) -> ff pair.

    Scans the contraction axis, accumulating outer-product slabs with
    TwoProd/TwoSum; error terms (hi*lo cross products and lo*lo) are summed
    in plain f32, which keeps the result accurate to ~eps^2 of the product
    scale — effectively float64 for the condensing sizes used here.
    """
    K = A_hi.shape[-1]
    n, m = A_hi.shape[0], B_hi.shape[1]

    def body(carry, k):
        acc_hi, acc_lo = carry
        a_hi, a_lo = A_hi[:, k, None], A_lo[:, k, None]
        b_hi, b_lo = B_hi[None, k, :], B_lo[None, k, :]
        p, e = two_prod(a_hi, b_hi)
        e = e + a_hi * b_lo + a_lo * (b_hi + b_lo)
        acc_hi, acc_lo = ff_add(acc_hi, acc_lo, p, e)
        return (acc_hi, acc_lo), None

    z = jnp.zeros((n, m), A_hi.dtype)
    (hi, lo), _ = jax.lax.scan(body, (z, z), jnp.arange(K))
    return hi, lo


def ff_to_f32(hi, lo):
    return hi + lo
