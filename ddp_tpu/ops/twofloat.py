"""Double-float (error-free compensated pair) arithmetic on TPU.

The reference's multiprecision story is MPFR 500/1000-digit scalars threaded
through the whole template stack (SURVEY.md §2 #30; test/pinocchio_mpfr_500
.cpp, test/pendulum_ddp.cpp:15-17) — its tests use 1000-digit floats as the
derivative oracle.  TPUs have no MPFR and no native f64 ALU worth using; the
TPU-native extended-precision primitive is the **double-float**: an unevaluated
pair (hi, lo) of f32 giving ~48 mantissa bits (or f64 pairs on CPU giving
~106), built from Dekker/Knuth error-free transformations that are all plain
VPU add/mul — they vmap, jit, and run inside Pallas kernels unchanged.

This module provides the pair type and the operations the solver stack
needs: +, −, ×, ÷, sqrt, fused dot/sum reductions.  diagnostics and tests
use it as an on-device oracle (f32 pipeline vs twofloat reference) the same
way the reference uses MPFR against double.

Algorithms: Knuth two_sum, Dekker split/two_prod (f32 split at 2^12+1, f64 at
2^27+1), Bailey/Hida double-double add/mul/div/sqrt (QD library operation
set, public domain algorithms).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TF(NamedTuple):
    """Unevaluated sum hi + lo with |lo| ≤ ulp(hi)/2.  A pytree: vmap/jit/
    scan/Pallas all treat it as two ordinary arrays."""

    hi: jax.Array
    lo: jax.Array


def _split_const(dtype) -> float:
    # Dekker splitter: 2^ceil(p/2) + 1 for p mantissa bits.  Only f32/f64
    # are supported — for bf16/f16 the f64 splitter would silently destroy
    # the error terms instead of widening precision.
    dt = jnp.dtype(dtype)
    if dt == jnp.float32:
        return float(2**12 + 1)
    if dt == jnp.float64:
        return float(2**27 + 1)
    raise TypeError(f"twofloat arithmetic supports f32/f64 only, got {dt}")


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """Error-free a + b = s + e assuming |a| ≥ |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod(a, b):
    """Error-free a · b = p + e (Dekker split; no FMA exposed on VPU)."""
    p = a * b
    c = _split_const(jnp.result_type(a, b))
    aa = a * c
    a_hi = aa - (aa - a)
    a_lo = a - a_hi
    bb = b * c
    b_hi = bb - (bb - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def from_float(x) -> TF:
    x = jnp.asarray(x)
    return TF(x, jnp.zeros_like(x))


def to_float(x: TF):
    return x.hi + x.lo


def neg(x: TF) -> TF:
    return TF(-x.hi, -x.lo)


def add(x: TF, y: TF) -> TF:
    s, e = two_sum(x.hi, y.hi)
    e = e + x.lo + y.lo
    s, e = quick_two_sum(s, e)
    return TF(s, e)


def sub(x: TF, y: TF) -> TF:
    return add(x, neg(y))


def mul(x: TF, y: TF) -> TF:
    p, e = two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    p, e = quick_two_sum(p, e)
    return TF(p, e)


def div(x: TF, y: TF) -> TF:
    q1 = x.hi / y.hi
    r = sub(x, mul(from_float(q1), y))
    q2 = r.hi / y.hi
    r = sub(r, mul(from_float(q2), y))
    q3 = r.hi / y.hi
    s, e = quick_two_sum(q1, q2)
    return add(TF(s, e), from_float(q3))


def sqrt(x: TF) -> TF:
    """One Newton refinement of the f32 sqrt (Karp's trick)."""
    a = jnp.sqrt(x.hi)
    # r = (x − a²) / (2a);  sqrt ≈ a + r.  Guard a == 0: the correction is
    # 0/0 there (QD special-cases x == 0), and the guarded denominator also
    # keeps NaN out of the unused jvp/vjp branch.
    a2 = mul(from_float(a), from_float(a))
    r = sub(x, a2)
    denom = jnp.where(a == 0.0, jnp.ones_like(a), 2.0 * a)
    corr = jnp.where(a == 0.0, jnp.zeros_like(a), r.hi / denom)
    s, e = quick_two_sum(a, corr)
    return TF(s, e)


def scale(x: TF, c) -> TF:
    """x · c for an exact (power-of-two or plain float) scalar c."""
    return mul(x, from_float(jnp.asarray(c, x.hi.dtype)))


def sum_(x: TF, axis=None) -> TF:
    """Compensated reduction of a TF array along ``axis``."""

    def body(acc, pair):
        return add(acc, TF(*pair)), None

    if axis is None:
        flat = TF(jnp.ravel(x.hi), jnp.ravel(x.lo))
        zero = TF(jnp.zeros((), x.hi.dtype), jnp.zeros((), x.hi.dtype))
        acc, _ = jax.lax.scan(body, zero, (flat.hi, flat.lo))
        return acc
    hi = jnp.moveaxis(x.hi, axis, 0)
    lo = jnp.moveaxis(x.lo, axis, 0)
    zero = TF(jnp.zeros(hi.shape[1:], hi.dtype), jnp.zeros(hi.shape[1:], hi.dtype))
    acc, _ = jax.lax.scan(body, zero, (hi, lo))
    return acc


def dot(a, b) -> TF:
    """Compensated inner product of two plain-float vectors: exact products,
    compensated accumulation (≈ twice the working precision — the classic
    'dot2' kernel)."""
    p, e = two_prod(a, b)
    return sum_(TF(p, e))


def mv(A, x) -> TF:
    """Compensated matrix-vector product [m,n]·[n] → TF [m]."""
    p, e = two_prod(A, x[None, :])
    return sum_(TF(p, e), axis=1)


def tT(x: TF) -> TF:
    """Transpose of a TF matrix (exact)."""
    return TF(x.hi.T, x.lo.T)


def matvec(A: TF, x: TF) -> TF:
    """TF matrix · TF vector: [m,n]·[n] → [m], compensated accumulation."""
    p = mul(A, TF(x.hi[None, :], x.lo[None, :]))
    return sum_(p, axis=1)


def matmat(A: TF, B: TF) -> TF:
    """TF matrix · TF matrix: [m,k]·[k,n] → [m,n], compensated accumulation.
    Materializes the [m,k,n] product tensor — small-dims use only."""
    p = mul(
        TF(A.hi[:, :, None], A.lo[:, :, None]),
        TF(B.hi[None, :, :], B.lo[None, :, :]),
    )
    return sum_(p, axis=1)


def contract0(v: TF, T3: TF) -> TF:
    """Σ_o v_o · T3[o, :, :] — the backward pass's rank-3 contraction
    (≙ tensor.hpp:179-235 noalias_contract_add_outdim) in TF."""
    p = mul(TF(v.hi[:, None, None], v.lo[:, None, None]), T3)
    return sum_(p, axis=0)
