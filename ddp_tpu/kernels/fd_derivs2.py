"""Pallas TPU kernel: batched SECOND-order forward-dynamics derivatives.

The reference always runs full DDP — dynamics/constraint Hessians are
computed every iteration (problem.hpp:989-997, via finite differences of the
analytic ABA Jacobians, problem.hpp:67-150).  On TPU the straight
jacfwd-over-assembled-Jacobian formulation materializes ~5 MB of
tangent-chain intermediates *per sample* ("Used 44.04G of 15.75G" at B=512,
docs/DESIGN.md "Full-DDP at arm dims"), because each of the nz=2·ndx+nu
Hessian columns re-runs the whole kinematic chain through HBM.

This kernel pushes the (q, v) tangent duals through the chain ONCE at second
order, entirely in VMEM, emitting per sample

    (q, v, τ) → (a, ∂a/∂q, ∂a/∂v, M⁻¹, H)   with H[o, i, j] = ∂²a_o/∂ζ_i∂ζ_j

over ζ = (q, v, τ) — everything the full-DDP derivative sweep needs, with
the batch on the TPU lane axis (same recipe as kernels/fd_derivs.py, which
bought 4.2× at first order by eliminating those bytes).

Mechanism: the shared unrolled chain (fd_derivs._chain_M_bias) runs over
truncated second-order Taylor duals ``_D2`` = (primal, sparse gradient,
sparse upper-triangle Hessian), giving the exact Hessians of the mass
matrix M(q) and bias(q, v).  The acceleration Hessian then follows from
implicitly differentiating RNEA(q, v, a) = τ twice:

    M ∂ij a = −[∂ij bias + (∂ij M)·a + (∂i M)(∂j a) + (∂j M)(∂i a)]
    M ∂(τ_k)∂s a = −(∂s M)·(M⁻¹ e_k),         ∂τ∂τ' a = 0

— nv·(NZ² upper triangle) extra triangular solves against the one unrolled
Cholesky factor, no extra chain evaluations.  Exactness vs jacfwd∘jacfwd is
pinned by tests/test_fd_derivs2_kernel.py (f64 interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddp_tpu.kernels.fd_derivs import (
    _add_entry,
    _chain_M_bias,
    _neg_entry,
    _scale_t,
    _sub_entry,
    _tzip,
    model_spec,
)
from ddp_tpu.kernels.riccati_small import _chol_solve_unrolled


# ---------------------------------------------------------------------------
# second-order sparse duals
# ---------------------------------------------------------------------------
# A ``_D2`` carries (p, t, h): primal, gradient tuple (length NC), and the
# upper triangle of the Hessian as a tuple (length NC·(NC+1)/2, row-major:
# entry (i, j), i ≤ j, at index i·NC − i(i−1)/2 + (j−i)).  Entries are
# float (trace-time constant), a [block] lane vector, or None (exact zero);
# all structural zeros fold away in Python before Mosaic sees the program.


def _neg_t(t):
    return None if t is None else tuple(map(_neg_entry, t))


def _e_mul(x, y):
    if x is None or y is None:
        return None
    return x * y


def _outer_sym(ta, tb):
    """Upper triangle of ∇a·∇bᵀ + ∇b·∇aᵀ: entry (i, j) = a_i·b_j + a_j·b_i
    (= 2·a_i·b_i on the diagonal)."""
    if ta is None or tb is None:
        return None
    NC = len(ta)
    out = []
    any_ = False
    for i in range(NC):
        for j in range(i, NC):
            e = _add_entry(_e_mul(ta[i], tb[j]), _e_mul(ta[j], tb[i]))
            out.append(e)
            if e is not None:
                any_ = True
    return tuple(out) if any_ else None


class _D2:
    """Truncated second-order Taylor value (p, ∇, upper-tri Hessian)."""

    __slots__ = ("p", "t", "h")

    def __init__(self, p, t=None, h=None):
        self.p = p
        self.t = t
        self.h = h

    def __add__(self, o):
        if isinstance(o, _D2):
            return _D2(
                self.p + o.p,
                _tzip(self.t, o.t, _add_entry),
                _tzip(self.h, o.h, _add_entry),
            )
        return _D2(self.p + o, self.t, self.h)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, _D2):
            return _D2(
                self.p - o.p,
                _tzip(self.t, o.t, _sub_entry),
                _tzip(self.h, o.h, _sub_entry),
            )
        return _D2(self.p - o, self.t, self.h)

    def __rsub__(self, o):
        return _D2(o - self.p, _neg_t(self.t), _neg_t(self.h))

    def __neg__(self):
        return _D2(-self.p, _neg_t(self.t), _neg_t(self.h))

    def __mul__(self, o):
        # H(fg) = f·Hg + g·Hf + (∇f∇gᵀ + ∇g∇fᵀ)
        if isinstance(o, _D2):
            p = self.p * o.p
            t = _tzip(_scale_t(self.t, o.p), _scale_t(o.t, self.p), _add_entry)
            h = _tzip(_scale_t(self.h, o.p), _scale_t(o.h, self.p), _add_entry)
            h = _tzip(h, _outer_sym(self.t, o.t), _add_entry)
            return _D2(p, t, h)
        return _D2(self.p * o, _scale_t(self.t, o), _scale_t(self.h, o))

    __rmul__ = __mul__


def _d2sin(x):
    if not isinstance(x, _D2):
        return jnp.sin(x)
    sn, cs = jnp.sin(x.p), jnp.cos(x.p)
    # H(sin u) = cos·Hu − sin·∇u∇uᵀ; _outer_sym(t, t) = 2·∇u∇uᵀ
    h = _tzip(
        _scale_t(x.h, cs), _scale_t(_outer_sym(x.t, x.t), sn * (-0.5)), _add_entry
    )
    return _D2(sn, _scale_t(x.t, cs), h)


def _d2cos(x):
    if not isinstance(x, _D2):
        return jnp.cos(x)
    sn, cs = jnp.sin(x.p), jnp.cos(x.p)
    h = _tzip(
        _scale_t(x.h, -sn), _scale_t(_outer_sym(x.t, x.t), cs * (-0.5)), _add_entry
    )
    return _D2(cs, _scale_t(x.t, -sn), h)


def _p(x):
    return x.p if isinstance(x, _D2) else x


def _t_col(x, c):
    if isinstance(x, _D2) and x.t is not None:
        return x.t[c]
    return None


def _h_ent(x, idx):
    if isinstance(x, _D2) and x.h is not None:
        return x.h[idx]
    return None


def _hidx(i, j, NC):
    """Upper-triangle flat index of (i, j), i ≤ j."""
    return i * NC - i * (i - 1) // 2 + (j - i)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _fd2_kernel(qvu_ref, a_ref, Aq_ref, Av_ref, Mi_ref, H_ref, *, spec):
    nv = len(spec["joint_types"])
    NC = 2 * nv  # dual seed space: (q, v)
    NZ = 3 * nv  # output Hessian space: (q, v, τ)

    # ---- seed second-order duals on (q, v); τ primal-only ----
    q, v, tau = [], [], []
    for i in range(nv):
        tq = [None] * NC
        tq[i] = 1.0
        q.append(_D2(qvu_ref[i, :], tuple(tq)))
        tv = [None] * NC
        tv[nv + i] = 1.0
        v.append(_D2(qvu_ref[nv + i, :], tuple(tv)))
        tau.append(qvu_ref[2 * nv + i, :])

    M, bias = _chain_M_bias(q, v, spec, sin=_d2sin, cos=_d2cos)

    zero = qvu_ref[0, :] * 0.0

    def vec(x):
        if x is None:
            return zero
        if isinstance(x, float):
            return zero + x
        return x

    def Mat(i, j):
        return M[min(i, j)][max(i, j)]

    # ---- primal solve: a = M⁻¹ (τ − bias) ----
    Mp = [[vec(_p(Mat(i, j))) for j in range(nv)] for i in range(nv)]
    rhs_a = [vec(tau[i] - _p(bias[i])) for i in range(nv)]
    (a_sol,), L = _chol_solve_unrolled(Mp, [rhs_a], nv, 0.0)

    def chol_apply(rhs):
        y = [None] * nv
        for i in range(nv):
            s = rhs[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * nv
        for i in reversed(range(nv)):
            s = y[i]
            for k in range(i + 1, nv):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return x

    # ---- first-order columns (kept for the cross terms below) ----
    da = []  # da[c][n] = ∂a_n/∂ζ_c, c < NC
    for c in range(NC):
        rhs = []
        for n in range(nv):
            acc = vec(_t_col(bias[n], c))
            for j in range(nv):
                tM = _t_col(Mat(n, j), c)
                if tM is not None:
                    acc = acc + vec(tM) * a_sol[j]
            rhs.append(-acc)
        col = chol_apply(rhs)
        da.append(col)
        dst = Aq_ref if c < nv else Av_ref
        cc = c if c < nv else c - nv
        for n in range(nv):
            dst[n * nv + cc, :] = col[n]

    # ---- M⁻¹ columns ----
    Minv_cols = []
    for c in range(nv):
        col = chol_apply([zero + (1.0 if i == c else 0.0) for i in range(nv)])
        Minv_cols.append(col)
        for n in range(nv):
            Mi_ref[n * nv + c, :] = col[n]

    def hstore(o, i, j, val):
        H_ref[(o * NZ + i) * NZ + j, :] = val

    # ---- (q, v) × (q, v) Hessian block ----
    for i in range(NC):
        for j in range(i, NC):
            hx = _hidx(i, j, NC)
            rhs = []
            for n in range(nv):
                acc = vec(_h_ent(bias[n], hx))
                for k in range(nv):
                    Mnk = Mat(n, k)
                    hM = _h_ent(Mnk, hx)
                    if hM is not None:
                        acc = acc + vec(hM) * a_sol[k]
                    tMi = _t_col(Mnk, i)
                    if tMi is not None:
                        acc = acc + vec(tMi) * da[j][k]
                    tMj = _t_col(Mnk, j)
                    if tMj is not None:
                        acc = acc + vec(tMj) * da[i][k]
                rhs.append(-acc)
            col = chol_apply(rhs)
            for n in range(nv):
                hstore(n, i, j, col[n])
                if i != j:
                    hstore(n, j, i, col[n])

    # ---- τ cross terms: ∂²a/∂τ_k∂ζ_s = −M⁻¹ (∂s M) M⁻¹ e_k ----
    for s_ in range(NC):
        has = any(
            _t_col(Mat(n, m), s_) is not None
            for n in range(nv)
            for m in range(n, nv)
        )
        if not has:  # M is q-only: every v column lands here
            for k in range(nv):
                for n in range(nv):
                    hstore(n, 2 * nv + k, s_, zero)
                    hstore(n, s_, 2 * nv + k, zero)
            continue
        for k in range(nv):
            rhs = []
            for n in range(nv):
                acc = None
                for m in range(nv):
                    tM = _t_col(Mat(n, m), s_)
                    if tM is not None:
                        term = vec(tM) * Minv_cols[k][m]
                        acc = term if acc is None else acc + term
                rhs.append(zero if acc is None else -acc)
            col = chol_apply(rhs)
            for n in range(nv):
                hstore(n, 2 * nv + k, s_, col[n])
                hstore(n, s_, 2 * nv + k, col[n])

    # ---- τ × τ block is exactly zero (a is affine in τ) ----
    for k in range(nv):
        for k2 in range(nv):
            for n in range(nv):
                hstore(n, 2 * nv + k, 2 * nv + k2, zero)

    for i in range(nv):
        a_ref[i, :] = a_sol[i]


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def _make_fd2_call(spec):
    nv = len(spec["joint_types"])
    NZ = 3 * nv

    @functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
    def call(qvu_t, *, block_b, interpret):
        N = qvu_t.shape[-1]
        grid = (N // block_b,)
        kernel = functools.partial(_fd2_kernel, spec=spec)
        out_shape = [
            jax.ShapeDtypeStruct((nv, N), qvu_t.dtype),
            jax.ShapeDtypeStruct((nv * nv, N), qvu_t.dtype),
            jax.ShapeDtypeStruct((nv * nv, N), qvu_t.dtype),
            jax.ShapeDtypeStruct((nv * nv, N), qvu_t.dtype),
            jax.ShapeDtypeStruct((nv * NZ * NZ, N), qvu_t.dtype),
        ]

        def bs(rows):
            return pl.BlockSpec(
                (rows, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            )

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs(3 * nv)],
            out_specs=[bs(nv), bs(nv * nv), bs(nv * nv), bs(nv * nv), bs(nv * NZ * NZ)],
            out_shape=out_shape,
            # the straight-line second-order chain keeps ~78 Hessian lane
            # vectors live per scalar intermediate — the scoped footprint at
            # arm dims (~27 MiB at block 128) exceeds the 16 MiB default
            # scoped limit but not the chip's physical VMEM; raise the cap
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(qvu_t)

    return call


_SPEC_CACHE_MAX = 32
_SPEC_CACHE: dict = {}  # key -> jitted callable; insertion-ordered LRU


def _spec_cache_get(key, spec):
    if key in _SPEC_CACHE:
        _SPEC_CACHE[key] = _SPEC_CACHE.pop(key)
    else:
        if len(_SPEC_CACHE) >= _SPEC_CACHE_MAX:
            del _SPEC_CACHE[next(iter(_SPEC_CACHE))]
        _SPEC_CACHE[key] = _make_fd2_call(spec)
    return _SPEC_CACHE[key]


def fd_derivs2_pallas(model, q, v, tau, *, block_b=256, interpret=False):
    """Batched (a, ∂a/∂q, ∂a/∂v, M⁻¹, H) for [N, nv] inputs.

    H is [N, nv, NZ, NZ] with NZ = 3·nv over ζ = (q, v, τ): the full
    symmetric acceleration Hessian (ττ block exactly zero).  N must be a
    multiple of ``block_b``.  Default lane block 256 — measured fastest at
    UR5 dims on v5e (N=8192: 696 ns/sample vs 1565 at 128 and 1255 at 512,
    where the Hessian live set starts spilling)."""
    spec = model_spec(model)
    key = (
        spec["joint_types"],
        spec["parents"],
        spec["axes"].tobytes(),
        spec["jp_rot"].tobytes(),
        spec["jp_trans"].tobytes(),
        spec["inertias"].tobytes(),
        spec["gravity"].tobytes(),
        spec["damping"].tobytes(),
    )
    call = _spec_cache_get(key, spec)
    nv = len(spec["joint_types"])
    NZ = 3 * nv
    N = q.shape[0]
    if N % block_b:
        raise ValueError(f"N={N} not a multiple of block_b={block_b}")
    qvu_t = jnp.concatenate([q, v, tau], axis=1).T  # [3·nv, N]
    a_t, Aq_t, Av_t, Mi_t, H_t = call(qvu_t, block_b=block_b, interpret=interpret)
    a = a_t.T
    A = Aq_t.T.reshape(N, nv, nv)
    Bv = Av_t.T.reshape(N, nv, nv)
    Mi = Mi_t.T.reshape(N, nv, nv)
    H = H_t.T.reshape(N, nv, NZ, NZ)
    return a, A, Bv, Mi, H
