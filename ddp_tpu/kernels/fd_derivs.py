"""Pallas TPU kernel: batched forward-dynamics derivative blocks.

The arm-class batched solve is derivative-bound: at UR5 dims the
jacfwd-over-RNEA stage moves ~27 GB of materialized intermediates for
2.6 GFLOP of work (0.1 FLOP/byte — measured via XLA cost analysis,
docs/DESIGN.md "Arm-class dims"), because every einsum in the vmapped
kinematic chain round-trips [B·T·cols, …] temporaries through HBM.  This
kernel computes, per sample,

    (q, v, τ) → (a, ∂a/∂q, ∂a/∂v, M⁻¹)

entirely in VMEM with the batch on the TPU lane axis — the same
batch-on-lanes recipe as kernels/riccati_small.py.  ≙ Pinocchio's
computeABADerivatives (pinocchio_model.ipp:359-400) as a single fused
TPU program.

Two structural tricks make the kernel small and fast:

- **Static model specialization.** Joint types, parents, axes, fixed
  placements, spatial inertias, gravity and damping are concrete numbers
  at trace time (the model pytree is data, not tracers), so the whole
  kinematic chain unrolls into straight-line VPU code with every
  structural zero constant-folded in Python.  Supports revolute/prismatic
  joints (vector-space configurations — the same gate as the analytic
  Euler path, ocp/dynamics.py).

- **Sparse forward-mode duals.** Derivatives are propagated by a tiny
  hand-rolled dual-number type whose tangent is a tuple of per-column
  entries, each a [block] lane vector, a Python float (constant fold), or
  None (exact zero).  Seeding column i of (q, v) with the float 1.0 keeps
  early-chain tangents sparse: a joint's rotation only carries tangents of
  its own column until the world chain mixes ancestors in, so the dual
  arithmetic does ~half the work of a dense 2·nv-column JVP.

The implicit-function scheme matches models/rigid_body.py::fd_derivatives:
differentiate RNEA(q, v, a) = τ at the solution,

    [∂a/∂q | ∂a/∂v] = −M⁻¹ (∂bias/∂(q,v) + (∂M/∂(q,v))·a),   ∂a/∂τ = M⁻¹,

with one unrolled 6×6 Cholesky (reused from kernels/riccati_small) and
2·nv+nv+1 triangular solves.  Exactness vs the XLA path is pinned by
tests/test_fd_derivs_kernel.py (f64 interpret mode, 1e-9).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddp_tpu.kernels.riccati_small import _chol_solve_unrolled


# ---------------------------------------------------------------------------
# sparse dual numbers over lane vectors
# ---------------------------------------------------------------------------
# A value is a Python float (trace-time constant), a jnp [block] vector
# (primal-only), or a _D carrying (primal, tangent-tuple).  Tangent entries
# are float / [block] vector / None (exact zero).  Arithmetic between all
# kinds is defined so structural zeros fold away at trace time.


def _tzip(ta, tb, f):
    if ta is None:
        return tb if f is _add_entry else tuple(map(_neg_entry, tb)) if tb else None
    if tb is None:
        return ta
    return tuple(f(x, y) for x, y in zip(ta, tb))


def _add_entry(x, y):
    if x is None:
        return y
    if y is None:
        return x
    return x + y


def _sub_entry(x, y):
    if x is None:
        return _neg_entry(y)
    if y is None:
        return x
    return x - y


def _neg_entry(x):
    return None if x is None else -x


def _scale_t(t, s):
    """tangent · s with s a primal (float or vector)."""
    if t is None:
        return None
    if isinstance(s, float) and s == 0.0:
        return None
    return tuple(None if x is None else x * s for x in t)


class _D:
    """Dual number: primal p (float or [block] vec) + sparse tangent."""

    __slots__ = ("p", "t")

    def __init__(self, p, t=None):
        self.p = p
        self.t = t

    # -- addition/subtraction --
    def __add__(self, o):
        if isinstance(o, _D):
            return _D(self.p + o.p, _tzip(self.t, o.t, _add_entry))
        return _D(self.p + o, self.t)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, _D):
            return _D(self.p - o.p, _tzip(self.t, o.t, _sub_entry))
        return _D(self.p - o, self.t)

    def __rsub__(self, o):
        return _D(o - self.p, None if self.t is None else tuple(
            map(_neg_entry, self.t)))

    def __neg__(self):
        return _D(-self.p, None if self.t is None else tuple(
            map(_neg_entry, self.t)))

    # -- multiplication --
    def __mul__(self, o):
        if isinstance(o, _D):
            return _D(
                self.p * o.p,
                _tzip(_scale_t(self.t, o.p), _scale_t(o.t, self.p), _add_entry),
            )
        return _D(self.p * o, _scale_t(self.t, o))

    __rmul__ = __mul__


def _dsin(x: _D) -> _D:
    return _D(jnp.sin(x.p), _scale_t(x.t, jnp.cos(x.p)))


def _dcos(x: _D) -> _D:
    return _D(jnp.cos(x.p), _scale_t(x.t, -jnp.sin(x.p)))


def _primal(x):
    return x.p if isinstance(x, _D) else x


def _tangent_col(x, c):
    """Tangent column c of x as float/vec/None."""
    if isinstance(x, _D) and x.t is not None:
        return x.t[c]
    return None


# -- small dense helpers on lists (entries: float / vec / _D) --


def _mat_vec(A, x):
    return [sum(A[i][j] * x[j] for j in range(len(x))) for i in range(len(A))]


def _mat_mul(A, B):
    n, k, m = len(A), len(B), len(B[0])
    return [
        [sum(A[i][r] * B[r][j] for r in range(k)) for j in range(m)]
        for i in range(n)
    ]


def _transpose(A):
    return [[A[j][i] for j in range(len(A))] for i in range(len(A[0]))]


def _vadd(a, b):
    return [x + y for x, y in zip(a, b)]


def _vsub(a, b):
    return [x - y for x, y in zip(a, b)]


def _cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _dot(a, b):
    return sum(x * y for x, y in zip(a, b))


def _crm_apply(v6, u6):
    """crm(v) @ u = [w×u_a, vl×u_a + w×u_l] (w = v[:3], vl = v[3:])."""
    w, vl = v6[:3], v6[3:]
    ua, ul = u6[:3], u6[3:]
    top = _cross(w, ua)
    bot = _vadd(_cross(vl, ua), _cross(w, ul))
    return top + bot


def _crmT_apply(v6, u6):
    """crm(v)ᵀ @ u = [−w×u_a − vl×u_l, −w×u_l]."""
    w, vl = v6[:3], v6[3:]
    ua, ul = u6[:3], u6[3:]
    top = [-x for x in _vadd(_cross(w, ua), _cross(vl, ul))]
    bot = [-x for x in _cross(w, ul)]
    return top + bot


# ---------------------------------------------------------------------------
# static model spec
# ---------------------------------------------------------------------------


def model_spec(model) -> dict:
    """Extract the concrete (numpy) model constants the kernel bakes in.

    Requires revolute/prismatic joints only (1-DoF, vector-space config —
    the analytic-Jacobian gate of ocp/dynamics.py)."""
    jt = tuple(model.joint_types)
    if not all(t in ("revolute", "prismatic") for t in jt):
        raise ValueError(f"fd_derivs kernel supports revolute/prismatic; got {jt}")
    return dict(
        joint_types=jt,
        parents=tuple(int(p) for p in model.parents),
        axes=np.asarray(model.axes, np.float64),
        jp_rot=np.asarray(model.jp_rot, np.float64),
        jp_trans=np.asarray(model.jp_trans, np.float64),
        inertias=np.asarray(model.inertias, np.float64),
        gravity=np.asarray(model.gravity, np.float64),
        damping=np.asarray(model.damping, np.float64),
    )


def _hat_np(a):
    return np.array(
        [[0.0, -a[2], a[1]], [a[2], 0.0, -a[0]], [-a[1], a[0], 0.0]], np.float64
    )


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _chain_M_bias(q, v, spec, *, sin, cos):
    """The unrolled kinematics → CRBA → RNEA chain over dual-ish values.

    ``q``/``v`` are length-nv lists of any type supporting +, -, * with
    floats and with each other (plain lane vectors, first-order ``_D``
    duals, or second-order ``_D2`` duals from kernels/fd_derivs2.py);
    ``sin``/``cos`` are the matching elementary functions.  Returns
    (M upper-triangle-filled [nv][nv], bias [nv]) in the same value type.
    Shared by the first- and second-order fd-derivative kernels."""
    jt = spec["joint_types"]
    par = spec["parents"]
    nb = len(jt)
    nv = nb

    def f(x):
        return float(x)

    # ---- world kinematics (≙ RobotModel._world_quantities) ----
    Rw = [None] * nb  # world rotations, 3×3 of duals
    pw = [None] * nb  # world positions, 3 of duals
    Sw = [None] * nb  # world joint subspace columns, 6 of duals
    for i in range(nb):
        ax = spec["axes"][i]
        Ep = [[f(spec["jp_rot"][i][a][b]) for b in range(3)] for a in range(3)]
        rp = [f(spec["jp_trans"][i][a]) for a in range(3)]
        if jt[i] == "revolute":
            K = _hat_np(ax)
            K2 = K @ K
            c, s = cos(q[i]), sin(q[i])
            omc = 1.0 - c
            # R = I + s·K + (1−c)·K²; joint transform E = Rᵀ
            R = [
                [
                    (1.0 if a == b else 0.0) + s * f(K[a][b]) + omc * f(K2[a][b])
                    for b in range(3)
                ]
                for a in range(3)
            ]
            E = _transpose(R)
            rj = [0.0, 0.0, 0.0]
            S_ang = [f(x) for x in ax]
            S_lin = [0.0, 0.0, 0.0]
        else:  # prismatic
            E = [[1.0 if a == b else 0.0 for b in range(3)] for a in range(3)]
            rj = [q[i] * f(ax[a]) for a in range(3)]
            S_ang = [0.0, 0.0, 0.0]
            S_lin = [f(x) for x in ax]
        # compose fixed placement: E_full = E·Ep, r = rp + Epᵀ·rj
        Ef = _mat_mul(E, Ep)
        r = _vadd(rp, _mat_vec(_transpose(Ep), rj))
        p = par[i]
        if p < 0:
            Rw[i] = _transpose(Ef)
            pw[i] = r
        else:
            Rw[i] = _mat_mul(Rw[p], _transpose(Ef))
            pw[i] = _vadd(_mat_vec(Rw[p], r), pw[p])
        sw_ang = _mat_vec(Rw[i], S_ang)
        sw_lin = _vadd(_cross(pw[i], sw_ang), _mat_vec(Rw[i], S_lin))
        Sw[i] = sw_ang + sw_lin

    # ---- world spatial inertias: Iw = X_bwᵀ I X_bw ----
    Iw = []
    for i in range(nb):
        R = Rw[i]
        ph = [
            [0.0, -pw[i][2], pw[i][1]],
            [pw[i][2], 0.0, -pw[i][0]],
            [-pw[i][1], pw[i][0], 0.0],
        ]
        Rt = _transpose(R)
        mRtph = [[-x for x in row] for row in _mat_mul(Rt, ph)]
        # X_bw = [[Rᵀ, 0], [−Rᵀp̂, Rᵀ]]
        X = [Rt[a] + [0.0, 0.0, 0.0] for a in range(3)] + [
            mRtph[a] + Rt[a] for a in range(3)
        ]
        Ist = [[f(spec["inertias"][i][a][b]) for b in range(6)] for a in range(6)]
        Y = _mat_mul(Ist, X)
        Iw.append(_mat_mul(_transpose(X), Y))

    # ---- mass matrix via composite rigid bodies (CRBA) ----
    IC = [[[Iw[i][a][b] for b in range(6)] for a in range(6)] for i in range(nb)]
    for i in reversed(range(nb)):
        p = par[i]
        if p >= 0:
            for a in range(6):
                for b in range(6):
                    IC[p][a][b] = IC[p][a][b] + IC[i][a][b]
    M = [[0.0] * nv for _ in range(nv)]
    for j in range(nv):
        u = _mat_vec(IC[j], Sw[j])
        i = j
        while i >= 0:
            M[i][j] = _dot(Sw[i], u)
            i = par[i]

    # ---- bias forces: RNEA(q, v, 0) with gravity + damping ----
    anc = [[] for _ in range(nb)]  # ancestors incl. self
    for i in range(nb):
        j = i
        while j >= 0:
            anc[i].append(j)
            j = par[j]
    vb = []
    for b in range(nb):
        acc = [0.0] * 6
        for n in anc[b]:
            acc = _vadd(acc, [Sw[n][s] * v[n] for s in range(6)])
        vb.append(acc)
    g = spec["gravity"]
    a0 = [0.0, 0.0, 0.0, -f(g[0]), -f(g[1]), -f(g[2])]
    psi = [_crm_apply(vb[c], [Sw[c][s] * v[c] for s in range(6)]) for c in range(nv)]
    ab = []
    for b in range(nb):
        acc = [a0[s] for s in range(6)]
        for c in anc[b]:
            acc = _vadd(acc, psi[c])
        ab.append(acc)
    bias = []
    fb = []
    for b in range(nb):
        Ivb = _mat_vec(Iw[b], vb[b])
        fb.append(_vsub(_mat_vec(Iw[b], ab[b]), _crmT_apply(vb[b], Ivb)))
    for n in range(nv):
        acc = f(spec["damping"][n]) * v[n]
        for b in range(nb):
            if n in anc[b]:
                acc = acc + _dot(Sw[n], fb[b])
        bias.append(acc)

    return M, bias


def _fd_kernel(qvu_ref, a_ref, Aq_ref, Av_ref, Mi_ref, *, spec):
    nv = len(spec["joint_types"])
    NC = 2 * nv

    # ---- seed duals: column i of (q, v) gets tangent float 1.0 ----
    q, v, tau = [], [], []
    for i in range(nv):
        tq = [None] * NC
        tq[i] = 1.0
        q.append(_D(qvu_ref[i, :], tuple(tq)))
        tv = [None] * NC
        tv[nv + i] = 1.0
        v.append(_D(qvu_ref[nv + i, :], tuple(tv)))
        tau.append(qvu_ref[2 * nv + i, :])  # primal only (∂a/∂τ = M⁻¹ free)

    M, bias = _chain_M_bias(q, v, spec, sin=_dsin, cos=_dcos)

    # ---- primal solve: a = M⁻¹ (τ − bias) ----
    zero = qvu_ref[0, :] * 0.0

    def vec(x):
        """Materialize float/None entries to [block] vectors."""
        if x is None:
            return zero
        if isinstance(x, float):
            return zero + x
        return x

    Mp = [[vec(_primal(M[min(i, j)][max(i, j)])) for j in range(nv)] for i in range(nv)]
    rhs_a = [vec(tau[i] - _primal(bias[i])) for i in range(nv)]
    (a_sol,), L = _chol_solve_unrolled(Mp, [rhs_a], nv, 0.0)

    # ---- tangent rows: dRNEA = ∂bias + (∂M)·a, then AB = −M⁻¹·dRNEA ----
    # (solve re-uses the factor L via the identity in _chol_solve_unrolled's
    #  returned factor: redo fwd/bwd substitution per rhs)
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

    for c in range(NC):
        rhs = []
        for n in range(nv):
            acc = _tangent_col(bias[n], c)
            acc = vec(acc)
            for j in range(nv):
                Mnj = M[min(n, j)][max(n, j)]
                tM = _tangent_col(Mnj, c)
                if tM is not None:
                    acc = acc + vec(tM) * a_sol[j]
            rhs.append(-acc)
        col = chol_apply(rhs)
        dst = Aq_ref if c < nv else Av_ref
        cc = c if c < nv else c - nv
        for n in range(nv):
            dst[n * nv + cc, :] = col[n]

    # ---- M⁻¹ columns ----
    for c in range(nv):
        rhs = [zero + (1.0 if i == c else 0.0) for i in range(nv)]
        col = chol_apply(rhs)
        for n in range(nv):
            Mi_ref[n * nv + c, :] = col[n]

    for i in range(nv):
        a_ref[i, :] = a_sol[i]


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def _make_fd_call(spec):
    """Per-spec jitted kernel wrapper.  The callable (and its compile cache)
    lives in the LRU entry, so evicting a spec drops exactly that spec's jit
    specializations and nothing else (ADVICE r4 — the previous design held
    one module-level jit keyed on spec_key and had to clear ALL
    specializations on any eviction)."""
    nv = len(spec["joint_types"])

    @functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
    def call(qvu_t, *, block_b, interpret):
        N = qvu_t.shape[-1]
        grid = (N // block_b,)
        kernel = functools.partial(_fd_kernel, spec=spec)
        out_shape = [
            jax.ShapeDtypeStruct((nv, N), qvu_t.dtype),
            jax.ShapeDtypeStruct((nv * nv, N), qvu_t.dtype),
            jax.ShapeDtypeStruct((nv * nv, N), qvu_t.dtype),
            jax.ShapeDtypeStruct((nv * nv, N), qvu_t.dtype),
        ]

        def bs(rows):
            return pl.BlockSpec(
                (rows, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            )

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bs(3 * nv)],
            out_specs=[bs(nv), bs(nv * nv), bs(nv * nv), bs(nv * nv)],
            out_shape=out_shape,
            interpret=interpret,
        )(qvu_t)

    return call


# Bounded LRU keyed on the model-constant byte pattern, holding the per-spec
# jitted callables.  A long-lived process sweeping >32 model specs recompiles
# evicted specs on return instead of leaking memory/compilations.
_SPEC_CACHE_MAX = 32
_SPEC_CACHE: dict = {}  # key -> jitted callable; insertion-ordered LRU


def _spec_cache_get(key, spec):
    if key in _SPEC_CACHE:
        _SPEC_CACHE[key] = _SPEC_CACHE.pop(key)  # refresh LRU order
    else:
        if len(_SPEC_CACHE) >= _SPEC_CACHE_MAX:
            del _SPEC_CACHE[next(iter(_SPEC_CACHE))]
        _SPEC_CACHE[key] = _make_fd_call(spec)
    return _SPEC_CACHE[key]


def fd_derivs_pallas(model, q, v, tau, *, block_b=512, interpret=False):
    """Batched (a, ∂a/∂q, ∂a/∂v, M⁻¹) for [N, nv] inputs.

    N must be a multiple of ``block_b`` (the solver's B·T always is for the
    production configs; callers pad otherwise).  Returns
    (a [N, nv], A [N, nv, nv], Bv [N, nv, nv], Minv [N, nv, nv])."""
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
    N = q.shape[0]
    if N % block_b:
        raise ValueError(f"N={N} not a multiple of block_b={block_b}")
    qvu_t = jnp.concatenate([q, v, tau], axis=1).T  # [3·nv, N]
    a_t, Aq_t, Av_t, Mi_t = call(qvu_t, block_b=block_b, interpret=interpret)
    a = a_t.T
    A = Aq_t.T.reshape(N, nv, nv)
    Bv = Av_t.T.reshape(N, nv, nv)
    Mi = Mi_t.T.reshape(N, nv, nv)
    return a, A, Bv, Mi
