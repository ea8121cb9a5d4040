"""Parallel (associative-scan) Riccati backward pass — O(log T) depth.

The reference's backward sweep is serial in t (true data dependence through
Vx/Vxx, ddp_bwd.ipp:31-39; SURVEY.md §5 "long-context").  For the
Gauss-Newton/iLQR path (no dynamics Hessians) the Riccati recursion is an
associative operation on conditional-value-function elements, so the whole
sweep parallelizes over time via ``jax.lax.associative_scan`` — the
trajectory-optimization analog of scaling sequence length (PAPERS.md:
"The Parallelization of Riccati Recursion", arXiv:1809.06360; element
algebra as in Särkkä & García-Fernández's temporal parallelization of LQT).

Each step contributes an element e_t = (A, b, C, η, J) representing the
partially-minimized cost between its endpoint states; composition is

    A = A₂(I + C₁J₂)⁻¹A₁
    b = A₂(I + C₁J₂)⁻¹(b₁ + C₁η₂) + b₂
    C = A₂(I + C₁J₂)⁻¹C₁A₂ᵀ + C₂
    η = A₁ᵀ(I + J₂C₁)⁻¹(η₂ − J₂b₁) + η₁
    J = A₁ᵀ(I + J₂C₁)⁻¹J₂A₁ + J₁

After the (reverse) scan, element t composed with everything to its right
yields the value function V_t(dx) = ½dxᵀJdx − ηᵀdx, from which per-step
gains follow in one fully-parallel vmap.

Notes/limits:
- exact for the Gauss-Newton path (Problem.second_order=False);  with
  dynamics Hessians the Q-expansion couples V into the per-step elements
  and the recursion is no longer associative — use the sequential sweep.
- regularization is folded into the per-step control cost (stage-cost
  interpretation ½·reg·‖du‖²); identical to the sequential sweep at reg=0.
- AL multiplier terms enter through the effective stage-cost blocks exactly
  as in the sequential Q-expansion (ddp_bwd.ipp:61-88).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class _Elem(NamedTuple):
    A: jax.Array  # [T+1, n, n]
    b: jax.Array  # [T+1, n]
    C: jax.Array  # [T+1, n, n]
    eta: jax.Array  # [T+1, n]
    J: jax.Array  # [T+1, n, n]


def _compose(e1: _Elem, e2: _Elem) -> _Elem:
    """e1 ⊗ e2 (e1 earlier in time), batched over the leading axis."""
    n = e1.A.shape[-1]
    I = jnp.eye(n, dtype=e1.A.dtype)

    def one(A1, b1, C1, eta1, J1, A2, b2, C2, eta2, J2):
        M = I + C1 @ J2  # (I + C₁J₂)
        # solve instead of inverse; M is I + PSD·PSD-like, well conditioned
        # under the same assumptions as the sequential recursion
        A2M = A2 @ jnp.linalg.solve(M, I)
        A = A2M @ A1
        b = A2M @ (b1 + C1 @ eta2) + b2
        C = A2M @ C1 @ A2.T + C2
        Mt = I + J2 @ C1
        A1Mt = A1.T @ jnp.linalg.solve(Mt, I)
        eta = A1Mt @ (eta2 - J2 @ b1) + eta1
        J = A1Mt @ J2 @ A1 + J1
        return A, b, C, eta, J

    A, b, C, eta, J = jax.vmap(one)(
        e1.A, e1.b, e1.C, e1.eta, e1.J, e2.A, e2.b, e2.C, e2.eta, e2.J
    )
    return _Elem(A, b, C, eta, J)


def effective_stage_blocks(derivs, mult_val, mult_jac, mu, reg):
    """Per-step effective LQR blocks with AL terms folded into the cost —
    the V-independent parts of the Q-expansion (ddp_bwd.ipp:61-88).

    Returns (X, gx, U, gu, M): ½dxᵀXdx + gxᵀdx + ½duᵀUdu + guᵀdu + duᵀMdx.
    """
    nu = derivs.lu.shape[1]
    I_u = jnp.eye(nu, dtype=derivs.lu.dtype)

    def one(lx, lu, lxx, lux, luu, eqv, eqx, equ, pe, pex):
        tmp = pe + mu * eqv
        tmp2 = pex + mu * eqx
        X = lxx + eqx.T @ tmp2 + pex.T @ eqx
        gx = lx + eqx.T @ tmp + pex.T @ eqv
        U = luu + mu * equ.T @ equ + reg * I_u
        gu = lu + equ.T @ tmp
        M = lux + equ.T @ tmp2
        return X, gx, U, gu, M

    return jax.vmap(one)(
        derivs.lx, derivs.lu, derivs.lxx, derivs.lux, derivs.luu,
        derivs.eq, derivs.eqx, derivs.equ, mult_val, mult_jac,
    )  # fmt: skip


def backward_pass_assoc(derivs, mult_val, mult_jac, mu, reg):
    """Associative-scan Riccati: returns (k [T,nu], K [T,nu,ndx], ok).

    Gauss-Newton only (ignores fxx/fux/fuu — callers use
    Problem.second_order=False).
    """
    T, ndx = derivs.fx.shape[0], derivs.fx.shape[1]
    dtype = derivs.fx.dtype

    X, gx, U, gu, M = effective_stage_blocks(derivs, mult_val, mult_jac, mu, reg)
    F, L = derivs.fx, derivs.fu

    chol_U = jnp.linalg.cholesky(U)
    ok = jnp.all(jnp.isfinite(chol_U))

    def solve_U(rhs):
        return jax.vmap(lambda c, r: jax.scipy.linalg.cho_solve((c, True), r))(chol_U, rhs)

    Uinv_gu = solve_U(gu)  # [T, nu]
    Uinv_M = solve_U(M)  # [T, nu, ndx]
    Uinv_Lt = solve_U(jnp.swapaxes(L, 1, 2))  # [T, nu, ndx] = U⁻¹Lᵀ

    # per-step elements (drift c = 0: linearization is exact at the nominal)
    A = F - jnp.einsum("tij,tjk->tik", L, Uinv_M)
    b = -jnp.einsum("tij,tj->ti", L, Uinv_gu)
    C = jnp.einsum("tij,tjk->tik", L, Uinv_Lt)
    J = X - jnp.einsum("tji,tjk->tik", M, Uinv_M)
    eta = -(gx - jnp.einsum("tji,tj->ti", M, Uinv_gu))

    # terminal element: V_T(dx) = ½dxᵀlfxx dx + lfxᵀdx
    zero_n = jnp.zeros((1, ndx, ndx), dtype)
    elems = _Elem(
        A=jnp.concatenate([A, zero_n]),
        b=jnp.concatenate([b, jnp.zeros((1, ndx), dtype)]),
        C=jnp.concatenate([C, zero_n]),
        eta=jnp.concatenate([eta, -derivs.lfx[None]]),
        J=jnp.concatenate([J, derivs.lfxx[None]]),
    )

    # reverse=True passes the later-in-time composite as the FIRST argument;
    # _compose wants (earlier, later), so swap
    combined = jax.lax.associative_scan(
        lambda a, b: _compose(b, a), elems, reverse=True
    )
    # V_{t} from the element composed over [t, T]; we need V_{t+1} for gains
    S_next = combined.J[1:]  # [T, ndx, ndx]
    s_next = -combined.eta[1:]  # [T, ndx]

    def gains(S1, s1, F_t, L_t, U_t, gu_t, M_t):
        Quu = U_t + L_t.T @ S1 @ L_t
        Qu = gu_t + L_t.T @ s1
        Qux = M_t + L_t.T @ S1 @ F_t
        chol = jnp.linalg.cholesky(Quu)
        ok_t = jnp.all(jnp.isfinite(chol))
        k = -jax.scipy.linalg.cho_solve((chol, True), Qu)
        K = -jax.scipy.linalg.cho_solve((chol, True), Qux)
        return k, K, ok_t

    k, K, oks = jax.vmap(gains)(S_next, s_next, F, L, U, gu, M)
    return k, K, jnp.logical_and(ok, jnp.all(oks))
