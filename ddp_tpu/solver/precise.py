"""Extended-precision (double-float) solver stages: the TPU-native
multiprecision envelope.

The reference threads MPFR 500/1000-digit scalars through its *entire*
template stack (test/pendulum_ddp.cpp:15-17, test/pinocchio_mpfr_500.cpp:1-17;
scalar-templated e.g. pinocchio_model.hpp:15).  TPUs have no MPFR and no f64
ALU worth using; the native equivalent is double-float (ops/twofloat.py):
~48 mantissa bits from f32 pairs, all plain VPU adds/muls that vmap/jit.

This module applies it where finite precision actually binds the solver:

- ``al_costs_tf`` / ``al_cost_total_tf``: the line-search acceptance test
  compares Σ AL-costs whose μ‖eq‖² terms dwarf the control-cost differences
  being resolved (cost_seq_aug ≙ ddp.hpp:699-735; acceptance
  ddp_fwd.ipp:53-63).  In f32 the comparison floor is μ·eps·‖eq‖²; the TF
  sum restores it to ~eps² and lets late iterations keep making progress.
- ``optimality_obj_tf`` / ``optimality_lag_tf``: the adjoint recursions
  (ddp.hpp:516-627) with compensated accumulation, so the multiplier-update
  gate and the convergence test see sub-f32-noise values.
- ``backward_sweep_tf``: the full Riccati recursion (ddp_bwd.ipp:9-155)
  carried in TF — Q-expansion products are error-free (two_prod), V carries
  a (hi, lo) pair, and the Quu solve is float Cholesky + one step of
  compensated iterative refinement.  Usable as an on-TPU oracle (the role
  MPFR-1000 plays in the reference's tests) and as a drop-in
  ``backward="tf"`` backend in solve_batched.

``solve(..., precise=True)`` (solver/solve.py) turns all three on.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ddp_tpu.ops import twofloat as tf
from ddp_tpu.ops.twofloat import TF
from ddp_tpu.solver import al as al_mod


def _F(x) -> TF:
    return tf.from_float(x)


def _mul_scalar(s, x) -> TF:
    """Error-free product of plain-float operands (broadcasts)."""
    return TF(*tf.two_prod(s, x))


def al_costs_tf(problem, xs, us, mults, mu) -> TF:
    """Per-step AL cost [T+1] in TF: l + p·eq + (μ/2)‖eq‖² with error-free
    products and compensated dot products.  ≙ cost_seq_aug (ddp.hpp:699-735).
    Constraint penalties are evaluated at statically-active timesteps only
    (same skip as al.al_costs — zeros contribute exactly zero to the TF sum)."""
    import numpy as np

    T = problem.horizon
    ts = jnp.arange(T)
    mask = jnp.asarray(problem.eq_mask(), dtype=xs.dtype)

    stage_l = jax.vmap(lambda t, x, u: problem.cost.stage(t, x, u))(
        ts, xs[:-1], us
    )
    hi = stage_l
    lo = jnp.zeros_like(stage_l)

    active = problem.active_ts() if hasattr(problem, "active_ts") else tuple(range(T))
    if problem.ne and active:

        def pen(t, x, u, p, m):
            ce = problem.constraint.value(t, x, u) * m
            acc = tf.add(tf.dot(p, ce), tf.mul(_F(0.5 * mu), tf.dot(ce, ce)))
            return acc

        if len(active) == T:
            pe = al_mod.eval_mults(problem.model, mults, xs)
            pen_all = jax.vmap(pen)(ts, xs[:-1], us, pe, mask)
            acc = tf.add(TF(hi, lo), pen_all)
            hi, lo = acc.hi, acc.lo
        else:
            from ddp_tpu.models.base import state_difference

            ts_a = np.asarray(active)
            pe_a = jax.vmap(
                lambda val, jac, origin, x: val
                + jac @ state_difference(problem.model, origin, x)
            )(mults.val[ts_a], mults.jac[ts_a], mults.origin[ts_a], xs[:-1][ts_a])
            pen_a = jax.vmap(pen)(
                jnp.asarray(ts_a), xs[:-1][ts_a], us[ts_a], pe_a, mask[ts_a]
            )
            acc_a = tf.add(TF(hi[ts_a], lo[ts_a]), pen_a)
            hi = hi.at[ts_a].set(acc_a.hi)
            lo = lo.at[ts_a].set(acc_a.lo)

    lf = _F(problem.cost.terminal(xs[-1]))
    return TF(
        jnp.concatenate([hi, lf.hi[None]]),
        jnp.concatenate([lo, lf.lo[None]]),
    )


def al_cost_total_tf(problem, xs, us, mults, mu) -> TF:
    """Compensated Σ_t AL cost (scalar TF)."""
    return tf.sum_(al_costs_tf(problem, xs, us, mults, mu))


def optimality_obj_tf(problem, derivs, mult_val, mult_jac, mu) -> jax.Array:
    """max_t ‖∂L_aug/∂u_t‖ (ddp.hpp:575-627) with TF accumulation."""

    def step(adj: TF, inp):
        lx, lu, fx, fu, eqv, eqx, equ, pe, pex = inp
        lu_aug = tf.add(_F(lu), tf.matvec(_F(equ.T), _F(pe)))
        lu_aug = tf.add(lu_aug, tf.matvec(_F(equ.T), _mul_scalar(mu, eqv)))
        lu_aug = tf.add(lu_aug, tf.matvec(_F(fu.T), adj))
        score = jnp.sqrt(tf.dot(tf.to_float(lu_aug), tf.to_float(lu_aug)).hi)
        adj_new = tf.add(tf.matvec(_F(fx.T), adj), _F(lx))
        adj_new = tf.add(adj_new, tf.matvec(_F(eqx.T), _mul_scalar(mu, eqv)))
        adj_new = tf.add(adj_new, tf.matvec(_F(eqx.T), _F(pe)))
        adj_new = tf.add(adj_new, tf.matvec(_F(pex.T), _F(eqv)))
        return adj_new, score

    inputs = (
        derivs.lx, derivs.lu, derivs.fx, derivs.fu,
        derivs.eq, derivs.eqx, derivs.equ, mult_val, mult_jac,
    )  # fmt: skip
    _, scores = jax.lax.scan(step, _F(derivs.lfx), inputs, reverse=True)
    return jnp.max(scores)


def optimality_lag_tf(problem, derivs, mult_val, mult_jac) -> jax.Array:
    """max_t ‖∂L/∂u_t‖ (μ-free, ddp.hpp:525-573) with TF accumulation."""

    def step(adj: TF, inp):
        lx, lu, fx, fu, eqv, eqx, equ, pe, pex = inp
        lu_aug = tf.add(_F(lu), tf.matvec(_F(equ.T), _F(pe)))
        lu_aug = tf.add(lu_aug, tf.matvec(_F(fu.T), adj))
        score = jnp.sqrt(tf.dot(tf.to_float(lu_aug), tf.to_float(lu_aug)).hi)
        adj_new = tf.add(tf.matvec(_F(fx.T), adj), _F(lx))
        adj_new = tf.add(adj_new, tf.matvec(_F(eqx.T), _F(pe)))
        adj_new = tf.add(adj_new, tf.matvec(_F(pex.T), _F(eqv)))
        return adj_new, score

    inputs = (
        derivs.lx, derivs.lu, derivs.fx, derivs.fu,
        derivs.eq, derivs.eqx, derivs.equ, mult_val, mult_jac,
    )  # fmt: skip
    _, scores = jax.lax.scan(step, _F(derivs.lfx), inputs, reverse=True)
    return jnp.max(scores)


class MultsTF(NamedTuple):
    """Affine multiplier sequence with double-float value/jac accumulators.

    The reference's multipliers live in MPFR scalars end-to-end
    (pinocchio_model.hpp:15); here the hi parts stay the f32 arrays every
    other solver stage consumes, while the lo parts carry the rounding
    residue of the two accumulating recurrences across iterations:

    - ``update_origin``: val += jac·(x_new ⊖ origin) every iteration, and
    - the AL update: val += μ·(eq + eq_u·k),  jac += μ·(eq_x + eq_u·K),

    both of which compound f32 round-off precisely when μ is large and the
    increments are small (late iterations).  ≙ mat_seq_common.hpp:62-89 and
    ddp.hpp:677-695 under an MPFR scalar."""

    hi: al_mod.AffineMults
    lo_val: jax.Array  # [T, m]
    lo_jac: jax.Array  # [T, m, ndx]

    @classmethod
    def from_plain(cls, mults: al_mod.AffineMults) -> "MultsTF":
        return cls(
            hi=mults,
            lo_val=jnp.zeros_like(mults.val),
            lo_jac=jnp.zeros_like(mults.jac),
        )


def update_origin_tf(model, m: MultsTF, xs) -> MultsTF:
    """update_origin (mat_seq_common.hpp:62-89) with compensated
    accumulation: val' = val ⊕ jac·d in TF; jac' = jac·J with the product
    round-off folded into lo_jac."""
    from ddp_tpu.models.base import state_difference, state_difference_jacobian

    def one(val, vlo, jac, jlo, origin, x_new):
        d = state_difference(model, origin, x_new)
        J = state_difference_jacobian(model, origin, x_new)
        acc = tf.add(TF(val, vlo), tf.matvec(TF(jac, jlo), _F(d)))
        jac_new = tf.matmat(TF(jac, jlo), _F(J))
        return acc.hi, acc.lo, jac_new.hi, jac_new.lo, x_new

    val, vlo, jac, jlo, origin = jax.vmap(one)(
        m.hi.val, m.lo_val, m.hi.jac, m.lo_jac, m.hi.origin, xs[:-1]
    )
    return MultsTF(al_mod.AffineMults(val, jac, origin), vlo, jlo)


def mult_update_tf(m: MultsTF, gain, val_inc, jac_inc) -> MultsTF:
    """Compensated first-order AL update (ddp.hpp:680-688):
    val ⊕= gain·val_inc, jac ⊕= gain·jac_inc, with the gain products
    error-free (two_prod) and the sums carried in TF."""
    val = tf.add(TF(m.hi.val, m.lo_val), _mul_scalar(gain, val_inc))
    jac = tf.add(TF(m.hi.jac, m.lo_jac), _mul_scalar(gain, jac_inc))
    return MultsTF(
        al_mod.AffineMults(val.hi, jac.hi, m.hi.origin), val.lo, jac.lo
    )


def backward_sweep_tf(derivs, mult_val, mult_jac, mu, reg):
    """One Riccati sweep (ddp_bwd.ipp:9-155) carried in double-float.

    Inputs are plain-float Derivs (their values are exact by definition);
    every product in the Q-expansion is error-free, (Vx, Vxx) propagate as
    TF pairs, and the Quu⁻¹ solves are float Cholesky + one compensated
    iterative-refinement step (≈ full TF accuracy for well-conditioned Quu).

    Returns (k [T,m], K [T,m,n], ok) as plain floats (rounded from TF).
    """
    nu = derivs.lu.shape[1]
    dtype = derivs.lx.dtype
    I_u = jnp.eye(nu, dtype=dtype)

    inputs = (
        derivs.lx, derivs.lu, derivs.lxx, derivs.lux, derivs.luu,
        derivs.fx, derivs.fu, derivs.fxx, derivs.fux, derivs.fuu,
        derivs.eq, derivs.eqx, derivs.equ, derivs.eqxx, derivs.equx, derivs.equu,
        mult_val, mult_jac,
    )  # fmt: skip

    def refine(chol, Quu_reg: TF, rhs: TF):
        """Solve (Quu+reg·I) x = −rhs with one compensated refinement step."""
        apply = tf.matvec if rhs.hi.ndim == 1 else tf.matmat
        x0 = -jax.scipy.linalg.cho_solve((chol, True), tf.to_float(rhs))
        # residual of A·x = −rhs:  r = −rhs − A·x0, computed in TF
        r = tf.neg(tf.add(rhs, apply(Quu_reg, _F(x0))))
        dx = jax.scipy.linalg.cho_solve((chol, True), tf.to_float(r))
        return tf.add(_F(x0), _F(dx))

    def step(carry, inp):
        Vx, Vxx = carry  # TF [n], TF [n,n]
        (lx, lu, lxx, lux, luu, fx, fu, fxx, fux, fuu,
         eqv, eqx, equ, eqxx, equx, equu, pe, pex) = inp  # fmt: skip

        tmp = tf.add(_F(pe), _mul_scalar(mu, eqv))  # p + μ·eq
        tmp2 = tf.add(_F(pex), _mul_scalar(mu, eqx))  # p_x + μ·eq_x

        Qx = tf.add(_F(lx), tf.matvec(_F(fx.T), Vx))
        Qx = tf.add(Qx, tf.matvec(_F(eqx.T), tmp))
        Qx = tf.add(Qx, tf.matvec(_F(pex.T), _F(eqv)))

        Qu = tf.add(_F(lu), tf.matvec(_F(fu.T), Vx))
        Qu = tf.add(Qu, tf.matvec(_F(equ.T), tmp))

        Vfx = tf.matmat(Vxx, _F(fx))
        Vfu = tf.matmat(Vxx, _F(fu))

        Qxx = tf.add(_F(lxx), tf.matmat(_F(fx.T), Vfx))
        Qxx = tf.add(Qxx, tf.matmat(_F(eqx.T), tmp2))
        Qxx = tf.add(Qxx, tf.matmat(_F(pex.T), _F(eqx)))
        Qxx = tf.add(Qxx, tf.contract0(tmp, _F(eqxx)))
        Qxx = tf.add(Qxx, tf.contract0(Vx, _F(fxx)))

        Quu = tf.add(_F(luu), tf.matmat(_F(fu.T), Vfu))
        Quu = tf.add(Quu, tf.matmat(tf.tT(_mul_scalar(mu, equ)), _F(equ)))
        Quu = tf.add(Quu, tf.contract0(tmp, _F(equu)))
        Quu = tf.add(Quu, tf.contract0(Vx, _F(fuu)))

        Qux = tf.add(_F(lux), tf.matmat(_F(fu.T), Vfx))
        Qux = tf.add(Qux, tf.matmat(_F(equ.T), tmp2))
        Qux = tf.add(Qux, tf.contract0(tmp, _F(equx)))
        Qux = tf.add(Qux, tf.contract0(Vx, _F(fux)))

        Quu_reg = tf.add(Quu, _F(reg * I_u))
        chol = jnp.linalg.cholesky(tf.to_float(Quu_reg))
        ok_t = jnp.all(jnp.isfinite(chol))
        k = refine(chol, Quu_reg, Qu)  # TF [m]
        K = refine(chol, Quu_reg, Qux)  # TF [m,n]

        Vx_new = tf.add(Qx, tf.matvec(tf.tT(Qux), k))
        Vxx_new = tf.add(Qxx, tf.matmat(tf.tT(Qux), K))
        return (Vx_new, Vxx_new), (tf.to_float(k), tf.to_float(K), ok_t)

    _, (ks, Ks, oks) = jax.lax.scan(
        step, (_F(derivs.lfx), _F(derivs.lfxx)), inputs, reverse=True
    )
    return ks, Ks, jnp.all(oks)


def backward_pass_tf(derivs, mult_val, mult_jac, mu, reg, max_retries: int = 24):
    """TF sweep with the reference's failure-escalation loop
    (ddp_bwd.ipp:26, 105-132: reg = max(reg, μ)·2, μ·2, restart).
    Same result contract as riccati.backward_pass."""
    from ddp_tpu.solver.riccati import BackwardResult

    ks0, Ks0, ok0 = backward_sweep_tf(derivs, mult_val, mult_jac, mu, reg)

    def cond(c):
        it, ok, *_ = c
        return jnp.logical_and(~ok, it < max_retries)

    def body(c):
        it, _, mu_, reg_, _, _ = c
        reg_ = jnp.maximum(reg_, mu_) * 2.0
        mu_ = mu_ * 2.0
        ks, Ks, ok = backward_sweep_tf(derivs, mult_val, mult_jac, mu_, reg_)
        return (it + 1, ok, mu_, reg_, ks, Ks)

    it, ok, mu, reg, ks, Ks = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), ok0, mu, reg, ks0, Ks0)
    )
    return BackwardResult(k=ks, K=Ks, mu=mu, reg=reg, ok=ok, dV=jnp.zeros((), ks.dtype))
