"""Pallas TPU kernel: the ENTIRE batched AL-DDP solve in one launch.

The batched pendulum-class solve is dependency-latency bound: ~1,500
dependent kernel executions per 8-iteration solve batch (rollout scans,
Riccati sweep, two adjoint scans, ~6 elementwise stages per iteration) whose
per-step work sits far below the chip's latency floor — measured 13% of the
bandwidth speed-of-light at B=4096 (docs/DESIGN.md "Speed-of-light
accounting").  The Pallas backward removed one stage's launches; this kernel
removes ALL of them: derivative sweep, backward pass, line-searched forward
rollouts, multiplier updates, and the optimality adjoints for the full
fixed iteration budget run inside a single kernel with the batch on the TPU
lane axis, touching HBM only for x0 in and results out.

Scope: "flat-lane" problems (the linesearch_flat.py class) — closed-form
vector-space models whose dynamics/cost/constraint are cheap elementwise
chains (pendulum/cartpole/acrobot), Gauss-Newton mode, the static-flow
schedule of solver/batched.py.  Semantics mirror solve_batched(...,
n_reg_levels=1, forward='sweep'/'seq' acceptance): same gates, same
safeguards, same accepted steps — parity pinned by
tests/test_flat_solve.py against solve_batched in f64 interpret mode.

Layout: every per-sample scalar is one [B] lane vector; the whole batch is
ONE grid block (B ≤ ~8k fits VMEM at pendulum dims with the raised scoped
limit), so each of the ~10⁵ straight-line VPU ops processes all B lanes in
a few cycles with zero launch overhead in between.

≙ ddp.hpp:744-842 (outer loop) + ddp_bwd.ipp + ddp_fwd.ipp as one TPU
program.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddp_tpu.kernels.linesearch_flat import _pack_problem
from ddp_tpu.kernels.riccati_small import _chol_solve_unrolled


def _solve_kernel(
    x0_ref,  # [nx, B]
    us0_ref,  # [T*m, B]
    pvec_ref,  # [P, B] packed problem leaves
    scal_ref,  # [4, B]: mu0, reg0, w0, n0 (per-lane warm-startable)
    us_out,  # [T*m, B]
    xs_out,  # [(T+1)*nx, B]
    fbk_out,  # [T*m, B]
    fbK_out,  # [T*m*nx, B]
    stats_out,  # [6, B]: oc, olag, mu, reg, w, n
    mval_out,  # [Ta_e, B] multiplier values (Ta_e = max(T*e, 1))
    mjac_out,  # [Ta_e*nx, B]
    *,
    T,
    nx,  # == ndx (vector space)
    m,
    e,
    n_iters,
    n_ls,
    rebuild,
    mask,  # static np [T, e] 0/1
    active,  # static tuple of active timesteps
    affine,  # method is PRIMAL_DUAL_AFFINE
    primal,  # method is PRIMAL (drops multiplier feedback in updates)
    threshold,
    w_min,
    mu_factor,
    mu_max,  # None or float
    mult_max,  # None or float
    inner_max,  # None or int (params.inner_iters_max)
):
    B = x0_ref.shape[-1]
    dtype = x0_ref.dtype
    nz = nx + m
    pv = pvec_ref[...]

    def vl(f, n_in):
        # batch LAST on every output rank ([nz,B], [nz,nz,B], [nx,nz,B], …)
        return jax.vmap(f, in_axes=(1,) * n_in, out_axes=-1)

    def dyn_t(t, x, u):
        """x [nx,B], u [m,B] → x' [nx,B]."""
        return vl(lambda pc, xc, uc: rebuild(pc).dynamics(t, xc, uc), 3)(pv, x, u)

    def stage_t(t, x, u):
        inner = jax.vmap(
            lambda pc, xc, uc: rebuild(pc).cost.stage(t, xc, uc),
            in_axes=(1, 1, 1), out_axes=0,
        )  # fmt: skip
        return inner(pv, x, u)  # [B]

    def term_cost(x):
        return jax.vmap(
            lambda pc, xc: rebuild(pc).cost.terminal(xc), in_axes=(1, 1), out_axes=0
        )(pv, x)

    def eq_t(t, x, u):
        return vl(lambda pc, xc, uc: rebuild(pc).constraint.value(t, xc, uc), 3)(
            pv, x, u
        )

    def derivs_t(t, x, u):
        """Per-lane first-order rows + cost Hessian via jacfwd of the local
        maps (GN: dynamics/constraint Hessians zero — ≙ problem.derivatives
        second_order=False)."""

        def one(pc, xc, uc):
            prob = rebuild(pc)

            def gl(z):
                return prob.cost.stage(t, xc + z[:nx], uc + z[nx:])

            def gf(z):
                return prob.dynamics(t, xc + z[:nx], uc + z[nx:])

            z0 = jnp.zeros((nz,), dtype)
            lz = jax.jacfwd(gl)(z0)
            lzz = jax.jacfwd(jax.jacfwd(gl))(z0)
            fz = jax.jacfwd(gf)(z0)
            return lz, lzz, fz

        lz, lzz, fz = vl(one, 3)(pv, x, u)
        return lz, lzz, fz  # [nz,B], [nz,nz,B], [nx,nz,B]

    def eq_derivs_t(t, x, u):
        def one(pc, xc, uc):
            prob = rebuild(pc)

            def ge(z):
                return prob.constraint.value(t, xc + z[:nx], uc + z[nx:])

            z0 = jnp.zeros((nz,), dtype)
            return jax.jacfwd(ge)(z0)

        return vl(one, 3)(pv, x, u)  # [e, nz, B]

    zero = x0_ref[0, :] * 0.0
    one_ = zero + 1.0

    def f(c):
        return float(c)

    # ---------------- state (Python lists of [B] lane vectors) -------------
    xs = [[None] * nx for _ in range(T + 1)]
    us = [[us0_ref[t * m + j, :] for j in range(m)] for t in range(T)]
    for i in range(nx):
        xs[0][i] = x0_ref[i, :]
    for t in range(T):
        nxt = dyn_t(t, jnp.stack(xs[t]), jnp.stack(us[t]))
        for i in range(nx):
            xs[t + 1][i] = nxt[i]

    # multipliers: val 0, jac 0, origin = xs[:-1]  (init_multipliers)
    mval = [[zero for _ in range(e)] for _ in range(T)]
    mjac = [[[zero for _ in range(nx)] for _ in range(e)] for _ in range(T)]
    morig = [[xs[t][i] for i in range(nx)] for t in range(T)]
    fbk = [[zero for _ in range(m)] for _ in range(T)]
    fbK = [[[zero for _ in range(nx)] for _ in range(m)] for _ in range(T)]
    fborig = [[xs[t][i] for i in range(nx)] for t in range(T)]

    mu = scal_ref[0, :]
    reg = scal_ref[1, :]
    w = scal_ref[2, :]
    n_tol = scal_ref[3, :]
    oo_prev = zero + jnp.inf
    just_changed = one_  # float 0/1 mask
    inner = one_  # counts inner iterations since last (p, μ) change

    # ---------------- stage primitives ------------------------------------
    def compute_derivs(xs, us):
        """Returns dict of per-t lists mirroring Derivs rows (GN)."""
        d = {"lz": [], "lzz": [], "fz": [], "eq": [], "eqz": []}
        for t in range(T):
            x, u = jnp.stack(xs[t]), jnp.stack(us[t])
            lz, lzz, fz = derivs_t(t, x, u)
            d["lz"].append([lz[i] for i in range(nz)])
            d["lzz"].append([[lzz[i, j] for j in range(nz)] for i in range(nz)])
            d["fz"].append([[fz[i, j] for j in range(nz)] for i in range(nx)])
            if e and t in active:
                ev = eq_t(t, x, u)
                ez = eq_derivs_t(t, x, u)
                d["eq"].append([ev[a] * f(mask[t][a]) for a in range(e)])
                d["eqz"].append(
                    [[ez[a, j] * f(mask[t][a]) for j in range(nz)] for a in range(e)]
                )
            else:
                d["eq"].append([zero] * e)
                d["eqz"].append([[zero] * nz for _ in range(e)])
        return d

    def update_origin(val, jac, orig, xs):
        """val += jac·(x_new − origin); origin = x_new (vector space)."""
        for t in range(T):
            d_ = [xs[t][i] - orig[t][i] for i in range(nx)]
            for a in range(len(val[t])):
                s = val[t][a]
                for i in range(nx):
                    s = s + jac[t][a][i] * d_[i]
                val[t][a] = s
            orig[t] = [xs[t][i] for i in range(nx)]
        return val, jac, orig

    def backward(d, mval, mjac, mu, reg):
        """≙ _backward_sweep (batched.py:99-150), per-lane; returns
        (k, K, ok_mask[B])."""
        Vx = [zero] * nx  # lfx = terminal cost grad: computed below
        # terminal derivatives of cost.terminal (vector space)
        def term_one(pc, xc):
            prob = rebuild(pc)

            def gt(dx):
                return prob.cost.terminal(xc + dx)

            z0 = jnp.zeros((nx,), dtype)
            return jax.jacfwd(gt)(z0), jax.jacfwd(jax.jacfwd(gt))(z0)

        lfx, lfxx = vl(term_one, 2)(pv, jnp.stack(xs_cur[T]))
        Vx = [lfx[i] for i in range(nx)]
        Vxx = [[lfxx[i, j] for j in range(nx)] for i in range(nx)]
        ks = [None] * T
        Ks = [None] * T
        ok = one_
        for t in reversed(range(T)):
            lz = d["lz"][t]
            lzz = d["lzz"][t]
            fz = d["fz"][t]
            eqv = d["eq"][t]
            eqz = d["eqz"][t]
            pe = mval[t]
            pex = mjac[t]
            tmp = [pe[a] + mu * eqv[a] for a in range(e)]
            tmp2 = [
                [pex[a][j] + mu * eqz[a][j] for j in range(nx)] for a in range(e)
            ]
            # Qx / Qu
            Qz = []
            for i in range(nz):
                s = lz[i]
                for o in range(nx):
                    s = s + fz[o][i] * Vx[o]
                Qz.append(s)
            for a in range(e):
                for i in range(nx):
                    Qz[i] = Qz[i] + eqz[a][i] * tmp[a] + pex[a][i] * eqv[a]
                for i in range(m):
                    Qz[nx + i] = Qz[nx + i] + eqz[a][nx + i] * tmp[a]
            # Vxx·fz  [nx][nz]
            Vf = [
                [sum(Vxx[o][r] * fz[r][j] for r in range(nx)) for j in range(nz)]
                for o in range(nx)
            ]
            # Qzz = lzz + fzᵀ(Vxx fz) + AL terms
            Qzz = [[None] * nz for _ in range(nz)]
            for i in range(nz):
                for j in range(nz):
                    s = lzz[i][j]
                    for o in range(nx):
                        s = s + fz[o][i] * Vf[o][j]
                    Qzz[i][j] = s
            for a in range(e):
                for i in range(nx):
                    for j in range(nx):
                        Qzz[i][j] = (
                            Qzz[i][j]
                            + eqz[a][i] * tmp2[a][j]
                            + pex[a][i] * eqz[a][j]
                        )
                    for i2 in range(m):
                        Qzz[nx + i2][i] = Qzz[nx + i2][i] + eqz[a][nx + i2] * tmp2[a][i]
                for i2 in range(m):
                    for j2 in range(m):
                        Qzz[nx + i2][nx + j2] = (
                            Qzz[nx + i2][nx + j2]
                            + mu * eqz[a][nx + i2] * eqz[a][nx + j2]
                        )
            Quu = [
                [Qzz[nx + i][nx + j] + (reg if i == j else 0.0) for j in range(m)]
                for i in range(m)
            ]
            rhss = [[Qz[nx + i] for i in range(m)]] + [
                [Qzz[nx + i][jx] for i in range(m)] for jx in range(nx)
            ]
            sols, L = _chol_solve_unrolled(Quu, rhss, m, 0.0)
            k_sol = sols[0]
            K_cols = sols[1:]
            for i in range(m):
                good = jnp.logical_and(L[i][i] > 0.0, jnp.isfinite(L[i][i]))
                ok = ok * jnp.where(good, 1.0, 0.0).astype(dtype)
            ks[t] = [-k_sol[i] for i in range(m)]
            Ks[t] = [[-K_cols[jx][i] for jx in range(nx)] for i in range(m)]
            # V updates (note ks/Ks already negated)
            Vx_new = []
            for i in range(nx):
                s = Qz[i]
                for o in range(m):
                    s = s + Qzz[nx + o][i] * ks[t][o]
                Vx_new.append(s)
            Vxx_new = [[None] * nx for _ in range(nx)]
            for i in range(nx):
                for j in range(nx):
                    s = Qzz[i][j]
                    for o in range(m):
                        s = s + Qzz[nx + o][i] * Ks[t][o][j]
                    Vxx_new[i][j] = s
            Vx, Vxx = Vx_new, Vxx_new
        return ks, Ks, ok

    def al_cost(xs_c, us_c, mval, mjac, morig, mu):
        """Σ_t l + p(x)·ce + (μ/2)‖ce‖² + lf  → [B]."""
        total = zero
        for t in range(T):
            total = total + stage_t(t, jnp.stack(xs_c[t]), jnp.stack(us_c[t]))
            if e and t in active:
                ce = eq_t(t, jnp.stack(xs_c[t]), jnp.stack(us_c[t]))
                for a in range(e):
                    cea = ce[a] * f(mask[t][a])
                    p = mval[t][a]
                    for i in range(nx):
                        p = p + mjac[t][a][i] * (xs_c[t][i] - morig[t][i])
                    total = total + p * cea + 0.5 * mu * cea * cea
        return total + term_cost(jnp.stack(xs_c[T]))

    def rollout(step, ks, Ks, xs_old, us_old):
        xs_c = [[None] * nx for _ in range(T + 1)]
        us_c = [[None] * m for _ in range(T)]
        xs_c[0] = [xs_old[0][i] for i in range(nx)]
        for t in range(T):
            dx = [xs_c[t][i] - xs_old[t][i] for i in range(nx)]
            for j in range(m):
                s = us_old[t][j] + step * ks[t][j]
                for i in range(nx):
                    s = s + Ks[t][j][i] * dx[i]
                us_c[t][j] = s
            nxt = dyn_t(t, jnp.stack(xs_c[t]), jnp.stack(us_c[t]))
            xs_c[t + 1] = [nxt[i] for i in range(nx)]
        return xs_c, us_c

    def linesearch(ks, Ks, xs_old, us_old, mval, mjac, morig, mu):
        """Largest accepted step of the 2^-c ladder; per-lane select.
        ≙ _linesearch_sweep semantics (batched.py:280-317)."""
        cost_old = al_cost(xs_old, us_old, mval, mjac, morig, mu)
        chosen = zero
        taken = zero
        for c in range(n_ls):
            step = zero + f(2.0 ** (-c))
            xs_c, us_c = rollout(step, ks, Ks, xs_old, us_old)
            acc = jnp.where(
                al_cost(xs_c, us_c, mval, mjac, morig, mu) - cost_old <= 0.0,
                1.0, 0.0,
            ).astype(dtype)  # fmt: skip
            newly = acc * (1.0 - taken)
            chosen = chosen + newly * f(2.0 ** (-c))
            taken = jnp.maximum(taken, acc)
        # one final rollout at the per-lane chosen step (step 0 where none
        # accepted reproduces the incumbent exactly, incl. NaN-free lanes)
        xs_n, us_n = rollout(chosen, ks, Ks, xs_old, us_old)
        for t in range(T):
            for j in range(m):
                us_n[t][j] = jnp.where(taken > 0, us_n[t][j], us_old[t][j])
            for i in range(nx):
                xs_n[t + 1][i] = jnp.where(taken > 0, xs_n[t + 1][i], xs_old[t + 1][i])
        return xs_n, us_n, chosen

    def opt_measures(d, mval, mjac, mu):
        """(opt_obj, opt_constr, opt_lag) per lane — al.py adjoints."""
        oc = zero
        for t in active:
            s = zero
            for a in range(e):
                s = s + d["eq"][t][a] * d["eq"][t][a]
            oc = jnp.maximum(oc, jnp.sqrt(s))
        adj_o = [zero] * nx  # lfx assumed handled via terminal grad below
        adj_l = [zero] * nx

        def term_grad():
            def one(pc, xc):
                prob = rebuild(pc)

                def gt(dx):
                    return prob.cost.terminal(xc + dx)

                return jax.jacfwd(gt)(jnp.zeros((nx,), dtype))

            g = vl(one, 2)(pv, jnp.stack(xs_cur[T]))
            return [g[i] for i in range(nx)]

        adj_o = term_grad()
        adj_l = [adj_o[i] for i in range(nx)]
        oo = zero
        olag = zero
        for t in reversed(range(T)):
            lz = d["lz"][t]
            fz = d["fz"][t]
            eqv = d["eq"][t]
            eqz = d["eqz"][t]
            pe = mval[t]
            pex = mjac[t]
            lu_o = []
            lu_l = []
            for i in range(m):
                so = lz[nx + i]
                sl = lz[nx + i]
                for a in range(e):
                    so = so + eqz[a][nx + i] * (pe[a] + mu * eqv[a])
                    sl = sl + eqz[a][nx + i] * pe[a]
                for o in range(nx):
                    so = so + fz[o][nx + i] * adj_o[o]
                    sl = sl + fz[o][nx + i] * adj_l[o]
                lu_o.append(so)
                lu_l.append(sl)
            so = zero
            sl = zero
            for i in range(m):
                so = so + lu_o[i] * lu_o[i]
                sl = sl + lu_l[i] * lu_l[i]
            oo = jnp.maximum(oo, jnp.sqrt(so))
            olag = jnp.maximum(olag, jnp.sqrt(sl))
            adj_o_new = []
            adj_l_new = []
            for i in range(nx):
                ao = lz[i]
                al_ = lz[i]
                for o in range(nx):
                    ao = ao + fz[o][i] * adj_o[o]
                    al_ = al_ + fz[o][i] * adj_l[o]
                for a in range(e):
                    ao = ao + mu * eqz[a][i] * eqv[a] + eqz[a][i] * pe[a] + pex[a][i] * eqv[a]
                    al_ = al_ + eqz[a][i] * pe[a] + pex[a][i] * eqv[a]
                adj_o_new.append(ao)
                adj_l_new.append(al_)
            adj_o, adj_l = adj_o_new, adj_l_new
        return oo, oc, olag

    # ---------------- pre-loop (solve_batched:669-719) ---------------------
    xs_cur, us_cur = xs, us
    d = compute_derivs(xs_cur, us_cur)
    ks, Ks, ok = backward(d, mval, mjac, mu, reg)
    xs1, us1, step = linesearch(ks, Ks, xs_cur, us_cur, mval, mjac, morig, mu)
    fin = one_
    for t in range(T):
        for j in range(m):
            fin = fin * jnp.where(jnp.isfinite(us1[t][j]), 1.0, 0.0).astype(dtype)
    ok = ok * fin
    for t in range(T + 1):
        for i in range(nx):
            if t > 0:
                xs_cur[t][i] = jnp.where(ok > 0, xs1[t][i], xs_cur[t][i])
    for t in range(T):
        for j in range(m):
            us_cur[t][j] = jnp.where(ok > 0, us1[t][j], us_cur[t][j])
            fbk[t][j] = jnp.where(ok > 0, ks[t][j], zero)
            for i in range(nx):
                fbK[t][j][i] = jnp.where(ok > 0, Ks[t][j][i], zero)
        fborig[t] = [xs_cur[t][i] for i in range(nx)]
    reg = jnp.where(ok > 0, reg, jnp.maximum(reg, mu) * 2.0)

    # ---------------- iterations (solve_batched:721-824) -------------------
    for _ in range(n_iters):
        d = compute_derivs(xs_cur, us_cur)
        mval, mjac, morig = update_origin(mval, mjac, morig, xs_cur)
        if not affine:
            mjac = [[[zero] * nx for _ in range(e)] for _ in range(T)]
        fbk, fbK, fborig = update_origin(fbk, fbK, fborig, xs_cur)
        oo, oc, olag = opt_measures(d, mval, mjac, mu)
        done = jnp.where(
            jnp.logical_and(olag < threshold, oc < threshold), 1.0, 0.0
        ).astype(dtype)
        plateau = jnp.where(oo >= 0.1 * oo_prev, 1.0, 0.0) * (1.0 - just_changed)
        gate = jnp.maximum(
            jnp.where(oo < jnp.maximum(w, w_min), 1.0, 0.0).astype(dtype), plateau
        )
        if inner_max is not None:
            gate = jnp.maximum(
                gate, jnp.where(inner >= f(inner_max), 1.0, 0.0).astype(dtype)
            )
        upd_s = (1.0 - done) * gate * jnp.where(oc < n_tol, 1.0, 0.0).astype(dtype)
        upd_f = (1.0 - done) * gate * jnp.where(oc >= n_tol, 1.0, 0.0).astype(dtype)

        # AL multiplier update (where-select; PRIMAL drops feedback)
        for t in active:
            for a in range(e):
                fb_term = zero
                if not primal:
                    for j in range(m):
                        fb_term = fb_term + d["eqz"][t][a][nx + j] * fbk[t][j]
                v_new = mval[t][a] + mu * (d["eq"][t][a] + fb_term)
                if mult_max is not None:
                    v_new = jnp.clip(v_new, -f(mult_max), f(mult_max))
                mval[t][a] = jnp.where(upd_s > 0, v_new, mval[t][a])
                if affine:
                    for i in range(nx):
                        fbj = zero
                        if not primal:
                            for j in range(m):
                                fbj = fbj + d["eqz"][t][a][nx + j] * fbK[t][j][i]
                        j_new = mjac[t][a][i] + mu * (d["eqz"][t][a][i] + fbj)
                        if mult_max is not None:
                            j_new = jnp.clip(j_new, -f(mult_max), f(mult_max))
                        mjac[t][a][i] = jnp.where(upd_s > 0, j_new, mjac[t][a][i])
        mu_new = jnp.where(upd_f > 0, mu * f(mu_factor), mu)
        if mu_max is not None:
            mu_new = jnp.minimum(mu_new, zero + f(mu_max))
        n_tol = jnp.where(
            upd_s > 0,
            jnp.maximum(n_tol * mu ** -0.9, zero + f(threshold)),
            jnp.where(upd_f > 0, mu_new ** -0.1, n_tol),
        )
        w = jnp.where(upd_s > 0, w / mu, w)

        ks, Ks, ok = backward(d, mval, mjac, mu_new, reg)
        xs1, us1, step = linesearch(
            ks, Ks, xs_cur, us_cur, mval, mjac, morig, mu_new
        )
        fin = one_
        for t in range(T):
            for j in range(m):
                fin = fin * jnp.where(jnp.isfinite(us1[t][j]), 1.0, 0.0).astype(dtype)
        ok = ok * fin
        reg = jnp.where(
            ok > 0,
            jnp.where(
                step >= 0.5,
                jnp.where(reg / 2 < 1e-5, zero, reg / 2),
                reg,
            ),
            jnp.maximum(reg, mu_new) * 2.0,
        )
        for t in range(T):
            for j in range(m):
                fbk[t][j] = jnp.where(ok > 0, ks[t][j], fbk[t][j])
                for i in range(nx):
                    fbK[t][j][i] = jnp.where(ok > 0, Ks[t][j][i], fbK[t][j][i])
            fborig[t] = [
                jnp.where(ok > 0, xs_cur[t][i], fborig[t][i]) for i in range(nx)
            ]
        for t in range(T + 1):
            if t > 0:
                for i in range(nx):
                    xs_cur[t][i] = jnp.where(ok > 0, xs1[t][i], xs_cur[t][i])
        for t in range(T):
            for j in range(m):
                us_cur[t][j] = jnp.where(ok > 0, us1[t][j], us_cur[t][j])
        mu = mu_new
        oo_prev = oo
        just_changed = jnp.maximum(upd_s, upd_f)
        inner = jnp.where(just_changed > 0, one_, inner + 1.0)

    # ---------------- final measures + outputs -----------------------------
    d = compute_derivs(xs_cur, us_cur)
    mval, mjac, morig = update_origin(mval, mjac, morig, xs_cur)
    _, oc, olag = opt_measures(d, mval, mjac, mu)
    for t in range(T):
        for j in range(m):
            us_out[t * m + j, :] = us_cur[t][j]
            fbk_out[t * m + j, :] = fbk[t][j]
            for i in range(nx):
                fbK_out[(t * m + j) * nx + i, :] = fbK[t][j][i]
    for t in range(T + 1):
        for i in range(nx):
            xs_out[t * nx + i, :] = xs_cur[t][i]
    stats_out[0, :] = oc
    stats_out[1, :] = olag
    stats_out[2, :] = mu
    stats_out[3, :] = reg
    stats_out[4, :] = w
    stats_out[5, :] = n_tol
    if e:
        for t in range(T):
            for a in range(e):
                mval_out[t * e + a, :] = mval[t][a]
                for i in range(nx):
                    mjac_out[(t * e + a) * nx + i, :] = mjac[t][a][i]
    else:
        mval_out[0, :] = zero
        mjac_out[0, :] = zero


def solve_flat_pallas(
    problem,
    params,
    x0s,  # [B, nx]
    us_init=None,  # [B, T, m]
    method=None,
    n_linesearch: int = 8,
    interpret: bool = False,
):
    """One-launch whole-solve for flat-lane problems.  Returns a
    BatchSolveResult-compatible namespace (xs, us, fb_k, fb_K, opt_constr,
    opt_lag, mu, mults, reg, w, n) matching solve_batched(...,
    n_reg_levels=1) semantics."""
    from ddp_tpu.solver import al as al_mod
    from ddp_tpu.solver.batched import BatchSolveResult
    from ddp_tpu.solver.solve import Method
    from ddp_tpu.ocp.dynamics import _vector_space_config

    if method is None:
        method = Method.PRIMAL_DUAL_AFFINE
    if problem.second_order:
        raise ValueError("flat solve kernel is Gauss-Newton only")
    if not _vector_space_config(problem.model):
        raise ValueError("flat solve kernel needs a vector-space model")
    B, nx = x0s.shape
    T, m, e = problem.horizon, problem.nu, problem.ne
    if nx != problem.ndx:
        raise ValueError("flat solve kernel needs nx == ndx")
    dtype = x0s.dtype
    if us_init is None:
        us_init = jnp.zeros((B, T, m), dtype)

    mask = np.asarray(problem.eq_mask())
    active = problem.active_ts()
    pvec, rebuild = _pack_problem(problem, dtype)
    P = pvec.shape[0]
    eps = jnp.finfo(dtype).eps
    w_min = float(params.w_min) if params.w_min is not None else float(10.0 * eps**0.5)
    w0 = float(params.w) if params.w is not None else 1.0 / params.mu
    n0 = float(params.n) if params.n is not None else params.mu**-0.1

    kernel = functools.partial(
        _solve_kernel,
        T=T, nx=nx, m=m, e=e,
        n_iters=params.max_iterations, n_ls=n_linesearch,
        rebuild=rebuild, mask=mask.tolist(), active=tuple(active),
        affine=method is Method.PRIMAL_DUAL_AFFINE,
        primal=method is Method.PRIMAL,
        threshold=float(params.threshold), w_min=w_min,
        mu_factor=float(params.mu_factor),
        mu_max=params.mu_max, mult_max=params.mult_max,
        inner_max=params.inner_iters_max,
    )  # fmt: skip

    Ta_e = max(T * e, 1)
    scal = jnp.stack([
        jnp.full((B,), params.mu, dtype),
        jnp.full((B,), params.reg, dtype),
        jnp.full((B,), w0, dtype),
        jnp.full((B,), n0, dtype),
    ])  # fmt: skip

    def bs(rows):
        return pl.BlockSpec((rows, B), lambda: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        in_specs=[bs(nx), bs(T * m), bs(P), bs(4)],
        out_specs=(
            bs(T * m), bs((T + 1) * nx), bs(T * m), bs(T * m * nx),
            bs(6), bs(Ta_e), bs(Ta_e * nx),
        ),  # fmt: skip
        out_shape=(
            jax.ShapeDtypeStruct((T * m, B), dtype),
            jax.ShapeDtypeStruct(((T + 1) * nx, B), dtype),
            jax.ShapeDtypeStruct((T * m, B), dtype),
            jax.ShapeDtypeStruct((T * m * nx, B), dtype),
            jax.ShapeDtypeStruct((6, B), dtype),
            jax.ShapeDtypeStruct((Ta_e, B), dtype),
            jax.ShapeDtypeStruct((Ta_e * nx, B), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x0s.T,
        jnp.transpose(us_init, (1, 2, 0)).reshape(T * m, B),
        jnp.broadcast_to(pvec[:, None], (P, B)),
        scal,
    )
    us_o, xs_o, fbk_o, fbK_o, stats, mval_o, mjac_o = outs
    us = jnp.transpose(us_o.reshape(T, m, B), (2, 0, 1))
    xs = jnp.transpose(xs_o.reshape(T + 1, nx, B), (2, 0, 1))
    fb_k = jnp.transpose(fbk_o.reshape(T, m, B), (2, 0, 1))
    fb_K = jnp.transpose(fbK_o.reshape(T, m, nx, B), (3, 0, 1, 2))
    if e:
        mval = jnp.transpose(mval_o.reshape(T, e, B), (2, 0, 1))
        mjac = jnp.transpose(mjac_o.reshape(T, e, nx, B), (3, 0, 1, 2))
    else:
        mval = jnp.zeros((B, T, 0), dtype)
        mjac = jnp.zeros((B, T, 0, nx), dtype)
    mults = al_mod.AffineMults(val=mval, jac=mjac, origin=xs[:, :-1])
    return BatchSolveResult(
        xs=xs, us=us, fb_k=fb_k, fb_K=fb_K,
        opt_constr=stats[0], opt_lag=stats[1], mu=stats[2],
        mults=mults, reg=stats[3], w=stats[4], n=stats[5],
    )  # fmt: skip
