"""Pallas TPU kernel: the ENTIRE batched AL-DDP solve in one launch.

The batched pendulum-class solve is dependency-latency bound: ~1,500
dependent kernel executions per 8-iteration solve batch (rollout scans,
Riccati sweep, two adjoint scans, ~6 elementwise stages per iteration)
whose per-step work sits far below the chip's latency floor — measured 13%
of the bandwidth speed-of-light at B=4096 (docs/DESIGN.md "Speed-of-light
accounting").  The Pallas backward removed one stage's launches; this
kernel removes ALL of them: derivative sweep, backward pass, line-searched
forward rollouts, multiplier schedule, and the optimality adjoints for the
full fixed iteration budget run inside one kernel with the batch on the
TPU lane axis, touching HBM only for x0 in and results out.  A probe of
the op-issue cost (benchmarks/flat_probe.py) measures 0.4-1.6 cycles per
dependent [4096]-wide VPU op with ~25 µs launch overhead — order-of-
magnitude headroom over the launch-chain floor.

Structure: the time loops (derivative+Riccati reverse sweep, rollouts,
adjoints, origin updates) are `lax.fori_loop`s over [T, rows, B] VMEM
refs — a fully unrolled first version was exact but its ~10⁵-op straight-
line program was SIGKILLed by the Mosaic compiler at production shapes;
the looped form traces/compiles ~50× smaller with the same executed ops.
Constraint rows are hoisted out of the loops (single-active-step
schedules): evaluated once per iteration at the static active timestep,
stored, and applied inside the loops behind a (t == ta) mask.

Scope: "flat-lane" problems (the linesearch_flat.py class) — closed-form
vector-space models whose dynamics/cost/constraint are cheap elementwise
chains (pendulum/cartpole/acrobot), Gauss-Newton mode, the static-flow
schedule of solver/batched.py with n_reg_levels=1 and the parallel-sweep
line-search acceptance (largest accepted step of the 2^-c ladder).
Parity vs solve_batched is pinned by tests/test_flat_solve.py (f64
interpret mode).

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
    # inputs
    x0_ref,  # [nx, B]
    us0_ref,  # [T, m, B]
    pvec_ref,  # [P, B] packed problem leaves
    scal_ref,  # [4, B]: mu0, reg0, w0, n0
    # outputs (also used as working storage)
    us_ref,  # [T, m, B]
    xs_ref,  # [T+1, nx, B]
    fbk_ref,  # [T, m, B]
    fbK_ref,  # [T, m*nx, B]
    stats_ref,  # [6, B]: oc, olag, mu, reg, w, n
    mval_ref,  # [T, e_k, B]
    mjac_ref,  # [T, e_k*nx, B]
    # scratch
    k_ref,  # [T, m, B]
    K_ref,  # [T, m*nx, B]
    xc_ref,  # [T+1, nx, B] candidate rollout
    uc_ref,  # [T, m, B]
    morig_ref,  # [T, nx, B]
    fborig_ref,  # [T, nx, B]
    eqr_ref,  # [e_k*(1+nz), B] hoisted eq rows at the active step
    Vx_ref,  # [nx, B]
    Vxx_ref,  # [nx*nx, B]
    *,
    T,
    nx,  # == ndx (vector space)
    m,
    e,
    n_iters,
    n_ls,
    rebuild,
    ta,  # the single active timestep (static; -1 = unconstrained)
    mrow,  # static [e] 0/1 mask at ta
    affine,
    primal,
    threshold,
    w_min,
    mu_factor,
    mu_max,
    mult_max,
    inner_max,
):
    B = x0_ref.shape[-1]
    dtype = x0_ref.dtype
    nz = nx + m
    pv = pvec_ref[...]
    zero = x0_ref[0, :] * 0.0
    one_ = zero + 1.0

    def f(c):
        return float(c)

    def vl(fn, n_in):
        # batch LAST on every output rank
        return jax.vmap(fn, in_axes=(1,) * n_in, out_axes=-1)

    def dyn_t(t, x, u):
        return vl(lambda pc, xc, uc: rebuild(pc).dynamics(t, xc, uc), 3)(pv, x, u)

    def stage_t(t, x, u):
        return jax.vmap(
            lambda pc, xc, uc: rebuild(pc).cost.stage(t, xc, uc),
            in_axes=(1, 1, 1), out_axes=0,
        )(pv, x, u)  # fmt: skip

    def term_cost(x):
        return jax.vmap(
            lambda pc, xc: rebuild(pc).cost.terminal(xc), in_axes=(1, 1), out_axes=0
        )(pv, x)

    def derivs_t(t, x, u):
        def one(pc, xc, uc):
            prob = rebuild(pc)

            def gl(z):
                return prob.cost.stage(t, xc + z[:nx], uc + z[nx:])

            def gf(z):
                return prob.dynamics(t, xc + z[:nx], uc + z[nx:])

            z0 = jnp.zeros((nz,), dtype)
            return (
                jax.jacfwd(gl)(z0),
                jax.jacfwd(jax.jacfwd(gl))(z0),
                jax.jacfwd(gf)(z0),
            )

        return vl(one, 3)(pv, x, u)  # [nz,B], [nz,nz,B], [nx,nz,B]

    def term_grads(x):
        def one(pc, xc):
            prob = rebuild(pc)

            def gt(dx):
                return prob.cost.terminal(xc + dx)

            z0 = jnp.zeros((nx,), dtype)
            return jax.jacfwd(gt)(z0), jax.jacfwd(jax.jacfwd(gt))(z0)

        return vl(one, 2)(pv, x)  # [nx,B], [nx,nx,B]

    def hoist_eq():
        """Evaluate constraint value + Jacobian at the static active step on
        the CURRENT (xs, us) and store into eqr_ref (masked rows)."""
        if ta < 0 or e == 0:
            return
        x = xs_ref[ta]
        u = us_ref[ta]
        ev = vl(lambda pc, xc, uc: rebuild(pc).constraint.value(ta, xc, uc), 3)(
            pv, x, u
        )

        def one(pc, xc, uc):
            prob = rebuild(pc)

            def ge(z):
                return prob.constraint.value(ta, xc + z[:nx], uc + z[nx:])

            return jax.jacfwd(ge)(jnp.zeros((nz,), dtype))

        ez = vl(one, 3)(pv, x, u)  # [e, nz, B]
        for a in range(e):
            eqr_ref[a * (1 + nz), :] = ev[a] * f(mrow[a])
            for j in range(nz):
                eqr_ref[a * (1 + nz) + 1 + j, :] = ez[a, j] * f(mrow[a])

    def eq_rows(t):
        """(eqv [e][B], eqz [e][nz][B]) at traced t via the hoisted rows."""
        sel = jnp.where(t == ta, one_, zero) if ta >= 0 else zero
        eqv = [eqr_ref[a * (1 + nz), :] * sel for a in range(e)]
        eqz = [
            [eqr_ref[a * (1 + nz) + 1 + j, :] * sel for j in range(nz)]
            for a in range(e)
        ]
        return eqv, eqz

    # ---------------- pre-loop rollout + init ------------------------------
    for i in range(nx):
        xs_ref[0, i] = x0_ref[i, :]

    def init_roll(t, _):
        u = us0_ref[t]
        for j in range(m):
            us_ref[t, j] = u[j]
        x1 = dyn_t(t, xs_ref[t], u)
        for i in range(nx):
            xs_ref[t + 1, i] = x1[i]
        # multipliers zero, origins = x_t; feedback zero
        for a in range(e):
            mval_ref[t, a] = zero
            for i in range(nx):
                mjac_ref[t, a * nx + i] = zero
        for i in range(nx):
            morig_ref[t, i] = xs_ref[t, i]
            fborig_ref[t, i] = xs_ref[t, i]
        for j in range(m):
            fbk_ref[t, j] = zero
            for i in range(nx):
                fbK_ref[t, j * nx + i] = zero
        return 0

    jax.lax.fori_loop(0, T, init_roll, 0)

    mu = scal_ref[0, :]
    reg = scal_ref[1, :]
    w = scal_ref[2, :]
    n_tol = scal_ref[3, :]
    oo_prev = zero + jnp.inf
    just_changed = one_
    inner = one_

    # ---------------- stages ----------------------------------------------
    def backward(mu_, reg_):
        """Fused derivative+Riccati reverse sweep; writes k_ref/K_ref,
        carries (Vx, Vxx) in scratch; returns per-lane ok mask."""
        lfx, lfxx = term_grads(xs_ref[T])
        for i in range(nx):
            Vx_ref[i] = lfx[i]
            for j in range(nx):
                Vxx_ref[i * nx + j] = lfxx[i, j]

        def body(it, ok):
            t = T - 1 - it
            x = xs_ref[t]
            u = us_ref[t]
            lz_a, lzz_a, fz_a = derivs_t(t, x, u)
            lz = [lz_a[i] for i in range(nz)]
            lzz = [[lzz_a[i, j] for j in range(nz)] for i in range(nz)]
            fz = [[fz_a[i, j] for j in range(nz)] for i in range(nx)]
            eqv, eqz = eq_rows(t)
            pe = [mval_ref[t, a] for a in range(e)]
            pex = [[mjac_ref[t, a * nx + i] for i in range(nx)] for a in range(e)]
            Vx = [Vx_ref[i] for i in range(nx)]
            Vxx = [[Vxx_ref[i * nx + j] for j in range(nx)] for i in range(nx)]
            tmp = [pe[a] + mu_ * eqv[a] for a in range(e)]
            tmp2 = [
                [pex[a][j] + mu_ * eqz[a][j] for j in range(nx)] for a in range(e)
            ]
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
            Vf = [
                [sum(Vxx[o][r] * fz[r][j] for r in range(nx)) for j in range(nz)]
                for o in range(nx)
            ]
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
                        Qzz[nx + i2][i] = (
                            Qzz[nx + i2][i] + eqz[a][nx + i2] * tmp2[a][i]
                        )
                for i2 in range(m):
                    for j2 in range(m):
                        Qzz[nx + i2][nx + j2] = (
                            Qzz[nx + i2][nx + j2]
                            + mu_ * eqz[a][nx + i2] * eqz[a][nx + j2]
                        )
            Quu = [
                [Qzz[nx + i][nx + j] + (reg_ if i == j else 0.0) for j in range(m)]
                for i in range(m)
            ]
            rhss = [[Qz[nx + i] for i in range(m)]] + [
                [Qzz[nx + i][jx] for i in range(m)] for jx in range(nx)
            ]
            sols, L = _chol_solve_unrolled(Quu, rhss, m, 0.0)
            k_sol = sols[0]
            K_cols = sols[1:]
            ok_t = one_
            for i in range(m):
                good = jnp.logical_and(L[i][i] > 0.0, jnp.isfinite(L[i][i]))
                ok_t = ok_t * jnp.where(good, 1.0, 0.0).astype(dtype)
            for i in range(m):
                k_ref[t, i] = -k_sol[i]
                for jx in range(nx):
                    K_ref[t, i * nx + jx] = -K_cols[jx][i]
            for i in range(nx):
                s = Qz[i]
                for o in range(m):
                    s = s - Qzz[nx + o][i] * k_sol[o]
                Vx_ref[i] = s
            for i in range(nx):
                for j in range(nx):
                    s = Qzz[i][j]
                    for o in range(m):
                        s = s - Qzz[nx + o][i] * K_cols[j][o]
                    Vxx_ref[i * nx + j] = s
            return ok * ok_t

        return jax.lax.fori_loop(0, T, body, one_)

    def al_penalty(xs_like_ref, mu_):
        """Constraint penalty of the trajectory in xs_like_ref at the static
        active step: p(x)·ce + (μ/2)‖ce‖² (+ eq from scratch at that x)."""
        if ta < 0 or e == 0:
            return zero
        x = xs_like_ref[ta]
        u_ref = uc_ref if xs_like_ref is xc_ref else us_ref
        u = u_ref[ta]
        ce = vl(lambda pc, xc, uc2: rebuild(pc).constraint.value(ta, xc, uc2), 3)(
            pv, x, u
        )
        total = zero
        for a in range(e):
            cea = ce[a] * f(mrow[a])
            p = mval_ref[ta, a]
            for i in range(nx):
                p = p + mjac_ref[ta, a * nx + i] * (x[i] - morig_ref[ta, i])
            total = total + p * cea + 0.5 * mu_ * cea * cea
        return total

    def incumbent_cost(mu_):
        def body(t, acc):
            return acc + stage_t(t, xs_ref[t], us_ref[t])

        c = jax.lax.fori_loop(0, T, body, zero)
        return c + term_cost(xs_ref[T]) + al_penalty(xs_ref, mu_)

    def rollout(step):
        """Roll xc/uc at per-lane step (feedback about xs/us + k/K); returns
        the stage-cost sum (penalty/terminal added by caller)."""
        for i in range(nx):
            xc_ref[0, i] = xs_ref[0, i]

        def body(t, acc):
            x = xc_ref[t]
            dx = [x[i] - xs_ref[t, i] for i in range(nx)]
            u_rows = []
            for j in range(m):
                s = us_ref[t, j] + step * k_ref[t, j]
                for i in range(nx):
                    s = s + K_ref[t, j * nx + i] * dx[i]
                uc_ref[t, j] = s
                u_rows.append(s)
            u = jnp.stack(u_rows)
            x1 = dyn_t(t, x, u)
            for i in range(nx):
                xc_ref[t + 1, i] = x1[i]
            return acc + stage_t(t, x, u)

        return jax.lax.fori_loop(0, T, body, zero)

    def linesearch(mu_, ok):
        cost_old = incumbent_cost(mu_)
        chosen = zero
        taken = zero
        for c in range(n_ls):
            step = zero + f(2.0 ** (-c))
            cost_c = rollout(step) + term_cost(xc_ref[T]) + al_penalty(xc_ref, mu_)
            acc = jnp.where(cost_c - cost_old <= 0.0, 1.0, 0.0).astype(dtype)
            newly = acc * (1.0 - taken)
            chosen = chosen + newly * f(2.0 ** (-c))
            taken = jnp.maximum(taken, acc)
        rollout(chosen)
        keep = ok * taken  # accept only ok lanes with an accepted step

        def commit(t, _):
            for j in range(m):
                us_ref[t, j] = jnp.where(keep > 0, uc_ref[t, j], us_ref[t, j])
            for i in range(nx):
                xs_ref[t + 1, i] = jnp.where(
                    keep > 0, xc_ref[t + 1, i], xs_ref[t + 1, i]
                )
            return 0

        jax.lax.fori_loop(0, T, commit, 0)
        return chosen * taken

    def commit_fb(ok):
        def body(t, _):
            for j in range(m):
                fbk_ref[t, j] = jnp.where(ok > 0, k_ref[t, j], fbk_ref[t, j])
                for i in range(nx):
                    fbK_ref[t, j * nx + i] = jnp.where(
                        ok > 0, K_ref[t, j * nx + i], fbK_ref[t, j * nx + i]
                    )
            for i in range(nx):
                fborig_ref[t, i] = jnp.where(
                    ok > 0, xs_ref[t, i], fborig_ref[t, i]
                )
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    def update_origin_mults():
        def body(t, _):
            d_ = [xs_ref[t, i] - morig_ref[t, i] for i in range(nx)]
            for a in range(e):
                s = mval_ref[t, a]
                for i in range(nx):
                    s = s + mjac_ref[t, a * nx + i] * d_[i]
                mval_ref[t, a] = s
            for i in range(nx):
                morig_ref[t, i] = xs_ref[t, i]
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    def update_origin_fb():
        def body(t, _):
            d_ = [xs_ref[t, i] - fborig_ref[t, i] for i in range(nx)]
            for j in range(m):
                s = fbk_ref[t, j]
                for i in range(nx):
                    s = s + fbK_ref[t, j * nx + i] * d_[i]
                fbk_ref[t, j] = s
            for i in range(nx):
                fborig_ref[t, i] = xs_ref[t, i]
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    def opt_measures(mu_):
        """(opt_obj, opt_constr, opt_lag): reverse adjoint fori_loop."""
        oc = zero
        if ta >= 0 and e:
            s = zero
            for a in range(e):
                va = eqr_ref[a * (1 + nz), :]
                s = s + va * va
            oc = jnp.sqrt(s)
        lfx, _ = term_grads(xs_ref[T])
        adj = jnp.concatenate(
            [jnp.stack([lfx[i] for i in range(nx)])] * 2
        )  # [2*nx, B]: rows 0..nx-1 = obj adjoint, nx.. = lag adjoint

        def body(it, carry):
            t = T - 1 - it
            adj, oo, olag = carry
            x = xs_ref[t]
            u = us_ref[t]
            lz_a, _, fz_a = derivs_t(t, x, u)
            eqv, eqz = eq_rows(t)
            pe = [mval_ref[t, a] for a in range(e)]
            pex = [[mjac_ref[t, a * nx + i] for i in range(nx)] for a in range(e)]
            a_o = [adj[i] for i in range(nx)]
            a_l = [adj[nx + i] for i in range(nx)]
            so = zero
            sl = zero
            for i in range(m):
                vo = lz_a[nx + i]
                vel = lz_a[nx + i]
                for a in range(e):
                    vo = vo + eqz[a][nx + i] * (pe[a] + mu_ * eqv[a])
                    vel = vel + eqz[a][nx + i] * pe[a]
                for o in range(nx):
                    vo = vo + fz_a[o, nx + i] * a_o[o]
                    vel = vel + fz_a[o, nx + i] * a_l[o]
                so = so + vo * vo
                sl = sl + vel * vel
            oo = jnp.maximum(oo, jnp.sqrt(so))
            olag = jnp.maximum(olag, jnp.sqrt(sl))
            new_rows = []
            for i in range(nx):
                ao = lz_a[i]
                for o in range(nx):
                    ao = ao + fz_a[o, i] * a_o[o]
                for a in range(e):
                    ao = (
                        ao
                        + mu_ * eqz[a][i] * eqv[a]
                        + eqz[a][i] * pe[a]
                        + pex[a][i] * eqv[a]
                    )
                new_rows.append(ao)
            for i in range(nx):
                al_ = lz_a[i]
                for o in range(nx):
                    al_ = al_ + fz_a[o, i] * a_l[o]
                for a in range(e):
                    al_ = al_ + eqz[a][i] * pe[a] + pex[a][i] * eqv[a]
                new_rows.append(al_)
            return jnp.stack(new_rows), oo, olag

        _, oo, olag = jax.lax.fori_loop(0, T, body, (adj, zero, zero))
        return oo, oc, olag

    # ---------------- pre-loop backward/forward ----------------------------
    hoist_eq()
    ok = backward(mu, reg)
    linesearch(mu, ok)
    commit_fb(ok)
    reg = jnp.where(ok > 0, reg, jnp.maximum(reg, mu) * 2.0)

    # ---------------- iterations -------------------------------------------
    for _ in range(n_iters):
        hoist_eq()
        update_origin_mults()
        if not affine:
            for a in range(e):
                # constant-multiplier methods: jac stays zero (already is)
                pass
        update_origin_fb()
        oo, oc, olag = opt_measures(mu)
        done = jnp.where(
            jnp.logical_and(olag < threshold, oc < threshold), 1.0, 0.0
        ).astype(dtype)
        plateau = jnp.where(oo >= 0.1 * oo_prev, 1.0, 0.0).astype(dtype) * (
            1.0 - just_changed
        )
        gate = jnp.maximum(
            jnp.where(oo < jnp.maximum(w, w_min), 1.0, 0.0).astype(dtype), plateau
        )
        if inner_max is not None:
            gate = jnp.maximum(
                gate, jnp.where(inner >= f(inner_max), 1.0, 0.0).astype(dtype)
            )
        upd_s = (1.0 - done) * gate * jnp.where(oc < n_tol, 1.0, 0.0).astype(dtype)
        upd_f = (1.0 - done) * gate * jnp.where(oc >= n_tol, 1.0, 0.0).astype(dtype)

        if ta >= 0 and e:
            for a in range(e):
                eqv_a = eqr_ref[a * (1 + nz), :]
                fb_term = zero
                if not primal:
                    for j in range(m):
                        fb_term = (
                            fb_term + eqr_ref[a * (1 + nz) + 1 + nx + j, :]
                            * fbk_ref[ta, j]
                        )
                v_new = mval_ref[ta, a] + mu * (eqv_a + fb_term)
                if mult_max is not None:
                    v_new = jnp.clip(v_new, -f(mult_max), f(mult_max))
                mval_ref[ta, a] = jnp.where(upd_s > 0, v_new, mval_ref[ta, a])
                if affine:
                    for i in range(nx):
                        fbj = zero
                        if not primal:
                            for j in range(m):
                                fbj = (
                                    fbj + eqr_ref[a * (1 + nz) + 1 + nx + j, :]
                                    * fbK_ref[ta, j * nx + i]
                                )
                        j_new = mjac_ref[ta, a * nx + i] + mu * (
                            eqr_ref[a * (1 + nz) + 1 + i, :] + fbj
                        )
                        if mult_max is not None:
                            j_new = jnp.clip(j_new, -f(mult_max), f(mult_max))
                        mjac_ref[ta, a * nx + i] = jnp.where(
                            upd_s > 0, j_new, mjac_ref[ta, a * nx + i]
                        )
        mu_new = jnp.where(upd_f > 0, mu * f(mu_factor), mu)
        if mu_max is not None:
            mu_new = jnp.minimum(mu_new, zero + f(mu_max))
        n_tol = jnp.where(
            upd_s > 0,
            jnp.maximum(n_tol * mu ** -0.9, zero + f(threshold)),
            jnp.where(upd_f > 0, mu_new ** -0.1, n_tol),
        )
        w = jnp.where(upd_s > 0, w / mu, w)

        ok = backward(mu_new, reg)
        step = linesearch(mu_new, ok)
        reg = jnp.where(
            ok > 0,
            jnp.where(
                step >= 0.5,
                jnp.where(reg / 2 < 1e-5, zero, reg / 2),
                reg,
            ),
            jnp.maximum(reg, mu_new) * 2.0,
        )
        commit_fb(ok)
        mu = mu_new
        oo_prev = oo
        just_changed = jnp.maximum(upd_s, upd_f)
        inner = jnp.where(just_changed > 0, one_, inner + 1.0)

    # ---------------- final measures ---------------------------------------
    hoist_eq()
    update_origin_mults()
    _, oc, olag = opt_measures(mu)
    stats_ref[0, :] = oc
    stats_ref[1, :] = olag
    stats_ref[2, :] = mu
    stats_ref[3, :] = reg
    stats_ref[4, :] = w
    stats_ref[5, :] = n_tol


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
    BatchSolveResult matching solve_batched(..., n_reg_levels=1)."""
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
    active = problem.active_ts()
    if len(active) > 1:
        raise ValueError(
            "flat solve kernel supports single-active-step schedules; "
            "use solve_batched for dense/periodic constraint schedules"
        )
    ta = active[0] if active else -1
    mask = np.asarray(problem.eq_mask())
    mrow = mask[ta].tolist() if ta >= 0 else [0.0] * e
    dtype = x0s.dtype
    if us_init is None:
        us_init = jnp.zeros((B, T, m), dtype)

    pvec, rebuild = _pack_problem(problem, dtype)
    P = pvec.shape[0]
    eps = jnp.finfo(dtype).eps
    w_min = float(params.w_min) if params.w_min is not None else float(10.0 * eps**0.5)
    w0 = float(params.w) if params.w is not None else 1.0 / params.mu
    n0 = float(params.n) if params.n is not None else params.mu**-0.1
    nz = nx + m
    e_k = max(e, 1)

    kernel = functools.partial(
        _solve_kernel,
        T=T, nx=nx, m=m, e=e,
        n_iters=params.max_iterations, n_ls=n_linesearch,
        rebuild=rebuild, ta=ta, mrow=mrow,
        affine=method is Method.PRIMAL_DUAL_AFFINE,
        primal=method is Method.PRIMAL,
        threshold=float(params.threshold), w_min=w_min,
        mu_factor=float(params.mu_factor),
        mu_max=params.mu_max, mult_max=params.mult_max,
        inner_max=params.inner_iters_max,
    )  # fmt: skip

    scal = jnp.stack([
        jnp.full((B,), params.mu, dtype),
        jnp.full((B,), params.reg, dtype),
        jnp.full((B,), w0, dtype),
        jnp.full((B,), n0, dtype),
    ])  # fmt: skip

    def bs2(rows):
        return pl.BlockSpec((rows, B), lambda: (0, 0), memory_space=pltpu.VMEM)

    def bs3(nt, rows):
        return pl.BlockSpec(
            (nt, rows, B), lambda: (0, 0, 0), memory_space=pltpu.VMEM
        )

    outs = pl.pallas_call(
        kernel,
        in_specs=[bs2(nx), bs3(T, m), bs2(P), bs2(4)],
        out_specs=(
            bs3(T, m), bs3(T + 1, nx), bs3(T, m), bs3(T, m * nx),
            bs2(6), bs3(T, e_k), bs3(T, e_k * nx),
        ),  # fmt: skip
        out_shape=(
            jax.ShapeDtypeStruct((T, m, B), dtype),
            jax.ShapeDtypeStruct((T + 1, nx, B), dtype),
            jax.ShapeDtypeStruct((T, m, B), dtype),
            jax.ShapeDtypeStruct((T, m * nx, B), dtype),
            jax.ShapeDtypeStruct((6, B), dtype),
            jax.ShapeDtypeStruct((T, e_k, B), dtype),
            jax.ShapeDtypeStruct((T, e_k * nx, B), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, m, B), dtype),          # k
            pltpu.VMEM((T, m * nx, B), dtype),     # K
            pltpu.VMEM((T + 1, nx, B), dtype),     # xc
            pltpu.VMEM((T, m, B), dtype),          # uc
            pltpu.VMEM((T, nx, B), dtype),         # morig
            pltpu.VMEM((T, nx, B), dtype),         # fborig
            pltpu.VMEM((e_k * (1 + nz), B), dtype),  # eq rows
            pltpu.VMEM((nx, B), dtype),            # Vx
            pltpu.VMEM((nx * nx, B), dtype),       # Vxx
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x0s.T,
        jnp.transpose(us_init, (1, 2, 0)),
        jnp.broadcast_to(pvec[:, None], (P, B)),
        scal,
    )
    us_o, xs_o, fbk_o, fbK_o, stats, mval_o, mjac_o = outs
    us = jnp.transpose(us_o, (2, 0, 1))
    xs = jnp.transpose(xs_o, (2, 0, 1))
    fb_k = jnp.transpose(fbk_o, (2, 0, 1))
    fb_K = jnp.transpose(fbK_o.reshape(T, m, nx, B), (3, 0, 1, 2))
    if e:
        mval = jnp.transpose(mval_o, (2, 0, 1))
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
