"""Per-stage device profile of the headline pendulum batched solve at the
round-3 tuned config (B=4096, T=32, GN, pallas backward n_levels=1,
4-candidate line search, unroll=4) — the analog of arm_profile.py, so the
next optimization round targets the real split rather than the round-2
"forward is ~60%" estimate that predates the tuning.

Run SOLO (the tunnel serializes TPU clients).  Stage times are pipelined
(enqueue back-to-back, block once): at ~100 µs-class stages the blocking
protocol would measure only the ~28 ms tunnel round trip.
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

B, H = 4096, 32
REPS = 40


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    from ddp_tpu.models.pendulum import pendulum
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver import al as al_mod
    from ddp_tpu.solver.batched import _backward_pallas_levels, _linesearch_sweep

    dtype = jnp.float32
    model = pendulum(1.0, 1.0, dtype=dtype)
    dyn = dynamics.euler(model, 0.01)
    con = constraints.advance_time(
        constraints.ConfigTarget(
            model=model, target=jnp.asarray([3.14], dtype), active_ts=(H,)
        ),
        dyn,
        times=2,
    )
    problem = Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con,
        horizon=H,
        second_order=False,
    )

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.stack([rng.uniform(-np.pi, np.pi, B), np.zeros(B)], 1), dtype
    )
    us = jnp.zeros((B, H, 1), dtype)
    xs = jax.jit(jax.vmap(problem.rollout))(x0s, us)
    jax.block_until_ready(xs)

    vderivs = jax.jit(jax.vmap(problem.derivatives))
    ms_deriv = _time(vderivs, xs, us)
    derivs = vderivs(xs, us)
    record("pend_stage_derivatives", B=B, H=H, ms=round(ms_deriv, 3))

    mults = jax.vmap(lambda xs_: al_mod.init_multipliers(problem, xs_))(xs)
    mu = jnp.full((B,), 1e4, dtype)
    reg = jnp.zeros((B,), dtype)
    bwd = jax.jit(
        lambda d, v, j, m, r: _backward_pallas_levels(d, v, j, m, r, n_levels=1)
    )
    ms_bwd = _time(bwd, derivs, mults.val, mults.jac, mu, reg)
    record("pend_stage_backward_pallas1", B=B, H=H, ms=round(ms_bwd, 3))

    k, K, _, _ = bwd(derivs, mults.val, mults.jac, mu, reg)
    for nls, unroll in ((4, 4), (8, 1)):
        vls = jax.jit(
            jax.vmap(
                lambda xs_, us_, k_, K_, mv, mj, mo, mu_, n=nls, u=unroll: _linesearch_sweep(
                    problem, xs_, us_, k_, K_,
                    al_mod.AffineMults(mv, mj, mo), mu_, n, unroll=u,
                )  # fmt: skip
            )
        )
        ms_fwd = _time(vls, xs, us, k, K, mults.val, mults.jac, mults.origin, mu)
        record(
            f"pend_stage_forward_ls{nls}_u{unroll}", B=B, H=H, ms=round(ms_fwd, 3)
        )
        if nls == 4:
            ms_fwd4 = ms_fwd

    def aux(xs_, mv, mj, mo, d, mu_):
        m2 = jax.vmap(
            lambda m_, x_: al_mod.update_origin(
                problem.model, al_mod.AffineMults(*m_), x_
            )
        )((mv, mj, mo), xs_)
        oo = jax.vmap(
            lambda d_, v_, j_, u_: al_mod.optimality_obj(problem, d_, v_, j_, u_)
        )(d, m2.val, m2.jac, mu_)
        oc = jax.vmap(al_mod.optimality_constr)(d)
        ol = jax.vmap(
            lambda d_, v_, j_: al_mod.optimality_lag(problem, d_, v_, j_)
        )(d, m2.val, m2.jac)
        return oo, oc, ol

    ms_aux = _time(jax.jit(aux), xs, mults.val, mults.jac, mults.origin, derivs, mu)
    record("pend_stage_aux_origin_opt", B=B, H=H, ms=round(ms_aux, 3))

    per_iter = ms_deriv + ms_bwd + ms_fwd4 + ms_aux
    record(
        "pend_stage_summary",
        B=B,
        H=H,
        iters=8,
        deriv_pct=round(100 * ms_deriv / per_iter, 1),
        backward_pct=round(100 * ms_bwd / per_iter, 1),
        forward_pct=round(100 * ms_fwd4 / per_iter, 1),
        aux_pct=round(100 * ms_aux / per_iter, 1),
        est_total_ms=round(8 * per_iter, 2),
    )


if __name__ == "__main__":
    main()
