"""Per-stage device profile of the UR5 batched solve (round-3 VERDICT item 1).

The arm-class workload (BASELINE configs[3] dims: n=12, m=6, e=6) is
derivative-bound (docs/DESIGN.md "Arm-class dims"); this script measures the
three solver stages in isolation at the arm_backend_sweep config (B=512,
T=16, f32, Gauss-Newton) so optimization work targets the real split:

- derivatives: vmap(problem.derivatives) — the jacfwd-over-RNEA sweep
- backward:    the multi-reg XLA sweep and the Pallas batch-on-lanes kernel
- forward:     the 8-candidate parallel line search (includes AL cost evals)
- aux:         update_origin + optimality reductions

Each stage is jitted standalone with fixed inputs and timed wall-to-wall
after warm-up (device-bound at these sizes: one dispatch per call).

Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

B, H = 512, 16
REPS = 5


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from ddp_tpu.models import base
    from ddp_tpu.models.robots import ur5
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver import al as al_mod
    from ddp_tpu.solver.batched import (
        _backward_multi_reg,
        _backward_pallas_levels,
        _linesearch_sweep,
    )
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    arm = ur5(dtype=dtype)
    dyn = dynamics.euler(arm, 0.01)
    q0 = arm.neutral_configuration()
    q_target = arm.integrate(q0, jnp.asarray(0.05 * np.arange(1.0, 7.0), dtype))
    con = constraints.advance_time(
        constraints.ConfigTarget(model=arm, target=q_target, active_ts=(H,)),
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

    x0 = base.state_pack(q0, jnp.zeros(arm.nv, dtype))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.1 * rng.standard_normal((B, problem.nx)), dtype
    )
    us = jnp.zeros((B, H, arm.nu), dtype)
    xs = jax.jit(jax.vmap(problem.rollout))(x0s, us)
    jax.block_until_ready(xs)

    # --- stage: derivatives ---
    vderivs = jax.jit(jax.vmap(problem.derivatives))
    ms_deriv = _time(vderivs, xs, us)
    derivs = vderivs(xs, us)
    record("arm_stage_derivatives", B=B, H=H, ms=ms_deriv)

    # --- stage: backward ---
    mults = jax.vmap(lambda xs_: al_mod.init_multipliers(problem, xs_))(xs)
    mu = jnp.full((B,), 1e4, dtype)
    reg = jnp.zeros((B,), dtype)

    bwd_sweep = jax.jit(
        lambda d, v, j, m, r: jax.vmap(
            lambda d_, v_, j_, m_, r_: _backward_multi_reg(d_, v_, j_, m_, r_)
        )(d, v, j, m, r)
    )
    ms_bwd = _time(bwd_sweep, derivs, mults.val, mults.jac, mu, reg)
    record("arm_stage_backward_sweep", B=B, H=H, ms=ms_bwd)

    bwd_pallas = jax.jit(
        lambda d, v, j, m, r: _backward_pallas_levels(d, v, j, m, r)
    )
    ms_bwd_p = _time(bwd_pallas, derivs, mults.val, mults.jac, mu, reg)
    record("arm_stage_backward_pallas", B=B, H=H, ms=ms_bwd_p)

    # --- stage: forward (line search) ---
    k, K, _, _ = bwd_pallas(derivs, mults.val, mults.jac, mu, reg)
    vls = jax.jit(
        jax.vmap(
            lambda xs_, us_, k_, K_, mv, mj, mo, mu_: _linesearch_sweep(
                problem, xs_, us_, k_, K_,
                al_mod.AffineMults(mv, mj, mo), mu_, 8,
            )
        )
    )
    ms_fwd = _time(vls, xs, us, k, K, mults.val, mults.jac, mults.origin, mu)
    record("arm_stage_forward_ls8", B=B, H=H, ms=ms_fwd)

    # the round-3 production forward: sequential early-exit ladder (expected
    # rollout count ~1 when gains are accurate) at 4 candidates
    from ddp_tpu.solver.batched import _linesearch_seq

    vseq = jax.jit(
        jax.vmap(
            lambda xs_, us_, k_, K_, mv, mj, mo, mu_: _linesearch_seq(
                problem, xs_, us_, k_, K_,
                al_mod.AffineMults(mv, mj, mo), mu_, 4,
            )
        )
    )
    ms_fwd_seq = _time(
        vseq, xs, us, k, K, mults.val, mults.jac, mults.origin, mu
    )
    record("arm_stage_forward_seq4", B=B, H=H, ms=ms_fwd_seq)

    # --- stage: aux (update_origin + optimality measures) ---
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

    ms_aux = _time(
        jax.jit(aux), xs, mults.val, mults.jac, mults.origin, derivs, mu
    )
    record("arm_stage_aux_origin_opt", B=B, H=H, ms=ms_aux)

    per_iter = ms_deriv + min(ms_bwd, ms_bwd_p) + min(ms_fwd, ms_fwd_seq) + ms_aux
    record(
        "arm_stage_summary",
        B=B,
        H=H,
        iters=8,
        deriv_pct=round(100 * ms_deriv / per_iter, 1),
        fwd_pct=round(100 * min(ms_fwd, ms_fwd_seq) / per_iter, 1),
        est_total_ms=round(8 * per_iter, 1),
    )


if __name__ == "__main__":
    main()
