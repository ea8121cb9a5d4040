"""Panda7 spatial_eq f32 tail: per-lane root cause + throughput lift (r5).

Round 4 left configs[3] at 98.8% feasible @1e-2 (p99 2.47e-2, 236 solves/s
at B=1024) with the 1.2% tail un-attributed.  This script answers, on TPU:

1. Does the tail close with budget?  B=1024 fleet at 40 iterations with
   history=True → cumulative frac-feasible per iteration + the stalled
   lanes' (μ, step, opt_obj, opt_constr) traces.
2. What distinguishes tail lanes?  EE-Jacobian σ_min at x0 and at the
   final configuration, x0 distance from the ready pose.
3. Throughput: B ∈ {1024, 2048, 4096} at the production budget, and a
   "tail-rescue" two-phase recipe (24 iters for all + warm-started
   continuation for the infeasible tail only).

Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

H = 16


def build(B, iters, dtype=jnp.float32):
    from ddp_tpu.models import base
    from ddp_tpu.models.robots import ee_frame_id, panda7
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.solve import SolverParams

    arm = panda7(dtype=dtype)
    dyn = dynamics.euler(arm, 0.01)
    fid = ee_frame_id(arm, "ee")
    q_ready = jnp.asarray([0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785], dtype)
    q_goal = arm.integrate(q_ready, jnp.asarray(0.04 * np.arange(1.0, 8.0), dtype))
    p_target = arm.frame_position(fid, q_goal)
    con = constraints.advance_time(
        constraints.FrameTarget(model=arm, target=p_target, frame_id=fid, active_ts=(H,)),
        dyn, times=2,
    )  # fmt: skip
    problem = Problem(
        dynamics=dyn, cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con, horizon=H, second_order=False,
    )  # fmt: skip
    params = SolverParams(
        max_iterations=iters, threshold=1e-5, mu=1e4, inner_iters_max=1
    )
    rng = np.random.default_rng(0)
    x0 = base.state_pack(q_ready, jnp.zeros(arm.nv, dtype))
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, problem.nx)), dtype
    )
    zero_v = jnp.zeros(arm.nv, dtype)
    grav = jax.vmap(lambda q: arm.rnea(q, zero_v, zero_v))(x0s[:, : arm.nq])
    us0 = jnp.tile(grav[:, None, :], (1, H, 1))
    return arm, fid, problem, params, x0s, us0


def solve_fn(problem, params, history=False):
    from ddp_tpu.solver.batched import solve_batched

    return jax.jit(
        lambda x, u: solve_batched(
            problem, params, x, us_init=u, backward="pallas",
            matmul_precision="highest", n_linesearch=8, forward="seq",
            deriv="pallas", history=history,
        )  # fmt: skip
    )


def main():
    from ddp_tpu.models import base

    # --- 1+2: budget probe with history at B=1024, 40 iters ---
    B = 1024
    arm, fid, problem, params, x0s, us0 = build(B, 40)
    fn = solve_fn(problem, params, history=True)
    r = fn(x0s, us0)
    jax.block_until_ready(r.us)
    oc_hist = np.asarray(r.history.opt_constr)  # [I, B]
    frac_per_iter = (oc_hist < 1e-2).mean(axis=1)
    oc = np.asarray(r.opt_constr)
    bad = np.nonzero(oc >= 1e-2)[0]
    # what frac does 24 iters give within this same run?
    frac24 = float((oc_hist[23] < 1e-2).mean())
    frac40 = float((oc < 1e-2).mean())

    def sig_min(q):
        J = jax.jacfwd(lambda qq: arm.frame_position(fid, qq))(q)
        return jnp.linalg.svd(J, compute_uv=False)[-1]

    q0s = x0s[:, : arm.nq]
    qfs = r.xs[:, -1, : arm.nq]
    s0 = np.asarray(jax.vmap(sig_min)(q0s))
    sf = np.asarray(jax.vmap(sig_min)(qfs))
    x0_dist = np.asarray(jnp.linalg.norm(x0s - jnp.mean(x0s, 0), axis=1))
    tail_info = {
        "n_bad_40": int(bad.size),
        "frac24": round(frac24, 4),
        "frac40": round(frac40, 4),
        "frac_per_iter_tail": [round(float(f), 4) for f in frac_per_iter[20:]],
        "sig_min_x0_bad_vs_all": [
            round(float(np.median(s0[bad])) if bad.size else -1, 4),
            round(float(np.median(s0)), 4),
        ],
        "sig_min_final_bad_vs_all": [
            round(float(np.median(sf[bad])) if bad.size else -1, 4),
            round(float(np.median(sf)), 4),
        ],
        "x0_dist_bad_vs_all": [
            round(float(np.median(x0_dist[bad])) if bad.size else -1, 3),
            round(float(np.median(x0_dist)), 3),
        ],
        "bad_mu_final_median": (
            float(np.median(np.asarray(r.mu)[bad])) if bad.size else -1
        ),
        "bad_oc_final": [float(x) for x in oc[bad][:8]],
        "bad_step_last5_median": (
            [round(float(np.median(np.asarray(r.history.step)[i, bad])), 4)
             for i in range(35, 40)] if bad.size else []
        ),
    }
    record("panda7_tail_diagnosis", B=B, **tail_info)

    # --- 3: throughput sweep at the production budget ---
    for Bs in (1024, 2048, 4096):
        arm, fid, problem, params, x0s, us0 = build(Bs, 24)
        fn = solve_fn(problem, params)
        r = fn(x0s, us0)
        jax.block_until_ready(r.us)
        frac = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
        p99 = float(jnp.percentile(r.opt_constr, 99))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(x0s, us0)
            jax.block_until_ready(r.us)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        record(
            "panda7_B_sweep", B=Bs, iters=24, ms=round(dt * 1e3, 1),
            solves_per_s=round(Bs / dt, 1), frac_feasible=round(frac, 4),
            p99_constr=f"{p99:.2e}",
        )  # fmt: skip


if __name__ == "__main__":
    main()
