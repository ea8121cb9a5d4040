"""7-DoF panda spatial_eq batched DDP — the literal BASELINE configs[3]
workload ("equality-constrained DDP on a 7-DoF arm (spatial_eq variant,
augmented-Lagrangian multipliers)", ≙ test/pinocchio_spatial_eq_ddp.cpp run
on a 7-DoF model; the reference drives ONE instance from neutral for 200
iterations at μ₀=1e20 under MPFR — this measures a 512-lane fleet in f32).

Workload recipe (f64 CPU study, benchmarks/results.jsonl panda7 rows +
round-4 notes):
- fleet centered on the panda *ready* pose (bent elbow): the neutral
  upright pose is kinematically near-singular (EE Jacobian σ_min 0.088 vs
  0.23 bent) and its fleet has a heavy slow-convergence tail;
- gravity-compensation warm start (us_init = RNEA(q₀, 0, 0) per lane) —
  standard MPC practice; a zero-torque init from a bent pose rolls out a
  falling arm and costs ~8 iterations of recovery;
- ±0.05 rad/rad·s⁻¹ start spread, EE target from a +0.04·k rad offset
  configuration, terminal FrameTarget (e=3) through double AdvanceTime;
- 24 AL iterations (inner_iters_max=1), 8-candidate early-exit sequential
  line search: f64 oracle reaches frac_feasible = 1.000 at p99 ‖eq‖ ≈ 1e-4;
- matmul_precision="highest": the f32 TPU run needs the bf16x6 passes —
  "high" leaves a 4.3% infeasible tail (0.957 vs 0.988, panda7_tune rows),
  the same mechanism as the UR5 feasibility story (docs/DESIGN.md).

The e=3 config-dependent constraint rides the generic JVP derivative path;
dynamics Jacobians ride the fd-derivatives Pallas kernel (deriv="pallas" —
fx/fu only, constraint untouched).  Run SOLO (the tunnel serializes TPU
clients).
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

B, H = 512, 16
ITERS = 24


def main():
    from ddp_tpu.models import base
    from ddp_tpu.models.robots import ee_frame_id, panda7
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    arm = panda7(dtype=dtype)
    dyn = dynamics.euler(arm, 0.01)
    fid = ee_frame_id(arm, "ee")
    q_ready = jnp.asarray(
        [0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785], dtype
    )
    q_goal = arm.integrate(
        q_ready, jnp.asarray(0.04 * np.arange(1.0, 8.0), dtype)
    )
    p_target = arm.frame_position(fid, q_goal)

    con = constraints.advance_time(
        constraints.FrameTarget(
            model=arm, target=p_target, frame_id=fid, active_ts=(H,)
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
    params = SolverParams(
        max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=1
    )

    rng = np.random.default_rng(0)
    x0 = base.state_pack(q_ready, jnp.zeros(arm.nv, dtype))
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, problem.nx)),
        dtype,
    )
    zero_v = jnp.zeros(arm.nv, dtype)
    grav = jax.vmap(lambda q: arm.rnea(q, zero_v, zero_v))(x0s[:, : arm.nq])
    us0 = jnp.tile(grav[:, None, :], (1, H, 1))

    fn = jax.jit(
        lambda x, u: solve_batched(
            problem,
            params,
            x,
            us_init=u,
            backward="pallas",
            matmul_precision="highest",
            n_linesearch=8,
            forward="seq",
            deriv="pallas",
        )
    )
    r = fn(x0s, us0)
    jax.block_until_ready(r.us)
    frac = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
    p99 = float(jnp.percentile(r.opt_constr, 99))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(x0s, us0)
        jax.block_until_ready(r.us)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    record(
        "panda7_spatial_eq",
        backend="pallas",
        matmul_precision="highest",
        n_linesearch=8,
        forward="seq",
        deriv="pallas",
        recipe="ready-pose fleet, grav-comp warm start, 0.05 spread",
        dims="n=14,m=7,e=3",
        B=B,
        H=H,
        iters=ITERS,
        ms=round(dt * 1e3, 2),
        solves_per_s=round(B / dt, 1),
        frac_feasible=round(frac, 4),
        p99_constr=f"{p99:.2e}",
    )


if __name__ == "__main__":
    main()
