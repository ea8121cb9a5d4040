"""7-DoF panda spatial_eq batched DDP — the literal BASELINE configs[3]
workload ("equality-constrained DDP on a 7-DoF arm (spatial_eq variant,
augmented-Lagrangian multipliers)", ≙ test/pinocchio_spatial_eq_ddp.cpp run
on a 7-DoF model).

The arm_backend_sweep rows cover the 6-DoF UR5 with a config target
(n=12, m=6, e=6); this records the 7-DoF end-effector-position variant
(n=14, m=7, e=3) under the round-3 production config: Pallas backward,
matmul_precision="high", 4-candidate early-exit sequential line search.
Shared reachable EE target (FK of a perturbed configuration), randomized
±0.1 starts per lane — the same batch recipe as the UR5 sweep.

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
ITERS = 8


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
    q0 = arm.neutral_configuration()
    q_goal = arm.integrate(
        q0, jnp.asarray(0.04 * np.arange(1.0, 8.0), dtype)
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
    x0 = base.state_pack(q0, jnp.zeros(arm.nv, dtype))
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.1 * rng.standard_normal((B, problem.nx)),
        dtype,
    )

    fn = jax.jit(
        lambda x: solve_batched(
            problem,
            params,
            x,
            backward="pallas",
            matmul_precision="high",
            n_linesearch=4,
            forward="seq",
            deriv="pallas",
        )
    )
    r = fn(x0s)
    jax.block_until_ready(r.us)
    frac = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
    p99 = float(jnp.percentile(r.opt_constr, 99))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(x0s)
        jax.block_until_ready(r.us)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    record(
        "panda7_spatial_eq",
        backend="pallas",
        matmul_precision="high",
        n_linesearch=4,
        forward="seq",
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
