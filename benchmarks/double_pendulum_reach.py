"""Double-pendulum batched DDP — BASELINE configs[2] ("double-pendulum/
acrobot via RNEA/ABA dynamics with jacfwd linearization, mirrors
pinocchio_double").

The 2-DoF chain runs the full rigid-body engine path (world-frame RNEA/
CRBA forward dynamics + the batch-on-lanes fd-derivatives kernel), i.e.
exactly the machinery the 6/7-DoF arms use, at the dims the reference's
pinocchio_double instantiation targets.  Workload: terminal ConfigTarget
reach q = [0.8, -0.5] (the reference's constraint type,
problem.hpp:745-864) through double AdvanceTime, H=32, dt=0.01, starts
±0.3 rad / ±0.2 rad·s⁻¹.  f64 CPU study: frac_feasible = 1.000 at
p99 ‖eq‖ = 4.2e-3 with 12 AL iterations.

Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

B, H = 2048, 32
ITERS = 12


def main():
    from ddp_tpu.models.rigid_body import double_pendulum
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    m = double_pendulum(dtype=dtype)
    dyn = dynamics.euler(m, 0.01)
    con = constraints.advance_time(
        constraints.ConfigTarget(
            model=m, target=jnp.asarray([0.8, -0.5], dtype), active_ts=(H,)
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
    x0s = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.3, 0.3, (B, 2)), 0.2 * rng.standard_normal((B, 2))],
            axis=1,
        ),
        dtype,
    )

    fn = jax.jit(
        lambda x: solve_batched(
            problem,
            params,
            x,
            backward="pallas",
            matmul_precision="high",
            n_linesearch=8,
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
        "double_pendulum_reach",
        backend="pallas",
        matmul_precision="high",
        n_linesearch=8,
        forward="seq",
        deriv="pallas",
        dims="n=4,m=2,e=2",
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
