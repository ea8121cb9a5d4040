"""Pendulum throughput vs fleet size — the roofline section's prediction
(docs/DESIGN.md "Speed-of-light accounting"): at B=4096 the solve runs at
13% of HBM speed-of-light, latency-bound on the serial scan chain, so
solves/s/chip should scale ~linearly with B until the bandwidth term
catches up (~6×).  B=4096 stays the headline (BASELINE configs[1] pins
it); these rows record the per-chip ceiling beyond it.

Same workload/config as bench.py (T=32, 8 iters, pallas backward,
nls=4/unroll=4, pipelined timing).  Run SOLO.
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

H = 32
ITERS = 8


def main():
    from ddp_tpu.models.pendulum import pendulum
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

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
    params = SolverParams(
        max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=1
    )
    rng = np.random.default_rng(0)

    for B in (4096, 8192, 16384, 32768, 65536):
        x0s = jnp.asarray(
            np.stack([rng.uniform(-np.pi, np.pi, B), np.zeros(B)], axis=1),
            dtype,
        )
        try:
            fn = jax.jit(
                lambda x: solve_batched(
                    problem, params, x, backward="pallas", n_reg_levels=1,
                    n_linesearch=4, unroll=4,
                )  # fmt: skip
            )
            r = fn(x0s)
            jax.block_until_ready(r.us)
            frac = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
            n_rep = 10
            t0 = time.perf_counter()
            outs = [fn(x0s) for _ in range(n_rep)]
            jax.block_until_ready(outs[-1].us)
            dt = (time.perf_counter() - t0) / n_rep
            record(
                "pendulum_batch_scaling",
                backend="pallas",
                timing="pipelined",
                B=B,
                H=H,
                iters=ITERS,
                ms=round(dt * 1e3, 2),
                solves_per_s=round(B / dt, 1),
                frac_feasible=round(frac, 4),
            )
        except Exception as e:  # noqa: BLE001
            record(
                "pendulum_batch_scaling", B=B, H=H,
                error=f"{type(e).__name__}: {e}"[:300],
            )


if __name__ == "__main__":
    main()
