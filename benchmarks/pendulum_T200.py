"""Horizon-200 batched pendulum swing-up — the reference's *functional*
pendulum config (test/pendulum_ddp.cpp:33: horizon 200, dt 0.01, terminal
q=3.14 through double advance_time) batched on TPU (VERDICT r3 item 8: tie
the T=32 throughput headline to the reference's own horizon).

B=4096 random starts in [-π, π] (the bench.py fleet recipe), GN mode,
production levers: time-chunked Pallas backward (the [T, rows, B] slabs
split into reverse-order chunks carrying (Vx, Vxx) between launches —
solver/batched.py::_pallas_block_plan), 4-candidate early-exit ladder.
f64 CPU study: frac_feasible = 1.000 at p99 ‖eq‖ = 6.6e-4 with 8 AL
iterations.  Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

B, H = 4096, 200
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
    x0s = jnp.asarray(
        np.stack([rng.uniform(-np.pi, np.pi, B), np.zeros(B)], axis=1), dtype
    )

    for backend in ("pallas", "sweep"):
        try:
            fn = jax.jit(
                lambda x, b=backend: solve_batched(
                    problem, params, x, backward=b, n_reg_levels=1,
                    n_linesearch=4, unroll=4, forward="seq",
                )  # fmt: skip
            )
            r = fn(x0s)
            jax.block_until_ready(r.us)
            frac = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
            p99 = float(jnp.percentile(r.opt_constr, 99))
            n_rep = 5
            t0 = time.perf_counter()
            outs = [fn(x0s) for _ in range(n_rep)]
            jax.block_until_ready(outs[-1].us)
            dt = (time.perf_counter() - t0) / n_rep
            record(
                "pendulum_T200_swingup",
                backend=backend,
                timing="pipelined",
                B=B,
                H=H,
                iters=ITERS,
                ms=round(dt * 1e3, 2),
                solves_per_s=round(B / dt, 1),
                frac_feasible=round(frac, 4),
                p99_constr=f"{p99:.2e}",
            )
        except Exception as e:  # noqa: BLE001
            record(
                "pendulum_T200_swingup",
                backend=backend,
                B=B,
                H=H,
                error=f"{type(e).__name__}: {e}"[:300],
            )


if __name__ == "__main__":
    main()
