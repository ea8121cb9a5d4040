"""Whole-solve kernel vs the scan-chain solver on the headline workload.

BASELINE configs[1] shapes (pendulum T=32, 8 AL iterations, n_ls=4): the
one-launch kernel (kernels/flat_solve.py) vs solve_batched with the pallas
backward — same problem, same budget, pipelined timing protocol.  Run SOLO.
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

H, ITERS = 32, 8


def main():
    from ddp_tpu.models.pendulum import pendulum
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams
    from ddp_tpu.kernels.flat_solve import solve_flat_pallas

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
        dynamics=dyn, cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con, horizon=H, second_order=False,
    )  # fmt: skip
    params = SolverParams(
        max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=1
    )

    for B in (4096, 8192, 16384):
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(
            np.stack([rng.uniform(-np.pi, np.pi, B), np.zeros(B)], axis=1), dtype
        )
        try:
            t0 = time.perf_counter()
            fk = jax.jit(
                lambda x: solve_flat_pallas(problem, params, x, n_linesearch=4)
            )
            rk = fk(x0s)
            jax.block_until_ready(rk.us)
            t_compile = time.perf_counter() - t0
            frac = float(jnp.mean((rk.opt_constr < 1e-2).astype(jnp.float32)))
            n_rep = 50
            t0 = time.perf_counter()
            outs = [fk(x0s) for _ in range(n_rep)]
            jax.block_until_ready(outs[-1].us)
            dt = (time.perf_counter() - t0) / n_rep
            record(
                "flat_solve_kernel", B=B, T=H, iters=ITERS, n_ls=4,
                compile_s=round(t_compile, 1), ms=round(dt * 1e3, 3),
                solves_per_s=round(B / dt, 1), frac_feasible=round(frac, 4),
            )  # fmt: skip
        except Exception as e:  # noqa: BLE001
            record(
                "flat_solve_kernel", B=B,
                error=f"{type(e).__name__}: {e}"[:300],
            )
            continue

        # parity vs the production path on-device (f32 tolerance)
        if B == 4096:
            fs = jax.jit(
                lambda x: solve_batched(
                    problem, params, x, backward="pallas", n_reg_levels=1,
                    n_linesearch=4,
                )  # fmt: skip
            )
            rs = fs(x0s)
            jax.block_until_ready(rs.us)
            n_rep = 20
            t0 = time.perf_counter()
            outs = [fs(x0s) for _ in range(n_rep)]
            jax.block_until_ready(outs[-1].us)
            dts = (time.perf_counter() - t0) / n_rep
            du = float(jnp.max(jnp.abs(rk.us - rs.us)))
            agree = float(
                jnp.mean(
                    ((rk.opt_constr < 1e-2) == (rs.opt_constr < 1e-2)).astype(
                        jnp.float32
                    )
                )
            )
            record(
                "flat_solve_parity_vs_batched", B=B,
                batched_ms=round(dts * 1e3, 3),
                batched_solves_per_s=round(B / dts, 1),
                max_du=f"{du:.2e}", feasible_agree_frac=round(agree, 4),
            )  # fmt: skip


if __name__ == "__main__":
    main()
