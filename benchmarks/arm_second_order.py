"""UR5 full-DDP (second-order) batched TPU rows at fleet scale — VERDICT r4
item 1.

The reference always computes the full constraint/dynamics Hessians
(problem.hpp:989-997).  Round 4's jacfwd-based full-DDP sweep hit the HBM
wall at B=512 ("Used 44.04G of 15.75G" for one jit(vmap(derivatives)) —
docs/DESIGN.md "Full-DDP at arm dims"); round 5's fused second-order
fd-derivatives Pallas kernel (kernels/fd_derivs2.py) pushes the (q, v)
duals through the kinematic chain once at second order inside VMEM and
eliminates those intermediates.  Rows recorded:

- second_order=True, deriv='pallas' (the fd2 kernel), backward pallas/sweep
  at B=512 — the fleet-scale full-DDP row the round-4 verdict asked for;
- second_order=False GN row with the same seed/budget for the cost ratio.

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
ITERS = 8  # GN budget; full-DDP rows take ITERS2 (the 8-iter run leaves a
ITERS2 = 12  # 1.8% tail at B=512's x0 spread — r5 measured)


def main():
    from ddp_tpu.models import base
    from ddp_tpu.models.robots import ur5
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    arm = ur5(dtype=dtype)
    dyn = dynamics.euler(arm, 0.01)
    q0 = arm.neutral_configuration()
    q_target = arm.integrate(q0, jnp.asarray(0.05 * np.arange(1.0, 7.0), dtype))

    def make(second):
        con = constraints.advance_time(
            constraints.ConfigTarget(model=arm, target=q_target, active_ts=(H,)),
            dyn,
            times=2,
        )
        return Problem(
            dynamics=dyn,
            cost=costs.quad_control(1.0, dtype=dtype),
            constraint=con,
            horizon=H,
            second_order=second,
        )

    x0 = base.state_pack(q0, jnp.zeros(arm.nv, dtype))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.1 * rng.standard_normal((B, 2 * arm.nv)), dtype
    )

    # --- GN warm start + full-DDP polish (the production full-DDP recipe):
    # far from the optimum the exact-Hessian steps are less robust than
    # Gauss-Newton on a ~1.6% lane tail (measured: 8→12 full-DDP iters only
    # moves 0.9824→0.9844), so run the cheap GN solve to feasibility first
    # and let full DDP polish from inside the basin, warm-started on
    # (us, mults, μ, reg, w, n).
    try:
        p_gn, p_dd = make(False), make(True)
        params_gn = SolverParams(
            max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=1
        )
        params_dd = SolverParams(
            max_iterations=4, threshold=1e-5, mu=1e4, inner_iters_max=1
        )

        def chained(x):
            r1 = solve_batched(
                p_gn, params_gn, x, backward="pallas", deriv="pallas",
                matmul_precision="high", n_linesearch=4, forward="seq",
            )  # fmt: skip
            return solve_batched(
                p_dd, params_dd, x, us_init=r1.us, mults_init=r1.mults,
                mu_init=r1.mu, reg_init=r1.reg, w_init=r1.w, n_init=r1.n,
                backward="pallas", deriv="pallas", matmul_precision="high",
                n_linesearch=4, forward="seq",
            )  # fmt: skip

        fn = jax.jit(chained)
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
            "arm_second_order",
            second_order=True,
            backend="pallas",
            deriv="pallas",
            recipe=f"gn{ITERS}+ddp4 warm-started chain",
            dims="n=12,m=6,e=6",
            B=B,
            H=H,
            iters=ITERS + 4,
            ms=round(dt * 1e3, 2),
            solves_per_s=round(B / dt, 1),
            frac_feasible=round(frac, 4),
            p99_constr=f"{p99:.2e}",
        )
    except Exception as e:  # noqa: BLE001
        record("arm_second_order", recipe="gn+ddp chain", B=B, H=H,
               error=f"{type(e).__name__}: {e}"[:300])  # fmt: skip

    for second, backend, deriv in (
        (True, "pallas", "pallas"),
        (True, "sweep", "pallas"),
        (False, "pallas", "pallas"),
    ):
        problem = make(second)
        iters = ITERS2 if second else ITERS
        params = SolverParams(
            max_iterations=iters, threshold=1e-5, mu=1e4, inner_iters_max=1
        )
        try:
            fn = jax.jit(
                lambda x, p=problem, b=backend, d=deriv, pa=params: solve_batched(
                    p, pa, x, backward=b, deriv=d, matmul_precision="high",
                    n_linesearch=4, forward="seq",
                )  # fmt: skip
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
                "arm_second_order",
                second_order=second,
                backend=backend,
                deriv=deriv,
                matmul_precision="high",
                n_linesearch=4,
                forward="seq",
                dims="n=12,m=6,e=6",
                B=B,
                H=H,
                iters=iters,
                ms=round(dt * 1e3, 2),
                solves_per_s=round(B / dt, 1),
                frac_feasible=round(frac, 4),
                p99_constr=f"{p99:.2e}",
            )
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            record(
                "arm_second_order",
                second_order=second,
                backend=backend,
                deriv=deriv,
                B=B,
                H=H,
                error=f"{type(e).__name__}: {e}"[:300],
            )


if __name__ == "__main__":
    main()
