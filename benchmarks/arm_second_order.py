"""UR5 full-DDP (second-order) batched TPU row — VERDICT r3 item 5.

The reference always computes the full constraint/dynamics Hessians
(problem.hpp:989-997); our production arm rows are Gauss-Newton.  This
records the second_order=True cost on TPU:

- derivative sweep: jacfwd∘jacfwd over the shared-primal chart maps
  (ocp/problem.py per_t) — the fd-derivatives Pallas kernel is GN-only;
- backward: the Pallas batch-on-lanes kernel WITH the rank-3 contraction
  terms (kernels/riccati_small.py second_order path).  The VMEM plan
  shrinks the lane block to fit the 6 extra tensor blocks
  (n·(n²+mn+m²)+e·(n²+mn+m²) extra rows/step — plan says block 32 at UR5
  dims vs 256 for GN).

A GN row with the same seed/budget rides along for the cost ratio.
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

    params = SolverParams(
        max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=1
    )
    x0 = base.state_pack(q0, jnp.zeros(arm.nv, dtype))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.1 * rng.standard_normal((B, 2 * arm.nv)), dtype
    )

    for second, backend in ((True, "pallas"), (True, "sweep"), (False, "pallas")):
        problem = make(second)
        try:
            fn = jax.jit(
                lambda x, p=problem, b=backend: solve_batched(
                    p, params, x, backward=b, matmul_precision="high",
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
                matmul_precision="high",
                n_linesearch=4,
                forward="seq",
                dims="n=12,m=6,e=6",
                B=B,
                H=H,
                iters=ITERS,
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
                B=B,
                H=H,
                error=f"{type(e).__name__}: {e}"[:300],
            )


if __name__ == "__main__":
    main()
