"""Backend × AL-schedule sweep at matched iteration budgets (round-2 VERDICT
item 1: same-iteration comparison rows).

Context (docs/DESIGN.md "The bf16 plateau anomaly"): the round-1 backend_sweep
showed pallas frac_feasible=0.585 vs XLA sweep 0.988 at ITERS=10.  Root cause:
the XLA sweep's tiny matmuls ran on the MXU in bf16; that ~0.4%/step gain
noise tripped the plateau gate early, firing multiplier/μ updates sooner.  The
pallas kernel (exact f32) — and the XLA sweep once pinned to HIGHEST matmul
precision — both converge identically, later.  The schedule fix is the
bounded inner loop (SolverParams.inner_iters_max); this sweep records the
matrix so the claim is traceable.

Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import time

from _common import pendulum_problem, record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

B, H = 4096, 32


def main():
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    problem = pendulum_problem(H, second_order=False, dtype=dtype)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.stack([rng.uniform(-np.pi, np.pi, B), np.zeros(B)], axis=1), dtype
    )

    configs = [
        # (backend, iters, inner_iters_max)
        ("sweep", 10, None),   # round-1 comparison point (now HIGHEST prec)
        ("pallas", 10, None),  # round-1 comparison point
        ("sweep", 8, 1),
        ("pallas", 8, 1),
        ("pallas", 10, 1),
    ]
    for backend, iters, k in configs:
        try:
            params = SolverParams(
                max_iterations=iters, threshold=1e-5, mu=1e4, inner_iters_max=k
            )
            fn = jax.jit(
                lambda x, b=backend, p=params: solve_batched(problem, p, x, backward=b)
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
                "schedule_sweep",
                backend=backend,
                iters=iters,
                inner_iters_max=k,
                ms=round(dt * 1e3, 2),
                solves_per_s=round(B / dt, 1),
                frac_feasible=round(frac, 4),
                p99_constr=f"{p99:.2e}",
            )
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            record("schedule_sweep", backend=backend, iters=iters,
                   inner_iters_max=k, error=f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
