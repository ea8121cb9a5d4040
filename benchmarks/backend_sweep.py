"""Sweep solve_batched configurations on the TPU: backward backend × unroll.

Finds the fastest configuration for the headline bench (batched pendulum
DDP, BASELINE configs[1]).  Appends one JSON line per config to
benchmarks/results.jsonl.  Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import time

from _common import pendulum_problem, record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

B, H, ITERS = 4096, 32, 10


def main():
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    problem = pendulum_problem(H, second_order=False, dtype=dtype)
    params = SolverParams(max_iterations=ITERS, threshold=1e-5, mu=1e4)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.stack([rng.uniform(-np.pi, np.pi, B), np.zeros(B)], axis=1), dtype
    )

    configs = [
        ("sweep", 1),
        ("sweep", 4),
        ("pallas", 1),
        ("pallas", 4),
        ("assoc", 1),
    ]
    for backend, unroll in configs:
        try:
            fn = jax.jit(
                lambda x, b=backend, u=unroll: solve_batched(
                    problem, params, x, backward=b, unroll=u
                )
            )
            r = fn(x0s)
            jax.block_until_ready(r.us)
            # sanity: solutions must be finite and mostly feasible
            frac_ok = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                r = fn(x0s)
                jax.block_until_ready(r.us)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            record(
                "backend_sweep",
                backend=backend,
                unroll=unroll,
                ms=round(dt * 1e3, 2),
                solves_per_s=round(B / dt, 1),
                frac_feasible=round(frac_ok, 4),
            )
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            record("backend_sweep", backend=backend, unroll=unroll,
                   error=f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
