"""Sweep solve_batched configurations on the TPU: backward backend × unroll.

Finds the fastest configuration for the headline bench (batched pendulum
DDP, BASELINE configs[1]).  Appends one JSON line per config to
benchmarks/results.jsonl.  Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.jsonl")
B, H, ITERS = 4096, 32, 10


def record(**kw):
    row = {"t": time.strftime("%Y-%m-%d %H:%M:%S"), **kw}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


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
            model=model, target=jnp.asarray([3.14], dtype=dtype), active_ts=(H,)
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
                metric="backend_sweep",
                backend=backend,
                unroll=unroll,
                ms=round(dt * 1e3, 2),
                solves_per_s=round(B / dt, 1),
                frac_feasible=round(frac_ok, 4),
            )
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            record(metric="backend_sweep", backend=backend, unroll=unroll,
                   error=f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
