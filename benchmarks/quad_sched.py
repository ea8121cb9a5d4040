"""Quadrotor schedule sweep: can the 36-iteration AL ramp shrink?

The stage profile (quadrotor_stage_profile row) shows no dominant stage —
derivs 39%, forward 26%, backward 18%, aux 18% — and throughput does not
scale with B (compute-bound).  The binder is the iteration budget itself:
36 iterations × K=3 forced by the rank-6-control vs rank-12-terminal
constraint.  This sweep probes cheaper schedules (μ₀, K, iters, safeguards)
for the same 100%-feasibility bar.  Run SOLO.
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

from quad_profile import build

setup_cache()


def main():
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    B = 512
    quad, problem, _, x0s, us0 = build(B)
    for name, kw in (
        ("it24_k3_mu1e5", dict(max_iterations=24, inner_iters_max=3, mu=1e5)),
        ("it24_k2_mu1e4", dict(max_iterations=24, inner_iters_max=2, mu=1e4)),
        ("it20_k2_mu1e5_cap", dict(max_iterations=20, inner_iters_max=2,
                                   mu=1e5, mu_max=1e8, mult_max=1e6)),
        ("it28_k3_mu3e4", dict(max_iterations=28, inner_iters_max=3, mu=3e4)),
    ):  # fmt: skip
        params = SolverParams(threshold=1e-5, **kw)
        fn = jax.jit(
            lambda x, u, p=params: solve_batched(
                problem, p, x, us_init=u, backward="pallas",
                matmul_precision="highest", n_linesearch=8, forward="seq",
            )  # fmt: skip
        )
        r = fn(x0s, us0)
        jax.block_until_ready(r.us)
        frac = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
        p99 = float(jnp.percentile(r.opt_constr, 99))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(x0s, us0)
            jax.block_until_ready(r.us)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        record(
            "quadrotor_sched_sweep", recipe=name, B=B,
            ms=round(dt * 1e3, 1), solves_per_s=round(B / dt, 1),
            frac_feasible=round(frac, 4), p99_constr=f"{p99:.2e}", **kw,
        )  # fmt: skip


if __name__ == "__main__":
    main()
