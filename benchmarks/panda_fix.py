"""Panda7 spatial_eq: kill the μ-race tail + lift throughput (r5 item 2).

Diagnosis (panda7_tail_diagnosis row): the infeasible tail is 3/1024 lanes
whose μ raced to 1e35 under K=1 premature multiplier updates — steps
collapse to 0 and ‖eq‖ freezes/diverges.  Not singular targets (σ_min and
x0 spread normal).  The cures already exist in the solver: bound the inner
budget (K=2/3) so updates fire at inner convergence, and/or the
Bertsekas safeguards (mu_max + mult_max).  This sweep measures the
candidate recipes at B=1024 and the winner at larger B for throughput.

Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

from panda_tail import build  # same fleet construction

setup_cache()


def run(recipe_name, B, iters, inner_k, mu_max=None, mult_max=None, reps=3):
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    arm, fid, problem, _, x0s, us0 = build(B, iters)
    params = SolverParams(
        max_iterations=iters, threshold=1e-5, mu=1e4,
        inner_iters_max=inner_k, mu_max=mu_max, mult_max=mult_max,
    )  # fmt: skip
    fn = jax.jit(
        lambda x, u: solve_batched(
            problem, params, x, us_init=u, backward="pallas",
            matmul_precision="highest", n_linesearch=8, forward="seq",
            deriv="pallas",
        )  # fmt: skip
    )
    r = fn(x0s, us0)
    jax.block_until_ready(r.us)
    frac = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
    p99 = float(jnp.percentile(r.opt_constr, 99))
    pmax = float(jnp.max(r.opt_constr))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(x0s, us0)
        jax.block_until_ready(r.us)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    record(
        "panda7_fix_sweep", recipe=recipe_name, B=B, iters=iters,
        inner_k=inner_k, mu_max=mu_max, mult_max=mult_max,
        ms=round(dt * 1e3, 1), solves_per_s=round(B / dt, 1),
        frac_feasible=round(frac, 4), p99_constr=f"{p99:.2e}",
        max_constr=f"{pmax:.2e}",
    )  # fmt: skip
    return frac, B / dt


def main():
    B = 1024
    candidates = [
        ("k1_mucap", dict(iters=24, inner_k=1, mu_max=1e7, mult_max=1e6)),
        ("k2", dict(iters=24, inner_k=2)),
        ("k2_mucap", dict(iters=24, inner_k=2, mu_max=1e7, mult_max=1e6)),
        ("k3", dict(iters=30, inner_k=3)),
        ("k1_32_mucap", dict(iters=32, inner_k=1, mu_max=1e7, mult_max=1e6)),
    ]
    best = None
    for name, kw in candidates:
        frac, sps = run(name, B, **kw)
        if frac >= 0.9999 and (best is None or sps > best[1]):
            best = (name, sps, kw)
    if best is not None:
        name, _, kw = best
        for Bs in (2048, 4096):
            run(f"{name}_B{Bs}", Bs, **kw)


if __name__ == "__main__":
    main()
