"""Panda7 tail rescue: re-solve the μ-raced lanes under a gentler schedule.

The recipe sweep (panda7_fix_sweep rows) shows the global fixes all hurt:
μ caps starve the AL forcing (k1_mucap: 13% feasible), K=2 delays updates
for the majority (92%).  The production answer is per-lane: run the
K=1/24-iter fleet, detect the ~0.7% infeasible lanes (opt_constr ≥ 1e-2),
and re-solve exactly those from their x0 under μ₀=1e3 with a 32-iteration
budget (padded to one lane block).  Records whether the rescue closes the
fleet to 100% and its amortized throughput cost.  Run SOLO.
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

from panda_tail import build

setup_cache()


def main():
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    B = 1024
    arm, fid, problem, params, x0s, us0 = build(B, 24)
    fn = jax.jit(
        lambda x, u: solve_batched(
            problem, params, x, us_init=u, backward="pallas",
            matmul_precision="highest", n_linesearch=8, forward="seq",
            deriv="pallas",
        )  # fmt: skip
    )
    r = fn(x0s, us0)
    jax.block_until_ready(r.us)
    oc = np.asarray(r.opt_constr)
    bad = np.nonzero(oc >= 1e-2)[0]
    frac_main = float((oc < 1e-2).mean())

    # rescue fleet: bad lanes padded to 128 with repeats
    RB = 128
    idx = np.resize(bad, RB) if bad.size else np.zeros((RB,), np.int64)
    xr = x0s[jnp.asarray(idx)]
    ur = us0[jnp.asarray(idx)]
    params_r = SolverParams(
        max_iterations=32, threshold=1e-5, mu=1e3, inner_iters_max=1
    )
    _, _, problem_r, _, _, _ = build(RB, 32)  # same problem, fresh horizon obj
    fr = jax.jit(
        lambda x, u: solve_batched(
            problem_r, params_r, x, us_init=u, backward="pallas",
            matmul_precision="highest", n_linesearch=8, forward="seq",
            deriv="pallas",
        )  # fmt: skip
    )
    rr = fr(xr, ur)
    jax.block_until_ready(rr.us)
    ocr = np.asarray(rr.opt_constr)[: max(bad.size, 1)]
    rescued = int((ocr < 1e-2).sum()) if bad.size else 0

    # amortized timing: main fleet + rescue pass
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(x0s, us0)
        jax.block_until_ready(r.us)
        rr = fr(xr, ur)
        jax.block_until_ready(rr.us)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    frac_final = float(((oc < 1e-2).sum() + rescued) / B)
    record(
        "panda7_rescue", B=B, n_bad=int(bad.size), rescued=rescued,
        frac_main=round(frac_main, 4), frac_after_rescue=round(frac_final, 4),
        rescue_mu0=1e3, rescue_iters=32,
        ms_total=round(dt * 1e3, 1),
        solves_per_s_amortized=round(B / dt, 1),
        bad_oc_after=[float(x) for x in ocr[:8]],
    )  # fmt: skip


if __name__ == "__main__":
    main()
