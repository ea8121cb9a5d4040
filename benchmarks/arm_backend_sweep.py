"""Pallas-vs-XLA backward at arm-class dims (round-2 VERDICT item 3).

UR5 config-target Gauss-Newton DDP (BASELINE configs[3] dims: n=12, m=6,
e=6 — the reference driver test/pinocchio_ddp.cpp:35-68) batched on TPU.
The pendulum headline (n=2, m=1, e=1) exercises the kernel at tiny dims;
this records whether the batch-on-lanes layout still wins when the
per-timestep row count grows ~50× (734 rows vs 15) and the VMEM plan must
shrink the lane block (solver/batched.py::_pallas_block_plan).

Math parity at these dims is pinned by
tests/test_pallas_riccati.py::test_pallas_backward_arm_dims_matches_xla
(f64 interpret, 1e-9); this script measures the f32 TPU behavior.

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
    con = constraints.advance_time(
        constraints.ConfigTarget(model=arm, target=q_target, active_ts=(H,)),
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

    x0 = base.state_pack(q0, jnp.zeros(arm.nv, dtype))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.1 * rng.standard_normal((B, problem.nx)), dtype
    )

    # (backend, matmul_precision): the None-precision rows reproduce the
    # round-2 feasibility tail (bf16 MXU passes in the derivative/rollout
    # stages); "highest" restores the f64-oracle feasibility — VERDICT r3
    # item 2, docs/DESIGN.md "bf16 matmul passes and the arm feasibility
    # tail".
    import sys

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    for backend, prec, nls, fwd in (
        ("sweep", None, 8, "sweep"),
        ("pallas", None, 8, "sweep"),
        ("sweep", "high", 8, "sweep"),
        ("sweep", "highest", 8, "sweep"),
        ("pallas", "high", 8, "sweep"),
        # round-3 production recommendation: accurate passes + halved ladder
        # (the rollout evaluates RNEA per candidate at arm dims, so unlike
        # the pendulum the cut removes real FLOPs from the dominant stage)
        ("pallas", "high", 4, "sweep"),
        # early-exit ladder: rolls out candidates largest-first and stops at
        # the first batchwide accept — expected ~1 rollout/iter vs always
        # n_linesearch; same accepted step (bit-identical on CPU f64,
        # tests/test_batched_solver.py::test_forward_seq_matches_sweep_bitwise)
        ("pallas", "high", 8, "seq"),
        ("pallas", "high", 4, "seq"),
        # round-3: batch-on-lanes fd-derivatives kernel replaces the
        # jacfwd-over-RNEA sweep (kernels/fd_derivs.py) — the stage that
        # dominated the per-iteration profile (arm_stage_derivatives rows)
        ("pallas", "high", 4, "seq+fd"),
    ):
        tag = f"{backend}-{prec or 'default'}-{nls}-{fwd}"
        if only is not None and not any(o in tag for o in only):
            continue
        try:
            fwd_name, deriv = (
                (fwd[: -len("+fd")], "pallas") if fwd.endswith("+fd") else (fwd, "jvp")
            )
            fn = jax.jit(
                lambda x, b=backend, p=prec, n=nls, f=fwd_name, d=deriv: solve_batched(
                    problem, params, x, backward=b, matmul_precision=p,
                    n_linesearch=n, forward=f, deriv=d,
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
                "arm_backend_sweep",
                backend=backend,
                matmul_precision=prec or "default",
                n_linesearch=nls,
                forward=fwd,
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
                "arm_backend_sweep",
                backend=backend,
                matmul_precision=prec or "default",
                n_linesearch=nls,
                forward=fwd,
                B=B,
                H=H,
                error=f"{type(e).__name__}: {e}"[:300],
            )


if __name__ == "__main__":
    main()
