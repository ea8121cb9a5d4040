"""Batched quadrotor (freeflyer) StateTarget DDP — the quaternion-manifold
workload the round-3 verdict flagged as excluded from every fast path.

Round-4 closes that: ``EulerDynamics.jacobians`` chains fd_derivatives'
coordinate ∂a/∂q through the chart (Q = ∂integrate/∂δ + group-transport
q-row), so the GN derivative sweep on freeflyer models runs the assembled
one-kinematics-pass + one-Cholesky path instead of pushing 2·ndx+nu JVP
columns through RNEA (≙ the reference's analytic freeflyer coverage,
pinocchio_model.ipp:222-321, 359-400).

Workload (f64 CPU study, round-4): hover-to-displaced-hover (0.54 m
translation + 0.2 rad yaw over 0.64 s), terminal StateTarget (ne = 12)
through a double AdvanceTime, gravity-compensation warm start, ±0.05
tangent start spread.  The rank-6-control vs rank-12-constraint terminal
needs the AL multipliers built up patiently: inner_iters_max=3 with 36
iterations reaches frac_feasible = 0.984 at p99 ‖eq‖ = 7.9e-3 in f64
(inner=1 stalls at ~0.7 and is non-monotone in the budget — the premature
multiplier-update mechanism, docs/DESIGN.md).  Records both the
analytic-deriv row and a generic-JVP control row (same seed).

Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import dataclasses
import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

B, H = 512, 32
ITERS = 36


def main():
    from ddp_tpu.models import base
    from ddp_tpu.models.robots import quadrotor
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    quad = quadrotor(dtype=dtype)
    dyn = dynamics.euler(quad, 0.02)
    q0 = quad.neutral_configuration()
    # target: translate (0.3, -0.2, 0.4) m and yaw 0.2 rad from hover
    q_goal = quad.integrate(
        q0, jnp.asarray([0.3, -0.2, 0.4, 0.0, 0.0, 0.2], dtype)
    )
    x_goal = base.state_pack(q_goal, jnp.zeros(quad.nv, dtype))

    def make_problem(dyn_):
        con = constraints.advance_time(
            constraints.StateTarget(model=quad, target=x_goal, active_ts=(H,)),
            dyn_,
            times=2,
        )
        return Problem(
            dynamics=dyn_,
            cost=costs.quad_control(1.0, dtype=dtype),
            constraint=con,
            horizon=H,
            second_order=False,
        )

    params = SolverParams(
        max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=3
    )

    rng = np.random.default_rng(0)
    x0 = base.state_pack(q0, jnp.zeros(quad.nv, dtype))
    # perturb in the tangent space then retract (keeps quaternions unit)
    dxs = 0.05 * rng.standard_normal((B, 2 * quad.nv)).astype(np.float32)
    x0s = jax.vmap(lambda d: base.state_integrate(quad, x0, d))(
        jnp.asarray(dxs, dtype)
    )
    zero_v = jnp.zeros(quad.nv, dtype)
    grav = jax.vmap(lambda x: quad.rnea(x[: quad.nq], zero_v, zero_v))(x0s)
    us0 = jnp.tile(grav[:, None, :], (1, H, 1))

    # generic-JVP control: identical dynamics but with the analytic gate off
    @jax.tree_util.register_dataclass
    @dataclasses.dataclass(frozen=True)
    class GenericEuler(dynamics.EulerDynamics):
        @property
        def analytic_jacobians_ok(self):
            return False

    variants = {
        "analytic": make_problem(dyn),
        "generic_jvp": make_problem(GenericEuler(model=quad, dt=dyn.dt)),
    }
    for name, problem in variants.items():
        fn = jax.jit(
            lambda x, u, p=problem: solve_batched(
                p,
                params,
                x,
                us_init=u,
                backward="pallas",
                matmul_precision="highest",
                n_linesearch=8,
                forward="seq",
            )
        )
        r = fn(x0s, us0)
        jax.block_until_ready(r.us)
        frac = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
        p99 = float(jnp.percentile(r.opt_constr, 99))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = fn(x0s, us0)
            jax.block_until_ready(r.us)
            ts.append(time.perf_counter() - t0)
        dt_s = float(np.median(ts))
        record(
            "quadrotor_state_eq",
            deriv=name,
            backend="pallas",
            matmul_precision="highest",
            n_linesearch=8,
            dims="n=13,m=6,e=12(tangent)",
            recipe="grav-comp warm start, inner=3",
            B=B,
            H=H,
            iters=ITERS,
            ms=round(dt_s * 1e3, 2),
            solves_per_s=round(B / dt_s, 1),
            frac_feasible=round(frac, 4),
            p99_constr=f"{p99:.2e}",
        )


if __name__ == "__main__":
    main()
