"""Per-stage device profile + B-scaling of the quadrotor StateTarget solve
(VERDICT r4 item 4: "first profile the quadrotor solve per stage ... then
attack the real binder").

Stages at the quadrotor_state_eq config (freeflyer, n=12, m=6, e=12, B=512,
T=32, GN, matmul_precision=highest):

- derivatives: the analytic manifold path (fd_derivatives + chart chain)
  and the generic JVP path, timed standalone;
- backward: the Pallas batch-on-lanes kernel (one launch per reg level);
- forward: the early-exit seq ladder (8 candidates);
- aux: update_origin + the three optimality reductions.

A per-iteration stage total × 36 iterations vs the measured end-to-end
solve then shows how much is dependency/dispatch latency.  The B sweep
(512 → 4096) tests the latency-bound hypothesis directly: if the solve is
latency-bound, solves/s scales ~linearly with B.

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

H = 32
ITERS = 36
REPS = 5


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def build(B, generic=False):
    from ddp_tpu.models import base
    from ddp_tpu.models.robots import quadrotor
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    quad = quadrotor(dtype=dtype)
    dyn = dynamics.euler(quad, 0.02)

    if generic:
        @jax.tree_util.register_dataclass
        @dataclasses.dataclass(frozen=True)
        class GenericEuler(dynamics.EulerDynamics):
            @property
            def analytic_jacobians_ok(self):
                return False

        dyn = GenericEuler(model=quad, dt=dyn.dt)
    q0 = quad.neutral_configuration()
    q_goal = quad.integrate(q0, jnp.asarray([0.3, -0.2, 0.4, 0.0, 0.0, 0.2], dtype))
    x_goal = base.state_pack(q_goal, jnp.zeros(quad.nv, dtype))
    con = constraints.advance_time(
        constraints.StateTarget(model=quad, target=x_goal, active_ts=(H,)),
        dyn, times=2,
    )  # fmt: skip
    problem = Problem(
        dynamics=dyn, cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con, horizon=H, second_order=False,
    )  # fmt: skip
    params = SolverParams(
        max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=3
    )
    rng = np.random.default_rng(0)
    x0 = base.state_pack(q0, jnp.zeros(quad.nv, dtype))
    dxs = 0.05 * rng.standard_normal((B, 2 * quad.nv)).astype(np.float32)
    x0s = jax.vmap(lambda d: base.state_integrate(quad, x0, d))(jnp.asarray(dxs, dtype))
    zero_v = jnp.zeros(quad.nv, dtype)
    grav = jax.vmap(lambda x: quad.rnea(x[: quad.nq], zero_v, zero_v))(x0s)
    us0 = jnp.tile(grav[:, None, :], (1, H, 1))
    return quad, problem, params, x0s, us0


def main():
    from ddp_tpu.solver import al as al_mod
    from ddp_tpu.solver.batched import (
        _backward_pallas_levels,
        _linesearch_seq,
        solve_batched,
    )

    B = 512
    quad, problem, params, x0s, us0 = build(B)
    _, problem_g, _, _, _ = build(B, generic=True)

    with jax.default_matmul_precision("highest"):
        xs = jax.vmap(problem.rollout)(x0s, us0)
        v_da = jax.jit(lambda xs_, us_: jax.vmap(problem.derivatives)(xs_, us_))
        v_dg = jax.jit(lambda xs_, us_: jax.vmap(problem_g.derivatives)(xs_, us_))
        t_da = _time(v_da, xs, us0)
        t_dg = _time(v_dg, xs, us0)
        derivs = v_da(xs, us0)
        mults = jax.vmap(lambda xs_: al_mod.init_multipliers(problem, xs_))(xs)
        mu = jnp.full((B,), 1e4, jnp.float32)
        reg = jnp.zeros((B,), jnp.float32)
        v_bwd = jax.jit(
            lambda d, mv, mj: _backward_pallas_levels(d, mv, mj, mu, reg, n_levels=4)
        )
        t_b = _time(v_bwd, derivs, mults.val, mults.jac)
        k, K, ok, _ = v_bwd(derivs, mults.val, mults.jac)
        v_fwd = jax.jit(
            lambda xs_, us_, k_, K_, m_: jax.vmap(
                lambda a, b, c, d_, e_: _linesearch_seq(
                    problem, a, b, c, d_, e_, 1e4, 8
                )
            )(xs_, us_, k_, K_, m_)
        )
        t_f = _time(v_fwd, xs, us0, k, K, mults)
        v_aux = jax.jit(
            lambda d, m_, xs_: (
                jax.vmap(lambda mm, xx: al_mod.update_origin(quad, mm, xx))(m_, xs_),
                jax.vmap(
                    lambda dd, mv, mj: al_mod.optimality_obj(problem, dd, mv, mj, 1e4)
                )(d, m_.val, m_.jac),
                jax.vmap(al_mod.optimality_constr)(d),
            )
        )
        t_aux = _time(v_aux, derivs, mults, xs)

    per_iter = t_da + t_b + t_f + t_aux
    record(
        "quadrotor_stage_profile", B=B, T=H,
        derivs_analytic_ms=round(t_da, 2), derivs_generic_ms=round(t_dg, 2),
        backward_pallas_ms=round(t_b, 2), forward_seq_ms=round(t_f, 2),
        aux_ms=round(t_aux, 2), per_iter_total_ms=round(per_iter, 2),
        x36_iters_ms=round(per_iter * ITERS, 1),
    )  # fmt: skip

    # --- B scaling at the production recipe ---
    for Bs in (512, 1024, 2048, 4096):
        quad, problem, params, x0s, us0 = build(Bs)
        fn = jax.jit(
            lambda x, u: solve_batched(
                problem, params, x, us_init=u, backward="pallas",
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
            "quadrotor_B_sweep", B=Bs, iters=ITERS, ms=round(dt * 1e3, 1),
            solves_per_s=round(Bs / dt, 1), frac_feasible=round(frac, 4),
            p99_constr=f"{p99:.2e}",
        )  # fmt: skip


if __name__ == "__main__":
    main()
