"""Consolidated TPU profile: rigid-body primitives, arm solver stages, MPC
replan latency, batched pendulum throughput.

Run SOLO (no other TPU process — the tunnel serializes clients; see
.claude/skills/verify/SKILL.md).  Appends one JSON line per metric to
benchmarks/results.jsonl.
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()


def timed(fn, *args, n=20):
    """Single-dispatch median (includes the tunnel round trip — compare
    against the dispatch_floor metric)."""
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = g(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def timed_pipelined(fn, *args, n=20):
    """Sustained per-call time: enqueue back-to-back, block once — the
    device-limited rate a full queue achieves (production protocol)."""
    g = jax.jit(fn)
    r = g(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    outs = [g(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) * 1e3 / n


def main():
    from ddp_tpu.models import base
    from ddp_tpu.models.robots import ur5
    from ddp_tpu.models.pendulum import pendulum
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver import al as al_mod
    from ddp_tpu.solver.batched import (
        _backward_multi_reg,
        _linesearch_sweep,
        solve_batched,
    )
    from ddp_tpu.solver.mpc import init_carry, make_mpc_step
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32

    # --- rigid-body primitives -------------------------------------------
    arm = ur5(dtype=dtype)
    q = arm.neutral_configuration()
    v = jnp.zeros(6, dtype)
    tau = jnp.zeros(6, dtype)
    record("ur5_fd_single", timed(arm.forward_dynamics, q, v, tau))
    record("ur5_mass_matrix", timed(arm.mass_matrix, q))
    record("ur5_rnea", timed(arm.rnea, q, v, tau))
    qs = jnp.tile(q, (1024, 1))
    vs = jnp.zeros((1024, 6), dtype)
    ts_ = jnp.zeros((1024, 6), dtype)
    ms = timed(jax.vmap(arm.forward_dynamics), qs, vs, ts_)
    record("ur5_fd_b1024", ms, per_call_us=round(ms * 1e3 / 1024, 3))

    # --- arm solver stages (H=16, B=1) -----------------------------------
    H = 16
    dyn = dynamics.euler(arm, 0.01)
    q_t = arm.integrate(q, 0.05 * jnp.ones(6, dtype))
    con = constraints.advance_time(
        constraints.ConfigTarget(model=arm, target=q_t, active_ts=(H,)), dyn, times=2
    )
    prob = Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con,
        horizon=H,
        second_order=False,
    )
    x0 = base.state_pack(q, jnp.zeros(6, dtype))
    us = jnp.zeros((H, 6), dtype)
    xs = prob.rollout(x0, us)
    mults = al_mod.init_multipliers(prob, xs)
    mu = jnp.asarray(1e4, dtype)
    reg = jnp.asarray(0.0, dtype)
    record("arm_rollout_T16", timed(prob.rollout, x0, us))
    derivs = jax.jit(prob.derivatives)(xs, us)
    jax.block_until_ready(derivs.fx)
    record("arm_derivs_T16", timed(prob.derivatives, xs, us))
    record(
        "arm_backward_T16",
        timed(lambda d: _backward_multi_reg(d, mults.val, mults.jac, mu, reg), derivs),
    )
    k, K, _, _ = _backward_multi_reg(derivs, mults.val, mults.jac, mu, reg)
    record(
        "arm_linesearch8_T16",
        timed(lambda xs_: _linesearch_sweep(prob, xs_, us, k, K, mults, mu, 8), xs),
    )

    # --- MPC replan latency ----------------------------------------------
    params = SolverParams(max_iterations=3, threshold=1e-4, mu=1e4)
    step = make_mpc_step(prob, params, unroll=1)
    carry = init_carry(prob, dtype=dtype)
    out = step(x0, carry)
    jax.block_until_ready(out.u0)
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        out = step(x0, out.carry)
        jax.block_until_ready(out.u0)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat) * 1e3
    record(
        "ur5_mpc_replan",
        float(np.percentile(lat, 50)),
        p99_ms=round(float(np.percentile(lat, 99)), 3),
        iters=3,
        horizon=H,
    )

    # --- dispatch floor + amortized MPC latency ---------------------------
    # The tunnel adds a fixed per-dispatch round-trip (tens of ms) that
    # dominates single-replan wall time.  Measure it with a no-op, then
    # measure the true on-device replan cost by scanning N replans in ONE
    # dispatch (the production MPC discipline: no host round-trips in the
    # loop) and dividing.
    noop = jnp.zeros(8, dtype)
    record("dispatch_floor", timed(lambda z: z + 1.0, noop))

    from ddp_tpu.solver.mpc import run_mpc

    N_REPLAN = 100
    loop = jax.jit(lambda x: run_mpc(prob, params, x, N_REPLAN)[1])
    r = loop(x0)
    jax.block_until_ready(r)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        r = loop(x0)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    per_replan = float(np.median(ts)) * 1e3 / N_REPLAN
    record(
        "ur5_mpc_replan_amortized",
        per_replan,
        n_replans=N_REPLAN,
        iters=3,
        horizon=H,
        budget_ms=10.0,
    )

    # --- batched pendulum throughput -------------------------------------
    B, HP = 4096, 32
    pend = pendulum(1.0, 1.0, dtype=dtype)
    pdyn = dynamics.euler(pend, 0.01)
    pcon = constraints.advance_time(
        constraints.ConfigTarget(
            model=pend, target=jnp.asarray([3.14], dtype=dtype), active_ts=(HP,)
        ),
        pdyn,
        times=2,
    )
    pprob = Problem(
        dynamics=pdyn,
        cost=costs.quad_control(1.0, dtype=dtype),
        constraint=pcon,
        horizon=HP,
        second_order=True,
    )
    pparams = SolverParams(max_iterations=10, threshold=1e-5, mu=1e4)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.stack([rng.uniform(-np.pi, np.pi, B), np.zeros(B)], axis=1), dtype
    )
    for backend in ("sweep", "pallas"):
        ms = timed_pipelined(
            lambda x, b=backend: solve_batched(pprob, pparams, x, backward=b).us,
            x0s,
            n=10,
        )
        record(
            f"pendulum_batch4096_fullDDP_{backend}",
            ms,
            solves_per_s=round(B / (ms / 1e3), 1),
        )


if __name__ == "__main__":
    main()
