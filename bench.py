"""Benchmark: batched pendulum DDP solves/s per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json north_star): >= 10_000 solves/s/chip for
batched pendulum DDP (4096 initial states, shared cost, line-search sweep).

Run on whatever accelerator jax finds (the driver runs it on one TPU chip);
falls back to CPU cleanly.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = 4096
HORIZON = 32
# 8 fixed AL-DDP iterations with the bounded inner loop (inner_iters_max=1:
# multiplier/μ update gate opens every iteration).  Round-2 root-cause work
# (docs/DESIGN.md "The bf16 plateau anomaly") showed the old 14-iteration
# budget was compensating for a schedule that deferred updates when the
# gains are computed accurately; with K=1 the same solve reaches 100%
# feasibility at p99 ‖eq‖ = 1.4e-4 in 8 iterations (results.jsonl
# schedule_sweep rows) — tighter than 14 iterations ever got (2.7e-3).
ITERS = 8
INNER_K = 1
# Single-level regularization: on the GN pendulum Quu = c·I + μ·equᵀequ +
# fuᵀVxx·fu never loses definiteness, so the 4-level parallel retry ladder
# is dead work (measured: n_levels 1 vs 4 give bitwise-equal feasibility and
# p99 ‖eq‖ = 1.38e-4, 869k vs 780k solves/s).  A lane that did fail would
# keep its trajectory via the ok-mask and recover through the
# cross-iteration reg escalation, same as the reference's bump-and-retry
# (ddp_bwd.ipp:105-132) amortized across iterations.
N_REG_LEVELS = 1
# Forward stage tuning (round-3, results.jsonl pendulum_forward_sweep):
# the line-search ladder never accepts past 1/8 on this workload once the
# gains are accurate — 4 candidates are bit-identical to 8 on CPU and give
# the same p99 = 1.38e-4 on TPU; unroll=4 on the rollout scan + outer
# iteration scan cuts per-step dispatch overhead.  Measured (solo, 20-rep
# pipelined): (nls=8,u=1) 995k → (nls=4,u=4) 1,196k solves/s, +20%.
N_LINESEARCH = 4
UNROLL = 4
TARGET = 10_000.0  # solves/s/chip (BASELINE.json)


def _mpc_device_time(jax, jnp, n_replans: int = 12, budget_s: int = 300):
    """UR5 MPC replan (T=16, 3 AL iters): device-only p50/p99 in ms from a
    profiler trace, or None when no device plane is captured (CPU runs).

    The whole measurement runs under a SIGALRM watchdog: the tunnel's trace
    transfer occasionally degrades to minutes, and the headline metric must
    print regardless (the alarm surfaces as ur5_mpc_error in the row)."""
    import glob
    import signal
    import tempfile

    def _timeout(signum, frame):
        raise TimeoutError(f"mpc trace exceeded {budget_s}s watchdog")

    old = signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(budget_s)
    try:
        return _mpc_device_time_inner(jax, jnp, n_replans, glob, tempfile)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _mpc_device_time_inner(jax, jnp, n_replans, glob, tempfile):

    import numpy as np

    from ddp_tpu.models import base
    from ddp_tpu.models.robots import ur5
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.mpc import init_carry, make_mpc_step
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    arm = ur5(dtype=dtype)
    dyn = dynamics.euler(arm, 0.01)
    q0 = arm.neutral_configuration()
    q_target = arm.integrate(q0, jnp.asarray(0.05 * np.arange(1.0, 7.0), dtype))
    con = constraints.advance_time(
        constraints.ConfigTarget(model=arm, target=q_target, active_ts=(16,)),
        dyn,
        times=2,
    )
    problem = Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con,
        horizon=16,
        second_order=False,
    )
    params = SolverParams(max_iterations=3, threshold=1e-5, mu=1e4, inner_iters_max=1)
    step = make_mpc_step(problem, params)
    x0 = base.state_pack(q0, jnp.zeros(arm.nv, dtype))
    carry = init_carry(problem, dtype)
    out = step(x0, carry)  # compile
    jax.block_until_ready(out.u0)
    carry = out.carry

    trace_dir = tempfile.mkdtemp(prefix="bench-mpc-trace-")
    with jax.profiler.trace(trace_dir):
        for _ in range(n_replans):
            out = step(x0, carry)
            jax.block_until_ready(out.u0)
            carry = out.carry

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        return None
    # TPU plane only (same prefix as benchmarks/mpc_device_time.py): a
    # non-TPU backend must report None, not its host-plane module times.
    # Events are deduped per (plane, start) — a re-parsed plane proto can
    # surface the same execution twice.
    mods: dict[str, dict[tuple, float]] = {}
    for plane in jax.profiler.ProfileData.from_file(files[0]).planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                mods.setdefault(ev.name, {})[(plane.name, ev.start_ns)] = (
                    ev.end_ns - ev.start_ns
                ) / 1e6
    if not mods:
        return None
    # the replan module is the one executed exactly n_replans times; if the
    # count heuristic is ambiguous, fall back to most-events and say so in
    # the row rather than silently reporting a possibly-wrong module
    counts = {k: len(v) for k, v in mods.items()}
    exact = [k for k, c in counts.items() if c == n_replans]
    if len(exact) == 1:
        durs = np.asarray(list(mods[exact[0]].values()))
        note = None
    else:
        name = max(mods, key=lambda k: counts[k])
        durs = np.asarray(list(mods[name].values()))
        note = f"event counts {sorted(counts.values())} vs n_replans={n_replans}"
    out = {
        "p50": round(float(np.percentile(durs, 50)), 3),
        "p99": round(float(np.percentile(durs, 99)), 3),
        "n": int(durs.size),
        "vs_budget_10ms": round(float(np.percentile(durs, 50)) / 10.0, 3),
    }
    if note is not None:
        out["count_warning"] = note
    return out


def _pallas_parity(jax, jnp, problem, params, x0s, n_check=512):
    """TPU-compiled kernel-correctness signal (round-4): one backward sweep
    through the Mosaic-compiled Pallas kernel AND the pinned XLA sweep on
    identical inputs, reporting max|Δk|/max|ΔK| across the batch.  The
    interpret-mode exactness tests (tests/test_pallas_riccati.py) cover the
    kernel *math*; this covers the actual Mosaic compilation on the chip —
    a lowering regression shows up here as a loud number, not a silent
    feasibility drop.  Math both must agree on: ddp_bwd.ipp:9-155."""
    from ddp_tpu.solver import batched as bt

    x = x0s[:n_check]
    B = x.shape[0]
    T, ne, ndx, nu = problem.horizon, problem.ne, problem.ndx, problem.nu
    dtype = x.dtype
    us = jnp.zeros((B, T, nu), dtype)

    @jax.jit
    def both(x):
        xs = jax.vmap(problem.rollout)(x, us)
        derivs = jax.vmap(problem.derivatives)(xs, us)
        mv = jnp.zeros((B, T, ne), dtype)
        mj = jnp.zeros((B, T, ne, ndx), dtype)
        mu = jnp.full((B,), params.mu, dtype)
        reg = jnp.zeros((B,), dtype)
        kp, Kp, okp, _ = bt._backward_pallas_levels(
            derivs, mv, mj, mu, reg, n_levels=1
        )
        kx, Kx, okx, _ = jax.vmap(
            lambda d, v, j, m, r: bt._backward_multi_reg(d, v, j, m, r, n_levels=1)
        )(derivs, mv, mj, mu, reg)
        return (
            jnp.max(jnp.abs(kp - kx)),
            jnp.max(jnp.abs(Kp - Kx)),
            jnp.logical_and(jnp.all(okp), jnp.all(okx)),
        )

    dk, dK, ok = both(x)
    out = {
        "max_dk": float(dk),
        "max_dK": float(dK),
        "both_ok": bool(ok),
        "n_check": int(B),
    }
    # loud failure above ~1e-4 (f32 sweeps at these scales agree to ~1e-5)
    if not bool(ok) or float(dk) > 1e-4 or float(dK) > 1e-4:
        out["ALERT"] = "pallas backward diverged from XLA sweep on-device"
    return out


def _t200_row(jax, jnp, budget_s: int = 420):
    """Reference-horizon batched row (test/pendulum_ddp.cpp:33: T=200):
    ties the T=32 throughput headline to the reference's functional config.
    Watchdog-guarded like the MPC block — the headline must print
    regardless."""
    import signal

    def _timeout(signum, frame):
        raise TimeoutError(f"T200 row exceeded {budget_s}s watchdog")

    old = signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(budget_s)
    try:
        from ddp_tpu.models.pendulum import pendulum
        from ddp_tpu.ocp import constraints, costs, dynamics
        from ddp_tpu.ocp.problem import Problem
        from ddp_tpu.solver.batched import solve_batched
        from ddp_tpu.solver.solve import SolverParams

        dtype = jnp.float32
        model = pendulum(1.0, 1.0, dtype=dtype)
        dyn = dynamics.euler(model, 0.01)
        H = 200
        con = constraints.advance_time(
            constraints.ConfigTarget(
                model=model, target=jnp.asarray([3.14], dtype), active_ts=(H,)
            ),
            dyn,
            times=2,
        )
        problem = Problem(
            dynamics=dyn, cost=costs.quad_control(1.0, dtype=dtype),
            constraint=con, horizon=H, second_order=False,
        )
        params = SolverParams(
            max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=1
        )
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(
            np.stack([rng.uniform(-np.pi, np.pi, BATCH), np.zeros(BATCH)], axis=1),
            dtype,
        )
        fn = jax.jit(
            lambda x: solve_batched(
                problem, params, x, backward="pallas", n_reg_levels=1,
                n_linesearch=N_LINESEARCH, unroll=UNROLL, forward="seq",
            )  # fmt: skip
        )
        r = fn(x0s)
        jax.block_until_ready(r.us)
        frac = float(jnp.mean((r.opt_constr < 1e-2).astype(jnp.float32)))
        n_rep = 5
        t0 = time.perf_counter()
        outs = [fn(x0s) for _ in range(n_rep)]
        jax.block_until_ready(outs[-1].us)
        dt = (time.perf_counter() - t0) / n_rep
        return {
            "solves_per_s": round(BATCH / dt, 1),
            "frac_feasible_1e-2": round(frac, 4),
            "vs_10k_target": round(BATCH / dt / 10_000.0, 2),
        }
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _panda7_row(jax, jnp, budget_s: int = 420):
    """BASELINE configs[3]-class row (7-DoF spatial_eq fleet) at a bounded
    budget: B=256, 24 AL iterations, the production recipe
    (benchmarks/panda_spatial_eq.py).  Watchdog-guarded."""
    import signal

    def _timeout(signum, frame):
        raise TimeoutError(f"panda7 row exceeded {budget_s}s watchdog")

    old = signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(budget_s)
    try:
        from ddp_tpu.models import base
        from ddp_tpu.models.robots import ee_frame_id, panda7
        from ddp_tpu.ocp import constraints, costs, dynamics
        from ddp_tpu.ocp.problem import Problem
        from ddp_tpu.solver.batched import solve_batched
        from ddp_tpu.solver.solve import SolverParams

        dtype = jnp.float32
        B, H, iters = 256, 16, 24
        arm = panda7(dtype=dtype)
        dyn = dynamics.euler(arm, 0.01)
        fid = ee_frame_id(arm, "ee")
        q_ready = jnp.asarray(
            [0.0, -0.785, 0.0, -2.356, 0.0, 1.571, 0.785], dtype
        )
        q_goal = arm.integrate(
            q_ready, jnp.asarray(0.04 * np.arange(1.0, 8.0), dtype)
        )
        con = constraints.advance_time(
            constraints.FrameTarget(
                model=arm, target=arm.frame_position(fid, q_goal),
                frame_id=fid, active_ts=(H,),
            ),
            dyn, times=2,
        )  # fmt: skip
        problem = Problem(
            dynamics=dyn, cost=costs.quad_control(1.0, dtype=dtype),
            constraint=con, horizon=H, second_order=False,
        )  # fmt: skip
        params = SolverParams(
            max_iterations=iters, threshold=1e-5, mu=1e4, inner_iters_max=1
        )
        rng = np.random.default_rng(0)
        x0 = base.state_pack(q_ready, jnp.zeros(arm.nv, dtype))
        x0s = jnp.asarray(
            np.asarray(x0)[None] + 0.05 * rng.standard_normal((B, problem.nx)),
            dtype,
        )
        zero_v = jnp.zeros(arm.nv, dtype)
        grav = jax.vmap(lambda q: arm.rnea(q, zero_v, zero_v))(x0s[:, : arm.nq])
        us0 = jnp.tile(grav[:, None, :], (1, H, 1))
        # production recipe (benchmarks/panda_recipe.py sweep + the μ-race
        # rescue, docs/DESIGN.md "The panda7 f32 tail"): highest precision
        # (throughput-free, keeps the tail small), 2-candidate ladder (the
        # ladder width is the lever — the reg-escalation machinery absorbs
        # rejections), 24 iterations, then re-solve the infeasible lanes
        # from x0 at fresh μ₀=1e3 in one padded 128-lane block
        # (1024-lane fleet: 503 solves/s amortized, 100% @1e-2, p99 5.6e-3)
        fn = jax.jit(
            lambda x, u: solve_batched(
                problem, params, x, us_init=u, backward="pallas",
                matmul_precision="highest", n_linesearch=2, forward="seq",
                deriv="pallas",
            )  # fmt: skip
        )
        RB = 128
        r = fn(x0s, us0)
        jax.block_until_ready(r.us)
        oc = np.asarray(r.opt_constr)
        bad = np.nonzero(oc >= 1e-2)[0]
        frac_main = float((oc < 1e-2).mean())
        oc_final = oc.copy()
        xr = ur = fr = None
        if bad.size and bad.size <= RB:
            # rescue pass (compiled only when the fleet has a tail — the
            # B=256 bench fleet is often already clean)
            params_r = SolverParams(
                max_iterations=32, threshold=1e-5, mu=1e3, inner_iters_max=1
            )
            fr = jax.jit(
                lambda x, u: solve_batched(
                    problem, params_r, x, us_init=u, backward="pallas",
                    matmul_precision="highest", n_linesearch=8, forward="seq",
                    deriv="pallas",
                )  # fmt: skip
            )
            idx = np.resize(bad, RB)
            xr, ur = x0s[jnp.asarray(idx)], us0[jnp.asarray(idx)]
            rr = fr(xr, ur)
            jax.block_until_ready(rr.us)
            ocr = np.asarray(rr.opt_constr)[: bad.size]
            oc_final[bad] = ocr
        frac = float((oc_final < 1e-2).mean())
        p99 = float(np.percentile(oc_final, 99))
        t0 = time.perf_counter()
        r = fn(x0s, us0)
        jax.block_until_ready(r.us)
        if fr is not None:
            rr = fr(xr, ur)
            jax.block_until_ready(rr.us)
        dt = time.perf_counter() - t0
        return {
            "solves_per_s": round(B / dt, 1), "B": B, "iters": iters,
            "recipe": "highest_ls2_24+rescue", "n_rescued": int(bad.size),
            "frac_main": round(frac_main, 4),
            "frac_feasible_1e-2": round(frac, 4), "p99_constr": f"{p99:.2e}",
        }  # fmt: skip
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _quadrotor_row(jax, jnp, budget_s: int = 420):
    """configs[2]-class quaternion-manifold row: freeflyer StateTarget fleet
    at a bounded budget (B=256, 36 iterations, K=3 — the working recipe,
    benchmarks/quadrotor_state_eq.py).  Watchdog-guarded."""
    import signal

    def _timeout(signum, frame):
        raise TimeoutError(f"quadrotor row exceeded {budget_s}s watchdog")

    old = signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(budget_s)
    try:
        from ddp_tpu.models import base
        from ddp_tpu.models.robots import quadrotor
        from ddp_tpu.ocp import constraints, costs, dynamics
        from ddp_tpu.ocp.problem import Problem
        from ddp_tpu.solver.batched import solve_batched
        from ddp_tpu.solver.solve import SolverParams

        dtype = jnp.float32
        B, H, iters = 256, 32, 36
        quad = quadrotor(dtype=dtype)
        dyn = dynamics.euler(quad, 0.02)
        q0 = quad.neutral_configuration()
        q_goal = quad.integrate(
            q0, jnp.asarray([0.3, -0.2, 0.4, 0.0, 0.0, 0.2], dtype)
        )
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
            max_iterations=iters, threshold=1e-5, mu=1e4, inner_iters_max=3
        )
        rng = np.random.default_rng(0)
        x0 = base.state_pack(q0, jnp.zeros(quad.nv, dtype))
        dxs = 0.05 * rng.standard_normal((B, 2 * quad.nv)).astype(np.float32)
        x0s = jax.vmap(lambda d: base.state_integrate(quad, x0, d))(
            jnp.asarray(dxs, dtype)
        )
        zero_v = jnp.zeros(quad.nv, dtype)
        grav = jax.vmap(lambda x: quad.rnea(x[: quad.nq], zero_v, zero_v))(x0s)
        us0 = jnp.tile(grav[:, None, :], (1, H, 1))
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
        t0 = time.perf_counter()
        r = fn(x0s, us0)
        jax.block_until_ready(r.us)
        dt = time.perf_counter() - t0
        return {
            "solves_per_s": round(B / dt, 1), "B": B, "iters": iters,
            "frac_feasible_1e-2": round(frac, 4), "p99_constr": f"{p99:.2e}",
        }  # fmt: skip
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the batched-static program is large and the
    # remote TPU compile is slow cold (~5 min); cached it loads in seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
            model=model, target=jnp.asarray([3.14], dtype=dtype), active_ts=(HORIZON,)
        ),
        dyn,
        times=2,
    )
    # BASELINE configs[1] is "batched pendulum iLQR": Gauss-Newton mode
    # (no dynamics Hessians), which is also the faster TPU path
    problem = Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con,
        horizon=HORIZON,
        second_order=False,
    )
    params = SolverParams(
        max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=INNER_K
    )

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.stack([rng.uniform(-np.pi, np.pi, BATCH), np.zeros(BATCH)], axis=1),
        dtype=dtype,
    )

    # Pallas batch-on-lanes backward (kernels/riccati_small.py) is the fast
    # path on real TPU; fall back to the XLA sweep anywhere Mosaic is
    # unavailable (still ≥2× the target).  The backend that actually ran and
    # any fallback reason are recorded in the output row so a pallas
    # regression shows up as more than an unexplained throughput drop.
    backend, fallback_error = "pallas", None
    try:
        fn = jax.jit(
            lambda x: solve_batched(
                problem, params, x, backward="pallas", n_reg_levels=N_REG_LEVELS,
                n_linesearch=N_LINESEARCH, unroll=UNROLL,
            )  # fmt: skip
        )
        res = fn(x0s)
        jax.block_until_ready(res.us)
    except Exception as exc:  # noqa: BLE001 — driver needs a number either way
        backend, fallback_error = "sweep", f"{type(exc).__name__}: {exc}"[:200]
        fn = jax.jit(
            lambda x: solve_batched(
                problem, params, x, n_linesearch=N_LINESEARCH, unroll=UNROLL
            )
        )
        res = fn(x0s)
        jax.block_until_ready(res.us)

    # Sustained throughput: enqueue back-to-back and block once at the end.
    # Blocking per call would charge the host↔device round trip (~28 ms
    # through the axon tunnel — benchmarks/results.jsonl "dispatch_floor")
    # to every batch; real deployments keep the device queue full.
    n_rep = 20
    t0 = time.perf_counter()
    outs = [fn(x0s) for _ in range(n_rep)]
    jax.block_until_ready(outs[-1].us)
    dt = (time.perf_counter() - t0) / n_rep
    res = outs[-1]

    solves_per_s = BATCH / dt
    frac_feasible = float(jnp.mean((res.opt_constr < 1e-2).astype(jnp.float32)))
    row = {
        "metric": "pendulum_ddp_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / TARGET, 3),
        "frac_feasible_1e-2": round(frac_feasible, 4),
        "backend": backend,
        # protocol stamp: pipelined = back-to-back enqueue, one final block
        # (older rows without these keys were per-call blocking at iters=10)
        "timing": "pipelined",
        "iters": ITERS,
        "inner_iters_max": INNER_K,
        "n_reg_levels": N_REG_LEVELS,
    }
    if fallback_error:
        row["fallback_error"] = fallback_error
    if backend == "pallas":
        # on-device Pallas-vs-XLA backward parity (kernel health signal)
        try:
            row["pallas_parity"] = _pallas_parity(jax, jnp, problem, params, x0s)
        except Exception as exc:  # noqa: BLE001 — headline must print regardless
            row["pallas_parity"] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    # Reference-horizon row (T=200, the functional pendulum config)
    try:
        row["pendulum_T200"] = _t200_row(jax, jnp)
    except Exception as exc:  # noqa: BLE001 — headline must print regardless
        row["pendulum_T200"] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    # configs[2]/[3]-class workload rows (VERDICT r4 item 8): bounded-budget
    # panda7 spatial_eq + quadrotor StateTarget fleets in the same JSON line
    try:
        row["panda7_spatial_eq"] = _panda7_row(jax, jnp)
    except Exception as exc:  # noqa: BLE001 — headline must print regardless
        row["panda7_spatial_eq"] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    try:
        row["quadrotor_state_eq"] = _quadrotor_row(jax, jnp)
    except Exception as exc:  # noqa: BLE001 — headline must print regardless
        row["quadrotor_state_eq"] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    # Second BASELINE metric (north_star: "arm MPC latency p50/p99 <10 ms"):
    # UR5 replan device time from a jax.profiler trace — each "XLA Modules"
    # event on the TPU plane is one on-device execution of the jitted replan
    # (benchmarks/mpc_device_time.py is the standalone version).  Embedded in
    # the same JSON line so the driver's single-line contract holds while
    # BENCH_r*.json captures both metrics.
    try:
        mpc = _mpc_device_time(jax, jnp)
        if mpc is not None:
            row["ur5_mpc_replan_device_ms"] = mpc
    except Exception as exc:  # noqa: BLE001 — headline must print regardless
        row["ur5_mpc_error"] = f"{type(exc).__name__}: {exc}"[:200]
    print(json.dumps(row))
    # mirror into the benchmark log so docs claims are traceable
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "benchmarks",
                "results.jsonl",
            ),
            "a",
        ) as f:
            f.write(json.dumps({**row, "t": time.strftime("%Y-%m-%d %H:%M:%S")}) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
